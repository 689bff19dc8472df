"""HTTP send-lane throughput (round-9 verdict item 4).

The reference's headline metric IS notifications/min through its HTTP
sink (AkkaHttpClient.scala:50-62 — 20000 max open requests, 1000 req/s
throttle; mediation/README.md:280-284 — >200K/min sustained). The
repo's last send-path figure (~197K/min, COVERAGE.md round-4) was
measured against ONE GIL-bound Python stub server sharing the host —
the stub, not the sender, was the suspect bottleneck.

This tool re-measures the CURRENT sender (keep-alive pooled
``mapInPandas``, per-thread connections, optional endpoint sharding):

- K stub receiver PROCESSES (ThreadingHTTPServer each, pre-rendered
  201 responses) so the receiver tier scales past one GIL;
- a concurrency sweep (per-partition thread-pool width);
- one leg with the reference's own 1000 req/s token-bucket throttle
  engaged for contract parity.

LOOPBACK CAVEAT (recorded in the artifact): client, receiver tier and
Spark share one box, so these numbers measure the SENDER's ceiling
against a local sink — on a real deployment the network and endpoint
SLA dominate, which is exactly why the throttle/token-bucket exists.

Usage: python tools/bench_http.py [n_records] [--servers 8]
           [--out FILE]
"""

from __future__ import annotations

import json
import multiprocessing
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

_BODY = json.dumps({"id": 101}).encode()


def _serve(port_q) -> None:
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    resp = (
        b"HTTP/1.1 201 Created\r\nContent-Type: application/json\r\n"
        + f"Content-Length: {len(_BODY)}\r\n\r\n".encode()
        + _BODY
    )

    class _H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # keep-alive

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            self.rfile.read(n)
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    ThreadingHTTPServer.request_queue_size = 1024
    server = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    port_q.put(server.server_address[1])
    server.serve_forever()


def main() -> int:
    n_records = (
        int(sys.argv[1])
        if len(sys.argv) > 1 and not sys.argv[1].startswith("--")
        else 200_000
    )
    n_servers = (
        int(sys.argv[sys.argv.index("--servers") + 1])
        if "--servers" in sys.argv
        else 8
    )
    out_path = (
        sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else None
    )

    from pyspark.sql import functions as F

    from benchgate import preflight_load_gate
    from scio_db_spark.session import SessionFactory
    from scio_db_spark.sinks.http_sink import send_http_batch

    gate = preflight_load_gate("bench_http")

    ctx = multiprocessing.get_context("fork")
    port_q = ctx.Queue()
    procs = [
        ctx.Process(target=_serve, args=(port_q,), daemon=True)
        for _ in range(n_servers)
    ]
    for p in procs:
        p.start()
    urls = [
        f"http://127.0.0.1:{port_q.get()}/posts" for _ in range(n_servers)
    ]

    spark = SessionFactory.create("bench-http")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(n_records).select(
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("title"),
        F.lit("bench message").alias("body"),
        (F.col("id") % 1000).cast("int").alias("user_id"),
    )

    def _leg(concurrency: int, throttle: float | None) -> dict:
        sent = send_http_batch(
            df,
            urls,
            max_concurrency=concurrency,
            throttle_rps=throttle,
            throttle_burst=throttle,
            retries=2,
            backoff_s=0.2,
            timeout=10.0,
        )
        t0 = time.perf_counter()
        n_ok = sent.filter(F.col("resp_id") == 101).count()
        elapsed = time.perf_counter() - t0
        return {
            "concurrency": concurrency,
            "throttle_rps": throttle,
            "n_records": n_records,
            "n_ok": n_ok,
            "all_ok": n_ok == n_records,
            "wall_sec": round(elapsed, 2),
            "records_per_min": round(n_records / elapsed * 60.0),
        }

    sweep = [_leg(c, None) for c in (16, 32, 64)]
    throttled = _leg(32, 1000.0)

    best = max(sweep, key=lambda r: r["records_per_min"])
    result = {
        "metric": "http_send_lane",
        "n_servers": n_servers,
        "caveat": (
            "loopback: client, receiver tier and Spark share one box; "
            "numbers are the sender's local ceiling, not a network SLA"
        ),
        "sweep": sweep,
        "throttled_leg": throttled,
        "best_records_per_min": best["records_per_min"],
        "baseline_records_per_min": 200_000,
        "vs_baseline": round(best["records_per_min"] / 200_000, 2),
        **gate,
    }
    for p in procs:
        p.terminate()
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
