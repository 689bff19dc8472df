"""Full-pipeline integration test: run_mediation_pipeline with both
sinks attached (HTTP send + dead-letter), driven by a file-drop source
against a local HTTP stub — the complete SURVEY.md §3.1 dataflow.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import Row

from scio_db_spark.streaming.mediation import run_mediation_pipeline

FLAT = (
    "transaction_id string, notification_id string, customer_id string, "
    "message string, event_time timestamp, ts double"
)


class _Stub(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n) or b"{}")
        self.server.requests.append(payload)
        body = json.dumps({**payload, "id": 101}).encode()
        self.send_response(201)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def _wait_until(pred, timeout=90.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.5)
    return False


@pytest.mark.slow
def test_run_mediation_pipeline_end_to_end(spark):
    import datetime

    server = ThreadingHTTPServer(("127.0.0.1", 0), _Stub)
    server.requests = []
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}/posts"

    root = tempfile.mkdtemp(prefix="med_e2e_")
    input_dir = os.path.join(root, "in")
    os.makedirs(input_dir)
    analytics = os.path.join(root, "analytics")
    dead = os.path.join(root, "dead")

    et = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row("tx1", "n1", "1", "m", et, 1.0),
        Row("tx1", "n1", "1", "m", et, 2.0),   # in-batch duplicate
        Row(None, "n2", "2", "m", et, 1.0),    # invalid -> dead letter
        Row("tx3", "n3", "3", "m", et, 1.0),
    ]
    df = spark.createDataFrame(rows, FLAT)
    staging = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        f for f in os.listdir(staging)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.rename(
        os.path.join(staging, part),
        os.path.join(input_dir, f"b_{uuid.uuid4().hex}.parquet"),
    )

    stream = spark.readStream.schema(FLAT).parquet(input_dir)
    queries = run_mediation_pipeline(
        stream,
        url=url,
        checkpoint_dir=os.path.join(root, "ck"),
        dead_letter_path=dead,
        analytics_path=analytics,
        ttl_seconds=3600,
        window_duration="30 seconds",
        retries=0,
        throttle_rps=None,
    )
    try:
        def _analytics_ready():
            try:
                return spark.read.parquet(analytics).count() >= 3
            except Exception:  # noqa: BLE001 — path not written yet
                return False

        assert _wait_until(_analytics_ready), "analytics output missing"
        out = spark.read.parquet(analytics)
        by_status = {
            r.send_status: r.n
            for r in out.groupBy("send_status").count()
            .withColumnRenamed("count", "n").collect()
        }
        # tx1-1 + tx3-3 SENT; tx1-1 second copy duplicated.
        assert by_status == {"SENT": 2, "SENT_OR_DUPLICATED": 1}
        assert len(server.requests) == 2  # only SENT rows hit the wire

        def _dead_ready():
            try:
                return spark.read.parquet(
                    os.path.join(dead, "toxic")
                ).count() >= 1
            except Exception:  # noqa: BLE001
                return False

        assert _wait_until(_dead_ready), "dead-letter output missing"
        toxic = spark.read.parquet(os.path.join(dead, "toxic"))
        assert [r.notification_id for r in toxic.collect()] == ["n2"]
    finally:
        for q in queries.values():
            q.stop()
        server.shutdown()
