"""Sink tests (SURVEY.md §2.2): HTTP sink contract against a local stub
(replacing the reference's live jsonplaceholder dependency,
MediationServiceSpec.scala:74-79) and the file sinks.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


class _StubHandler(BaseHTTPRequestHandler):
    """Mimics jsonplaceholder POST /posts: echoes body + id=101."""

    protocol_version = "HTTP/1.1"  # keep-alive (the sink pools connections)

    def do_POST(self):  # noqa: N802 — http.server API
        length = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(length) or b"{}")
        self.server.requests.append(payload)
        if self.server.fail_all:
            self.send_response(500)
            self.send_header("Content-Length", "4")
            self.end_headers()
            self.wfile.write(b"boom")
            return
        if self.server.weird_mode:
            # Non-DTO 2xx: string id, no "body" field — the parsing
            # layer must degrade gracefully, never crash the task.
            data = json.dumps({"id": "a1b2", "status": "accepted"}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return
        body = dict(payload)
        body["id"] = 101
        data = json.dumps(body).encode()
        self.send_response(201)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture()
def http_stub():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    server.requests = []
    server.fail_all = False
    server.weird_mode = False
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server
    server.shutdown()


def _url(server):
    return f"http://127.0.0.1:{server.server_address[1]}/posts"


def test_send_http_batch_appends_responses(spark, http_stub):
    from scio_db_spark.sinks import send_http_batch, to_http_request

    df = spark.createDataFrame(
        [
            Row(notification_id="n1", message="hello", customer_id="7"),
            Row(notification_id="n2", message="world", customer_id="8"),
        ]
    )
    out = send_http_batch(to_http_request(df), _url(http_stub)).collect()
    assert len(out) == 2
    assert all(r.resp_id == 101 for r in out)
    assert all(r.nhub_success for r in out)
    assert sorted(q["title"] for q in http_stub.requests) == ["n1", "n2"]


def test_send_http_batch_ko_on_failure_no_raise(spark, http_stub):
    # W9: errors are swallowed into the KO response, never raised.
    from scio_db_spark.sinks import send_http_batch, to_http_request

    http_stub.fail_all = True
    df = spark.createDataFrame(
        [Row(notification_id="n1", message="hello", customer_id="7")]
    )
    out = send_http_batch(
        to_http_request(df), _url(http_stub), retries=2, backoff_s=0.01
    ).collect()
    assert len(out) == 1
    assert out[0].resp_body == "ko"
    assert out[0].nhub_success is False
    # W8: 1 initial + 2 retries.
    assert len(http_stub.requests) == 3


def test_classify_success():
    from scio_db_spark.sinks import classify_success

    assert classify_success("created id=5")
    assert not classify_success("ERROR: nope")
    assert not classify_success("status KO")
    assert not classify_success(None)


def test_send_deduped_batch_posts_only_sent(spark, http_stub):
    # D4 + K4: 3 duplicates -> exactly 1 POST, all 3 rows emitted.
    from scio_db_spark.streaming.mediation import send_deduped_batch

    df = spark.createDataFrame(
        [
            Row(notification_id="n1", message="m", customer_id="7",
                send_status="SENT"),
            Row(notification_id="n1", message="m", customer_id="7",
                send_status="SENT_OR_DUPLICATED"),
            Row(notification_id="n1", message="m", customer_id="7",
                send_status="SENT_OR_DUPLICATED"),
        ]
    )
    out = send_deduped_batch(df, _url(http_stub)).collect()
    assert len(out) == 3
    assert len(http_stub.requests) == 1
    statuses = sorted(r.resp_body for r in out)
    assert statuses.count("SENT_OR_DUPLICATED") == 2
    sent = [r for r in out if r.send_status == "SENT"]
    assert sent[0].resp_id == 101 and sent[0].nhub_success


def test_write_sharded_and_windowed(spark, tmp_path):
    from scio_db_spark.sinks import write_sharded, write_windowed_batch

    df = spark.range(100).withColumn(
        "event_time",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(secs=F.col("id").cast("double")),
    )
    p1 = str(tmp_path / "sharded")
    write_sharded(df, p1, num_shards=3)
    parts = [f for f in os.listdir(p1) if f.startswith("part-")]
    assert len(parts) == 3
    assert spark.read.parquet(p1).count() == 100

    p2 = str(tmp_path / "windowed")
    write_windowed_batch(df, p2, window_duration="30 seconds")
    dirs = sorted(d for d in os.listdir(p2) if d.startswith("window_start="))
    assert len(dirs) == 4  # 100 s of data / 30 s windows
    back = spark.read.parquet(p2)
    assert back.count() == 100
    # Partition pruning works on the window column.
    assert back.filter(
        F.col("window_start") == "2024-01-01_00-00-00"
    ).count() == 30


def test_idempotent_batch_writer_replay_safe(spark, tmp_path):
    # Replaying the same epoch must overwrite, not duplicate; other
    # epochs stay intact (dynamic partition overwrite).
    from scio_db_spark.sinks.files import idempotent_batch_writer

    path = str(tmp_path / "eo")
    w = idempotent_batch_writer(path)
    b0 = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    b1 = spark.createDataFrame([Row(k="c", v=3)])
    w(b0, 0)
    w(b1, 1)
    w(b0, 0)  # replay of epoch 0 (post-failure rerun)
    got = spark.read.parquet(path)
    assert got.count() == 3
    assert sorted(r.k for r in got.collect()) == ["a", "b", "c"]
    assert {r.epoch for r in got.select("epoch").collect()} == {0, 1}


def test_send_http_batch_survives_non_dto_response(spark, http_stub):
    """W9 extends to the parsing layer: a 2xx JSON reply with a string
    id and no body must not crash the task; the raw text becomes the
    body and the malformed id maps to a null column."""
    from scio_db_spark.sinks.http_sink import send_http_batch

    http_stub.weird_mode = True
    df = spark.createDataFrame(
        [("n1", "hello", 7)], "title string, body string, user_id int"
    )
    out = send_http_batch(
        df, f"http://127.0.0.1:{http_stub.server_address[1]}/posts",
        retries=0, backoff_s=0.0,
    ).collect()
    (r,) = out
    assert r.resp_id is None  # "a1b2" is not an int — null, not a crash
    assert "accepted" in r.resp_body  # raw JSON recorded as body
    assert r.nhub_success  # no "error"/"ko" in the raw body


def test_send_deduped_batch_full_ber_flat_schema(spark, http_stub):
    """The documented BER_FLAT input carries a pre-send nhub_success
    placeholder; the send must supersede it, not crash with a duplicate
    column — and duplicates classify as SUCCESS (the reference's
    SENT_OR_DUPLICATED response contains neither 'error' nor 'ko')."""
    import datetime

    from scio_db_spark.schemas import BER_FLAT_SCHEMA
    from scio_db_spark.streaming.mediation import send_deduped_batch

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("e1", "tx1", 0, "7", "A", "n1", "m1", 0, False, 1.0, None, ts,
         "SENT"),
        ("e2", "tx1", 0, "7", "A", "n1", "m1", 0, False, 1.0, None, ts,
         "SENT_OR_DUPLICATED"),
    ]
    import pyspark.sql.types as T

    schema = T.StructType(
        BER_FLAT_SCHEMA.fields
        + [T.StructField("send_status", T.StringType())]
    )
    df = spark.createDataFrame(rows, schema)
    out = send_deduped_batch(
        df, _url(http_stub), retries=0, backoff_s=0.0
    ).collect()
    by_status = {r.send_status: r for r in out}
    assert by_status["SENT"].nhub_success
    assert by_status["SENT_OR_DUPLICATED"].nhub_success  # dup = handled OK
    assert by_status["SENT_OR_DUPLICATED"].resp_body == "SENT_OR_DUPLICATED"


def test_windowed_batch_epoch_replay_idempotent(spark, tmp_path):
    """foreachBatch replay (same epoch) must REPLACE the epoch's
    partitions, not append duplicates."""
    import datetime as dt

    from scio_db_spark.sinks.files import write_windowed_batch

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0, 5))],
        "id long, event_time timestamp",
    )
    out = str(tmp_path / "win")
    write_windowed_batch(df, out, window_duration="30 seconds", epoch_id=7)
    write_windowed_batch(df, out, window_duration="30 seconds", epoch_id=7)
    assert spark.read.parquet(out).count() == 1  # replay replaced, not appended
    # conf was restored (unset) — not leaked as 'dynamic'
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", None
    ) is None


def test_windowed_parquet_sink_routes_null_ts_to_no_window(spark, tmp_path):
    """K1 parquet flavor: a null-timestamp row must land in an explicit
    window_start=no-window partition, not silently vanish (F.window
    would inject an isnotnull filter — the dead-letter data-loss bug)."""
    import datetime

    from pyspark.sql import Row

    from scio_db_spark.sinks.files import write_windowed_batch

    rows = [
        Row(k="a", event_time=datetime.datetime(2024, 1, 1, 10, 0, 0)),
        Row(k="b", event_time=None),
    ]
    df = spark.createDataFrame(rows, "k string, event_time timestamp")
    out = str(tmp_path / "w")
    write_windowed_batch(df, out, window_duration="1 minute")
    back = spark.read.parquet(out)
    got = {(r.k, r.window_start) for r in back.select("k", "window_start").collect()}
    assert ("b", "no-window") in got
    assert any(k == "a" and w != "no-window" for k, w in got)


def test_send_http_batch_tolerates_response_named_input_columns(
    spark, http_stub
):
    """An input already carrying a response-named column (the BER-flat
    stream's pre-send nhub_success placeholder) must be dropped and
    re-appended, not declared twice in the output schema (which made
    every non-empty micro-batch fail on a column-count mismatch)."""
    from pyspark.sql import functions as F

    from scio_db_spark.sinks import send_http_batch, to_http_request

    df = to_http_request(
        spark.createDataFrame(
            [("n1", "hello", "7")],
            "notification_id string, message string, customer_id string",
        )
    ).withColumn("nhub_success", F.lit(None).cast("boolean"))
    out = send_http_batch(df, _url(http_stub)).collect()
    assert len(out) == 1
    assert out[0].nhub_success is True  # the RESPONSE value, not the input


def test_token_bucket_sub_one_burst_cannot_deadlock():
    from scio_db_spark.sinks.http_sink import TokenBucket

    b = TokenBucket(rate=1000.0, burst=0.25)
    # capacity clamps to >= 1 token, so acquire returns immediately
    b.acquire()


def test_as_int_rejects_out_of_int32_values():
    from scio_db_spark.sinks.http_sink import _as_int

    assert _as_int(99999999999) is None  # would overflow the int32 cast
    assert _as_int(-(2**40)) is None
    assert _as_int(2147483647) == 2147483647
    assert _as_int("12") == 12
    assert _as_int("nope") is None


def test_send_http_batch_shards_across_url_list(spark):
    """A LIST of endpoint URLs round-robins per partition: every row
    succeeds and BOTH receivers see traffic (the sharded receiver-tier
    path bench_http.py measures)."""
    servers = []
    for _ in range(2):
        s = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
        s.requests = []
        s.fail_all = False
        s.weird_mode = False
        threading.Thread(target=s.serve_forever, daemon=True).start()
        servers.append(s)
    urls = [
        f"http://127.0.0.1:{s.server_address[1]}/posts" for s in servers
    ]
    from scio_db_spark.sinks.http_sink import send_http_batch, to_http_request

    df = spark.createDataFrame(
        [Row(notification_id=f"n{i}", message="m", customer_id=i)
         for i in range(8)]
    ).coalesce(1)  # one partition => strict round-robin across urls
    out = send_http_batch(
        to_http_request(df), urls, throttle_rps=None, retries=2,
        backoff_s=0.01,
    ).collect()
    for s in servers:
        s.shutdown()
    assert len(out) == 8
    assert all(r.resp_id == 101 for r in out)
    counts = [len(s.requests) for s in servers]
    assert counts == [4, 4], counts


def test_release_session_memory_unpersists_and_reports(spark):
    from scio_db_spark.plans.hygiene import release_session_memory

    df = spark.range(100_000).localCheckpoint(eager=True)
    assert df.count() == 100_000
    before = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert before, "localCheckpoint should pin at least one RDD"
    stats = release_session_memory(spark)
    assert stats["unpersisted"] >= 1
    assert stats["heap_after"] >= 0  # GC ran and re-measured
