"""Checkpoint-restart e2e for the GATED corpus-ingest pipeline: the
bounded dedup state and the bloom screen must behave identically
across a clean stop + restart from checkpointLocation — the round-9
pipeline joining the restart matrix (test_checkpoint_restart.py)."""

from __future__ import annotations

import datetime
import os
import tempfile
import uuid

from pyspark.sql import Row

from scio_db_spark.plans.textops import bloom_build
from scio_db_spark.streaming.corpus_ingest import (
    CorpusIngestConfig,
    bloom_masks_dense,
    start_corpus_ingest,
)

SCHEMA = (
    "doc_id string, text string, ingest_ts timestamp"
)

GOOD_A = (
    "the quick brown fox jumps over the lazy dog and the dog is not "
    "amused by the fox in the morning light of a clear day while the "
    "farmer watches the field and the birds sing in the trees near a "
    "quiet river that flows to the sea past the old mill and the barn"
)
GOOD_B = GOOD_A.replace("fox", "owl").replace("river", "valley")
HIST = "a historical document that the screen must remember " * 4
JUNK = "!!! ??? ..."


def _drop(spark, rows, input_dir):
    df = spark.createDataFrame(rows, SCHEMA)
    staging = tempfile.mkdtemp(prefix="ci_restart_")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        f
        for f in os.listdir(staging)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.rename(
        os.path.join(staging, part),
        os.path.join(input_dir, f"b_{uuid.uuid4().hex}.parquet"),
    )


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 10, minute)


def test_gated_ingest_survives_restart(spark, tmp_path):
    words = bloom_build(
        spark.createDataFrame([(HIST,)], "key string"), "key"
    )
    cfg = CorpusIngestConfig(screen_masks=bloom_masks_dense(words))
    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(indir)

    def _stream():
        return spark.readStream.schema(SCHEMA).parquet(indir)

    # epoch 1: good doc A, a bloom duplicate, junk
    _drop(
        spark,
        [
            Row(doc_id="a1", text=GOOD_A, ingest_ts=_ts(0)),
            Row(doc_id="h1", text=HIST, ingest_ts=_ts(0)),
            Row(doc_id="j1", text=JUNK, ingest_ts=_ts(1)),
        ],
        indir,
    )
    ok_q, ko_q = start_corpus_ingest(_stream(), outdir, ck, cfg)
    ok_q.processAllAvailable()
    ko_q.processAllAvailable()
    ok_q.stop()
    ko_q.stop()

    # epoch 2 (restart from the same checkpoints): a CONTENT DUPLICATE
    # of A inside the dedup delay (state must have survived), a fresh
    # good doc B, and another bloom duplicate
    _drop(
        spark,
        [
            Row(doc_id="a2", text=GOOD_A, ingest_ts=_ts(5)),
            Row(doc_id="b1", text=GOOD_B, ingest_ts=_ts(5)),
            Row(doc_id="h2", text=HIST, ingest_ts=_ts(6)),
        ],
        indir,
    )
    ok_q, ko_q = start_corpus_ingest(_stream(), outdir, ck, cfg)
    ok_q.processAllAvailable()
    ko_q.processAllAvailable()
    ok_q.stop()
    ko_q.stop()

    ok = spark.read.parquet(f"{outdir}/ok")
    ok_ids = {r.doc_id for r in ok.select("doc_id").collect()}
    # A exactly once (a2 suppressed ACROSS the restart), B once,
    # nothing else
    assert ok_ids == {"a1", "b1"}, ok_ids
    ko = spark.read.parquet(f"{outdir}/toxic")
    reasons = {
        r.doc_id: r.reject_reason
        for r in ko.select("doc_id", "reject_reason").collect()
    }
    assert reasons["h1"] == "bloom_duplicate"
    assert reasons["h2"] == "bloom_duplicate"  # screen held post-restart
    assert reasons["j1"] == "low_quality"
    assert set(reasons) == {"h1", "h2", "j1"}
