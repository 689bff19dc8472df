"""Streaming corpus ingestion e2e (streaming/corpus_ingest.py).

Drives the composed pipeline (enrich → quality/lang gate → bounded
exact dedup → windowed sinks) through the deterministic harness and a
real windowed-sink run, pinning: OK/KO routing, in-batch and
cross-batch content dedup, watermark-bounded state expiry, and the
dead-letter contract.
"""

from __future__ import annotations

import datetime
import os
import tempfile

from pyspark.sql import Row
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from scio_db_spark.streaming.corpus_ingest import (
    CorpusIngestConfig,
    build_ko_stream,
    build_ok_stream,
    enrich,
)
from scio_db_spark.streaming.harness import StreamHarness

SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
        StructField("ingest_ts", TimestampType()),
    ]
)

# ~60 tokens incl. English stopwords → quality comfortably over 0.5,
# lang_id = "en".
GOOD = (
    "the quick brown fox jumps over the lazy dog and the dog is not "
    "amused by the fox in the morning light of a clear day while the "
    "farmer watches the field and the birds sing in the trees near a "
    "quiet river that flows to the sea past the old mill and the barn"
)
BAD = "!!! ??? ..."  # punctuation-heavy, no stopwords → low quality


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_ok_ko_routing_and_reasons(spark):
    cfg = CorpusIngestConfig()
    docs = spark.createDataFrame(
        [
            Row(doc_id="g", text=GOOD, ingest_ts=_ts("2024-01-01T10:00:00")),
            Row(doc_id="b", text=BAD, ingest_ts=_ts("2024-01-01T10:00:01")),
            Row(doc_id="n", text=None, ingest_ts=_ts("2024-01-01T10:00:02")),
        ],
        SCHEMA,
    )
    e = enrich(docs, cfg)
    ok_ids = {r.doc_id for r in e.filter(
        (e.quality >= cfg.min_quality) & e.lang.isin(*cfg.known_langs)
    ).collect()}
    assert ok_ids == {"g"}
    ko = {r.doc_id: r.reject_reason for r in build_ko_stream(docs, cfg).collect()}
    assert ko["n"] == "null_text"
    assert ko["b"] == "low_quality"
    assert "g" not in ko


def test_streaming_dedup_across_batches_and_expiry(spark):
    h = StreamHarness(spark, SCHEMA)
    try:
        h.start(lambda s: build_ok_stream(s), output_mode="append")
        # batch 1: good doc + same-content copy under another id + junk
        h.add_batch(
            [
                Row(doc_id="a1", text=GOOD, ingest_ts=_ts("2024-01-01T10:00:00")),
                Row(doc_id="a2", text=GOOD, ingest_ts=_ts("2024-01-01T10:00:30")),
                Row(doc_id="junk", text=BAD, ingest_ts=_ts("2024-01-01T10:00:40")),
            ]
        )
        # batch 2: cross-batch duplicate inside the 10-minute delay
        h.add_batch(
            [Row(doc_id="a3", text=GOOD, ingest_ts=_ts("2024-01-01T10:05:00"))]
        )
        rows = h.results()
        # exactly ONE emission for the GOOD content (which of a1/a2
        # wins inside batch 1 is not contractual), junk gated out
        assert len(rows) == 1 and rows[0].doc_id in {"a1", "a2"}
        assert rows[0].lang == "en" and rows[0].quality >= 0.5
        # batch 3: advance the watermark far past the content state,
        # then the same content re-emits (bounded state, not history)
        h.add_batch(
            [Row(doc_id="w", text=GOOD + " extra", ingest_ts=_ts("2024-01-01T12:00:00"))]
        )
        h.add_batch(
            [Row(doc_id="a4", text=GOOD, ingest_ts=_ts("2024-01-01T12:01:00"))]
        )
        got = [r.doc_id for r in h.results()]
        assert got.count("a4") == 1
    finally:
        h.stop()


def test_windowed_sink_run_end_to_end(spark, tmp_path):
    """start_corpus_ingest against a real file stream: OK docs land in
    window-partitioned parquet, KO docs under toxic/ with reasons."""
    from scio_db_spark.streaming.corpus_ingest import start_corpus_ingest

    indir = tempfile.mkdtemp(prefix="ci_in_")
    spark.createDataFrame(
        [
            Row(doc_id="g1", text=GOOD, ingest_ts=_ts("2024-01-01T10:00:00")),
            Row(doc_id="g2", text=GOOD + " more", ingest_ts=_ts("2024-01-01T10:02:00")),
            Row(doc_id="b1", text=BAD, ingest_ts=_ts("2024-01-01T10:00:10")),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(indir)

    stream = spark.readStream.schema(SCHEMA).parquet(indir)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    ok_q, ko_q = start_corpus_ingest(
        stream, out, ck, window_duration="1 minute"
    )
    try:
        ok_q.processAllAvailable()
        ko_q.processAllAvailable()
    finally:
        ok_q.stop()
        ko_q.stop()

    ok = spark.read.parquet(f"{out}/ok")
    assert {r.doc_id for r in ok.collect()} == {"g1", "g2"}
    # two docs, two distinct 1-minute windows → partition dirs
    assert ok.select("window_start").distinct().count() == 2
    ko = spark.read.parquet(f"{out}/toxic")
    assert {(r.doc_id, r.reject_reason) for r in ko.collect()} == {
        ("b1", "low_quality")
    }


def test_gate_metrics_ride_the_ok_stream(spark, tmp_path):
    """corpus_gate observe() metrics surface per micro-batch with no
    extra scan: totals must account for every input doc."""
    import tempfile

    indir = tempfile.mkdtemp(prefix="ci_obs_")
    spark.createDataFrame(
        [
            Row(doc_id="g", text=GOOD, ingest_ts=_ts("2024-01-01T10:00:00")),
            Row(doc_id="b", text=BAD, ingest_ts=_ts("2024-01-01T10:00:05")),
            Row(doc_id="n", text=None, ingest_ts=_ts("2024-01-01T10:00:06")),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(indir)
    stream = spark.readStream.schema(SCHEMA).parquet(indir)
    q = (
        build_ok_stream(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    observed = [
        p["observedMetrics"]["corpus_gate"].asDict()
        for p in q.recentProgress
        if p.get("observedMetrics", {}).get("corpus_gate")
    ]
    assert observed, "no micro-batch reported corpus_gate"
    total = {k: sum(m[k] for m in observed) for k in observed[0]}
    assert total["n_total"] == 3
    assert total["n_ok"] == 1
    assert total["n_ko"] == 2


def test_bloom_screen_and_model_gate(spark):
    """Round-9 gates: a doc whose content hash is in the historical
    bloom routes KO as bloom_duplicate (probe = literal-array Column,
    no join, no state); fresh docs survive; the model gate column
    matches the committed classifier's sign. The probe's bit
    definition is pinned IDENTICAL to the batch screen by asserting
    hits == bloom_probe verdicts on the same keys."""
    from pyspark.sql import functions as F

    from scio_db_spark.plans.textops import bloom_build, bloom_probe
    from scio_db_spark.streaming.corpus_ingest import bloom_masks_dense

    hist_texts = [GOOD, "some historical document " * 5]
    words = bloom_build(
        spark.createDataFrame([(t,) for t in hist_texts], "key string"),
        "key",
    )
    cfg = CorpusIngestConfig(
        clf_gate=True, screen_masks=bloom_masks_dense(words)
    )
    fresh = (
        "a genuinely new article about rivers and trade with many "
        "plain english words that the model and the heuristic both "
        "like because it is long and has the usual stopwords in it "
        "and no strange punctuation at all just text flowing on"
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id="dup", text=GOOD,
                ingest_ts=_ts("2024-01-01T10:00:00")),
            Row(doc_id="new", text=fresh,
                ingest_ts=_ts("2024-01-01T10:00:01")),
            Row(doc_id="bad", text=BAD,
                ingest_ts=_ts("2024-01-01T10:00:02")),
        ],
        SCHEMA,
    )
    e = enrich(docs, cfg)
    rows = {r.doc_id: r for r in e.collect()}
    assert rows["dup"].bloom_hit  # historical content screens out
    ko = {
        r.doc_id: r.reject_reason
        for r in build_ko_stream(docs, cfg).collect()
    }
    assert ko["dup"] == "bloom_duplicate"
    assert ko["bad"] == "low_quality"
    assert "new" not in ko or ko["new"] != "bloom_duplicate"
    # streaming probe == batch probe, same keys, bit-identical verdicts
    probe_keys = spark.createDataFrame(
        [(GOOD,), (fresh,), (BAD,)], "key string"
    )
    batch = {
        r.key: r.bloom_hit
        for r in bloom_probe(probe_keys, words, "key").collect()
    }
    stream_hits = {
        r.doc_id: bool(r.bloom_hit) for r in e.collect()
    }
    assert stream_hits["dup"] == bool(batch[GOOD])
    assert stream_hits["new"] == bool(batch[fresh])
    assert stream_hits["bad"] == bool(batch[BAD])
    # model gate column carries the committed classifier's logit sign
    from scio_db_spark.functions import text as X
    from scio_db_spark.plans.textops import quality_clf_score

    direct = {
        r.doc_id: r.s >= 0
        for r in docs.select(
            "doc_id",
            quality_clf_score(X.tokens(F.col("text"))).alias("s"),
        ).collect()
        if r.s is not None
    }
    for did, pos in direct.items():
        assert (rows[did].clf_score >= 0) == pos


def test_token_meter_matches_batch_trained_counts(spark, sf_dir):
    """The stream-safe per-row meter expression must reproduce the
    batch vocabulary-join form (docs_bpe_token_count_trained) row for
    row on the real corpus — one tokenizer, two plan shapes."""
    from pyspark.sql import functions as F

    from scio_db_spark.plans.catalog import table
    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.streaming.corpus_ingest import (
        trained_token_count_expr,
    )

    batch = {
        r.doc_id: r.n_bpe_tokens
        for r in all_queries()["docs_bpe_token_count_trained"]
        .spark(spark, sf_dir)
        .collect()
    }
    metered = {
        r.doc_id: r.n
        for r in table(spark, sf_dir, "documents")
        .select(
            "doc_id", trained_token_count_expr("text").alias("n")
        )
        .collect()
    }
    assert metered == batch


def test_token_meter_flows_through_streaming_enrich(spark):
    from pyspark.sql import Row

    from scio_db_spark.streaming.corpus_ingest import (
        CorpusIngestConfig,
        enrich,
    )

    h = StreamHarness(spark, SCHEMA)
    h.start(
        lambda s: enrich(s, CorpusIngestConfig(token_meter=True)).select(
            "doc_id", "n_bpe_tokens_trained"
        ),
        output_mode="append",
    )
    h.add_batch(
        [Row(doc_id="g", text=GOOD, ingest_ts=_ts("2024-01-01T10:00:00"))]
    )
    out = {r.doc_id: r.n_bpe_tokens_trained for r in h.results()}
    h.stop()
    assert out["g"] > 0


def test_lsh_near_dup_screen_routes_probable_near_dups(spark):
    """Round-11 streaming near-dup gate: a bloom over the historical
    corpus's canonical band keys flags arriving docs whose band keys
    collide — exact dups of history deterministically (identical text
    → identical signature → every band hits), close near-dups with
    banding probability, novel docs never via false NEGATIVE (bloom
    FNs are impossible; FPs are the documented tradeoff)."""
    from pyspark.sql import Row

    from scio_db_spark.streaming.corpus_ingest import (
        CorpusIngestConfig,
        enrich,
        lsh_band_bloom_masks,
    )

    hist_text = (
        "the historical corpus contains this exact boilerplate "
        "paragraph which repeats across many pages of the crawl "
        "and should be screened out on arrival every single time"
    )
    hist = spark.createDataFrame(
        [(i, hist_text) for i in range(3)]
        + [(100 + i, f"some other old doc {i} " + " ".join(
            f"w{i}x{j}" for j in range(12))) for i in range(5)],
        "doc_id long, text string",
    )
    masks = lsh_band_bloom_masks(hist, bits=4096)
    assert any(masks), "bloom build produced an empty filter"

    near = hist_text + " with a trailing clause appended"
    novel = " ".join(f"fresh{j} token{j}" for j in range(20))
    h = StreamHarness(spark, SCHEMA)
    h.start(
        lambda s: enrich(
            s, CorpusIngestConfig(lsh_screen_masks=masks)
        ).select("doc_id", "near_dup"),
        output_mode="append",
    )
    h.add_batch(
        [
            Row(doc_id="exact", text=hist_text,
                ingest_ts=_ts("2024-01-01T10:00:00")),
            Row(doc_id="near", text=near,
                ingest_ts=_ts("2024-01-01T10:00:01")),
            Row(doc_id="novel", text=novel,
                ingest_ts=_ts("2024-01-01T10:00:02")),
            Row(doc_id="tiny", text="hi",
                ingest_ts=_ts("2024-01-01T10:00:03")),
        ]
    )
    out = {r.doc_id: r.near_dup for r in h.results()}
    h.stop()
    assert out["exact"] is True  # identical signature: every band hits
    assert out["near"] is True  # verified deterministic for this text
    assert out["tiny"] is False  # too short to shingle: never flags
    assert out["novel"] is False  # would be a bloom FP; 4096 bits vs
    #                               ~32 keys makes that ~impossible


def test_lsh_screen_gates_ok_stream(spark):
    """The near-dup flag must actually route KO in the gated stream."""
    from pyspark.sql import Row

    from scio_db_spark.streaming.corpus_ingest import (
        CorpusIngestConfig,
        build_ok_stream,
        lsh_band_bloom_masks,
    )

    hist = spark.createDataFrame(
        [(i, GOOD) for i in range(3)], "doc_id long, text string"
    )
    masks = lsh_band_bloom_masks(hist, bits=4096)
    cfg = CorpusIngestConfig(lsh_screen_masks=masks)
    h = StreamHarness(spark, SCHEMA)
    h.start(lambda s: build_ok_stream(s, cfg), output_mode="append")
    h.add_batch(
        [Row(doc_id="dup-of-hist", text=GOOD,
             ingest_ts=_ts("2024-01-01T10:00:00"))]
    )
    ok_ids = {r.doc_id for r in h.results()}
    h.stop()
    # GOOD passes every quality gate (the baseline test proves it),
    # so its exclusion here is the near-dup screen and nothing else
    assert "dup-of-hist" not in ok_ids


def test_lsh_screen_udf_matches_expression_twin(spark, sf_dir):
    """The Arrow-kernel screen (hot path) and the Column-expression
    reference must produce bit-identical near_dup verdicts — on the
    REAL documents corpus (covers multi-whitespace, casing, unicode,
    short docs) plus planted exact/near/novel arrivals."""
    from pyspark.sql import functions as F

    from scio_db_spark.plans.catalog import table
    from scio_db_spark.streaming.corpus_ingest import (
        lsh_band_bloom_masks,
        lsh_screen_expr,
        lsh_screen_udf,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % 10 != 0)
    masks = lsh_band_bloom_masks(hist, bits=65536)

    expr_out = {
        r.doc_id: r.near_dup
        for r in lsh_screen_expr(docs, masks).collect()
    }
    udf_out = {
        r.doc_id: r.near_dup
        for r in docs.withColumn(
            "near_dup", lsh_screen_udf(masks)(F.col("text"))
        ).collect()
    }
    assert expr_out == udf_out
    # sanity: historical docs screen against themselves
    assert any(udf_out[d] for d in udf_out if d % 10 != 0)


def test_bloom_param_twins_agree():
    """The screen census's deferred param builder must stay in lock
    step with the module constant it mirrors (both feed the same bit
    definition; drift would silently fork build vs probe)."""
    from scio_db_spark.plans.textops import (
        _BLOOM_PARAMS,
        _BLOOM_PARAMS_REF,
    )

    assert _BLOOM_PARAMS_REF() == _BLOOM_PARAMS


def test_screen_parity_on_null_and_nonascii_text(spark):
    """Round-11 ADVICE regressions: (1) null text must flag False in
    BOTH screen implementations (a NULL near_dup would silently drop
    the doc from both the OK and KO lanes); (2) case mapping happens
    JVM-side in both, so non-ASCII uppercase (Turkish dotted İ,
    German ß, fullwidth letters) cannot fork the stream's routing
    from the oracle-pinned census."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from scio_db_spark.streaming.corpus_ingest import (
        lsh_band_bloom_masks,
        lsh_screen_expr,
        lsh_screen_udf,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    hist_rows = [
        (1, "İSTANBUL BOĞAZI manzarası çok güzel bir yerdir burada"),
        (2, "DIE STRASSE IST NASS und der Regen fällt weiter heute"),
        (3, "plain ascii historical document body with many words here"),
    ]
    hist = spark.createDataFrame(hist_rows, schema)
    masks = lsh_band_bloom_masks(hist, bits=65536)

    probe_rows = [
        # exact non-ASCII uppercase repeats: must flag in both forms
        (10, hist_rows[0][1]),
        (11, hist_rows[1][1]),
        # lowercase variants: identical after JVM lower in both forms
        (12, hist_rows[0][1].lower()),
        (13, None),  # null text: False in both, never NULL
        (14, "completely novel arrival text nothing like history at all"),
        (15, "𝕌ℕ𝕀ℂ𝕆𝔻𝔼 fullwidth ＡＢＣ mathematical alphanumerics row"),
    ]
    probe = spark.createDataFrame(probe_rows, schema)

    expr_out = {
        r.doc_id: r.near_dup
        for r in lsh_screen_expr(probe, masks).collect()
    }
    udf_out = {
        r.doc_id: r.near_dup
        for r in probe.withColumn(
            "near_dup", lsh_screen_udf(masks)(F.col("text"))
        ).collect()
    }
    assert expr_out == udf_out
    assert expr_out[13] is False  # null text: False, not NULL
    assert expr_out[10] and expr_out[11]  # exact repeats flagged


def test_bloom_masks_default_bits_track_screen_constant():
    """lsh_band_bloom_masks' default sizing IS the census constant
    (plans/textops._LSH_SCREEN_BITS) — one shared value, so the
    census's 'FP integers transfer at the same sizing' claim cannot
    silently drift from screen behavior (round-11 ADVICE)."""
    import inspect

    from scio_db_spark.plans.textops import _LSH_SCREEN_BITS
    from scio_db_spark.streaming.corpus_ingest import (
        lsh_band_bloom_masks,
    )

    sig = inspect.signature(lsh_band_bloom_masks)
    assert sig.parameters["bits"].default is None
    src = inspect.getsource(lsh_band_bloom_masks)
    assert "_LSH_SCREEN_BITS" in src
    assert _LSH_SCREEN_BITS == 65536
