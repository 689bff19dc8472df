"""BPE merge training: rank agreement between the distributed Spark
trainer and the plain-Python reference (identical semantics), apply
consistency, and committed-resource integrity — on the FULL charset
(byte symbols, category pre-tokens; round-11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scio_db_spark.operators.bpe import (
    EOW,
    apply_merges,
    bpe_train,
    bpe_train_python,
    pretokens,
    to_symbol_seq,
    word_to_symbols,
)


def _word_counts_from_docs(spark, sf_dir) -> dict[str, int]:
    from scio_db_spark.plans.catalog import table

    rows = (
        table(spark, sf_dir, "documents")
        .select(F.explode(pretokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .count()
        .collect()
    )
    return {r.word: r["count"] for r in rows}


def test_spark_trainer_rank_agrees_with_python(spark, sf_dir):
    """Full rank agreement on the real sf0.001 corpus vocabulary
    (category pre-tokens: case, digits, punctuation included): every
    merge, in order — the determinism claim the committed resource
    rests on."""
    wc = _word_counts_from_docs(spark, sf_dir)
    words = spark.createDataFrame(
        list(wc.items()), "word string, n long"
    )
    n = 24  # enough rounds to cross several tie-breaks
    assert bpe_train(words, n) == bpe_train_python(wc, n)


def test_trainer_early_stops_below_min_count(spark):
    wc = {"ab": 1, "cd": 1}  # every pair count is 1 < min_count=2
    words = spark.createDataFrame(list(wc.items()), "word string, n long")
    assert bpe_train(words, 10) == []
    assert bpe_train_python(wc, 10) == []


def test_apply_matches_python_segmentation(spark):
    """Chained replace() application reproduces the Python trainer's
    final vocabulary segmentation — including mixed-case, digits,
    punctuation, and a multi-byte non-Latin word (byte fallback)."""
    wc = {
        "lower": 6,
        "Lower": 5,  # case distinct from 'lower'
        "2024": 4,
        "--": 3,
        "naïve": 2,  # ï is two UTF-8 bytes
        "世界": 2,  # three UTF-8 bytes per char
    }
    merges = bpe_train_python(wc, 10)
    assert merges, "training produced no merges on the mixed vocab"
    # Python-side final segmentation over BYTE symbols
    segs = {}
    for w in wc:
        syms = list(word_to_symbols(w))
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        segs[w] = " ".join(f"|{x}|" for x in syms)
    df = spark.createDataFrame([(w,) for w in wc], "word string")
    got = {
        r.word: r.seq
        for r in df.select(
            "word",
            apply_merges(
                to_symbol_seq(F.col("word")), [list(m) for m in merges]
            ).alias("seq"),
        ).collect()
    }
    assert got == segs


def test_symbol_seq_twins_agree(spark):
    """Spark to_symbol_seq == DuckDB to_symbol_seq_sql byte for byte,
    across scripts, emoji, delimiters-in-text ('|', '_'), and digits
    — the cross-engine contract every census oracle rides on."""
    import duckdb

    from scio_db_spark.operators.bpe import to_symbol_seq_sql

    words = ["cat", "HeLLo", "42", "a|b", "__", "naïve", "世界", "🙂"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r.word: r.seq
        for r in df.select(
            "word", to_symbol_seq(F.col("word")).alias("seq")
        ).collect()
    }
    con = duckdb.connect()
    for w in words:
        (want,) = con.execute(
            f"SELECT {to_symbol_seq_sql('?')}", [w]
        ).fetchone()
        assert got[w] == want, (w, got[w], want)
        # and the plain-Python twin
        assert got[w] == " ".join(f"|{s}|" for s in word_to_symbols(w))


def test_committed_resource_is_wellformed():
    from scio_db_spark.plans.textops import _BPE_MERGES

    assert len(_BPE_MERGES) >= 50
    # base alphabet = the 256 byte symbols + EOW
    seen_symbols = {f"{b:02X}" for b in range(256)} | {EOW}
    for left, right in _BPE_MERGES:
        # every merge's components must be buildable from earlier
        # merges or base byte symbols (rank-order soundness)
        assert left in seen_symbols, left
        assert right in seen_symbols, right
        seen_symbols.add(left + right)


def test_rank_agreement_property_random_vocabularies(spark):
    """Property pin across adversarial vocabulary shapes: repeated
    letters (run-parity path), shared prefixes/suffixes (tie-break
    path), single chars, skewed counts — now over a mixed-charset
    alphabet (case, digit, punctuation, multi-byte unicode). The
    Spark trainer must reproduce the Python reference merge-for-merge
    on each."""
    import random

    rng = random.Random(42)
    # tiny alphabet maximizes ties and self-pairs; é is 2 bytes so
    # self-runs cross byte boundaries, and '|'/'_' stress delimiters
    alphabet = "aA1.é|_"
    for trial in range(4):
        wc = {}
        for _ in range(rng.randint(4, 12)):
            w = "".join(
                rng.choice(alphabet)
                for _ in range(rng.randint(1, 6))
            )
            wc[w] = rng.randint(1, 9)
        words = spark.createDataFrame(
            list(wc.items()), "word string, n long"
        )
        n = rng.randint(3, 10)
        got, want = bpe_train(words, n), bpe_train_python(wc, n)
        assert got == want, (trial, wc, n, got, want)
