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


# ------------------------------------------------------------------
# Round-12: batched training + production-depth application.


def _chain_replace_python(word: str, merges) -> list[str]:
    """The gold semantics, literally: render delimiter-complete, run
    one str.replace per merge in rank order, split back."""
    s = " ".join(f"|{t}|" for t in word_to_symbols(word))
    for left, right in merges:
        s = s.replace(f"|{left}| |{right}|", f"|{left}{right}|")
    return [t[1:-1] for t in s.split(" ")]


def test_batched_trainer_equals_sequential_hypothesis():
    """The batch-selection rule (maximal disjoint prefix, existing-
    symbol concat guard, self-pair stop, strict-count truncation,
    cap-after-truncate) is provably sequential-equivalent — fuzzed
    here at volume. Historical counterexamples (cap-before-conflict,
    concat-collision growth, self-pair derived ties) are in the
    module comment; all were found by exactly this fuzzer."""
    import random

    from scio_db_spark.operators.bpe import bpe_train_batched_python

    rng = random.Random(1234)
    for trial in range(400):
        alpha = rng.choice(["ab", "abc", "abcdef"])
        wc = {}
        for _ in range(rng.randint(1, 22)):
            w = "".join(
                rng.choice(alpha) for _ in range(rng.randint(1, 12))
            )
            wc[w] = wc.get(w, 0) + rng.randint(1, 50)
        nm = rng.randint(1, 50)
        seq = bpe_train_python(wc, nm)
        bat, _rounds = bpe_train_batched_python(wc, nm)
        assert seq == bat, (trial, wc, nm)


def test_histogram_trainer_equals_sequential_hypothesis():
    """The driver-local incremental trainer (heap + inverted index,
    O(affected words) per merge — the production two-phase path) is
    output-identical to the full-recount sequential reference: same
    run-parity self-pair counting, same (count desc, pair) tie-break,
    same min_count stop. Fuzzed across alphabets with repeated
    symbols (self-pair runs), multi-byte chars (symbol-string
    collisions), and all min_count regimes."""
    import random

    from scio_db_spark.operators.bpe import bpe_train_histogram

    rng = random.Random(4321)
    for trial in range(400):
        alpha = rng.choice(["ab", "abc", "abcdef", "aé日"])
        wc = {}
        for _ in range(rng.randint(1, 22)):
            w = "".join(
                rng.choice(alpha) for _ in range(rng.randint(1, 12))
            )
            wc[w] = wc.get(w, 0) + rng.randint(1, 50)
        nm = rng.randint(1, 50)
        mc = rng.choice([1, 2, 3])
        assert bpe_train_histogram(wc, nm, mc) == bpe_train_python(
            wc, nm, mc
        ), (trial, wc, nm, mc)


def test_histogram_trainer_real_corpus_agrees(spark, sf_dir):
    """Two-phase production path on the real corpus: the distributed
    histogram feeds the driver-local trainer, whose merges must equal
    the sequential reference rank-for-rank (and therefore the Spark
    and batched trainers, which share that pin)."""
    from scio_db_spark.operators.bpe import bpe_train_histogram

    wc = _word_counts_from_docs(spark, sf_dir)
    n = 96
    assert bpe_train_histogram(wc, n) == bpe_train_python(wc, n)


def test_batched_spark_trainer_rank_agrees(spark, sf_dir):
    """The SPARK batched trainer reproduces the sequential Python
    reference merge-for-merge on the real corpus vocabulary — the
    committed-resource recipe's exact path."""
    from scio_db_spark.operators.bpe import bpe_train_batched

    wc = _word_counts_from_docs(spark, sf_dir)
    words = spark.createDataFrame(
        list(wc.items()), "word string, n long"
    )
    n = 30
    got, rounds = bpe_train_batched(words, n)
    assert got == bpe_train_python(wc, n)
    assert rounds <= n  # batching never does worse than sequential


def test_batched_spark_trainer_horizon_path(spark):
    """top_m smaller than the pair count forces the horizon-cut path
    (exact-symbol collect + horizon truncation) — output must still
    equal sequential."""
    from scio_db_spark.operators.bpe import bpe_train_batched

    wc = {
        "banana": 9, "bandana": 7, "cabana": 6, "canada": 5,
        "nacho": 4, "dacha": 4, "abba": 3, "added": 3,
    }
    words = spark.createDataFrame(
        list(wc.items()), "word string, n long"
    )
    got, _ = bpe_train_batched(words, 20, top_m=5)
    assert got == bpe_train_python(wc, 20)


def test_cursor_apply_equals_chained_replace_hypothesis():
    """apply_ranked (the Arrow kernels' core) is pass-chain exact:
    fuzzed against the literal str.replace chain over random words
    and TRAINED merge tables (so collision-prone concatenations
    actually occur)."""
    import random

    from scio_db_spark.operators.bpe import (
        apply_ranked,
        merge_ranks,
    )

    rng = random.Random(99)
    for trial in range(200):
        alpha = rng.choice(["ab", "abc", "abcdef"])
        wc = {}
        for _ in range(rng.randint(2, 15)):
            w = "".join(
                rng.choice(alpha) for _ in range(rng.randint(1, 10))
            )
            wc[w] = wc.get(w, 0) + rng.randint(1, 30)
        merges = bpe_train_python(wc, rng.randint(1, 40))
        ranks = merge_ranks(merges)
        for w in list(wc) + [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
            for _ in range(4)  # unseen words too
        ]:
            got = list(apply_ranked(word_to_symbols(w), merges, ranks))
            want = _chain_replace_python(w, merges)
            assert got == want, (trial, w, merges)


def test_cursor_apply_string_collision_case():
    """Adversarial: rank 2 creates the STRING '61626162' which rank 1
    also spells — the chain's rank-1 pass already ran, so the kernel
    must NOT merge the late-appearing adjacency (cursor guard)."""
    from scio_db_spark.operators.bpe import apply_ranked, merge_ranks

    merges = [
        ("61", "62"),          # a b -> ab
        ("6162", "6162"),      # ab ab -> abab
        ("63", "6162"),        # c ab -> cab
    ]
    ranks = merge_ranks(merges)
    # 'cabab': after rank 0 -> [63,6162,6162,_]; rank 1 pass merges
    # the abab; rank 2's (63,6162) adjacency was consumed by rank 1
    got = list(
        apply_ranked(word_to_symbols("cabab"), merges, ranks)
    )
    assert got == _chain_replace_python("cabab", merges)
    # 'ccab' exercises rank 2 genuinely firing
    got2 = list(apply_ranked(word_to_symbols("ccab"), merges, ranks))
    assert got2 == _chain_replace_python("ccab", merges)


def test_arrow_kernels_match_expr_chain(spark):
    """The Arrow kernels (token count, merged seq, pre-token sum)
    agree with the chained-replace Column expressions on a merge
    table small enough for both paths to run — pinning the kernels to
    the oracle-verified gold semantics."""
    from scio_db_spark.operators.bpe import (
        apply_merges_expr,
        bpe_pretoken_count_udf,
        bpe_seq_udf,
        bpe_token_count_udf,
        pretokens,
    )

    wc = {
        "tokenize": 5, "tokens": 9, "token": 11, "broken": 3,
        "Tokyo": 2, "42": 2, "4242": 2, "déjà": 2, "a|b_c": 2,
    }
    merges = bpe_train_python(wc, 25)
    assert 0 < len(merges) <= 100
    words = spark.createDataFrame(
        [(w,) for w in wc], "word string"
    ).withColumn("seq0", to_symbol_seq(F.col("word")))
    expr_out = {
        r.word: (r.k, r.seq)
        for r in words.select(
            "word",
            F.size(
                F.split(apply_merges_expr("seq0", merges), " ")
            ).alias("k"),
            apply_merges_expr("seq0", merges).alias("seq"),
        ).collect()
    }
    kern_out = {
        r.word: (r.k, r.seq)
        for r in words.select(
            "word",
            bpe_token_count_udf(merges)(F.col("word")).alias("k"),
            bpe_seq_udf(merges)(F.col("word")).alias("seq"),
        ).collect()
    }
    assert expr_out == kern_out
    # pre-token sum kernel over raw text = sum of per-word counts
    text = "token tokens 42 déjà broken"
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(
        bpe_pretoken_count_udf(merges)(
            pretokens(F.col("text"))
        ).alias("n")
    ).collect()[0].n
    want = sum(
        expr_out[w][0] for w in ["token", "tokens", "42", "déjà", "broken"]
    )
    assert got == want
    # null text meters 0
    dfn = spark.createDataFrame([(None,)], "text string")
    assert (
        dfn.select(
            bpe_pretoken_count_udf(merges)(
                pretokens(F.col("text"))
            ).alias("n")
        ).collect()[0].n
        == 0
    )
