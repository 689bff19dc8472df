"""Exact-substring span removal (plans/textops.py::span_excise — the
Lee et al. 2022 ExactSubstr shape, boilerplate policy): planted
license headers must vanish from EVERY document, unique content must
survive untouched, and the rewritten corpus must satisfy the
no-surviving-span property the round-10 verdict asked to pin."""

from __future__ import annotations

from scio_db_spark.plans.textops import (
    _EXCISE_MIN_TOKENS,
    _SPAN_MIN_DOCS,
    _SHINGLE_N,
    span_excise,
)

HEADER = "standard license header do not remove this banner"  # 8 toks
SHORT = "shared tail here"  # 3 tokens < _EXCISE_MIN_TOKENS


def _rows():
    bodies = [
        "alpha document speaks of entirely original subject matter one",
        "beta text covers another personal topic nobody else mentions",
        "gamma notes ramble about a third unique theme in detail",
        "delta journal describes a fourth standalone story line here",
    ]
    rows = [
        (i, f"{HEADER} {b} {SHORT}") for i, b in enumerate(bodies)
    ]
    # doc that is NOTHING BUT the boilerplate header
    rows.append((100, HEADER))
    # pair-only shared span: long, but in 2 docs < _SPAN_MIN_DOCS=3
    pair = "this long span appears in exactly two documents only"
    rows.append((200, f"{pair} with unique suffix abc"))
    rows.append((201, f"{pair} with unique suffix xyz"))
    return rows


def _rewritten(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, text string")
    return {
        r.doc_id: r for r in span_excise(df).collect()
    }


def test_boilerplate_header_excised_from_every_doc(spark):
    out = _rewritten(spark)
    for i in range(4):
        t = out[i].text_rewritten
        assert HEADER not in t, (i, t)
        # the unique body survives verbatim
        assert out[i].n_tokens_post > 0
    # all-boilerplate doc reduces to the empty string, not a crash
    assert out[100].text_rewritten == ""
    assert out[100].n_tokens_post == 0
    assert out[100].n_tokens_pre == len(HEADER.split())


def test_unique_content_untouched(spark):
    out = _rewritten(spark)
    # body words all survive (the splice keeps originals in order)
    assert "alpha document speaks of entirely original" in (
        out[0].text_rewritten
    )
    # sub-threshold spans survive: SHORT is 3 tokens < 5 min...
    # but note SHORT rides adjacent to excised text, so only assert
    # the 2-doc 'pair' span (long enough, too few docs) is KEPT
    assert "this long span appears in exactly two documents" in (
        out[200].text_rewritten
    )
    assert "this long span appears in exactly two documents" in (
        out[201].text_rewritten
    )


def test_no_surviving_cross_doc_span_property(spark):
    """The verdict's pin: after the rewrite, no maximal run of
    cross-doc duplicate shingles covers >= _EXCISE_MIN_TOKENS tokens
    (recomputed from scratch on the REWRITTEN corpus, in plain
    Python)."""
    out = _rewritten(spark)
    toks = {
        d: r.text_rewritten.split() for d, r in out.items()
    }
    # shingle -> set of docs
    docs_of: dict[tuple, set] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - (_SHINGLE_N - 1)):
            docs_of.setdefault(
                tuple(ts[i : i + _SHINGLE_N]), set()
            ).add(d)
    dup = {s for s, ds in docs_of.items() if len(ds) >= _SPAN_MIN_DOCS}
    for d, ts in toks.items():
        run = 0
        for i in range(len(ts) - (_SHINGLE_N - 1)):
            if tuple(ts[i : i + _SHINGLE_N]) in dup:
                run += 1
                covered = run + (_SHINGLE_N - 1)
                assert covered < _EXCISE_MIN_TOKENS, (
                    d,
                    ts[i - run + 1 : i + _SHINGLE_N],
                )
            else:
                run = 0


def test_registry_census_property_on_real_corpus(spark, sf_dir):
    """Same property on the actual sf0.001 corpus via the registered
    query — the census's tokens_excised must also reconcile exactly
    with the per-doc pre/post integers."""
    from scio_db_spark.plans.registry import all_queries

    rows = (
        all_queries()["docs_span_excised_corpus"]
        .spark(spark, sf_dir)
        .collect()
    )
    toks = {r.doc_id: r.text_rewritten.split() for r in rows}
    for r in rows:
        assert r.n_tokens_post == len(toks[r.doc_id])
        assert r.n_tokens_post <= r.n_tokens_pre
    docs_of: dict[tuple, set] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - (_SHINGLE_N - 1)):
            docs_of.setdefault(
                tuple(ts[i : i + _SHINGLE_N]), set()
            ).add(d)
    dup = {s for s, ds in docs_of.items() if len(ds) >= _SPAN_MIN_DOCS}
    worst = 0
    for d, ts in toks.items():
        run = 0
        for i in range(len(ts) - (_SHINGLE_N - 1)):
            if tuple(ts[i : i + _SHINGLE_N]) in dup:
                run += 1
                worst = max(worst, run + (_SHINGLE_N - 1))
            else:
                run = 0
    assert worst < _EXCISE_MIN_TOKENS, worst


# ------------------------------------------------------------------
# Round-12: the production changed-rows-counter stop
# (span_excise_to_fixpoint) vs the oracle-pinnable fixed unroll.


def _onion_rows():
    """A corpus whose excision needs EIGHT changing rounds — two more
    than the fixed unroll — built as an onion: round 1 removes the
    planted 5-token span S1 (both copies in the chain doc plus two
    ref docs), and every later round's removal juxtaposes the next
    layer's left/right sides into a fresh 5-token window that two ref
    docs already hold intact (count reaches _SPAN_MIN_DOCS=3 only
    after the juxtaposition). Left sides are 3 tokens, so their one
    internal shingle is duplicate-flagged from round 1 but survives
    the >= _EXCISE_MIN_TOKENS=5 run filter until its layer's round —
    the filter interplay that makes a fixed unroll genuinely
    under-excise rather than just run slow."""
    s1 = "s1a s1b s1c s1d s1e"
    left = {r: f"l{r}1 l{r}2 l{r}3" for r in range(3, 9)}
    right = {r: f"r{r}1 r{r}2" for r in range(3, 9)}
    chain = (
        "w1 w2 "
        + " ".join(left[r] for r in range(8, 2, -1))
        + f" a1 a2 {s1} mid {s1} b1 b2 "
        + " ".join(right[r] for r in range(3, 9))
        + " w3 w4"
    )
    rows = [(0, chain)]
    rows.append((11, f"ua1 ua2 {s1} ua3 ua4"))
    rows.append((12, f"ub1 ub2 {s1} ub3 ub4"))
    rows.append((21, "x2a a1 a2 mid b1 b2 y2a"))
    rows.append((22, "x2b a1 a2 mid b1 b2 y2b"))
    for r in range(3, 9):
        rows.append((10 * r + 1, f"x{r}a {left[r]} {right[r]} y{r}a"))
        rows.append((10 * r + 2, f"x{r}b {left[r]} {right[r]} y{r}b"))
    return rows


def test_fixpoint_loop_excises_the_planted_8_round_onion(spark):
    from pyspark.sql import functions as F

    from scio_db_spark.plans.textops import span_excise_to_fixpoint

    df = spark.createDataFrame(
        _onion_rows(), "doc_id long, text string"
    )
    out, rounds = span_excise_to_fixpoint(df)
    got = {r.doc_id: r.text_rewritten for r in out.collect()}
    assert rounds == 8, rounds
    # the chain doc is stripped to its unique filler
    assert got[0] == "w1 w2 w3 w4", got[0]
    # every ref doc lost exactly its planted window
    assert got[11] == "ua1 ua2 ua3 ua4"
    assert got[21] == "x2a y2a"
    for r in range(3, 9):
        assert got[10 * r + 1] == f"x{r}a y{r}a", (r, got[10 * r + 1])
    # no surviving cross-doc duplicate span anywhere (fixpoint proof)
    from scio_db_spark.plans.textops import (
        _SHINGLE_N,
        _shingles_of,
    )
    from scio_db_spark.functions import text as X

    toks = out.select(
        "doc_id", X.tokens(F.col("text_rewritten")).alias("toks")
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(_shingles_of(F.col("toks")))
        ).alias("span"),
    )
    survivors = (
        sh.groupBy("span")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= _SPAN_MIN_DOCS)
        .count()
    )
    assert survivors == 0


def test_fixed_unroll_under_excises_the_onion(spark):
    """The documented limitation the fixpoint form exists to remove:
    the 6-round unroll leaves the onion's outer two layers in place
    (it is EXACT on corpora whose fixpoint is <= 6 — the next test —
    but a deeper corpus silently under-excises)."""
    df = spark.createDataFrame(
        _onion_rows(), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.text_rewritten for r in span_excise(df).collect()
    }
    # layers 7 and 8 survive in the chain doc
    assert "l71" in got[0] and "l81" in got[0], got[0]
    assert got[0] != "w1 w2 w3 w4"


def test_fixpoint_agrees_with_fixed_unroll_within_budget(spark, sf_dir):
    """On corpora whose fixpoint is within the unroll budget — the
    planted boilerplate corpus (fixpoint 1-2) and the real documents
    table (measured fixpoint <= 5 across SFs) — the two forms are
    row-identical, so the registered/oracle-pinned unroll and the
    production stop are the same operator, not cousins."""
    from scio_db_spark.plans.catalog import table
    from scio_db_spark.plans.textops import span_excise_to_fixpoint

    for df in (
        spark.createDataFrame(_rows(), "doc_id long, text string"),
        table(spark, sf_dir, "documents").select("doc_id", "text"),
    ):
        fixed = {
            (r.doc_id, r.text_rewritten, r.n_tokens_pre, r.n_tokens_post)
            for r in span_excise(df).collect()
        }
        looped_df, rounds = span_excise_to_fixpoint(df)
        looped = {
            (r.doc_id, r.text_rewritten, r.n_tokens_pre, r.n_tokens_post)
            for r in looped_df.collect()
        }
        assert fixed == looped
        assert rounds <= 6


def _literal_unroll(df):
    """The pre-round-12 registered form, verbatim: a literal
    _EXCISE_ROUNDS-round unroll with no early stop — the reference
    the capped fixpoint loop must be frame-identical to."""
    from pyspark.sql import functions as F

    from scio_db_spark.functions import text as X
    from scio_db_spark.operators.graph import checkpointed
    from scio_db_spark.plans.textops import _excise_round, _EXCISE_ROUNDS

    toks = df.select("doc_id", X.tokens(F.col("text")).alias("toks"))
    pre = toks.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens_pre")
    )
    cur = toks
    for _ in range(_EXCISE_ROUNDS):
        cur = checkpointed(_excise_round(cur))
    return pre.join(cur, "doc_id").select(
        "doc_id",
        F.array_join("toks", " ").alias("text_rewritten"),
        "n_tokens_pre",
        F.size("toks").cast("long").alias("n_tokens_post"),
    )


def test_capped_early_stop_matches_literal_unroll(spark):
    """Round-12 optimization pin: span_excise (now the fixpoint loop
    capped at _EXCISE_ROUNDS) is row-identical to the literal 6-round
    unroll on (a) the boilerplate corpus, (b) the 8-round onion where
    BOTH must under-excise identically, and (c) a corpus with null and
    empty text — the one shape where a round changes frames without
    changing the token total."""
    cases = [
        _rows(),
        _onion_rows(),
        [(0, None), (1, ""), (2, "   "), (3, "solo unique words")],
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ref = {
            tuple(r) for r in _literal_unroll(df).collect()
        }
        got = {tuple(r) for r in span_excise(df).collect()}
        assert got == ref, rows[:1]
