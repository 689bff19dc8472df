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
