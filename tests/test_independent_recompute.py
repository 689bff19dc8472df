"""Independent Python recomputation of mirrored-algorithm queries.

The DuckDB oracle twins deliberately mirror each query's algorithm —
which means an ALGORITHMIC bug shared by both sides passes the gate
(exactly what happened to the triangle census's wedge ordering until
a brute-force test caught it). This suite recomputes the round-8
mirrored queries a THIRD way, in plain Python, from the raw parquet:

- DLT estimator: pure integer arithmetic, including the md5 hash.
- Benford census: integer recount.
- CMS estimates: hashlib md5 -> universal-hash buckets -> counters.
- kNN label vote: LEFT-ASSOCIATIVE float dot/norm chains replicating
  the generated expression order bit-for-bit.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

SF = "/root/testdata/sf0.001"


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_dlt_estimator_recomputed_in_python(spark):
    from scio_db_spark.plans.registry import all_queries

    rows = duckdb.sql(
        f"SELECT o_orderkey, CAST(floor(o_totalprice*100) AS BIGINT) "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    pri = sorted(
        (_md5_60(f"r8:{k}") // w, k, w) for k, w in rows if w > 0
    )
    k = 50
    top, nxt = pri[:k], pri[k]
    w_next, u_next = nxt[2], _md5_60(f"r8:{nxt[1]}")
    a = m = 0
    for _q, kk, w in top:
        if w * u_next >= w_next * (1 << 60):
            a += w
        else:
            m += 1
    est = a + (m * w_next * (1 << 60)) // u_next
    exact = sum(w for _k, w in rows if w > 0)
    got = (
        all_queries()["orders_priority_sample_total_estimate"]
        .spark(spark, SF)
        .collect()[0]
    )
    assert got.exact_total_cents == exact
    assert got.est_total_cents == est
    assert got.err_permille == abs(est - exact) * 1000 // exact


def test_benford_recomputed_in_python(spark):
    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.plans.libops import _BENFORD_MICRO

    cents = [
        c
        for (c,) in duckdb.sql(
            f"SELECT CAST(floor(o_totalprice*100) AS BIGINT) "
            f"FROM read_parquet('{SF}/orders.parquet') "
            f"WHERE o_totalprice > 0"
        ).fetchall()
    ]
    obs = Counter(int(str(c)[0]) for c in cents)
    n = len(cents)
    got = {
        r.digit: (r.n_obs, r.n_exp, r.dev_micro)
        for r in all_queries()["orders_benford_digit_census"]
        .spark(spark, SF)
        .collect()
    }
    for d, p in _BENFORD_MICRO.items():
        n_exp = n * p // 1_000_000
        n_obs = obs.get(d, 0)
        dev = (
            0 if n_exp == 0
            else (n_obs - n_exp) ** 2 * 1_000_000 // n_exp
        )
        assert got[d] == (n_obs, n_exp, dev), f"digit {d}"


def test_cms_estimates_recomputed_in_python(spark):
    from scio_db_spark.functions.hashing import MERSENNE_P
    from scio_db_spark.functions.text import tokens_sql
    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.plans.textops import _CMS_PARAMS, _CMS_W

    # tokenization via the SQL twin (the shared-risk algorithm under
    # test is the sketch arithmetic, not the tokenizer — which has its
    # own cross-engine pin); everything after unnest is plain Python
    toks = [
        t
        for (t,) in duckdb.sql(
            f"SELECT unnest({tokens_sql('text')}) FROM "
            f"read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    ]
    tf = Counter(toks)
    counters: Counter = Counter()
    buckets = {}
    for tok, c in tf.items():
        h = _md5_60(tok) % MERSENNE_P
        cells = [
            (i, ((h * a + b) % MERSENNE_P) % _CMS_W)
            for i, (a, b) in enumerate(_CMS_PARAMS)
        ]
        buckets[tok] = cells
        for cell in cells:
            counters[cell] += c
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = {
        r.token: (r.true_count, r.cms_est, r.overcount)
        for r in all_queries()["docs_token_cms_topk"]
        .spark(spark, SF)
        .collect()
    }
    assert len(got) == 20
    for tok, c in top:
        est = min(counters[cell] for cell in buckets[tok])
        assert got[tok] == (c, est, est - c), tok


def test_knn_label_vote_recomputed_in_python(spark):
    from scio_db_spark.plans.registry import all_queries

    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    embs = {vid: list(map(float, e)) for vid, e, _l in rows}
    labels = {vid: l for vid, _e, l in rows}

    def chain_dot(x, y):
        # LEFT-ASSOCIATIVE accumulation: replicates the generated
        # a1*b1 + a2*b2 + ... expression tree bit-for-bit
        acc = 0.0
        for a, b in zip(x, y):
            acc = acc + a * b
        return acc

    def norm(x):
        return math.sqrt(chain_dot(x, x))

    expected = {}
    for q in range(20):
        qe, qn = embs[q], norm(embs[q])
        scored = []
        for vid, e in embs.items():
            if vid == q:
                continue
            den = qn * norm(e)
            cos = chain_dot(qe, e) / den if den != 0.0 else None
            scored.append((cos, vid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        votes = Counter(labels[vid] for _c, vid in scored[:10])
        lab, n = sorted(
            votes.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        expected[q] = (labels[q], lab, n, int(labels[q] == lab))
    got = {
        r.q_id: (r.true_label, r.knn_label, r.n_votes, r.correct)
        for r in all_queries()["emb_knn_label_census"]
        .spark(spark, SF)
        .collect()
    }
    assert got == expected


def test_basket_pairs_recomputed_in_python(spark):
    """Market-basket pair mining is oracle-mirrored (both sides expand
    per-order sorted pairs); recount the top-k pairs independently."""
    from scio_db_spark.plans.registry import all_queries

    rows = duckdb.sql(
        f"SELECT l_orderkey, l_partkey FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    by_order: dict = {}
    for ok, pk in rows:
        by_order.setdefault(ok, []).append(pk)
    pair_n: Counter = Counter()
    for parts in by_order.values():
        # row-level multiplicity: a part on two lineitems of one
        # order pairs twice (the query's count(*) over the row join)
        cnt = Counter(parts)
        ks = sorted(cnt)
        for i, a in enumerate(ks):
            for b in ks[i + 1:]:
                pair_n[(a, b)] += cnt[a] * cnt[b]
    got = [
        ((r.p1, r.p2), r.n)
        for r in all_queries()["basket_part_pairs_topk"]
        .spark(spark, SF)
        .collect()
    ]
    expected = sorted(
        pair_n.items(), key=lambda kv: (-kv[1], kv[0])
    )[: len(got)]
    assert got == expected


def test_pq_adc_topk_recomputed_in_python(spark):
    """Round-7's PQ/ADC search has a MIRRORED oracle (same codes, same
    LUT quantization) — apply the round-8 lesson backwards: recompute
    encode -> LUT -> ADC -> top-5 in plain Python with the identical
    left-associative float folds and floor quantization."""
    from scio_db_spark.plans.libops import _PQ
    from scio_db_spark.plans.registry import all_queries

    if _PQ is None:
        import pytest

        pytest.skip("pq model not committed")

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    embs = {vid: [float(x) for x in e] for vid, e in rows}
    d_sub, books = _PQ["d_sub"], _PQ["subspaces"]

    def sub_dist(vec, s, cent):
        acc = 0.0
        base = s * d_sub
        for j, w in enumerate(cent):
            t = (vec[base + j] - float(w))
            acc = acc + t * t
        return acc

    def codes(vec):
        out = []
        for s, book in enumerate(books):
            out.append(
                min(
                    (sub_dist(vec, s, cent), c)
                    for c, cent in enumerate(book)
                )[1]
            )
        return out

    enc = {vid: codes(v) for vid, v in embs.items()}
    expected = {}
    for q in range(5):
        lut = [
            [sub_dist(embs[q], s, cent) for cent in book]
            for s, book in enumerate(books)
        ]
        scored = []
        for vid, cs in enc.items():
            if vid == q:
                continue
            adc = sum(
                math.floor(lut[s][cs[s]] * 1_000_000_000)
                for s in range(len(books))
            )
            scored.append((adc, vid))
        scored.sort()
        expected[q] = scored[:5]
    got = {}
    for r in (
        all_queries()["emb_pq_adc_topk"].spark(spark, SF).collect()
    ):
        got.setdefault(r.q_id, []).append((r.adc_q, r.vec_id))
    for q in got:
        got[q].sort()
    assert got == expected


def test_pack_plan_recomputed_in_python(spark):
    """The packing plan is oracle-mirrored (same cumsum-before /
    budget-floor algebra both sides); recompute the greedy packer
    independently with an explicit running loop."""
    import re

    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.plans.textops import _PACK_BUDGET

    rows = duckdb.sql(
        f"SELECT lang, doc_id, text FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    by_lang: dict = {}
    for lang, did, text in rows:
        toks = len(re.split(r"[ \t\n\f\r]+", text))
        by_lang.setdefault(lang, []).append((did, toks))
    expected: Counter = Counter()
    totals: Counter = Counter()
    for lang, docs in by_lang.items():
        cum = 0
        for _did, toks in sorted(docs):
            pack = cum // _PACK_BUDGET
            expected[(lang, pack)] += 1
            totals[(lang, pack)] += toks
            cum += toks
    got = {
        (r.lang, r.pack_id): (r.n_docs, r.total_toks)
        for r in all_queries()["docs_pack_plan"]
        .spark(spark, SF)
        .collect()
    }
    assert got == {
        k: (expected[k], totals[k]) for k in expected
    }


def test_chunk_plan_recomputed_in_python(spark):
    """Chunker re-derived with an explicit Python loop (stride walk +
    clipped window length). NOTE on length semantics: both engines
    measure CHARACTERS of the substring (python len of the slice)."""
    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.plans.textops import _CHUNK_LEN, _CHUNK_STRIDE

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    expected = {}
    for did, text in rows:
        n = len(text)
        i = 1
        while i <= max(n - _CHUNK_STRIDE, 1):
            chunk = text[i - 1 : i - 1 + _CHUNK_LEN]
            expected[(did, (i - 1) // _CHUNK_STRIDE)] = (i, len(chunk))
            i += _CHUNK_STRIDE
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_start, r.chunk_len)
        for r in all_queries()["docs_chunk_plan"]
        .spark(spark, SF)
        .collect()
    }
    assert got == expected


def test_hll_estimate_recomputed_in_python(spark):
    """r9: deterministic-register HLL — registers, harmonic sum,
    rational-alpha raw estimate, and the micro-nat linear-counting
    branch all rebuilt from hashlib md5 in plain Python."""
    from scio_db_spark.functions.text import tokens_sql
    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.plans.textops import (
        _HLL_DEN,
        _HLL_LC_THRESHOLD,
        _HLL_M,
        _HLL_NUM,
        _HLL_RHO_MAX,
    )

    pairs = set(
        duckdb.sql(
            f"SELECT lang, unnest({tokens_sql('text')}) FROM "
            f"read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    regs: dict = {}
    for lang, tok in pairs:
        h = _md5_60(tok)
        idx, rest = h % _HLL_M, h // _HLL_M
        rho = _HLL_RHO_MAX - rest.bit_length() if rest else _HLL_RHO_MAX
        key = (lang, idx)
        regs[key] = max(regs.get(key, 0), rho)
    expected = {}
    for lang in {l for l, _ in regs}:
        mjs = [mj for (l, _), mj in regs.items() if l == lang]
        v = _HLL_M - len(mjs)
        s = v * (1 << 50) + sum(1 << (50 - mj) for mj in mjs)
        e_raw = _HLL_NUM // (_HLL_DEN * s)
        if v > 0 and e_raw <= _HLL_LC_THRESHOLD:
            lnm = math.floor(math.log(_HLL_M) * 1000000)
            lnv = math.floor(math.log(v) * 1000000)
            est = (_HLL_M * (lnm - lnv)) // 1000000
        else:
            est = e_raw
        expected[lang] = (est, v)
    got = {
        r.lang: (r.distinct_tokens_est, r.zero_registers)
        for r in all_queries()["docs_token_hll_estimate"]
        .spark(spark, SF)
        .collect()
    }
    assert got == expected


def test_grid_quantiles_recomputed_in_python(spark):
    """r9: log-grid quantile sketch — the funnel latencies, bucket
    floors, and cumulative-rank walk all rebuilt in plain Python from
    the raw events parquet."""
    from scio_db_spark.plans.registry import all_queries

    rows = duckdb.sql(
        f"SELECT user_id, event_type, epoch_us(ts) FROM "
        f"read_parquet('{SF}/events.parquet') "
        f"WHERE event_type IN ('view', 'purchase')"
    ).fetchall()
    views: dict = {}
    for u, et, ts in rows:
        if et == "view" and (u not in views or ts < views[u]):
            views[u] = ts
    first_p: dict = {}
    for u, et, ts in rows:
        if et == "purchase" and u in views and ts >= views[u]:
            if u not in first_p or ts < first_p[u]:
                first_p[u] = ts
    lats = sorted(first_p[u] - views[u] for u in first_p)
    n_viewers, n = len(views), len(lats)
    # bit-equality needs presence, not statistics (error bounds are
    # tests/test_quantile_sketch.py's job at sf0.01)
    assert n > 5

    def bucket_floor(x: int) -> int:
        shift = max(x.bit_length() - 1 - 6, 0)
        return (x >> shift) << shift

    hist = sorted(Counter(bucket_floor(x) for x in lats).items())

    def grid_q(rank: int) -> int:
        cum = 0
        for blo, cnt in hist:
            cum += cnt
            if cum >= rank:
                return blo
        raise AssertionError("rank beyond histogram")

    got = (
        all_queries()["events_latency_quantile_sketch"]
        .spark(spark, SF)
        .collect()[0]
    )
    assert got.n_viewers == n_viewers
    assert got.n_converted == n
    assert got.p50_us_est == grid_q((n - 1) // 2 + 1)
    assert got.p90_us_est == grid_q((n - 1) * 9 // 10 + 1)
