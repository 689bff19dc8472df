"""Near-dup dedup quality: LSH candidates must cover the true pairs.

Brute-force word-trigram Jaccard over all pairs (cheap at sf0.001's
500 docs) is the ground truth; the MinHash-LSH banding must recall
(nearly) all pairs above the dedup threshold while proposing far fewer
candidates than the quadratic pair space.
"""

from __future__ import annotations

import itertools

from scio_db_spark.plans.catalog import table
from scio_db_spark.plans.registry import all_queries

_JACCARD_TAU = 0.7


def _true_pairs(spark, sf_dir):
    docs = [
        (r.doc_id, r.text.lower())
        for r in table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).collect()
    ]
    def shingles(t):
        toks = [x for x in t.split() if x]
        return set(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    sh = {d: shingles(t) for d, t in docs}
    pairs = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        sa, sb = sh[a], sh[b]
        if sa and sb and len(sa & sb) / len(sa | sb) >= _JACCARD_TAU:
            pairs.add((a, b))
    return pairs, len(docs)


def _closure_covered(pairs: set, truth: set) -> float:
    """Fraction of truth pairs connected in the candidate GRAPH — the
    operational contract: candidates feed connected components
    (docs_dedup_clusters), so a truth pair is found iff its endpoints
    share a component. With the bounded LSH form, exact-dup clusters
    arrive as linear star edges (canonical→member), not c² pairs, so
    direct pair membership understates coverage by design."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    hit = sum(1 for a, b in truth if find(a) == find(b))
    return hit / len(truth)


def test_minhash_lsh_recalls_true_near_dups(spark, sf_dir):
    truth, n_docs = _true_pairs(spark, sf_dir)
    assert truth, "corpus has no near-dup pairs to find"
    cand = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["docs_minhash_lsh_pairs"]
        .spark(spark, sf_dir)
        .collect()
    }
    recall = len(truth & cand) / len(truth)
    # Measured 1.0 at sf0.001 (32 candidates for 28 true pairs).
    assert recall >= 0.9, f"LSH band recall collapsed: {recall:.2f}"
    # The end-to-end contract (bounded form): every true pair lands in
    # one dedup cluster — direct band pair OR via canonical star edges.
    coverage = _closure_covered(cand, truth)
    assert coverage >= 0.99, f"cluster coverage collapsed: {coverage:.2f}"
    # Candidate set must stay far below the quadratic pair space —
    # that pruning is the whole point of banding.
    assert len(cand) < n_docs * (n_docs - 1) // 2 * 0.01


def test_library_minhash_fast_hash_finds_planted_dups(spark):
    """operators/minhash.py (production xxhash64 path): planted
    near-duplicate pairs must surface as LSH candidates and identical
    texts must collide on the full signature; unrelated docs must not
    flood the candidate set (bucket join, not all-pairs)."""
    from scio_db_spark.operators.minhash import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
    )
    rows = [(0, base), (1, base)]  # identical pair
    # near-dup: one word changed
    rows.append((2, base.replace("sigma", "sigmaX")))
    # unrelated fillers
    for i in range(3, 40):
        rows.append(
            (i, " ".join(f"w{i}t{j}" for j in range(25)))
        )
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = minhash_signatures(df, "doc_id", "text", k=8)
    by_id = {r.doc_id: tuple(r)[1:] for r in sigs.collect()}
    assert by_id[0] == by_id[1]  # identical text → identical signature

    pairs = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id").collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup caught
    # all-pairs would be 40*39/2 = 780; the bucket join must prune hard
    assert len(pairs) < 100


def test_library_minhash_rejects_bad_band_config(spark):
    import pytest as _pytest

    from scio_db_spark.operators.minhash import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    sigs = minhash_signatures(df, "doc_id", "text", k=8)
    with _pytest.raises(ValueError):
        lsh_candidate_pairs(sigs, "doc_id", k=8, bands=16)  # bands > k
    with _pytest.raises(ValueError):
        lsh_candidate_pairs(sigs, "doc_id", k=10, bands=4)  # non-divisor


def test_ppjoin_exact_no_false_negatives_and_prunes(spark, sf_dir):
    """PPJoin candidate set must (a) be a SUPERSET of every pair at
    Jaccard >= t over the same shingle-hash domain (exactness — the
    guarantee LSH doesn't give), and (b) be much smaller than the
    all-shared-token pair space (the point of prefix filtering)."""
    from pyspark.sql import functions as F

    from scio_db_spark.plans.textops import (
        _PPJOIN_T,
        _doc_shingle_hashes,
        _ppjoin_candidates,
    )

    ds = _doc_shingle_hashes(spark, sf_dir)
    tok = {}
    for r in ds.collect():
        tok.setdefault(r.doc_id, set()).add(r.h)
    import itertools

    true_pairs = set()
    shared_pairs = 0
    for a, b in itertools.combinations(sorted(tok), 2):
        inter = len(tok[a] & tok[b])
        if inter == 0:
            continue
        shared_pairs += 1
        if inter / len(tok[a] | tok[b]) >= _PPJOIN_T:
            true_pairs.add((a, b))
    cand = {
        (r.doc_a, r.doc_b)
        for r in _ppjoin_candidates(spark, sf_dir).collect()
    }
    assert true_pairs <= cand, "prefix filter dropped a true pair"
    assert len(cand) < shared_pairs / 2, (
        f"no pruning: {len(cand)} candidates vs "
        f"{shared_pairs} shared-token pairs"
    )

    got = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["docs_ppjoin_similarity_pairs"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == true_pairs


def test_dsir_integer_surrogate_tracks_log_ratio(spark, sf_dir):
    """The integer ratio surrogate must (a) enrich the target language
    in the selected slice and (b) rank-agree with the true DSIR
    log-ratio scoring computed independently in Python."""
    import math

    from scio_db_spark.plans.textops import (
        _DSIR_BUCKETS,
        _doc_shingle_hashes,
    )
    from scio_db_spark.plans.catalog import table

    top = all_queries()["docs_dsir_importance_topk"].spark(
        spark, sf_dir
    ).collect()
    langs = [r.lang for r in top]
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    n_docs = docs.count()
    n_en = docs.filter("lang = 'en'").count()
    assert langs.count("en") / len(langs) > n_en / n_docs, (
        "selection did not enrich the target language"
    )

    # true log-ratio DSIR weights, smoothed, computed driver-side
    feats = {}
    for r in _doc_shingle_hashes(spark, sf_dir).collect():
        feats.setdefault(r.doc_id, []).append(r.h % _DSIR_BUCKETS)
    lang = {r.doc_id: r.lang for r in docs.collect()}
    raw, tgt = {}, {}
    for d, fs in feats.items():
        for f in fs:
            raw[f] = raw.get(f, 0) + 1
            if lang[d] == "en":
                tgt[f] = tgt.get(f, 0) + 1
    n_raw = sum(raw.values())
    n_tgt = sum(tgt.values())
    def log_score(d):
        return sum(
            math.log(((tgt.get(f, 0) + 0.5) / (n_tgt + 1))
                     / ((raw[f] + 0.5) / (n_raw + 1)))
            for f in feats[d]
        )
    true_rank = sorted(feats, key=lambda d: -log_score(d))[:50]
    overlap = len(set(true_rank) & {r.doc_id for r in top})
    assert overlap >= 25, (
        f"integer surrogate diverged from log-ratio DSIR: "
        f"{overlap}/50 overlap"
    )


def test_ppjoin_collapse_handles_mass_duplication(spark, sf_dir):
    """The x100-scaling pathology in miniature: replicate every doc 6x
    (exact copies). The collapsed join must return the complete answer
    — all intra-copy pairs at jaccard 1.0 plus every cross near-dup
    pair — while the prefix join only ever pairs representatives."""
    from pyspark.sql import functions as F

    from scio_db_spark.plans.catalog import table
    from scio_db_spark.plans.textops import (
        _PPJOIN_T,
        _doc_shingle_hashes,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n0 = docs.count()
    stride = (
        docs.agg(F.max("doc_id")).collect()[0][0] + 1
    )
    copies = docs
    for i in range(1, 4):
        copies = copies.unionByName(
            docs.select(
                (F.col("doc_id") + i * stride).alias("doc_id"), "text"
            )
        )
    views = {"documents": copies}

    # run the registered query body against the replicated frame by
    # monkey-free substitution: rebuild the same pipeline inline
    import scio_db_spark.plans.textops as T

    real_table = T.table
    try:
        T.table = lambda _s, _sf, name, **kw: views.get(name) or real_table(
            _s, _sf, name, **kw
        )
        out = all_queries()["docs_ppjoin_similarity_pairs"].spark(
            spark, sf_dir
        )
        got = out.collect()
    finally:
        T.table = real_table
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in got}
    # every copy group contributes C(4,2)=6 pairs at jaccard 1.0 for
    # docs with nonempty shingle sets
    ds0 = _doc_shingle_hashes(spark, sf_dir)
    docs_with_sets = ds0.select("doc_id").distinct().count()
    intra = sum(1 for (a, b), j in pairs.items()
                if a % stride == b % stride)
    assert intra >= docs_with_sets * 6 * 0.99
    assert all(
        j == 1.0 for (a, b), j in pairs.items() if a % stride == b % stride
    )
    # original near-dup pairs appear expanded 16x (4x4 member combos)
    base = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["docs_ppjoin_similarity_pairs"]
        .spark(spark, sf_dir)
        .collect()
    }
    for a, b in base:
        assert (a, b) in pairs


def test_ppjoin_positional_filter_exact_on_random_sets(spark):
    """Adversarial check of the positional filter's no-false-negative
    proof on RANDOM token sets (the corpus test can't exercise df-tie
    orderings, equal-size boundaries, or alpha edge cases): for every
    seeded universe, the candidate set must contain every pair with
    Jaccard >= t. Uses the raw (doc_id, h) frame contract of
    _doc_shingle_hashes."""
    import itertools
    import random

    from scio_db_spark.plans.textops import (
        _PPJOIN_T,
        _ppjoin_candidates_ds,
    )

    for seed in range(6):
        rng = random.Random(seed)
        universe = list(range(1, 40))
        docs = {}
        base = rng.sample(universe, rng.randint(4, 10))
        for d in range(14):
            if rng.random() < 0.6 and docs:
                # perturb an existing doc: near-dups with high overlap
                src = docs[rng.choice(list(docs))]
                s = set(src)
                for _ in range(rng.randint(0, 3)):
                    if rng.random() < 0.5 and len(s) > 2:
                        s.discard(rng.choice(list(s)))
                    else:
                        s.add(rng.choice(universe))
                docs[d] = sorted(s)
            else:
                docs[d] = sorted(
                    set(rng.sample(universe, rng.randint(2, 12)))
                )
        true_pairs = {
            (a, b)
            for a, b in itertools.combinations(sorted(docs), 2)
            if len(set(docs[a]) & set(docs[b]))
            / len(set(docs[a]) | set(docs[b]))
            >= _PPJOIN_T
        }
        rows = [(d, h) for d, hs in docs.items() for h in hs]
        ds = spark.createDataFrame(rows, "doc_id long, h long")
        cand = {
            (r.doc_a, r.doc_b)
            for r in _ppjoin_candidates_ds(ds).collect()
        }
        assert true_pairs <= cand, (
            f"seed {seed}: positional filter dropped "
            f"{sorted(true_pairs - cand)}; docs={docs}"
        )


def test_bounded_lsh_handles_mass_duplication(spark):
    """The r10-verdict scale-killer, in miniature: one viral page
    duplicated 200x must NOT emit C(200,2)*bands candidate pairs.
    Expected shape: 199 linear star edges (canonical->member), near-dup
    bridges preserved THROUGH the canonical, and a tiny hot bucket
    census ledger accounting for anything the cap withholds."""
    from scio_db_spark.plans.textops import bounded_lsh_pairs

    viral = "breaking news the quick brown fox jumped over the lazy dog again today " * 3
    near = viral + "with one extra trailing sentence appended"  # near-dup
    # every token carries the doc index — zero shared shingles
    other = [
        " ".join(f"w{i}x{j}" for j in range(15)) for i in range(20)
    ]
    rows = [(i, viral) for i in range(200)]
    rows.append((500, near))
    rows += [(1000 + i, t) for i, t in enumerate(other)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = {
        (r.doc_a, r.doc_b)
        for r in bounded_lsh_pairs(d).collect()
    }
    # linear, not quadratic: 199 star edges + the near-dup bridge(s),
    # nowhere near C(200,2) = 19900
    assert len(pairs) < 250, f"candidate blowup: {len(pairs)} pairs"
    star = {(0, i) for i in range(1, 200)}
    assert star <= pairs, "exact-dup star edges missing"
    # the near-dup must bridge through the canonical (same signature
    # as every member) — verify via connected components
    assert _closure_covered(pairs, {(0, 500), (7, 500)}) == 1.0


def test_bounded_lsh_cap_fires_with_accounting(spark):
    """Force the cap (cap=3) on distinct-but-colliding docs: buckets
    above the cap contribute no band pairs; star edges are unaffected."""
    from scio_db_spark.plans.textops import bounded_lsh_pairs

    # 10 IDENTICAL docs -> 1 canonical + 9 star edges; bucket size is
    # 1 after collapse so the cap never touches them
    rows = [(i, "same text for everyone repeated enough times to shingle nicely") for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b) for r in bounded_lsh_pairs(d, cap=3).collect()}
    assert pairs == {(0, i) for i in range(1, 10)}


def test_bounded_lsh_preserves_components_vs_unbounded(spark):
    """Equivalence property: connected components over the BOUNDED
    form (canonical band pairs + star edges, uncapped) equal
    components over the pre-fix all-docs band self-join, on random
    duplication-heavy corpora. This is the exact claim the collapse
    rests on: signatures are a pure function of text, so replacing a
    cluster's c² pairs with c-1 star edges moves no doc between
    components."""
    import random

    from pyspark.sql import functions as F

    from scio_db_spark.plans.textops import (
        _bands_of,
        _signature_of_docs,
        bounded_lsh_pairs,
    )

    def components(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        return parent, find

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(3):
        # base texts; some duplicated 2-6x; some near-dups
        texts = []
        for t in range(8):
            base = " ".join(rng.choice(vocab) for _ in range(12))
            texts.append(base)
            for _ in range(rng.randint(0, 5)):
                texts.append(base)  # exact dup
            if rng.random() < 0.5:
                texts.append(base + " extra")  # near dup
        rows = [(i, t) for i, t in enumerate(texts)]
        d = spark.createDataFrame(rows, "doc_id long, text string")

        bounded = {
            (r.doc_a, r.doc_b)
            for r in bounded_lsh_pairs(d, cap=10**9).collect()
        }
        bands = _bands_of(_signature_of_docs(d))
        a, b = bands.alias("a"), bands.alias("b")
        unbounded = {
            (r.doc_a, r.doc_b)
            for r in a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
            .collect()
        }
        ids = [i for i, _ in rows]
        pb, fb = components(bounded)
        pu, fu = components(unbounded)
        lb = {}
        lu = {}
        for i in ids:
            lb.setdefault(fb(i), set()).add(i)
            lu.setdefault(fu(i), set()).add(i)
        assert sorted(map(sorted, lb.values())) == sorted(
            map(sorted, lu.values())
        ), trial


def test_cc_over_capped_pairs_matches_union_find(spark):
    """Round-12 extension of the CC-equivalence property to the
    CAPPED-pairs regime: with a cap small enough that hot band
    buckets really drop pairs, the bounded large-star/small-star CC
    must equal a reference union-find over the IDENTICAL edge set
    (algorithm equivalence on capped graphs), and every exact-dup
    cluster must still land in ONE component regardless of the cap —
    the star edges' guarantee, since they bypass banding entirely."""
    import random

    from scio_db_spark.operators.clusters import connected_components
    from scio_db_spark.plans.textops import bounded_lsh_pairs

    def components(pairs, ids):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        out = {}
        for i in ids:
            out.setdefault(find(i), set()).add(i)
        return sorted(map(sorted, out.values()))

    rng = random.Random(21)
    vocab = [f"w{i}" for i in range(25)]
    texts = []
    text_of = {}
    for t in range(10):
        base = " ".join(rng.choice(vocab) for _ in range(12))
        for _ in range(rng.randint(1, 8)):  # heavy exact duplication
            texts.append(base)
        if rng.random() < 0.6:
            texts.append(base + " extra suffix words")
    rows = [(i, t) for i, t in enumerate(texts)]
    for i, t in rows:
        text_of[i] = t
    d = spark.createDataFrame(rows, "doc_id long, text string")

    pairs_df = bounded_lsh_pairs(d, cap=2)  # aggressively capped
    pairs = {(r.doc_a, r.doc_b) for r in pairs_df.collect()}
    ids = [i for i, _ in rows]

    want = components(pairs, ids)
    got_rows = connected_components(
        pairs_df, "doc_a", "doc_b"
    ).collect()
    got_map = {r.v: r.label for r in got_rows}
    got = {}
    for i in ids:
        got.setdefault(got_map.get(i, i), set()).add(i)
    assert sorted(map(sorted, got.values())) == want

    # exact-dup clusters never split, no matter the cap
    comp_of = {}
    for comp in want:
        for i in comp:
            comp_of[i] = id(comp)
    by_text = {}
    for i, t in rows:
        by_text.setdefault(t, set()).add(comp_of[i])
    assert all(len(cs) == 1 for cs in by_text.values())
