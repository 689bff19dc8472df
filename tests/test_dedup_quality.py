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
    # Candidate set must stay far below the quadratic pair space —
    # that pruning is the whole point of banding.
    assert len(cand) < n_docs * (n_docs - 1) // 2 * 0.01
