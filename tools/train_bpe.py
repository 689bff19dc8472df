"""Train the committed BPE merge table (one-time, offline).

The tokenizer-learning stage of an LLM data pipeline: Sennrich-style
BPE merge learning in the classic TWO-PHASE production split — one
distributed corpus scan to the weighted pre-token histogram (the only
data-sized pass), then driver-local incremental-pair-count training
over the collected histogram (operators/bpe.py::bpe_train_histogram;
32K merges in seconds on this recipe —
BENCH_LOCAL_r12_bpe_train.json). ``--distributed`` switches to the
all-Spark batched trainer (bpe_train_batched) for the
histogram-exceeds-driver-memory regime; both produce bit-identical
merge lists (property-pinned). Like
tools/train_quality_clf.py, the TRAINED LITERALS are what correctness
depends on: both engines apply the same committed merge list, so the
registered censuses are hash-verifiable, and this script only re-runs
when the recipe changes.

Recipe (round-12, production depth): GPT-2-style category pre-tokens
(letter runs / digit runs / other-non-space runs, case preserved,
operators/bpe.py::PRETOK_RE) over the UNION of every text-bearing
surface in the sf0.1 testdata — documents.text plus the TPC-H-ish
string columns and string-rendered date/price columns (the kind of
mixed prose/identifier/numeral stream a real crawl tokenizer sees;
the documents table alone saturates at ~550 statistically-valid
merges, which is a property of the synthetic corpus, not the
trainer). Weighted by occurrence, rendered as UTF-8 BYTE symbols
(two-hex-digit, byte fallback — any script representable); N_MERGES
merges at min_count=2 (every committed rank is backed by a pair seen
at least twice — no corpus-memorization tail), ties broken
lexicographically (deterministic — pinned against the plain-Python
reference trainer in tests/test_bpe.py, which also property-tests
batched ≡ sequential).

    python tools/train_bpe.py [sf_dir]

Writes scio_db_spark/resources/bpe_merges.json (merges + recipe with
the rounds/merges ratio the batching buys).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

_OUT = os.path.join(
    _REPO_ROOT, "scio_db_spark", "resources", "bpe_merges.json"
)

N_MERGES = 4096

#: Driver-side histogram bound for the default (two-phase) trainer:
#: collect only the TOP_M most frequent pre-tokens. On this recipe the
#: full histogram is 221,613 words; at 100 TB the heavy tail below the
#: top-M is count~1-2 noise that min_count=2 would cut anyway, and the
#: bound keeps the collect O(M) regardless of corpus size.
TRAIN_TOP_M = 2_000_000

#: (table, column expression) pairs forming the training stream. Cast
#: dates/prices through CAST(.. AS STRING) — training is single-engine
#: (Spark), so engine-specific decimal rendering is recipe-internal.
SOURCES: list[tuple[str, str]] = [
    ("documents", "text"),
    ("part", "p_name"),
    ("part", "p_type"),
    ("part", "p_brand"),
    ("customer", "c_name"),
    ("customer", "c_mktsegment"),
    ("supplier", "s_name"),
    ("events", "props"),
    ("events", "event_type"),
    ("orders", "o_orderpriority"),
    ("orders", "CAST(o_totalprice AS STRING)"),
    ("orders", "CAST(o_orderdate AS STRING)"),
    ("lineitem", "CAST(l_extendedprice AS STRING)"),
    ("lineitem", "CAST(l_shipdate AS STRING)"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from functools import reduce

    from pyspark.sql import functions as F

    from scio_db_spark.operators.bpe import (
        PRETOK_RE,
        bpe_train_batched,
        bpe_train_histogram,
        pretokens,
    )
    from scio_db_spark.plans.catalog import table
    from scio_db_spark.session import SessionFactory

    spark = SessionFactory.create("train-bpe")
    spark.sparkContext.setLogLevel("ERROR")

    streams = [
        table(spark, sf_dir, t).selectExpr(f"{expr} AS t")
        for t, expr in SOURCES
    ]
    corpus = reduce(lambda a, b: a.unionByName(b), streams)
    words = (
        corpus.select(F.explode(pretokens(F.col("t"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_vocab = words.count()
    t0 = time.time()
    if "--distributed" in sys.argv:
        # All-Spark path: provably sequential-equivalent batched
        # rounds, but on this recipe the top pairs are symbol-
        # entangled and batching buys only ~1.2 merges/round — kept
        # for the (histogram exceeds driver memory) regime and as the
        # equivalence cross-check.
        merges, rounds = bpe_train_batched(words, N_MERGES)
        trainer = "operators/bpe.py::bpe_train_batched"
    else:
        # Production path (two-phase, the classic trainer split): the
        # corpus-sized work is the ONE distributed histogram aggregate
        # above; the merge loop runs driver-local over the collected
        # histogram (incremental pair counts — seconds for 32K merges
        # on this recipe, BENCH_LOCAL_r12_bpe_train.json). TRAIN_TOP_M
        # bounds the collect at 100 TB scale: pre-tokens below the
        # top-M are count~1 tail cut by min_count=2 anyway.
        hist_rows = (
            words.orderBy(F.desc("n"), F.asc("word"))
            .limit(TRAIN_TOP_M)
            .collect()
        )
        hist = {r.word: r.n for r in hist_rows}
        merges = bpe_train_histogram(hist, N_MERGES, min_count=2)
        rounds = None
        trainer = "operators/bpe.py::bpe_train_histogram"
    wall = round(time.time() - t0, 1)

    payload = {
        "recipe": {
            "sf_dir": sf_dir,
            "sources": [f"{t}.{e}" for t, e in SOURCES],
            "word_re": PRETOK_RE,
            "symbols": "utf-8 bytes as two-hex-digit symbols",
            "n_merges_requested": N_MERGES,
            "n_vocab_words": n_vocab,
            "min_count": 2,
            "tie_break": "lexicographic (left, right)",
            "trainer": trainer,
            "train_wall_sec": wall,
            **(
                {
                    "n_rounds": rounds,
                    "merges_per_round": round(
                        len(merges) / max(rounds, 1), 2
                    ),
                }
                if rounds is not None
                else {"train_top_m": TRAIN_TOP_M}
            ),
        },
        "merges": [[left, right] for left, right in merges],
    }
    with open(_OUT, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"trained {len(merges)} merges ({wall}s) -> {_OUT}")
    print("first 10:", merges[:10])
    return 0


if __name__ == "__main__":
    sys.exit(main())
