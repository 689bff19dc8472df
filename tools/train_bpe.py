"""Train the committed BPE merge table (one-time, offline).

The tokenizer-learning stage of an LLM data pipeline: Sennrich-style
BPE merge learning over the documents corpus, run with the DISTRIBUTED
trainer (operators/bpe.py::bpe_train — one corpus scan to the weighted
vocabulary, then vocabulary-sized pair-count rounds). Like
tools/train_quality_clf.py, the TRAINED LITERALS are what correctness
depends on: both engines apply the same committed merge list
(chained replace in rank order), so the registered census is
hash-verifiable, and this script only re-runs when the recipe changes.

Recipe (round-11, full charset): GPT-2-style category pre-tokens
(letter runs / digit runs / other-non-space runs, case preserved,
operators/bpe.py::PRETOK_RE) from sf0.1 documents, weighted by
occurrence, rendered as UTF-8 BYTE symbols (two-hex-digit, byte
fallback — any script representable); N_MERGES merges, ties broken
lexicographically (deterministic — pinned against the plain-Python
reference trainer in tests/test_bpe.py).

    python tools/train_bpe.py [sf_dir]

Writes scio_db_spark/resources/bpe_merges.json.
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

N_MERGES = 160


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from scio_db_spark.operators.bpe import PRETOK_RE, bpe_train, pretokens
    from scio_db_spark.plans.catalog import table
    from scio_db_spark.session import SessionFactory

    spark = SessionFactory.create("train-bpe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(pretokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t0 = time.time()
    merges = bpe_train(words, N_MERGES)
    wall = round(time.time() - t0, 1)

    payload = {
        "recipe": {
            "sf_dir": sf_dir,
            "word_re": PRETOK_RE,
            "symbols": "utf-8 bytes as two-hex-digit symbols",
            "n_merges_requested": N_MERGES,
            "tie_break": "lexicographic (left, right)",
            "trainer": "operators/bpe.py::bpe_train",
            "train_wall_sec": wall,
        },
        "merges": [[left, right] for left, right in merges],
    }
    with open(_OUT, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"trained {len(merges)} merges in {wall}s -> {_OUT}")
    print("first 10:", merges[:10])
    return 0


if __name__ == "__main__":
    sys.exit(main())
