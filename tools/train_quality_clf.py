"""Train the committed hashed-feature quality classifier (one-time,
offline).

The fastText-style quality filter every LLM data pipeline runs: a
linear model over hashed bag-of-words features, cheap enough to score
100 TB in one scan. Like tools/train_vector_models.py, the TRAINED
LITERALS are what correctness depends on — both engines load the same
committed integer weights, so the registered census is hash-verifiable
— and this script only re-runs when the training recipe changes.

Recipe: logistic regression, full-batch gradient descent (fixed epoch
count, deterministic order), on sf0.1 documents. Features are
occurrence counts of str_hash60(token) % DIM (the engines' exact
hashing, replicated here via hashlib md5). Labels distill the
registered heuristic: quality_score(text) >= 0.6. Weights are
quantized to integers at scale 2^16 — scoring in the engines is pure
64-bit integer arithmetic (sum of per-token weights + bias), so the
census needs no float policy at all.

    python tools/train_quality_clf.py [sf_dir]

Writes scio_db_spark/resources/quality_clf.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

_OUT = os.path.join(
    _REPO_ROOT, "scio_db_spark", "resources", "quality_clf.json"
)

DIM = 512
SCALE = 1 << 16
LABEL_THRESHOLD = 0.6
EPOCHS = 400
LR = 2.0
L2 = 1e-4


def _hash_idx(token: str) -> int:
    h = int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16)
    return h % DIM


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import duckdb

    from scio_db_spark.functions.text import quality_score_sql, tokens_sql

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rows = con.sql(
        f"SELECT doc_id, {tokens_sql('text')} AS toks, "
        f"CASE WHEN {quality_score_sql('text')} >= {LABEL_THRESHOLD} "
        f"THEN 1 ELSE 0 END AS y "
        f"FROM documents ORDER BY doc_id"
    ).fetchall()

    n = len(rows)
    X = np.zeros((n, DIM), dtype=np.float64)
    y = np.zeros(n, dtype=np.float64)
    for r, (_doc_id, toks, label) in enumerate(rows):
        y[r] = label
        for t in toks:
            X[r, _hash_idx(t)] += 1.0
    # per-feature scaling keeps GD conditioning sane; folded back into
    # the integer weights afterwards so the ENGINES see raw counts
    col_scale = np.maximum(X.std(axis=0), 1e-9)
    Xs = X / col_scale

    w = np.zeros(DIM)
    b = 0.0
    for _ in range(EPOCHS):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * ((Xs.T @ g) / n + L2 * w)
        b -= LR * g.mean()

    w_raw = w / col_scale  # undo scaling: engines score raw counts
    w_int = np.round(w_raw * SCALE).astype(np.int64)
    b_int = int(round(b * SCALE))

    score = X @ w_int + b_int
    pred = (score >= 0).astype(int)
    acc = float((pred == y).mean())
    pos = float(y.mean())

    doc = {
        "dim": DIM,
        "scale": SCALE,
        "bias": b_int,
        "weights": [int(v) for v in w_int],
        "train": {
            "sf_dir": sf_dir,
            "n_docs": n,
            "label": f"quality_score >= {LABEL_THRESHOLD}",
            "epochs": EPOCHS,
            "lr": LR,
            "l2": L2,
            "positive_rate": round(pos, 4),
            "train_accuracy_int_weights": round(acc, 4),
        },
    }
    with open(_OUT, "w") as f:
        json.dump(doc, f)
    print(
        f"trained on {n} docs, positive_rate={pos:.3f}, "
        f"int-weight train accuracy={acc:.4f} -> {_OUT}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
