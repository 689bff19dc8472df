"""Train the committed vector-model literals (one-time, offline).

The driver's correctness gate needs BOTH engines to see the exact same
model: floats produced by a live ``kmeans_fit``/``pca_fit`` run depend
on partition-collect order (cross-partition double summation), so the
registered queries instead load centroids/components from a COMMITTED
JSON produced here once. Re-run only when the training recipe changes;
the output is deterministic enough for a one-shot artifact and the
literals — not this script — are what correctness depends on.

    python tools/train_vector_models.py [sf_dir]
    python tools/train_vector_models.py --sqrtn [sf_dir]   # add-only

``--sqrtn`` trains ONLY the √N-rule codebook (k=45 ≈ √2000 on the
sf0.1 embeddings, default sf_dir /root/testdata/sf0.1) and MERGES it
into the existing JSON under "kmeans_sf01_k45" — the committed
kmeans_k16/pca_2 literals are left byte-identical, so every
previously-green oracle row keeps its exact model.

Writes scio_db_spark/resources/vector_models.json with full-precision
(repr round-trip) floats:
  {"kmeans_k16": {"centroids": [[...]x16], "sf_dir": ..., "iters": N},
   "pca_2": {"mean": [...], "components": [[...], [...]],
             "explained_variance": [...]}}
"""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

_OUT = os.path.join(
    _REPO_ROOT, "scio_db_spark", "resources", "vector_models.json"
)


def main() -> int:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    from scio_db_spark.operators.kmeans import kmeans_fit
    from scio_db_spark.operators.pca import pca_fit
    from scio_db_spark.plans.catalog import table
    from scio_db_spark.session import SessionFactory

    spark = SessionFactory.create("train-vector-models")

    if "--sqrtn" in sys.argv:
        sf_dir = pos[0] if pos else "/root/testdata/sf0.1"
        emb = table(spark, sf_dir, "embeddings")
        n = emb.count()
        k = max(2, int(round(n ** 0.5)))
        km = kmeans_fit(
            emb, "embedding", k=k, id_col="vec_id", max_iters=5, tol=1e-9
        )
        with open(_OUT) as f:
            doc = json.load(f)
        doc["kmeans_sf01_k45"] = {
            "centroids": km.centroids,
            "sf_dir": sf_dir,
            "k": k,
            "n_rows": n,
            "iters": km.iterations,
            "converged": km.converged,
        }
        with open(_OUT, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"merged kmeans_sf01_k45: k={k} n={n} "
              f"iters={km.iterations} converged={km.converged}")
        return 0

    if "--pq" in sys.argv:
        # Product-quantization codebooks: m=8 subspaces of 8 dims,
        # k=16 EUCLIDEAN Lloyd centroids each (PQ quantizes residual
        # geometry, so L2 — not the spherical/cosine objective the
        # coarse codebooks use). Training is a one-shot offline
        # driver-side numpy loop over the 2000x8 subvector matrices —
        # tiny by construction; the committed literals are what the
        # registered queries (and correctness) depend on. Add-only:
        # existing literals stay byte-identical.
        import numpy as np

        sf_dir = pos[0] if pos else "/root/testdata/sf0.1"
        emb = table(spark, sf_dir, "embeddings")
        mat = np.array(
            [r["embedding"] for r in emb.select("embedding").collect()],
            dtype=np.float64,
        )
        m, sub_k, d_sub = 8, 16, mat.shape[1] // 8
        rng = np.random.default_rng(2024)
        books = []
        for s in range(m):
            x = mat[:, s * d_sub:(s + 1) * d_sub]
            cents = x[rng.choice(len(x), sub_k, replace=False)].copy()
            for _ in range(25):
                d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(2)
                assign = d2.argmin(1)
                new = np.array([
                    x[assign == c].mean(0) if (assign == c).any()
                    else cents[c]
                    for c in range(sub_k)
                ])
                if np.allclose(new, cents, rtol=0, atol=1e-12):
                    cents = new
                    break
                cents = new
            books.append([[float(v) for v in c] for c in cents])
        with open(_OUT) as f:
            doc = json.load(f)
        doc["pq_m8_k16"] = {
            "subspaces": books,
            "m": m,
            "k": sub_k,
            "d_sub": d_sub,
            "sf_dir": sf_dir,
            "n_rows": int(len(mat)),
        }
        with open(_OUT, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"merged pq_m8_k16: m={m} k={sub_k} d_sub={d_sub} "
              f"n={len(mat)}")
        return 0

    sf_dir = pos[0] if pos else "/root/testdata/sf0.01"
    emb = table(spark, sf_dir, "embeddings")

    km = kmeans_fit(
        emb, "embedding", k=16, id_col="vec_id", max_iters=5, tol=1e-9
    )
    pca = pca_fit(emb, "embedding", n_components=2)

    doc = {
        "kmeans_k16": {
            "centroids": km.centroids,
            "sf_dir": sf_dir,
            "iters": km.iterations,
            "converged": km.converged,
        },
        "pca_2": {
            "mean": pca.mean,
            "components": pca.components,
            "explained_variance": pca.explained_variance,
            "n_rows": pca.n_rows,
        },
    }
    with open(_OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {_OUT}: kmeans iters={km.iterations} "
          f"converged={km.converged}, pca ev={pca.explained_variance}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
