"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine top-k is the verified baseline; the LSH-bucketed
variant is the scale path: sign-random-projection buckets turn the
pairwise stage into an equi-join on the bucket id, so at 100 TB the
candidate set per query is |bucket| instead of |table|. All arithmetic
is code-generated element chains (see functions/vectors.py) so the
DuckDB oracle computes bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scio_db_spark.functions.vectors import (
    DUCK_AT,
    SPARK_AT,
    cosine_sql,
    dot_sql,
    lsh_bucket_sql,
    lsh_buckets_array_sql,
    norm_sql,
)
from scio_db_spark.plans.catalog import table
from scio_db_spark.plans.registry import register

_QUERY_IDS = (0, 1, 2, 3, 4)
_TOPK = 5


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    # spread_for_compute: consumers run 64-term dot/norm expression
    # chains per row (CPU-dense vs the scan); see catalog.table.
    return table(spark, sf, "embeddings", spread_for_compute=True)


# --------------------------------------------------------------------------
# Shared with libops' emb_ann_recall_census, which uses this exact
# top-k as the ANN-evaluation ground truth.
COSINE_TOPK_SQL = f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
        WHERE vec_id IN {_QUERY_IDS}
    ),
    scored AS (
        SELECT q.q_id, e.vec_id,
            {cosine_sql("q.q_emb", "e.embedding", DUCK_AT)} AS cos_sim
        FROM q JOIN embeddings e ON e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, cos_sim FROM (
        SELECT q_id, vec_id, cos_sim,
            row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn <= {_TOPK}
"""


@register(
    "emb_cosine_topk",
    oracle=COSINE_TOPK_SQL,
    headline=True,
    doc="Brute-force cosine ANN baseline: top-5 neighbors for 5 queries.",
)
def cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    q = e.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.expr(norm_sql("embedding", SPARK_AT)).alias("q_norm"),
    )
    # Norms are hoisted into per-ROW projections below the join, so the
    # per-PAIR expression is dot + one divide — computing both 64-term
    # norms (and their sqrts) inside the join tripled the pairwise work
    # (the round-4 1.3× regression). Values are bit-identical to the
    # oracle's per-pair form: dot/(nullif(q_norm*e_norm, 0)) is the same
    # expression tree, norm is deterministic per row, and Catalyst keeps
    # the Project below the join (it feeds join output attributes).
    e_n = e.select(
        "vec_id",
        "embedding",
        F.expr(norm_sql("embedding", SPARK_AT)).alias("e_norm"),
    )
    pair_cos = (
        f"({dot_sql('q_emb', 'embedding', SPARK_AT)}) / "
        f"nullif(q_norm * e_norm, 0.0)"
    )
    scored = (
        F.broadcast(q)
        .join(e_n, F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", F.expr(pair_cos).alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("q_id", "vec_id", "cos_sim")
    )


# --------------------------------------------------------------------------
@register(
    "emb_lsh_bucket_histogram",
    oracle=f"""
    SELECT {lsh_bucket_sql("embedding", DUCK_AT)} AS bucket, count(*) AS n
    FROM embeddings GROUP BY 1
    """,
    doc="Sign-random-projection LSH bucket assignment + histogram.",
)
def lsh_histogram(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    return (
        e.select(F.expr(lsh_bucket_sql("embedding", SPARK_AT)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
_LSH_TABLES = 8   # OR-amplification: independent hash tables unioned
_LSH_PLANES = 4   # planes per table (16 buckets each)


def _lsh_bands_sql() -> str:
    selects = [
        f"SELECT vec_id, embedding, {t} AS table_id, "
        f"{lsh_bucket_sql('embedding', DUCK_AT, _LSH_PLANES, plane_offset=t * _LSH_PLANES)} AS bucket "
        f"FROM embeddings"
        for t in range(_LSH_TABLES)
    ]
    return " UNION ALL ".join(selects)


@register(
    "emb_ann_lsh_topk",
    oracle=f"""
    WITH bands AS ({_lsh_bands_sql()}),
    q AS (SELECT vec_id AS q_id, embedding AS q_emb, table_id, bucket
          FROM bands WHERE vec_id IN {_QUERY_IDS}),
    cand AS (
        SELECT DISTINCT q.q_id, q.q_emb, e.vec_id, e.embedding
        FROM q JOIN bands e
          ON e.table_id = q.table_id AND e.bucket = q.bucket
         AND e.vec_id <> q.q_id
    ),
    scored AS (
        SELECT q_id, vec_id,
            {cosine_sql("q_emb", "embedding", DUCK_AT)} AS cos_sim
        FROM cand
    )
    SELECT q_id, vec_id, cos_sim FROM (
        SELECT q_id, vec_id, cos_sim,
            row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn <= {_TOPK}
    """,
    doc="Multi-table LSH ANN (OR-amplification): 8 independent "
    "sign-projection tables of 4 planes each; candidates = union of "
    "same-bucket vectors over tables (the MinHash-banding pattern), "
    "deduped, then exact cosine + per-query top-k. One table at 8 "
    "planes gave ~0 recall on 500 vectors (256 buckets ≈ empty); the "
    "banded form measures mean recall@5 ≈ 0.45-0.55 at ~50% candidate "
    "fraction on the synthetic NEAR-RANDOM embeddings — LSH's "
    "worst-case data (no cluster structure to hash; clustered real "
    "embeddings fare far better, and emb_ann_ivf_topk measures "
    "0.9-1.0 here). Table count tunes the recall/candidate tradeoff "
    "at any scale; recall floors pinned in tests/test_ann_recall.py.",
)
def ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    # ONE scan, ONE constant-size expression: all 8 bucket ids come
    # from lsh_buckets_array_sql's 3-D plane LITERAL (data, not
    # expression nodes), posexploded to (table_id, bucket). The
    # earlier 8-column + stack() form carried 2 048 unrolled terms —
    # seconds of driver codegen per consuming stage and a near-64KB
    # generated method; bucket ids are bit-identical (the fold vs
    # left-chain rationale in lsh_buckets_array_sql's docstring), so
    # the DuckDB oracle stays the unrolled lsh_bucket_sql twin. Bands
    # carry only ids, never the 64-dim arrays.
    e = _emb(spark, sf)
    bands = e.select(
        "vec_id",
        F.posexplode(
            F.expr(
                lsh_buckets_array_sql("embedding", _LSH_TABLES, _LSH_PLANES)
            )
        ).alias("table_id", "bucket"),
    )
    q_bands = bands.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_id"), "table_id", "bucket"
    )
    # Dedup candidates on (q_id, vec_id) BEFORE touching embeddings —
    # the distinct shuffles 16-byte id pairs, not vector payloads.
    cand = (
        F.broadcast(q_bands)
        .join(bands, on=["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    q_embs = e.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.expr(norm_sql("embedding", SPARK_AT)).alias("q_nrm"),
    )
    # Norms hoisted per row below the candidate join (cosine_topk
    # rewrite): per-candidate work is dot + one divide; values stay
    # bit-identical to the oracle's per-pair cosine_sql.
    e_n = e.select(
        "vec_id",
        "embedding",
        F.expr(norm_sql("embedding", SPARK_AT)).alias("e_nrm"),
    )
    pair_cos = F.expr(
        f"({dot_sql('q_emb', 'embedding', SPARK_AT)}) / "
        f"nullif(q_nrm * e_nrm, 0.0)"
    )
    scored = (
        cand.join(e_n, "vec_id")
        .join(F.broadcast(q_embs), "q_id")
        .select("q_id", "vec_id", pair_cos.alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("q_id", "vec_id", "cos_sim")
    )


# --------------------------------------------------------------------------
@register(
    "emb_norms",
    oracle=f"""
    SELECT vec_id, label, {norm_sql("embedding", DUCK_AT)} AS l2_norm,
        {dot_sql("embedding", "embedding", DUCK_AT)} AS sq_norm
    FROM embeddings
    """,
    doc="Per-vector L2 norms (vector scalar surface).",
)
def norms(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    return e.select(
        "vec_id",
        "label",
        F.expr(norm_sql("embedding", SPARK_AT)).alias("l2_norm"),
        F.expr(dot_sql("embedding", "embedding", SPARK_AT)).alias("sq_norm"),
    )


# --------------------------------------------------------------------------
_NEAR_DUP_TAU = 0.3  # synthetic embeddings are near-random; at this
# threshold ~1% of bucket-co-located pairs qualify, exercising the full path


@register(
    "emb_near_dup_pairs",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding,
            {lsh_bucket_sql("embedding", DUCK_AT)} AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, e.vec_id AS vec_b,
        {cosine_sql("a.embedding", "e.embedding", DUCK_AT)} AS cos_sim
    FROM b a JOIN b e
      ON a.bucket = e.bucket AND a.vec_id < e.vec_id
    WHERE {cosine_sql("a.embedding", "e.embedding", DUCK_AT)}
          >= {_NEAR_DUP_TAU}
    """,
    doc="Embedding-cosine near-duplicate pairs: LSH bucket equi-join "
    "prunes candidates, threshold keeps near-dups — the vector member "
    "of the dedup family (exact/MinHash/SimHash/Jaccard/cosine).",
)
def near_dup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Scale path: candidates come ONLY from the same LSH bucket (an
    equi-join on bucket id — never a cartesian product), then the exact
    cosine filters false positives. At 100 TB, recall is tuned by
    OR-ing multiple independent bucket tables (same pattern as the
    MinHash bands); one table suffices for the oracle check."""
    # Norm hoisted per ROW below the self-join (same rewrite as
    # cosine_topk): the per-PAIR expression is dot + one divide, not
    # dot + two 64-term norms + two sqrts. Values are bit-identical to
    # the oracle's per-pair cosine_sql — same expression tree, norm is
    # deterministic per row.
    b = _emb(spark, sf).select(
        "vec_id",
        "embedding",
        F.expr(lsh_bucket_sql("embedding", SPARK_AT)).alias("bucket"),
        F.expr(norm_sql("embedding", SPARK_AT)).alias("nrm"),
    )
    a = b.alias("a")
    e = b.alias("e")
    cos = F.expr(
        f"({dot_sql('a_emb', 'e_emb', SPARK_AT)}) / "
        f"nullif(a_nrm * e_nrm, 0.0)"
    )
    return (
        a.join(
            e,
            (F.col("a.bucket") == F.col("e.bucket"))
            & (F.col("a.vec_id") < F.col("e.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("e.vec_id").alias("vec_b"),
            F.col("a.embedding").alias("a_emb"),
            F.col("e.embedding").alias("e_emb"),
            F.col("a.nrm").alias("a_nrm"),
            F.col("e.nrm").alias("e_nrm"),
        )
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= _NEAR_DUP_TAU)
        .select("vec_a", "vec_b", "cos_sim")
    )


# --------------------------------------------------------------------------
_IVF_CELLS = 16   # coarse centroids (vec_id < 16, deterministic stand-in
#                   for a trained k-means codebook — the assignment and
#                   probe machinery is identical to real IVF)
_IVF_NPROBE = 2   # cells searched per query


def _ivf_assign_sql() -> str:
    """(vec_id, embedding, cid): every vector assigned to its max-dot
    centroid, ties broken by smallest centroid id."""
    return f"""
    SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.vec_id AS cid,
            row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY {dot_sql("e.embedding", "c.embedding", DUCK_AT)}
                         DESC, c.vec_id) AS rn
        FROM embeddings e JOIN embeddings c ON c.vec_id < {_IVF_CELLS}
    ) WHERE rn = 1
    """


_IVF_TOPK_SQL = f"""
    WITH assign AS ({_ivf_assign_sql()}),
    qprobe AS (
        SELECT q_id, q_emb, cid FROM (
            SELECT e.vec_id AS q_id, e.embedding AS q_emb,
                c.vec_id AS cid,
                row_number() OVER (
                    PARTITION BY e.vec_id
                    ORDER BY {dot_sql("e.embedding", "c.embedding", DUCK_AT)}
                             DESC, c.vec_id) AS rn
            FROM embeddings e JOIN embeddings c ON c.vec_id < {_IVF_CELLS}
            WHERE e.vec_id IN {_QUERY_IDS}
        ) WHERE rn <= {_IVF_NPROBE}
    ),
    scored AS (
        SELECT q.q_id, a.vec_id,
            {cosine_sql("q.q_emb", "a.embedding", DUCK_AT)} AS cos_sim
        FROM qprobe q JOIN assign a
          ON a.cid = q.cid AND a.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, cos_sim FROM (
        SELECT q_id, vec_id, cos_sim,
            row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn <= {_TOPK}
    """


@register(
    "emb_ann_ivf_topk",
    oracle=_IVF_TOPK_SQL,
    doc="IVF-style ANN: coarse-quantizer cell assignment (argmax dot, "
    "broadcast centroids), nprobe=2 cell probe per query, exact "
    "re-rank inside probed cells only.",
)
def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Scale path: the centroid table is tiny and broadcast; cell
    assignment is a map-side argmax (one pass over 100 TB, no shuffle
    of the embedding column beyond its own partition); the search joins
    queries only against their probed cells. Swapping the deterministic
    codebook for trained k-means centroids changes no plan shape."""
    e = _emb(spark, sf)
    cent = F.broadcast(
        e.filter(F.col("vec_id") < _IVF_CELLS).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
        )
    )
    dot = F.expr(dot_sql("embedding", "cemb", SPARK_AT))
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("dot"), F.asc("cid")
    )
    # Row norm hoisted once per vector and carried through the argmax
    # (cosine_topk rewrite) so the re-rank stage is dot + one divide.
    assign = (
        e.withColumn("e_nrm", F.expr(norm_sql("embedding", SPARK_AT)))
        .join(cent)
        .withColumn("dot", dot)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "e_nrm", "cid")
    )
    qprobe = (
        e.filter(F.col("vec_id").isin(*_QUERY_IDS))
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
        .join(cent)
        .withColumn("dot", F.expr(dot_sql("q_emb", "cemb", SPARK_AT)))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("dot"), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(
            "q_id",
            "q_emb",
            F.expr(norm_sql("q_emb", SPARK_AT)).alias("q_nrm"),
            "cid",
        )
    )
    pair_cos = F.expr(
        f"({dot_sql('q_emb', 'embedding', SPARK_AT)}) / "
        f"nullif(q_nrm * e_nrm, 0.0)"
    )
    scored = (
        F.broadcast(qprobe)
        .join(assign, on=["cid"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", pair_cos.alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("q_id", "vec_id", "cos_sim")
    )


# --------------------------------------------------------------------------
# Persisted IVF index lifecycle (round-11 item 4): at 100 TB the cell
# assignment is not a per-query subplan, it is a TABLE — built once at
# ingest, MERGE-upserted as new embeddings arrive, probed read-only by
# every query batch. The census below drives that whole lifecycle
# through the maintenance machinery (sinks/maintenance.py: atomic
# upsert + snapshot isolation) and is pinned against the SAME oracle
# as the inline emb_ann_ivf_topk: index build from half the corpus +
# MERGE of the other half must be indistinguishable from assigning
# everything in one shot.


def _ivf_centroids(e: DataFrame, cells: int = _IVF_CELLS) -> DataFrame:
    """The committed coarse codebook (vec_id < cells stand-in —
    swapping trained k-means centroids changes no plan shape). The
    census pins cells=_IVF_CELLS for oracle parity; the scaling bench
    uses a sqrt-n-shaped codebook, the lever that sets the probed
    fraction (nprobe x |queries| / cells)."""
    return F.broadcast(
        e.filter(F.col("vec_id") < cells).select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cemb"),
        )
    )


def ivf_index_rows(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Index rows ``(vec_id, embedding, e_nrm, cid)`` for an arbitrary
    embeddings frame: argmax against the broadcast codebook as a
    MAP-SIDE partial aggregate — ``max(struct(dot, -cid, ...))`` is
    lexicographic, so ties break to the smallest cid, and the
    rows×cells intermediate collapses to |V| rows inside each scan
    task. The window form this replaces SORTED rows×cells through an
    exchange: at 2M vectors × 256 cells that is a 512M-row sort, and
    the build measured 12× slower (the cost that made a sqrt-n
    codebook look unaffordable). Row norm precomputed once so probes
    pay dot + one divide."""
    dot = F.expr(dot_sql("embedding", "cemb", SPARK_AT))
    best = F.max(
        F.struct(
            F.col("dot").alias("d"),
            (-F.col("cid")).alias("nc"),
            F.col("cid").alias("cid"),
            F.col("embedding").alias("embedding"),
            F.col("e_nrm").alias("e_nrm"),
        )
    ).alias("m")
    return (
        e.withColumn("e_nrm", F.expr(norm_sql("embedding", SPARK_AT)))
        .join(cent)
        .withColumn("dot", dot)
        .groupBy("vec_id")
        .agg(best)
        .select(
            "vec_id",
            F.col("m.embedding").alias("embedding"),
            F.col("m.e_nrm").alias("e_nrm"),
            F.col("m.cid").alias("cid"),
        )
    )


def ivf_index_rows_fold(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Literal-codebook variant of :func:`ivf_index_rows` for LARGE
    codebooks (the sqrt-n regime a real deployment runs): the codebook
    is collected (bounded: cells × dim floats — the committed-centroid
    pattern) and embedded as an array LITERAL, and the argmax is one
    ``array_max(transform(...))`` fold per row — a tight codegen loop
    of cells×dim multiply-adds, zero joins, zero shuffles. The
    unrolled dot_sql chain this replaces put cells×dim expression
    NODES into the projection: at 256×64 the generated method left
    codegen and ran interpreted (~44 µs/row — builds measured 12×
    slow). Ties break to the smallest cid (max of (dot, -cid))."""
    rows = sorted(cent.collect(), key=lambda r: r.cid)
    cells = len(rows)
    cid_arr = "array(" + ", ".join(
        f"{int(r.cid)}L" for r in rows
    ) + ")"
    cents = "array(" + ", ".join(
        "array(" + ", ".join(f"{float(x)!r}D" for x in r.cemb) + ")"
        for r in rows
    ) + ")"
    dot = (
        f"aggregate(zip_with(embedding, element_at({cents}, c), "
        f"(x, s) -> s * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), "
        f"(a, t) -> a + t)"
    )
    best = (
        f"array_max(transform(sequence(1, {cells}), c -> "
        f"named_struct('d', {dot}, "
        f"'nc', -element_at({cid_arr}, c))))"
    )
    return (
        e.select(
            "vec_id",
            "embedding",
            F.expr(norm_sql("embedding", SPARK_AT)).alias("e_nrm"),
            F.expr(best).alias("m"),
        )
        .select(
            "vec_id",
            "embedding",
            "e_nrm",
            (-F.col("m.nc")).cast("long").alias("cid"),
        )
    )


def ivf_index_rows_np(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Arrow-batched numpy variant of :func:`ivf_index_rows` — the
    ingest kernel for LARGE codebooks at corpus scale. Spark's
    higher-order-function lambdas (the fold form) evaluate per
    ELEMENT outside whole-stage codegen (~1.6 ms/row measured at
    256×64); here each Arrow batch does ONE float64 matmul
    (batch × codebook.T) and an argmax, the BLAS shape this work
    actually is. Ties break to the smallest cid (np.argmax returns
    the first maximum; codebook rows sorted by cid). Map-only: the
    codebook broadcasts by closure, no joins, no shuffles."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    rows = sorted(cent.collect(), key=lambda r: r.cid)
    cids = np.array([int(r.cid) for r in rows], dtype=np.int64)
    book = np.array([list(r.cemb) for r in rows], dtype=np.float64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf["embedding"].values).astype(np.float64)
            dots = m @ book.T
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "embedding": pdf["embedding"].values,
                    "e_nrm": np.sqrt((m * m).sum(axis=1)),
                    "cid": cids[np.argmax(dots, axis=1)],
                }
            )

    return e.select("vec_id", "embedding").mapInPandas(
        fn, "vec_id long, embedding array<float>, e_nrm double, cid long"
    )


def ivf_probe_queries(
    e: DataFrame,
    cent: DataFrame,
    nprobe: int = _IVF_NPROBE,
    query_ids: tuple = _QUERY_IDS,
) -> DataFrame:
    """Query-side probe rows ``(q_id, q_emb, q_nrm, cid)`` — nprobe
    cells per query (query-time work, never stored in the index)."""
    return (
        e.filter(F.col("vec_id").isin(*query_ids))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
        .join(cent)
        .withColumn("dot", F.expr(dot_sql("q_emb", "cemb", SPARK_AT)))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("dot"), F.asc("cid")
                )
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select(
            "q_id",
            "q_emb",
            F.expr(norm_sql("q_emb", SPARK_AT)).alias("q_nrm"),
            "cid",
        )
    )


def ivf_probe(
    index_df: DataFrame, qprobe: DataFrame, prune_cells: bool = True
) -> DataFrame:
    """Probe-only search over a PERSISTED index frame: broadcast the
    query batch, equi-join on cid, exact cosine re-rank inside probed
    cells. Returns ``(q_id, vec_id, cos_sim)`` top-k.

    ``prune_cells`` collects the probed cid set first (bounded:
    <= |queries| x nprobe integers) and filters the index with an IN
    predicate BEFORE the join — a join key alone never reaches the
    parquet scan, so without this the probe reads the whole index
    (measured: 20.6 s vs whole-scan at x1000; the IN filter is what
    makes a probe read nprobe cells' row groups instead of the
    corpus, the actual IVF economics)."""
    if prune_cells:
        cids = [r.cid for r in qprobe.select("cid").distinct().collect()]
        index_df = index_df.filter(F.col("cid").isin(cids))
    pair_cos = F.expr(
        f"({dot_sql('q_emb', 'embedding', SPARK_AT)}) / "
        f"nullif(q_nrm * e_nrm, 0.0)"
    )
    scored = (
        F.broadcast(qprobe)
        .join(index_df, on=["cid"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", pair_cos.alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("q_id", "vec_id", "cos_sim")
    )


@register(
    "emb_ivf_index_lifecycle_census",
    effectful=True,  # builds + MERGEs + probes an on-disk index table
    oracle=_IVF_TOPK_SQL,
    doc="Persisted ANN index lifecycle, end-to-end: build the IVF "
    "cell-assignment TABLE from half the corpus (cid-clustered "
    "parquet + published snapshot), MERGE-upsert the other half "
    "through sinks/maintenance.py::upsert_keys (atomic, snapshot-"
    "isolated), then answer the standard query set PROBE-ONLY from "
    "the on-disk snapshot. Pinned against the inline emb_ann_ivf_topk "
    "oracle: the incremental build must be bit-indistinguishable from "
    "assigning the full corpus in one shot. The 100 TB story: "
    "assignment cost is paid at ingest (once per vector, amortized "
    "over every query batch), probes read nprobe cells, and index "
    "freshness is a MERGE, not a rebuild.",
)
def ivf_index_lifecycle_census(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from scio_db_spark.sinks.maintenance import (
        publish_snapshot,
        read_snapshot,
        upsert_keys,
    )

    e = _emb(spark, sf)
    cent = _ivf_centroids(e)
    tmp = tempfile.mkdtemp(prefix="scio_ivf_index_")
    try:
        # ingest-time build: first half of the corpus, clustered by
        # cid so probe filters prune row groups on disk
        ivf_index_rows(e.filter(F.col("vec_id") % 2 == 0), cent).repartition(
            4, "cid"
        ).sortWithinPartitions("cid").write.mode("overwrite").parquet(tmp)
        publish_snapshot(tmp)
        # freshness: the second half arrives later — MERGE, no rebuild
        upsert_keys(
            spark,
            tmp,
            "vec_id",
            ivf_index_rows(e.filter(F.col("vec_id") % 2 == 1), cent),
        )
        out = ivf_probe(
            read_snapshot(spark, tmp), ivf_probe_queries(e, cent)
        )
        # materialize BEFORE the finally-cleanup: the caller collects
        # after the temp index dir is gone
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
_KMEANS_K = 8


@register(
    "emb_kmeans_assign",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
        WHERE vec_id < {_KMEANS_K}
    ),
    scored AS (
        SELECT e.vec_id, cent.c_id,
            {cosine_sql("e.embedding", "cent.c_emb", DUCK_AT)} AS cos_sim
        FROM embeddings e, cent
    ),
    best AS (
        SELECT vec_id, c_id, cos_sim FROM (
            SELECT vec_id, c_id, cos_sim,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cos_sim DESC, c_id) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT c_id AS centroid, count(*) AS n_assigned,
        min(cos_sim) AS min_sim, max(cos_sim) AS max_sim
    FROM best GROUP BY c_id
    """,
    doc="K-means assignment step (one Lloyd half-iteration): every "
    "vector scored against k=8 fixed seed centroids, argmax cosine "
    "with a deterministic centroid tiebreak, per-centroid census. "
    "The centroid side is k rows — constant, not SF-scaling — so at "
    "100 TB it broadcasts and the whole step is one map-side pass "
    "plus one k-row aggregate; min/max (order-insensitive) avoid any "
    "float-summation ordering hazard.",
)
def kmeans_assign(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    cent = (
        e.filter(F.col("vec_id") < _KMEANS_K)
        .select(
            F.col("vec_id").alias("c_id"),
            F.col("embedding").alias("c_emb"),
            F.expr(norm_sql("embedding", SPARK_AT)).alias("c_nrm"),
        )
    )
    # Row norm once per vector, centroid norm once per centroid: the
    # k-way expansion evaluates dot + one divide per candidate. Same
    # expression tree as the oracle's cosine_sql → min/max outputs
    # stay bit-identical.
    pair_cos = F.expr(
        f"({dot_sql('embedding', 'c_emb', SPARK_AT)}) / "
        f"nullif(e_nrm * c_nrm, 0.0)"
    )
    scored = (
        e.withColumn("e_nrm", F.expr(norm_sql("embedding", SPARK_AT)))
        .crossJoin(F.broadcast(cent))
        .select("vec_id", "c_id", pair_cos.alias("cos_sim"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return best.groupBy(F.col("c_id").alias("centroid")).agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.min("cos_sim").alias("min_sim"),
        F.max("cos_sim").alias("max_sim"),
    )


# --------------------------------------------------------------------------
_SEMDEDUP_TAU = 0.3  # same threshold as emb_near_dup_pairs: the
#                      synthetic embeddings are near-random, so ~1% of
#                      cluster-co-located pairs qualify


@register(
    "emb_semantic_dedup",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings
        WHERE vec_id < {_KMEANS_K}
    ),
    assign AS (
        SELECT vec_id, embedding, c_id FROM (
            SELECT e.vec_id, e.embedding, cent.c_id,
                row_number() OVER (
                    PARTITION BY e.vec_id
                    ORDER BY {cosine_sql("e.embedding", "cent.c_emb", DUCK_AT)}
                             DESC, cent.c_id) AS rn
            FROM embeddings e, cent
        ) WHERE rn = 1
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.c_id AS cluster,
        {cosine_sql("a.embedding", "b.embedding", DUCK_AT)} AS cos_sim
    FROM assign a JOIN assign b
      ON a.c_id = b.c_id AND a.vec_id < b.vec_id
    WHERE {cosine_sql("a.embedding", "b.embedding", DUCK_AT)}
          >= {_SEMDEDUP_TAU}
    """,
    doc="SemDeDup-style semantic near-duplicate pairs: k-means cell "
    "assignment (argmax cosine against k broadcast centroids, "
    "deterministic tiebreak) prunes the pairwise stage to an "
    "equi-join on the cluster id — the semantic sibling of the LSH "
    "bucket prune in emb_near_dup_pairs. At 100 TB the cluster count "
    "scales with data (k ~ sqrt(N)) so per-cell candidate sets stay "
    "bounded; the assignment itself is one map-side pass.",
)
def semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # Norms hoisted per row / per centroid (cosine_topk rewrite): the
    # k-way assignment expansion and the within-cell pairwise stage
    # each evaluate dot + one divide instead of recomputing two 64-term
    # norms per candidate. dot/nullif(nl*nr, 0) is the oracle's exact
    # expression tree, so values — and therefore the argmax ordering —
    # stay bit-identical.
    e = _emb(spark, sf).select(
        "vec_id",
        "embedding",
        F.expr(norm_sql("embedding", SPARK_AT)).alias("nrm"),
    )
    cent = e.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("c_id")
    )
    assign_cos = F.expr(
        f"({dot_sql('embedding', 'c_emb', SPARK_AT)}) / "
        f"nullif(nrm * c_nrm, 0.0)"
    )
    assign = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "embedding", "nrm", "c_id", assign_cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "nrm", "c_id")
    )
    a = assign.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
        F.col("c_id").alias("cluster"),
    )
    b = assign.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
        F.col("c_id").alias("b_cid"),
    )
    cos = F.expr(
        f"({dot_sql('a_emb', 'b_emb', SPARK_AT)}) / "
        f"nullif(a_nrm * b_nrm, 0.0)"
    )
    return (
        a.join(
            b,
            (F.col("cluster") == F.col("b_cid"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= _SEMDEDUP_TAU)
        .select("vec_a", "vec_b", "cluster", "cos_sim")
    )


# --------------------------------------------------------------------------
_HARDNEG_CAP = 0.9


@register(
    "emb_hard_negatives_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
        WHERE vec_id IN {_QUERY_IDS}
    ),
    scored AS (
        SELECT q.q_id, e.vec_id,
            {cosine_sql("q.q_emb", "e.embedding", DUCK_AT)} AS cos_sim
        FROM q JOIN embeddings e ON e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, cos_sim FROM (
        SELECT q_id, vec_id, cos_sim,
            row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored WHERE cos_sim < {_HARDNEG_CAP}
    ) WHERE rn <= {_TOPK}
    """,
    doc="Hard-negative mining for contrastive training: per query, "
    "the top-k MOST similar candidates that are still BELOW the "
    "positive/near-dup ceiling (cos < 0.9) — the 'hard' band that "
    "drives embedding-model training signal, excluding near-"
    "duplicates that would be false negatives. Same broadcast + "
    "hoisted-norm pair scoring as emb_cosine_topk with the ceiling "
    "pushed below the ranking window; at corpus scale the scoring "
    "side swaps in the IVF probe (emb_ivfpq_* path) unchanged.",
)
def hard_negatives_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    q = e.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.expr(norm_sql("embedding", SPARK_AT)).alias("q_norm"),
    )
    e_n = e.select(
        "vec_id",
        "embedding",
        F.expr(norm_sql("embedding", SPARK_AT)).alias("e_norm"),
    )
    pair_cos = (
        f"({dot_sql('q_emb', 'embedding', SPARK_AT)}) / "
        f"nullif(q_norm * e_norm, 0.0)"
    )
    scored = (
        F.broadcast(q)
        .join(e_n, F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", F.expr(pair_cos).alias("cos_sim"))
        .filter(F.col("cos_sim") < _HARDNEG_CAP)
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("q_id", "vec_id", "cos_sim")
    )


# --------------------------------------------------------------------------
_KNN_K = 10
_KNN_QUERIES = 20  # vec_id < 20 are the evaluation queries


@register(
    "emb_knn_label_census",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_emb, label AS true_label
        FROM embeddings WHERE vec_id < {_KNN_QUERIES}
    ),
    scored AS (
        SELECT q.q_id, q.true_label, e.label,
            row_number() OVER (PARTITION BY q.q_id ORDER BY
                {cosine_sql("q.q_emb", "e.embedding", DUCK_AT)} DESC,
                e.vec_id) AS rn
        FROM q JOIN embeddings e ON e.vec_id <> q.q_id
    ),
    votes AS (
        SELECT q_id, true_label, label,
            CAST(count(*) AS BIGINT) AS n_votes
        FROM scored WHERE rn <= {_KNN_K}
        GROUP BY q_id, true_label, label
    ),
    winner AS (
        SELECT q_id, true_label, label AS knn_label, n_votes FROM (
            SELECT q_id, true_label, label, n_votes,
                row_number() OVER (PARTITION BY q_id
                    ORDER BY n_votes DESC, label) AS r
            FROM votes
        ) WHERE r = 1
    )
    SELECT q_id, true_label, knn_label, n_votes,
        CASE WHEN true_label = knn_label THEN 1 ELSE 0 END AS correct
    FROM winner ORDER BY q_id
    """,
    doc="kNN label-vote census: classify each of the first "
    f"{_KNN_QUERIES} vectors by the majority label of its {_KNN_K} "
    "nearest cosine neighbors (ties -> smallest label), next to its "
    "true label — the evaluation loop behind embedding-quality "
    "tracking (does neighborhood structure predict labels?). Same "
    "hoisted-norm broadcast scoring as emb_cosine_topk (bit-identical "
    "doubles in both engines), majority vote as an integer count "
    "window — at corpus scale the scoring side swaps in the IVF "
    "probe unchanged.",
)
def knn_label_census(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    q = e.filter(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("true_label"),
        F.expr(norm_sql("embedding", SPARK_AT)).alias("q_norm"),
    )
    e_n = e.select(
        "vec_id",
        "label",
        "embedding",
        F.expr(norm_sql("embedding", SPARK_AT)).alias("e_norm"),
    )
    pair_cos = (
        f"({dot_sql('q_emb', 'embedding', SPARK_AT)}) / "
        f"nullif(q_norm * e_norm, 0.0)"
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.col("vec_id")
    )
    scored = (
        F.broadcast(q)
        .join(e_n, F.col("vec_id") != F.col("q_id"))
        .withColumn("cos_sim", F.expr(pair_cos))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _KNN_K)
    )
    votes = scored.groupBy("q_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    w_win = Window.partitionBy("q_id").orderBy(
        F.desc("n_votes"), F.col("label")
    )
    return (
        votes.withColumn("r", F.row_number().over(w_win))
        .filter(F.col("r") == 1)
        .select(
            "q_id",
            "true_label",
            F.col("label").alias("knn_label"),
            "n_votes",
            F.when(F.col("true_label") == F.col("label"), 1)
            .otherwise(0)
            .alias("correct"),
        )
        .orderBy("q_id")
    )


# --------------------------------------------------------------------------
# Matryoshka (prefix-dim) retrieval: MRL-style embeddings are trained
# so a PREFIX of the vector is itself a usable embedding — retrieval
# then runs at a fraction of the dot-product (and index-memory) cost.
# The census measures exactly what that trade buys on THIS corpus:
# top-k overlap and top-1 agreement between full-dim and prefix-dim
# cosine rankings. At 100 TB the prefix ranking is the candidate
# generator (half the FLOPs and half the bytes through every join)
# and the full ranking reranks survivors — the same two-phase economics
# as IVF probe + rerank, but bought with column pruning alone: the
# scan reads HALF the embedding column bytes when the prefix lives in
# its own parquet column.
_MRL_DIM = 8  # prefix length; full vectors are 16-d


def _mrl_topk_sql(cos_expr: str, tag: str) -> str:
    return f"""
    {tag} AS (
        SELECT q_id, vec_id FROM (
            SELECT q.q_id, e.vec_id,
                row_number() OVER (
                    PARTITION BY q.q_id
                    ORDER BY {cos_expr} DESC, e.vec_id
                ) AS rn
            FROM qv q JOIN embeddings e ON e.vec_id <> q.q_id
        ) WHERE rn <= {_TOPK}
    )"""


@register(
    "emb_matryoshka_recall_census",
    oracle=f"""
    WITH qv AS (
        SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
        WHERE vec_id IN {_QUERY_IDS}
    ),
    {_mrl_topk_sql(cosine_sql("q.q_emb", "e.embedding", DUCK_AT), "fullk")},
    {_mrl_topk_sql(
        cosine_sql("q.q_emb", "e.embedding", DUCK_AT, dim=_MRL_DIM),
        "prefk",
    )}
    SELECT f.q_id,
        CAST({_TOPK} AS BIGINT) AS k,
        CAST((SELECT count(*) FROM prefk p
              WHERE p.q_id = f.q_id
                AND p.vec_id IN (SELECT vec_id FROM fullk ff
                                 WHERE ff.q_id = f.q_id))
             AS BIGINT) AS n_overlap
    FROM (SELECT DISTINCT q_id FROM fullk) f
    ORDER BY f.q_id
    """,
    doc="Matryoshka prefix-retrieval census: top-5 overlap between "
    "full 16-d and prefix 8-d cosine rankings per query — the "
    "measured quality cost of running candidate generation on half "
    "the vector (half the FLOPs, half the scanned bytes when the "
    "prefix is its own parquet column; full-dim rerank restores the "
    "rest, the IVF-probe economics bought with column pruning alone). "
    "Both rankings share one broadcast pair scan with per-row hoisted "
    "norms; deterministic (cos DESC, vec_id) tie-break in both "
    "engines. At the gate SF the overlap is 0-1 of 5: the synthetic "
    "embeddings are NOT MRL-trained, and the census exposes exactly "
    "that — run it before you bet an index layout on prefix "
    "retrieval.",
)
def matryoshka_recall_census(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    q = e.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.expr(norm_sql("embedding", SPARK_AT)).alias("q_norm"),
        F.expr(norm_sql("embedding", SPARK_AT, dim=_MRL_DIM)).alias(
            "q_norm_p"
        ),
    )
    e_n = e.select(
        "vec_id",
        "embedding",
        F.expr(norm_sql("embedding", SPARK_AT)).alias("e_norm"),
        F.expr(norm_sql("embedding", SPARK_AT, dim=_MRL_DIM)).alias(
            "e_norm_p"
        ),
    )
    cos_full = (
        f"({dot_sql('q_emb', 'embedding', SPARK_AT)}) / "
        f"nullif(q_norm * e_norm, 0.0)"
    )
    cos_pref = (
        f"({dot_sql('q_emb', 'embedding', SPARK_AT, dim=_MRL_DIM)}) / "
        f"nullif(q_norm_p * e_norm_p, 0.0)"
    )
    scored = (
        F.broadcast(q)
        .join(e_n, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.expr(cos_full).alias("cf"),
            F.expr(cos_pref).alias("cp"),
        )
        .localCheckpoint(eager=False)  # two window consumers
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("cf"), F.asc("vec_id"))
    wp = Window.partitionBy("q_id").orderBy(F.desc("cp"), F.asc("vec_id"))
    fullk = (
        scored.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= _TOPK)
        .select("q_id", "vec_id")
    )
    prefk = (
        scored.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= _TOPK)
        .select("q_id", "vec_id")
    )
    overlap = fullk.join(prefk, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return (
        fullk.select("q_id")
        .distinct()
        .join(overlap, "q_id", "left")
        .select(
            "q_id",
            F.lit(_TOPK).cast("long").alias("k"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
        )
        .orderBy("q_id")
    )


# --------------------------------------------------------------------------
# Embedding drift census: the distribution monitor a pipeline runs
# when the encoder (or the corpus) changes — per-dimension mean shift
# between two snapshots (here: vec_id parity halves as the committed
# stand-in for yesterday/today). Components are quantized to micro
# units BEFORE summation (the repo's quantize-before-aggregate float
# policy: double summation order is engine- and partition-dependent;
# integer sums are exact), so every reported value is an exact BIGINT.
@register(
    "emb_dimension_drift_census",
    oracle="""
    WITH c AS (
        SELECT vec_id % 2 AS half,
            generate_subscripts(embedding, 1) - 1 AS dim,
            CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                 AS BIGINT) AS q
        FROM embeddings
    ),
    agg AS (
        SELECT dim,
            CAST(sum(CASE WHEN half = 0 THEN q END) AS BIGINT) AS s0,
            CAST(count(CASE WHEN half = 0 THEN 1 END) AS BIGINT) AS n0,
            CAST(sum(CASE WHEN half = 1 THEN q END) AS BIGINT) AS s1,
            CAST(count(CASE WHEN half = 1 THEN 1 END) AS BIGINT) AS n1
        FROM c GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim,
        s0 // n0 AS mean_a_micro,
        s1 // n1 AS mean_b_micro,
        s1 // n1 - s0 // n0 AS drift_micro
    FROM agg
    WHERE n0 > 0 AND n1 > 0
    ORDER BY dim
    """,
    doc="Per-dimension embedding drift between two corpus halves "
    "(vec_id parity = the snapshot stand-in): floor-quantized micro "
    "component means and their delta, exact integers end to end "
    "(quantize-before-sum policy — raw double sums are partition-"
    "order dependent). One posexplode + one 16-group aggregate; at "
    "100 TB the shuffle carries 2x16 partial sums per map partition, "
    "nothing else. Dimensions missing a parity half are EXCLUDED "
    "(n0 > 0 AND n1 > 0 in both twins): a degenerate snapshot where "
    "every vec_id shares one parity would otherwise floor-divide by "
    "zero — NULL in Spark's DIV, a loud error in DuckDB's // — an "
    "engine-divergent edge (round-9 ADVICE finding). The monitor "
    "that catches a silently re-normalized or re-trained encoder "
    "before ANN recall quietly degrades.",
)
def emb_dimension_drift_census(spark: SparkSession, sf: str) -> DataFrame:
    e = _emb(spark, sf)
    c = e.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "v"),
    ).select(
        "half",
        "dim",
        F.floor(F.col("v").cast("double") * 1_000_000)
        .cast("long")
        .alias("q"),
    )
    agg = c.groupBy("dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("q"))).alias("s0"),
        F.count(F.when(F.col("half") == 0, F.lit(1))).alias("n0"),
        F.sum(F.when(F.col("half") == 1, F.col("q"))).alias("s1"),
        F.count(F.when(F.col("half") == 1, F.lit(1))).alias("n1"),
    )
    return (
        agg.filter((F.col("n0") > 0) & (F.col("n1") > 0))
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.expr("s0 DIV n0").alias("mean_a_micro"),
            F.expr("s1 DIV n1").alias("mean_b_micro"),
            F.expr("s1 DIV n1 - s0 DIV n0").alias("drift_micro"),
        )
        .orderBy("dim")
    )
