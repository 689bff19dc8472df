"""Vector similarity primitives (embedding columns).

Dot products / norms are code-generated as explicit left-associated
term chains over 1-based element access so Spark and the DuckDB oracle
perform bit-identical double arithmetic (same operand order, same
casts). sqrt is IEEE-correctly-rounded in both engines, so cosine
values match exactly. The only engine difference is the accessor name:
Spark ``element_at``, DuckDB ``list_extract`` (both 1-based).

For the 100 TB path, brute-force cosine is the verified baseline; the
bucketed variant (random-hyperplane LSH, ``hyperplane_signs``) cuts the
candidate set so the pairwise stage only joins within buckets —
expressed as an equi-join on the bucket id, which Spark executes as a
hash join instead of a cartesian product.
"""

from __future__ import annotations

DIM = 64  # embedding dimensionality of the synthetic tables

SPARK_AT = "element_at"
DUCK_AT = "list_extract"


def _terms(left: str, right: str, dim: int, at: str) -> str:
    """Left-associated sum of per-element products."""
    return " + ".join(
        f"CAST({at}({left}, {i}) AS DOUBLE) * CAST({at}({right}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )


def dot_sql(left: str, right: str, at: str, dim: int = DIM) -> str:
    return "(" + _terms(left, right, dim, at) + ")"


def norm_sql(col: str, at: str, dim: int = DIM) -> str:
    return f"sqrt({dot_sql(col, col, at, dim)})"


def l2_sql(left: str, right: str, at: str, dim: int = DIM) -> str:
    """Squared L2 distance as a left-associated term chain — the same
    double in Spark and DuckDB (the dot_sql equivalence class), so
    re-rank scores can be hash-compared across engines."""
    terms = " + ".join(
        f"(CAST({at}({left}, {i}) AS DOUBLE) - "
        f"CAST({at}({right}, {i}) AS DOUBLE)) * "
        f"(CAST({at}({left}, {i}) AS DOUBLE) - "
        f"CAST({at}({right}, {i}) AS DOUBLE))"
        for i in range(1, dim + 1)
    )
    return "(" + terms + ")"


def cosine_sql(left: str, right: str, at: str, dim: int = DIM) -> str:
    # nullif guards the zero-norm case UNIFORMLY: Spark (non-ANSI)
    # returns NULL for x/0.0 while DuckDB IEEE division returns
    # Inf/NaN — a zero vector would break the bit-identical oracle
    # contract. With nullif both engines yield NULL. Values for
    # nonzero norms are unchanged.
    return (
        f"({dot_sql(left, right, at, dim)}) / "
        f"nullif({norm_sql(left, at, dim)} * {norm_sql(right, at, dim)}, 0.0)"
    )


def hyperplane_signs(n_planes: int, dim: int = DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplanes for sign-random-projection LSH."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            v = (i * 2_654_435_761 + j * 40_503 + 12_345) % 97
            row.append(1 if v % 2 == 0 else -1)
        planes.append(row)
    return planes


def lsh_bucket_sql(
    col: str,
    at: str,
    n_planes: int = 8,
    dim: int = DIM,
    plane_offset: int = 0,
) -> str:
    """Bucket id = Σ 2^j · [dot(v, r_j) > 0] — same fragment both engines.

    ``plane_offset`` selects a disjoint plane block, giving INDEPENDENT
    hash tables for OR-amplified multi-table LSH (recall grows with the
    number of tables while each table keeps its pruning power).
    """
    planes = hyperplane_signs(plane_offset + n_planes, dim)[plane_offset:]
    parts = []
    for j, signs in enumerate(planes):
        terms = " + ".join(
            f"({s}) * CAST({at}({col}, {i + 1}) AS DOUBLE)"
            for i, s in enumerate(signs)
        )
        parts.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def lsh_buckets_array_sql(
    col: str,
    n_tables: int,
    n_planes: int,
    dim: int = DIM,
) -> str:
    """Spark-only: ALL ``n_tables`` bucket ids as one array<int>
    expression — `lsh_bucket_sql` per table, re-shaped the
    `kmeans.topk_cells` way (SCALE.md round-5/6 note).

    The unrolled per-table chains put n_tables·n_planes·dim expression
    nodes into one projection (2 048 terms for the ANN query's 8×4×64)
    — seconds of driver-side codegen per consuming stage and a
    near-64KB generated method. Here the planes are a 3-D array
    LITERAL (data, not nodes): per table, each plane's signed dot is a
    fold over ``zip_with``, its sign gates the plane's power-of-two
    weight, and the weights sum with ``aggregate`` — bit-identical
    bucket ids (fold seed 0.0 is an IEEE identity vs the
    left-associated chain, ±1.0 weights are exact, comparisons are on
    identical doubles) at a constant-size expression tree. The DuckDB
    oracle keeps the unrolled `lsh_bucket_sql` form, so every query
    using this stays hash-pinned cross-engine.
    """
    signs = hyperplane_signs(n_tables * n_planes, dim)
    lit3d = "array(" + ", ".join(
        "array(" + ", ".join(
            "array(" + ", ".join(
                f"{float(s)!r}D" for s in signs[t * n_planes + j]
            ) + ")"
            for j in range(n_planes)
        ) + ")"
        for t in range(n_tables)
    ) + ")"
    weights = "array(" + ", ".join(
        str(1 << j) for j in range(n_planes)
    ) + ")"
    dot = (
        f"aggregate(zip_with({col}, p, (x, s) -> "
        f"s * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, t) -> a + t)"
    )
    return (
        f"transform({lit3d}, tbl -> aggregate("
        f"zip_with(tbl, {weights}, (p, w) -> "
        f"CASE WHEN {dot} > 0 THEN w ELSE 0 END), 0, (a, b) -> a + b))"
    )
