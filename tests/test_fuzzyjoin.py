"""Deletion-neighborhood fuzzy join vs brute-force Levenshtein."""

from __future__ import annotations

from scio_db_spark.operators.fuzzyjoin import deletion_keys, edit1_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


WORDS = [
    "spark", "spank", "sparks", "park", "sprk", "spark",  # near-cluster
    "query", "querz", "queue",
    "table", "cable", "tble", "stable",
    "zzz", "zz", "z", "completely-different",
]


def test_edit1_pairs_match_bruteforce(spark):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "id long, s string"
    )
    got = {
        (r.id_a, r.id_b): r.dist for r in edit1_pairs(df, "id", "s").collect()
    }
    expect = {}
    for i, a in enumerate(WORDS):
        for j in range(i + 1, len(WORDS)):
            d = _lev(a, WORDS[j])
            if d <= 1:
                expect[(i, j)] = d
    assert got == expect
    # sanity: the construction actually found insert/delete/substitute
    # and exact-dup pairs
    dists = set(got.values())
    assert 0 in dists and 1 in dists
    assert len(got) >= 8


def test_deletion_keys_shape(spark):
    row = (
        spark.range(1)
        .select(deletion_keys(__import__("pyspark").sql.functions.lit("abc")).alias("k"))
        .first()
    )
    assert set(row.k) == {"abc", "bc", "ac", "ab"}


def test_plan_has_no_cross_product(spark):
    from scio_db_spark.plans.explain import plan_string

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "id long, s string"
    )
    plan = plan_string(edit1_pairs(df, "id", "s"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_edit1_pairs_random_sweep_matches_bruteforce(spark):
    """Seeded random corpus over a small alphabet (forces collisions):
    the deletion-neighborhood join must agree with brute force
    EXACTLY — both directions (no false pairs, no missed pairs)."""
    import random

    rng = random.Random(1234)
    words = [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
        for _ in range(150)
    ]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id long, s string"
    )
    got = {
        (r.id_a, r.id_b): r.dist
        for r in edit1_pairs(df, "id", "s").collect()
    }
    expect = {}
    for i, a in enumerate(words):
        for j in range(i + 1, len(words)):
            d = _lev(a, words[j])
            if d <= 1:
                expect[(i, j)] = d
    assert got == expect
    assert len(expect) > 100, "sweep too sparse to be meaningful"
