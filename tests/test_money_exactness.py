"""Exactness of the int64 cents/basis-point money path (q01/q11 hot
path) against Python's arbitrary-precision Decimal.

The engine's claim: for inputs on a 2-decimal grid, `round(x*100)`
recovers exact cents from the double, products/sums are exact int64,
and the final scaled division renders the exact decimal value. These
tests drive the actual Spark expressions over adversarial grids
(half-cent neighborhoods, maxima, zero discounts) and a seeded random
sweep, comparing to Decimal ground truth computed from the string
representation.
"""

from __future__ import annotations

import random
from decimal import Decimal

from pyspark.sql import functions as F

from scio_db_spark.plans.relational import _scaled_to_double
from scio_db_spark.plans.tpch_fill import _bp


def _grid_cases():
    # adversarial: values whose double representation sits just above
    # or below the grid point, plus range extremes
    cases = [
        ("0.01", "0.00"),
        ("0.01", "0.10"),
        ("999999.99", "0.99"),
        ("104995.50", "0.05"),
        ("0.10", "0.03"),
        ("123456.78", "0.07"),
    ]
    rng = random.Random(42)
    for _ in range(5000):
        price = Decimal(rng.randrange(1, 10_000_000)) / 100
        disc = Decimal(rng.randrange(0, 100)) / 100
        cases.append((str(price), str(disc)))
    return cases


def test_bp_product_is_exact_and_scaled_output_matches_decimal(spark):
    cases = _grid_cases()
    df = spark.createDataFrame(
        [(i, float(Decimal(p)), float(Decimal(d))) for i, (p, d) in enumerate(cases)],
        "i long, price double, disc double",
    )
    rows = (
        df.select(
            "i",
            _bp("price", "disc").alias("bp"),
        )
        .groupBy("i")
        .agg(F.sum("bp").alias("s"))
        .select("i", "s", _scaled_to_double(F.col("s"), 4).alias("v"))
        .collect()
    )
    by_i = {r.i: r for r in rows}
    for i, (p, d) in enumerate(cases):
        price, disc = Decimal(p), Decimal(d)
        expect_bp = int(price * 100) * (100 - int(disc * 100))
        r = by_i[i]
        assert r.s == expect_bp, (p, d, r.s, expect_bp)
        # the rendered double is the correctly-rounded double of the
        # exact 4-decimal quotient
        exact = Decimal(expect_bp) / Decimal(10_000)
        assert r.v == float(str(exact)), (p, d, r.v, str(exact))


def test_bp_sum_matches_decimal_aggregate(spark):
    """Aggregated over many rows per group, the int64 sum equals the
    Decimal sum exactly (no drift, no rounding ties)."""
    rng = random.Random(7)
    rows = []
    expect = {}
    for g in range(20):
        acc = 0
        for _ in range(500):
            price = Decimal(rng.randrange(1, 50_000_000)) / 100
            disc = Decimal(rng.randrange(0, 100)) / 100
            rows.append((g, float(price), float(disc)))
            acc += int(price * 100) * (100 - int(disc * 100))
        expect[g] = acc
    df = spark.createDataFrame(rows, "g long, price double, disc double")
    got = {
        r.g: r.s
        for r in df.select("g", _bp("price", "disc").alias("bp"))
        .groupBy("g")
        .agg(F.sum("bp").alias("s"))
        .collect()
    }
    assert got == expect
