"""Salted aggregation/join equivalence tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from scio_db_spark.operators.skew import salted_agg, salted_join_key


def _skewed(spark):
    # 90% of rows share one hot key.
    hot = [Row(k="hot", v=float(i)) for i in range(90)]
    rest = [Row(k=f"k{i}", v=float(i)) for i in range(10)]
    return spark.createDataFrame(hot + rest)


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r.k: (r.n, r.total, r.mn, r.mx, r.mean)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.avg("v").alias("mean"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.total, r.mn, r.mx, r.mean)
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": ("count", F.lit(1)),
                "total": ("sum", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
                "mean": ("avg", "v"),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [Row(k="hot", tag="H"), Row(k="k3", tag="T")]
    )
    plain = sorted(
        (r.k, r.v, r.tag)
        for r in left.join(right, "k").collect()
    )
    ls, rs, cols = salted_join_key(left, right, "k", n_salts=4)
    salted = sorted(
        (r.k, r.v, r.tag)
        for r in ls.join(rs, cols).select("k", "v", "tag").collect()
    )
    assert salted == plain


def test_salted_collect_list_matches_plain_as_multiset(spark):
    """collect_list is mergeable by concatenation; element ORDER is
    partition-dependent in the plain form already, so equality is by
    multiset per key."""
    from collections import Counter

    from pyspark.sql import functions as F

    df = _skewed(spark)
    plain = {
        r.k: Counter(r.vs)
        for r in df.groupBy("k")
        .agg(F.collect_list("v").alias("vs"))
        .collect()
    }
    salted = {
        r.k: Counter(r.vs)
        for r in salted_agg(
            df, ["k"], {"vs": ("collect_list", "v")}, n_salts=8
        ).collect()
    }
    assert salted == plain
