"""Runtime bloom-filter semi-join reduction: pin that Spark injects a
bloom filter from a selective dimension side into the fact scan of a
shuffle join — the 100 TB lever that prunes fact rows BEFORE the
shuffle (SCALE.md round-8 note). Local datasets sit far under the
production 10 GiB application-side threshold, so the test lowers the
thresholds to prove the mechanism; production inherits the defaults.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _with_confs(spark, pairs):
    old = {}
    for k, v in pairs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_for_selective_dim_join(spark, tmp_path):
    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    spark.range(500_000).select(
        (F.col("id") % 10_000).alias("k"), F.col("id").alias("payload")
    ).write.parquet(fact_p)
    spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("cat"),
    ).write.parquet(dim_p)

    old = _with_confs(
        spark,
        {
            # production thresholds are 10 MiB creation / 10 GiB scan;
            # shrink the scan threshold so the local fact qualifies,
            # and kill broadcast so the join is the shuffle join the
            # bloom path targets
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("cat") == 3)
        joined = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
        )
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), (
            "runtime bloom filter was not injected:\n" + plan[:2000]
        )
        # and it computes the right answer with the filter in place
        row = joined.collect()[0]
        # keys with cat==3: k % 7 == 3 -> 1429 of 10000 keys, 50
        # fact rows each
        expected_keys = sum(1 for k in range(10_000) if k % 7 == 3)
        assert row.n == expected_keys * 50
    finally:
        _restore(spark, old)


def test_bloom_filter_absent_when_disabled(spark, tmp_path):
    fact_p = str(tmp_path / "fact2")
    dim_p = str(tmp_path / "dim2")
    spark.range(100_000).select(
        (F.col("id") % 1_000).alias("k")
    ).write.parquet(fact_p)
    spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("cat")
    ).write.parquet(dim_p)
    old = _with_confs(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("cat") == 3)
        plan = (
            fact.join(dim, "k")
            .agg(F.count(F.lit(1)))
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "bloom" not in plan.lower()
    finally:
        _restore(spark, old)
