"""Mock BER generator (SURVEY.md §2.3 P10, §2.10 mock-data CLI).

The engine analogue of the reference's test-data tooling:
``utils/LocalAvroDump.scala:15-31`` (bounded dump),
``PubSubProducer.scala:22-49`` (``--mocks-number``/``--take-all``
publisher) and the jitter transforms
``MyEventRecordUtils.scala:27-53`` (random hex transactionId with
fixed prefixes so keys are distinct per run).

Everything is Column expressions over ``spark.range`` — generating
mock data at any scale is a map-only job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Prefix pool mirroring the reference's mock mutation constants.
MOCK_PREFIXES = ("mock", "loadtest", "smoke")


def _rand_hex(width: int) -> F.Column:
    """Random fixed-width lowercase hex string (P10's hex jitter)."""
    return F.lpad(
        F.conv(
            F.floor(F.rand() * F.lit(float(2**48))).cast("long"), 10, 16
        ),
        width,
        "0",
    )


def mock_bers(
    spark: SparkSession,
    n: int,
    distinct_keys: int | None = None,
    seed: int | None = None,
) -> DataFrame:
    """Generate ``n`` flat BERs (BER_FLAT_SCHEMA-compatible columns).

    ``distinct_keys`` caps key cardinality to force duplicates (the
    dedup stress shape); default every record unique. ``seed`` makes
    the output deterministic INCLUDING across machines/partitionings:
    seeded amounts derive from a hash of (id, seed), because
    ``F.rand(seed)`` is only per-partition deterministic and
    spark.range partition counts vary with the core count. The hex
    jitter stays random per run, matching the reference's mock
    mutation.
    """
    base = spark.range(n)
    rand = (
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(10_000))
        / 10_000.0
        if seed is not None
        else F.rand()
    )
    key_id = (
        (F.col("id") % distinct_keys) if distinct_keys else F.col("id")
    ).cast("string")
    prefix = F.element_at(
        F.array(*[F.lit(p) for p in MOCK_PREFIXES]),
        (F.col("id") % len(MOCK_PREFIXES) + 1).cast("int"),
    )
    return base.select(
        F.concat(F.lit("ev"), F.col("id").cast("string")).alias("event_id"),
        F.concat(prefix, F.lit("-"), key_id, F.lit("-"), _rand_hex(12)).alias(
            "transaction_id"
        ),
        (F.unix_millis(F.current_timestamp())).alias("nhub_timestamp"),
        key_id.alias("customer_id"),
        F.concat(F.lit("customer "), key_id).alias("customer_full_name"),
        F.concat(F.lit("n"), F.col("id").cast("string")).alias(
            "notification_id"
        ),
        F.lit("mock notification message").alias("message"),
        F.lit(None).cast("int").alias("retries"),
        F.lit(None).cast("boolean").alias("nhub_success"),
        (rand * 100.0).alias("amount"),
        F.lit(None).cast("string").alias("success_descr"),
        F.current_timestamp().alias("event_time"),
    )


def stable_mock_bers(
    spark: SparkSession, n: int, distinct_keys: int | None = None
) -> DataFrame:
    """Fully deterministic variant for tests/oracles: every column is a
    pure function of ``id`` (no jitter, no wall clock, no rand() —
    which is only per-partition-deterministic and shifts with
    parallelism)."""
    df = mock_bers(spark, n, distinct_keys)
    key_id = F.split(F.col("transaction_id"), "-").getItem(1)
    fixed_ts = F.lit("2024-01-01 00:00:00").cast("timestamp")
    return df.withColumns(
        {
            "transaction_id": F.concat(F.lit("tx-"), key_id),
            "nhub_timestamp": F.unix_millis(fixed_ts)
            + F.col("event_id").substr(F.lit(3), F.lit(18)).cast("long"),
            "event_time": fixed_ts,
            "amount": (
                F.col("event_id").substr(F.lit(3), F.lit(18)).cast("long")
                % 100
            ).cast("double"),
        }
    )
