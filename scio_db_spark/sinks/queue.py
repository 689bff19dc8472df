"""Queue (Kafka) sink facades (SURVEY.md §2.2 K3/K7).

The reference writes Avro records to Pub/Sub
(``streaming/utils/pubsub/PubSubProducer.scala:51-57``); the Spark
ecosystem equivalent is the Kafka sink. These facades only declare the
plan — the Kafka connector jar must be on the cluster classpath to
start the query (not present in this environment, mirroring how the
Avro connector is cluster-provided).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def serialize_json(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Project to the Kafka wire shape (key, value) as JSON.

    P11 analogue (``avroToCleanJSON``, utils/core/AvroUtils.scala:19-38):
    the whole row becomes a JSON value; ``key_col`` becomes the
    partition key (ordering is per-key within a partition).
    """
    value = F.to_json(F.struct(*df.columns)).alias("value")
    if key_col is None:
        return df.select(value)
    return df.select(F.col(key_col).cast("string").alias("key"), value)


def serialize_avro(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """P12 analogue (``avroToBytes``, AvroUtils.scala:40-62): rows to
    Avro-encoded bytes via ``to_avro``. Requires the spark-avro
    connector jar (cluster-provided)."""
    from pyspark.sql.avro.functions import to_avro  # jar-gated import

    value = to_avro(F.struct(*df.columns)).alias("value")
    if key_col is None:
        return df.select(value)
    return df.select(F.col(key_col).cast("string").alias("key"), value)


def write_stream_queue(
    wire_df: DataFrame,
    topic: str,
    bootstrap_servers: str,
    checkpoint: str,
    trigger: dict | None = None,
):
    """K3: streaming queue write. ``wire_df`` must already be in the
    (key?, value) wire shape (see the serializers above)."""
    writer = (
        wire_df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def write_batch_queue(
    wire_df: DataFrame, topic: str, bootstrap_servers: str
) -> None:
    """K3 batch form (the reference's PubSubProducer bulk publish)."""
    (
        wire_df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
