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
    Avro-encoded bytes. Uses the spark-avro jar's ``to_avro`` when
    present; otherwise an Arrow-batched stage running the pure-Python
    codec (functions/avroio.py) — identical wire bytes (Avro
    single-record binary body, no container framing), including NaN
    double payloads: the jar-less path reads values off the Arrow
    validity bitmap, so a Spark NULL encodes as the null branch and a
    genuine NaN encodes as an IEEE NaN double, same as the jar."""
    from scio_db_spark.sources.readers import has_avro_jar

    if has_avro_jar(df.sparkSession):
        from pyspark.sql.avro.functions import to_avro

        value = to_avro(F.struct(*df.columns)).alias("value")
        if key_col is None:
            return df.select(value)
        return df.select(
            F.col(key_col).cast("string").alias("key"), value
        )
    return _py_avro_encode(df, key_col)


def _py_avro_encode(df: DataFrame, key_col: str | None) -> DataFrame:
    """Jar-less wire encode: mapInArrow + RecordBatch.to_pylist, which
    yields None for Spark NULL and float('nan') for genuine NaN (the
    pandas route can't tell them apart)."""
    import pyarrow as pa

    from scio_db_spark.functions.avroio import (
        avro_schema_of,
        encode_record,
    )

    avsc = avro_schema_of(df.schema)
    cols = list(df.columns)

    if key_col is None:

        def enc(batches):
            for batch in batches:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(
                            [
                                encode_record(avsc, r)
                                for r in batch.to_pylist()
                            ],
                            type=pa.binary(),
                        )
                    ],
                    names=["value"],
                )

        return df.mapInArrow(enc, "value binary")

    # Key rendering must keep Spark's cast-to-string semantics, so the
    # cast happens as a Column op before the Arrow hop.
    keyed = df.withColumn("__key", F.col(key_col).cast("string"))

    def enc_keyed(batches):
        for batch in batches:
            keys = batch.column("__key").to_pylist()
            recs = batch.select(cols).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(keys, type=pa.string()),
                    pa.array(
                        [encode_record(avsc, r) for r in recs],
                        type=pa.binary(),
                    ),
                ],
                names=["key", "value"],
            )

    return keyed.mapInArrow(enc_keyed, "key string, value binary")


def deserialize_avro(
    df: DataFrame, avro_schema, value_col: str = "value"
) -> DataFrame:
    """Inverse of :func:`serialize_avro` for queue reads (S1): decode
    the binary ``value`` column into typed columns. ``avro_schema`` is
    the writer schema (JSON string or dict)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from scio_db_spark.functions.avroio import (
        decode_record,
        parse_schema,
        spark_schema_of,
    )

    schema = parse_schema(avro_schema)
    out_schema = spark_schema_of(schema)
    names = [f.name for f in out_schema.fields]

    def dec(vals):
        # Kafka reads routinely contain tombstones (value IS NULL) —
        # they decode to an all-null record, never a task crash.
        recs = [
            None if b is None else decode_record(schema, bytes(b))
            for b in vals
        ]
        return pd.DataFrame(
            {n: [r.get(n) if r is not None else None for r in recs]
             for n in names}
        )

    dec_udf = pandas_udf(dec, out_schema)
    other = [c for c in df.columns if c != value_col]
    return df.select(*other, dec_udf(F.col(value_col)).alias("record"))


def queue_writer_options(
    topic: str, bootstrap_servers: str, checkpoint: str | None = None
) -> dict[str, str]:
    """Kafka writer option contract, testable without a broker."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }
    if checkpoint is not None:
        opts["checkpointLocation"] = checkpoint
    return opts


def build_stream_queue_writer(
    wire_df: DataFrame,
    topic: str,
    bootstrap_servers: str,
    checkpoint: str,
    trigger: dict | None = None,
):
    """K3 writer construction, separated from ``.start()`` so the full
    readStream→serialize→writeStream DAG is buildable (and therefore
    analysis-checked: column resolution in every stage happens here)
    without a broker or the connector jar — only ``.start()`` needs
    those."""
    writer = wire_df.writeStream.format("kafka").options(
        **queue_writer_options(topic, bootstrap_servers, checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer


def write_stream_queue(
    wire_df: DataFrame,
    topic: str,
    bootstrap_servers: str,
    checkpoint: str,
    trigger: dict | None = None,
):
    """K3: streaming queue write. ``wire_df`` must already be in the
    (key?, value) wire shape (see the serializers above)."""
    return build_stream_queue_writer(
        wire_df, topic, bootstrap_servers, checkpoint, trigger
    ).start()


def write_batch_queue(
    wire_df: DataFrame, topic: str, bootstrap_servers: str
) -> None:
    """K3 batch form (the reference's PubSubProducer bulk publish)."""
    (
        wire_df.write.format("kafka")
        .options(**queue_writer_options(topic, bootstrap_servers))
        .save()
    )
