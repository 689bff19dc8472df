"""Kafka wire-shape contract tests (S1/K3/K7 — no broker required).

Pin the (key, value) wire schema the serializers emit and the
reader/writer option dictionaries the facades pass to the Kafka
connector, so the queue legs can't silently drift while the connector
jar is cluster-provided (PubSubConsumer.scala:38-52,
PubSubProducer.scala:51-57, AvroUtils.scala:19-62).
"""

from __future__ import annotations

import json

from scio_db_spark.sinks.queue import (
    queue_writer_options,
    serialize_avro,
    serialize_json,
)
from scio_db_spark.sources.readers import queue_reader_options


def test_reader_options_contract():
    opts = queue_reader_options(
        "bers", "broker:9092", starting_offsets="earliest",
        max_offsets_per_trigger=50_000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "bers",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "50000",
    }
    # throttle knob absent unless requested (W11 default-off)
    assert "maxOffsetsPerTrigger" not in queue_reader_options(
        "bers", "broker:9092"
    )


def test_writer_options_contract():
    assert queue_writer_options("out", "b:9092", "/ckpt") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out",
        "checkpointLocation": "/ckpt",
    }
    assert "checkpointLocation" not in queue_writer_options("out", "b:9092")


def test_json_wire_shape(spark):
    """P11: key is a string column, value is the full row as JSON."""
    df = spark.createDataFrame(
        [(7, "n1", 1.5)], "id long, name string, v double"
    )
    wire = serialize_json(df, key_col="id")
    assert [(f.name, f.dataType.simpleString()) for f in wire.schema.fields] \
        == [("key", "string"), ("value", "string")]
    row = wire.first()
    assert row.key == "7"
    assert json.loads(row.value) == {"id": 7, "name": "n1", "v": 1.5}
    # keyless form drops the key column entirely
    assert serialize_json(df).columns == ["value"]


def test_avro_wire_shape(spark):
    """P12: key string, value binary — a decodable Avro body whose
    writer schema is derived from the DataFrame schema."""
    from scio_db_spark.functions.avroio import avro_schema_of, decode_record

    df = spark.createDataFrame(
        [(7, "n1", 1.5)], "id long, name string, v double"
    )
    wire = serialize_avro(df, key_col="id")
    assert [(f.name, f.dataType.simpleString()) for f in wire.schema.fields] \
        == [("key", "string"), ("value", "binary")]
    row = wire.first()
    rec = decode_record(avro_schema_of(df.schema), bytes(row.value))
    assert rec == {"id": 7, "name": "n1", "v": 1.5}
    assert serialize_avro(df).columns == ["value"]


def test_full_queue_dag_builds_without_broker(spark, tmp_path):
    """K3/S1 wiring, end-to-end to one call short of ``.start()``: a
    Kafka-shaped source (key/value binary + topic/partition/offset
    metadata — the exact schema format('kafka') produces) feeds
    deserialize → transform → serialize → build_stream_queue_writer.
    Every stage's column resolution is analysis-checked at build time,
    so schema or option drift in any stage fails this test with no
    broker and no connector jar. With the jar present the same
    pipeline starts for real; has_kafka_jar gates that leg."""
    from pyspark.sql import functions as F

    from scio_db_spark.functions.avroio import avro_schema_of
    from scio_db_spark.sinks.queue import (
        build_stream_queue_writer,
        deserialize_avro,
        serialize_avro,
    )
    from scio_db_spark.sources.readers import has_kafka_jar

    payload_schema = "id long, name string, score double"
    avsc = avro_schema_of(
        spark.createDataFrame([], payload_schema).schema
    )

    # Kafka output schema stand-in over the rate source
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", "1"
    ).load()
    kafka_shaped = rate.select(
        F.col("value").cast("string").cast("binary").alias("key"),
        F.lit(None).cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("value").alias("offset"),
        F.col("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    assert kafka_shaped.isStreaming

    decoded = deserialize_avro(kafka_shaped, avsc).select(
        "key", "record.*"
    )
    transformed = decoded.withColumn(
        "name", F.upper(F.col("name"))
    )
    wire = serialize_avro(transformed, key_col="id")
    assert [f.name for f in wire.schema.fields] == ["key", "value"]
    assert wire.isStreaming

    writer = build_stream_queue_writer(
        wire,
        topic="events-out",
        bootstrap_servers="broker:9092",
        checkpoint=str(tmp_path / "ckpt"),
        trigger={"processingTime": "5 seconds"},
    )
    # the writer is fully configured; only .start() needs the jar
    assert writer is not None
    if has_kafka_jar(spark):
        q = writer.start()
        q.stop()


def test_kafka_facade_is_jar_gated(spark):
    """Without the connector jar, the Kafka read facade fails at plan
    resolution with the standard missing-data-source error — pinned so
    the facade can't silently fall back to something else."""
    import pytest as _pytest

    from scio_db_spark.sources.readers import (
        has_kafka_jar,
        read_stream_queue,
    )

    if has_kafka_jar(spark):
        _pytest.skip("connector jar present: facade resolves for real")
    with _pytest.raises(Exception, match="[Kk]afka"):
        read_stream_queue(spark, "events", "broker:9092")
