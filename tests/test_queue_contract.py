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
