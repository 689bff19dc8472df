"""Avro end-to-end: pure-Python OCF codec, Spark read/write, wire
serialization, and the windowed ``<start>_<end>`` sink naming contract
(S1/S3/K1/K2/P12 — SinkUtils.scala:36-71, AvroUtils.scala:40-62).

No spark-avro jar and no Python avro library exist in this
environment, so every assertion here exercises the stdlib codec in
functions/avroio.py against the public Avro 1.11 spec.
"""

from __future__ import annotations

import glob
import io
import os
from datetime import datetime

import pytest

from scio_db_spark.functions import avroio as A

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"], "default": None},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {
            "name": "ts",
            "type": {"type": "long", "logicalType": "timestamp-micros"},
        },
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "meta", "type": {"type": "map", "values": "long"}},
        {"name": "blob", "type": "bytes"},
        {
            "name": "color",
            "type": {"type": "enum", "name": "c", "symbols": ["R", "G", "B"]},
        },
    ],
}

ROWS = [
    {
        "id": 1, "name": "a", "score": 1.5, "flag": True,
        "ts": datetime(2024, 1, 2, 3, 4, 5, 123456),
        "tags": ["x", "y"], "meta": {"k": 2}, "blob": b"\x00\x01",
        "color": "G",
    },
    {
        "id": 2, "name": None, "score": -2.25, "flag": False,
        "ts": datetime(1970, 1, 1),
        "tags": [], "meta": {}, "blob": b"", "color": "B",
    },
]


def _aware(row: dict) -> dict:
    """Expected decode form: the codec returns timestamps TZ-AWARE UTC
    (naive values are localized by the pandas serializer to the session
    zone — the silent-shift bug); naive inputs encode as UTC wall."""
    from datetime import timezone

    out = dict(row)
    if isinstance(out.get("ts"), datetime) and out["ts"].tzinfo is None:
        out["ts"] = out["ts"].replace(tzinfo=timezone.utc)
    return out


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_round_trip(codec):
    buf = io.BytesIO()
    w = A.ContainerWriter(buf, SCHEMA, codec=codec)
    w.write_rows(ROWS)
    w.close()
    schema, recs = A.read_container(buf.getvalue())
    assert recs == [_aware(r) for r in ROWS]
    assert schema["name"] == "t"


def test_wire_round_trip():
    body = A.encode_record(SCHEMA, ROWS[0])
    assert A.decode_record(SCHEMA, body) == _aware(ROWS[0])
    # zig-zag sanity pins the binary format, not just self-consistency:
    # long(1) == 0x02, long(-1) == 0x01, long(64) == 0x80 0x01 per spec
    enc = A.BinaryEncoder()
    enc.write_long(1)
    enc.write_long(-1)
    enc.write_long(64)
    assert enc.getvalue() == b"\x02\x01\x80\x01"


def test_reads_java_written_container():
    """Interop: a container produced by the Java Avro library (the
    reference repo's mock data) must decode — proves spec conformance
    against an independent implementation, not just round-tripping."""
    p = (
        "/root/reference/src/main/resources/mock/avro/"
        "null_nhub_debit_abuela-00000-of-00001.avro"
    )
    if not os.path.exists(p):
        pytest.skip("reference mock avro not present")
    with open(p, "rb") as fh:
        schema, recs = A.read_container(fh.read())
    assert schema["name"] == "MyEventRecord"
    assert len(recs) == 1
    assert {"Event", "Customer", "Notification"} <= set(recs[0])


def test_spark_write_read_round_trip(spark, sf_dir, tmp_path):
    """write_avro → read_avro over the events table (timestamps, longs,
    doubles, strings) must reproduce the original rows."""
    from scio_db_spark.plans.catalog import table
    from scio_db_spark.sources.readers import read_files

    ev = table(spark, sf_dir, "events").limit(500)
    out = str(tmp_path / "events_avro")
    written = A.write_avro(ev, out, codec="deflate")
    assert sum(n for _, n in written) == 500
    back = read_files(spark, out, fmt="avro")
    assert back.schema == ev.schema
    a = sorted(map(tuple, ev.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_windowed_avro_naming_contract(spark, tmp_path):
    """K1 Avro leg: every file is named <start>_<end>-p<NNNNN>.avro and
    holds only rows of its window (SinkUtils.scala:36-56)."""
    from scio_db_spark.sinks.files import write_windowed_batch

    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0, 10)),
            (2, datetime(2024, 1, 1, 0, 0, 20)),
            (3, datetime(2024, 1, 1, 0, 0, 40)),
        ],
        "id long, event_time timestamp",
    )
    out = str(tmp_path / "win")
    write_windowed_batch(df, out, window_duration="30 seconds", fmt="avro")
    files = sorted(glob.glob(os.path.join(out, "*.avro")))
    assert files, "no avro files written"
    names = [os.path.basename(f) for f in files]
    starts = {n.split("_", 1)[0] for n in names}
    assert any("2024-01-01T00-00-00" in n for n in names)
    assert any("2024-01-01T00-00-30" in n for n in names)
    total = 0
    for f in files:
        with open(f, "rb") as fh:
            _, recs = A.read_container(fh.read())
        total += len(recs)
        # rows inside a file belong to the window its name declares
        start = os.path.basename(f).split("_")[0]
        for r in recs:
            bucket = r["event_time"].strftime("%Y-%m-%dT%H-%M-")
            lo = (r["event_time"].second // 30) * 30
            assert f"{bucket}{lo:02d}" == start
    assert total == 3
    assert len(starts) == 2


def test_serialize_deserialize_avro_wire(spark):
    """P12 wire shape without the jar: (key, value-bytes) out,
    typed columns back."""
    from scio_db_spark.sinks.queue import deserialize_avro, serialize_avro

    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, None, -1.0)], "id long, name string, v double"
    )
    wire = serialize_avro(df, key_col="id")
    assert [f.name for f in wire.schema.fields] == ["key", "value"]
    assert wire.schema["value"].dataType.simpleString() == "binary"
    rows = wire.collect()
    assert sorted(r.key for r in rows) == ["1", "2"]

    avsc = A.avro_schema_of(df.schema)
    back = deserialize_avro(wire, avsc).select("record.*")
    got = sorted(map(tuple, back.collect()))
    assert got == sorted(map(tuple, df.collect()))


def test_sharded_avro_write(spark, tmp_path):
    """K2 Avro leg: num_shards controls the file count."""
    from scio_db_spark.sinks.files import write_sharded
    from scio_db_spark.sources.readers import read_files

    df = spark.range(1000).selectExpr("id", "id * 2 as v")
    out = str(tmp_path / "sharded")
    write_sharded(df, out, num_shards=4, fmt="avro")
    files = glob.glob(os.path.join(out, "*.avro"))
    assert len(files) == 4
    back = read_files(spark, out, fmt="avro")
    assert back.count() == 1000
    assert back.selectExpr("sum(v)").first()[0] == 999 * 1000


def test_nullable_union_order_matches_connector():
    """spark-avro's SchemaConverters emits [T, 'null'] (type first) —
    the union branch index is on the wire, so our schema generator
    must agree for jar/jar-less interop."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("a", T.LongType(), True),
        T.StructField("b", T.StringType(), False),
    ])
    avsc = A.avro_schema_of(schema)
    assert avsc["fields"][0]["type"] == ["long", "null"]
    assert avsc["fields"][1]["type"] == "string"
    # no default on a type-first union (null default would violate the
    # spec's first-branch rule)
    assert "default" not in avsc["fields"][0]
    # round-trip still works for null and non-null
    body = A.encode_record(avsc, {"a": 7, "b": "x"})
    assert A.decode_record(avsc, body) == {"a": 7, "b": "x"}
    body = A.encode_record(avsc, {"a": None, "b": "y"})
    assert A.decode_record(avsc, body) == {"a": None, "b": "y"}


def test_nested_struct_names_unique():
    from pyspark.sql import types as T

    inner = T.StructType([T.StructField("x", T.LongType(), False)])
    schema = T.StructType([
        T.StructField("s1", inner, False),
        T.StructField("s2", inner, False),
    ])
    avsc = A.avro_schema_of(schema)
    names = [f["type"]["name"] for f in avsc["fields"]]
    assert len(set(names)) == 2  # Avro forbids redefining a named type


def test_windowed_avro_epoch_tag_no_clobber(spark, tmp_path):
    """Two micro-batches of the SAME window must not truncate each
    other's shards — the epoch tag keys the filenames."""
    from scio_db_spark.sinks.files import write_windowed_batch

    out = str(tmp_path / "win")
    rows1 = [(1, datetime(2024, 1, 1, 0, 0, 5))]
    rows2 = [(2, datetime(2024, 1, 1, 0, 0, 25))]
    sch = "id long, event_time timestamp"
    write_windowed_batch(spark.createDataFrame(rows1, sch), out,
                         window_duration="30 seconds", fmt="avro",
                         epoch_id=0)
    write_windowed_batch(spark.createDataFrame(rows2, sch), out,
                         window_duration="30 seconds", fmt="avro",
                         epoch_id=1)
    total = 0
    for f in glob.glob(os.path.join(out, "*.avro")):
        with open(f, "rb") as fh:
            total += len(A.read_container(fh.read())[1])
    assert total == 2  # both epochs' rows survive


def test_sharded_avro_append_and_overwrite(spark, tmp_path):
    from scio_db_spark.sinks.files import write_sharded
    from scio_db_spark.sources.readers import read_files

    out = str(tmp_path / "sh")
    df = spark.range(10).selectExpr("id")
    write_sharded(df, out, num_shards=1, fmt="avro", mode="append")
    write_sharded(df, out, num_shards=1, fmt="avro", mode="append")
    assert read_files(spark, out, fmt="avro").count() == 20
    write_sharded(df, out, num_shards=1, fmt="avro", mode="overwrite")
    assert read_files(spark, out, fmt="avro").count() == 10


def test_read_avro_empty_dir_raises(spark, tmp_path):
    import pytest as _pytest

    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with _pytest.raises(FileNotFoundError, match="no .avro files"):
        A.read_avro(spark, empty)


def test_dead_letter_sink_streaming_avro(spark, tmp_path):
    """K5 through the real streaming path with fmt='avro': KO rows land
    under <base>/toxic/ as windowed, epoch-tagged container files."""
    from scio_db_spark.sinks.files import dead_letter_sink

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    sch = "id long, event_time timestamp"
    spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 5)),
         (2, datetime(2024, 1, 1, 0, 0, 45))], sch
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(sch).parquet(in_dir)
    q = dead_letter_sink(
        stream, str(tmp_path / "dead"), str(tmp_path / "ck"),
        ts_col="event_time", window_duration="30 seconds", fmt="avro",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    files = glob.glob(os.path.join(str(tmp_path / "dead"), "toxic", "*.avro"))
    assert files, "no dead-letter avro files"
    names = [os.path.basename(f) for f in files]
    assert all("-e" in n for n in names)  # epoch tag present
    rows = []
    for f in files:
        with open(f, "rb") as fh:
            rows += A.read_container(fh.read())[1]
    assert sorted(r["id"] for r in rows) == [1, 2]
    # two distinct 30s windows
    assert len({os.path.basename(f).split("-e")[0] for f in files}) == 2


def test_streaming_avro_source_picks_up_new_files(spark, tmp_path):
    """S1 Avro leg jar-less: binaryFile streaming + mapInPandas decode;
    a shard dropped mid-stream arrives in a later micro-batch."""
    from scio_db_spark.sources.readers import read_stream_avro

    d = str(tmp_path / "drop")
    os.makedirs(d)
    sch = {"type": "record", "name": "r",
           "fields": [{"name": "id", "type": "long"}]}

    def drop(name, ids):
        w = A.ContainerWriter(open(os.path.join(d, name), "wb"), sch)
        for i in ids:
            w.write({"id": i})
        w.close()
        w._fh.close()

    drop("a.avro", [1, 2])
    out = read_stream_avro(spark, d)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("avro_stream_tt")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        drop("b.avro", [3])
        q.processAllAvailable()
    finally:
        q.stop()
    got = [r.id for r in
           spark.sql("select * from avro_stream_tt order by id").collect()]
    assert got == [1, 2, 3]


def test_streaming_avro_source_empty_dir_needs_schema(spark, tmp_path):
    from scio_db_spark.sources.readers import read_stream_avro

    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError, match="avro_schema"):
        read_stream_avro(spark, empty)
    # explicit schema works on an initially-empty dir
    sch = {"type": "record", "name": "r",
           "fields": [{"name": "id", "type": "long"}]}
    df = read_stream_avro(spark, empty, avro_schema=sch)
    assert df.isStreaming and df.columns == ["id"]


def test_read_files_avro_honors_pinned_schema(spark, tmp_path):
    """A caller-pinned schema must be applied (column order + types) on
    the jar-less path, and reader options must fail loudly."""
    from scio_db_spark.sources.readers import read_files

    df = spark.range(3).selectExpr("id", "cast(id as double) as v")
    out = str(tmp_path / "s")
    A.write_avro(df, out)
    pinned = "v double, id int"  # reordered + narrowed
    back = read_files(spark, out, fmt="avro", schema=pinned)
    assert [(f.name, f.dataType.simpleString()) for f in back.schema.fields] \
        == [("v", "double"), ("id", "int")]
    assert back.count() == 3
    with pytest.raises(ValueError, match="no reader options"):
        read_files(spark, out, fmt="avro", mergeSchema="true")


def test_timestamp_micros_encode_exact():
    """int(ts.timestamp() * 1e6) truncates a float product and loses
    1us on ~8% of values — encoding must be exact integer arithmetic."""
    sch = {"type": "record", "name": "r", "fields": [
        {"name": "ts",
         "type": {"type": "long", "logicalType": "timestamp-micros"}}]}
    for us in (46662, 46661, 1, 999999):
        v = {"ts": datetime(2038, 5, 17, 0, 0, 0, us)}
        assert A.decode_record(sch, A.encode_record(sch, v)) == _aware(v)


def test_deserialize_avro_tombstones(spark):
    """Null Kafka values (tombstones) decode to an all-null record."""
    from scio_db_spark.sinks.queue import deserialize_avro, serialize_avro

    df = spark.createDataFrame([(1, "x")], "id long, name string")
    avsc = A.avro_schema_of(df.schema)
    wire = serialize_avro(df, key_col="id")
    with_tomb = wire.unionByName(
        spark.createDataFrame(
            [("9", None)], "key string, value binary"
        )
    )
    out = deserialize_avro(with_tomb, avsc).select("key", "record.*")
    rows = {r.key: (r.id, r.name) for r in out.collect()}
    assert rows["1"] == (1, "x")
    assert rows["9"] == (None, None)


def test_nan_double_survives_write_and_wire(spark, tmp_path):
    """NaN fidelity (round-3 ADVICE): a genuine NaN double payload and
    a Spark NULL are different values and must stay different through
    (a) the container write/read path and (b) the wire serializer —
    the same behavior the JVM connector jar has. The jar-less paths
    now read values off the Arrow validity bitmap (mapInArrow), so
    NULL encodes as the union's null branch and NaN as an IEEE NaN
    double."""
    import math

    df = spark.createDataFrame(
        [(1, 1.5), (2, None), (3, float("nan"))], "id long, score double"
    )
    # (a) container round-trip
    out = str(tmp_path / "nan")
    A.write_avro(df, out)
    back = {r.id: r.score for r in A.read_avro(spark, out).collect()}
    assert back[1] == 1.5
    assert back[2] is None
    assert back[3] is not None and math.isnan(back[3])

    # (b) wire bytes: decode each record with the stdlib codec
    from scio_db_spark.sinks.queue import serialize_avro

    avsc = A.avro_schema_of(df.schema)
    wire = {
        r.key: A.decode_record(avsc, bytes(r.value))
        for r in serialize_avro(df, key_col="id").collect()
    }
    assert wire["1"]["score"] == 1.5
    assert wire["2"]["score"] is None
    assert math.isnan(wire["3"]["score"])


def test_windowed_avro_null_ts_routes_to_deadletter(spark, tmp_path):
    """Rows with NULL event_time have no window: they must land in an
    explicit no-window dead-letter file (K5 contract), never in a
    malformed ''-named file that violates the <start>_<end> naming
    scheme (round-3 ADVICE)."""
    out = str(tmp_path / "win")
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0, 10)),
            (2, None),
        ],
        "id long, event_time timestamp",
    )
    report = A.write_windowed_avro(
        df, out, ts_col="event_time", window_duration="30 seconds"
    )
    names = sorted(os.path.basename(p) for p, _ in report)
    # no malformed ''-named shard
    assert not any(n.startswith("-p") for n in names)
    dead = [n for n in names if n.startswith("no-window")]
    windowed = [n for n in names if n.startswith("2024-01-01T00-00-00_")]
    assert len(dead) == 1 and len(windowed) == 1
    # the dead-letter shard holds exactly the null-ts row
    dead_path = [p for p, _ in report if "no-window" in p][0]
    with open(dead_path, "rb") as fh:
        _, recs = A.read_container(fh.read())
    assert [r["id"] for r in recs] == [2]


def test_sharded_avro_overwrite_is_staged(spark, tmp_path):
    """A failed overwrite must leave the previous shards untouched:
    the jar-less writer stages into a hidden temp subdirectory and
    only deletes/renames after the distributed job succeeds (round-3
    ADVICE — the old code deleted first and could destroy data on a
    mid-write failure)."""
    import pyarrow as pa
    import pytest as _pytest

    from scio_db_spark.sinks.files import write_sharded
    from scio_db_spark.sources.readers import read_files

    out = str(tmp_path / "atomic")
    good = spark.range(5).selectExpr("id")
    write_sharded(good, out, num_shards=1, fmt="avro", mode="overwrite")
    assert read_files(spark, out, fmt="avro").count() == 5

    def explode(batches):
        for batch in batches:
            raise RuntimeError("task failure mid-write")
            yield batch  # pragma: no cover

    bad = good.mapInArrow(explode, "id long")
    with _pytest.raises(Exception):
        write_sharded(bad, out, num_shards=1, fmt="avro", mode="overwrite")

    # previous data intact, no staging residue
    assert read_files(spark, out, fmt="avro").count() == 5
    assert not [d for d in os.listdir(out) if d.startswith("._staging-")]


def test_nullable_decimal_and_map_columns_write(spark, tmp_path):
    """Union branch probing must accept decimal.Decimal (DecimalType →
    string branch) and Arrow's list-of-tuples map representation —
    nullable columns of either type previously crashed every jar-less
    write with 'matches no branch'."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id"),
        F.when(F.col("id") > 0, F.col("id").cast("decimal(10,2)"))
        .alias("price"),  # nullable decimal with a real NULL
        F.when(
            F.col("id") > 0, F.create_map(F.lit("k"), F.col("id"))
        ).alias("attrs"),  # nullable map with a real NULL
    )
    out = str(tmp_path / "dec")
    report = A.write_avro(df, out)
    assert sum(r for _, r in report) == 3
    schema, recs = A.read_container(
        open(sorted(p for p, _ in report)[0], "rb").read()
    ) if len(report) == 1 else (None, None)
    back = A.read_avro(spark, out).orderBy("id").collect()
    assert [r.price for r in back] == [None, 1.00, 2.00] or [
        str(r.price) for r in back
    ] == ["None", "1.00", "2.00"]
    assert back[0].attrs is None and back[1].attrs == {"k": 1}


def test_decoded_timestamps_survive_non_utc_session(spark):
    """serialize → deserialize round-trip must preserve the instant
    under a non-UTC session timezone (naive decode output used to get
    localized to the session zone — a silent +offset shift)."""
    from pyspark.sql import Row, functions as F

    from scio_db_spark.functions.avroio import avro_schema_of
    from scio_db_spark.sinks.queue import deserialize_avro, serialize_avro

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame(
            [Row(ts=datetime(2023, 2, 21, 12, 0, 0), k="a")],
            "ts timestamp, k string",
        )
        avsc = avro_schema_of(df.schema)
        wire = serialize_avro(df)
        back = deserialize_avro(wire, avsc).select("record.ts").first()
        assert back.ts == datetime(2023, 2, 21, 12, 0, 0)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_read_avro_glob_of_directories(spark, tmp_path):
    """A glob whose matches are DIRECTORIES (e.g. /data/2024/*) must
    probe and read the .avro files inside them."""
    from pyspark.sql import functions as F

    for day in ("d1", "d2"):
        df = spark.range(2).select(
            F.col("id"), F.lit(day).alias("day")
        )
        A.write_avro(df, str(tmp_path / "root" / day))
    back = A.read_avro(spark, str(tmp_path / "root" / "*"))
    assert back.count() == 4
    assert {r.day for r in back.collect()} == {"d1", "d2"}


def test_windowed_avro_epoch_rerun_replaces_stale_shards(spark, tmp_path):
    """A replayed epoch must REPLACE its previous attempt's shards even
    when the replay lands windows on different partitions — the
    epoch-tag sweep removes stale files first."""
    import datetime as dt

    from pyspark.sql import Row

    out = str(tmp_path / "w")
    rows = [
        Row(k="a", event_time=dt.datetime(2024, 1, 1, 10, 0, 0)),
        Row(k="b", event_time=dt.datetime(2024, 1, 1, 10, 1, 0)),
    ]
    df1 = spark.createDataFrame(rows).repartition(4)
    A.write_windowed_avro(df1, out, ts_col="event_time",
                          window_duration="1 minute", file_tag="e7")
    # replay of the SAME epoch with different partitioning/content
    df2 = spark.createDataFrame(rows[:1]).coalesce(1)
    A.write_windowed_avro(df2, out, ts_col="event_time",
                          window_duration="1 minute", file_tag="e7")
    names = sorted(os.listdir(out))
    # only the replay's shards remain for e7 — the first attempt's
    # second window is gone
    recs = []
    for n in names:
        _, rs = A.read_container(open(os.path.join(out, n), "rb").read())
        recs.extend(rs)
    assert len(recs) == 1 and recs[0]["k"] == "a"


def test_windowed_avro_backfill_many_windows_bounded_fds(spark, tmp_path):
    """A 70-window backfill through ONE task must not hold 70 open
    files: past the cap shards rotate (sequence suffix), and read-back
    is complete."""
    import datetime as dt

    from pyspark.sql import Row

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(k=f"r{i}", event_time=base + dt.timedelta(minutes=i))
        for i in range(70)
    ]
    df = spark.createDataFrame(rows).coalesce(1)
    out = str(tmp_path / "bf")
    report = A.write_windowed_avro(
        df, out, ts_col="event_time", window_duration="1 minute"
    )
    assert sum(r for _, r in report) == 70
    got = []
    for n in os.listdir(out):
        _, rs = A.read_container(open(os.path.join(out, n), "rb").read())
        got.extend(rs)
    assert {r["k"] for r in got} == {f"r{i}" for i in range(70)}


class TestSchemaResolution:
    W = {
        "type": "record", "name": "E", "fields": [
            {"name": "id", "type": "int"},
            {"name": "gone", "type": "string"},
            {"name": "amt", "type": "float"},
            {"name": "tags", "type": {"type": "array", "items": "int"}},
        ],
    }
    R = {
        "type": "record", "name": "E", "fields": [
            {"name": "amt", "type": "double"},       # reordered + promoted
            {"name": "id", "type": "long"},          # promoted
            {"name": "added", "type": "string", "default": "x"},
            {"name": "tags", "type": {"type": "array", "items": "long"}},
        ],
    }

    def test_reorder_skip_default_promote(self):
        from scio_db_spark.functions.avroio import (
            decode_record_resolved,
            encode_record,
        )

        data = encode_record(
            self.W, {"id": 7, "gone": "bye", "amt": 2.5, "tags": [1, 2]}
        )
        got = decode_record_resolved(self.W, self.R, data)
        assert got == {
            "amt": 2.5, "id": 7, "added": "x", "tags": [1, 2]
        }
        assert isinstance(got["id"], int)
        assert isinstance(got["amt"], float)
        assert "gone" not in got

    def test_identity_resolution_matches_plain_decode(self):
        from scio_db_spark.functions.avroio import (
            decode_record,
            decode_record_resolved,
            encode_record,
        )

        rec = {"id": 1, "gone": "g", "amt": 1.5, "tags": []}
        data = encode_record(self.W, rec)
        assert decode_record_resolved(self.W, self.W, data) == \
            decode_record(self.W, data)

    def test_missing_default_refuses(self):
        import pytest

        from scio_db_spark.functions.avroio import (
            decode_record_resolved,
            encode_record,
        )

        bad_reader = {
            "type": "record", "name": "E", "fields": [
                {"name": "id", "type": "int"},
                {"name": "nodefault", "type": "string"},
            ],
        }
        data = encode_record(
            self.W, {"id": 1, "gone": "", "amt": 0.0, "tags": []}
        )
        with pytest.raises(ValueError, match="no default"):
            decode_record_resolved(self.W, bad_reader, data)

    def test_union_branch_reresolution(self):
        from scio_db_spark.functions.avroio import (
            decode_record_resolved,
            encode_record,
        )

        w = {"type": "record", "name": "U", "fields": [
            {"name": "v", "type": ["null", "int"]}]}
        r = {"type": "record", "name": "U", "fields": [
            {"name": "v", "type": ["null", "long"]}]}
        for val in (None, 42):
            data = encode_record(w, {"v": val})
            assert decode_record_resolved(w, r, data) == {"v": val}

    def test_illegal_demotion_refuses(self):
        import pytest

        from scio_db_spark.functions.avroio import (
            decode_record_resolved,
            encode_record,
        )

        w = {"type": "record", "name": "D", "fields": [
            {"name": "v", "type": "double"}]}
        r = {"type": "record", "name": "D", "fields": [
            {"name": "v", "type": "int"}]}
        data = encode_record(w, {"v": 1.5})
        with pytest.raises(ValueError, match="not a legal promotion"):
            decode_record_resolved(w, r, data)


class TestSchemaResolutionNamedUnions:
    def test_multi_record_union_matches_by_fullname(self):
        from scio_db_spark.functions.avroio import (
            decode_record_resolved,
            encode_record,
        )

        rec_a = {"type": "record", "name": "A", "fields": [
            {"name": "x", "type": "int"}]}
        rec_b = {"type": "record", "name": "B", "fields": [
            {"name": "x", "type": "int"}]}
        w = {"type": "record", "name": "E", "fields": [
            {"name": "v", "type": rec_b}]}
        # reader union lists A FIRST: tag-only matching would decode
        # the B payload into branch A
        r = {"type": "record", "name": "E", "fields": [
            {"name": "v", "type": [rec_a, rec_b]}]}
        data = encode_record(w, {"v": {"x": 9}})
        assert decode_record_resolved(w, r, data) == {"v": {"x": 9}}

    def test_multi_record_union_no_name_match_refuses(self):
        import pytest

        from scio_db_spark.functions.avroio import (
            decode_record_resolved,
            encode_record,
        )

        rec_a = {"type": "record", "name": "A", "fields": [
            {"name": "x", "type": "int"}]}
        rec_b = {"type": "record", "name": "B", "fields": [
            {"name": "x", "type": "int"}]}
        rec_c = {"type": "record", "name": "C", "fields": [
            {"name": "x", "type": "int"}]}
        w = {"type": "record", "name": "E", "fields": [
            {"name": "v", "type": rec_c}]}
        r = {"type": "record", "name": "E", "fields": [
            {"name": "v", "type": [rec_a, rec_b]}]}
        data = encode_record(w, {"v": {"x": 9}})
        with pytest.raises(ValueError, match="none matches"):
            decode_record_resolved(w, r, data)

    def test_single_record_union_still_lenient_on_rename(self):
        from scio_db_spark.functions.avroio import (
            decode_record_resolved,
            encode_record,
        )

        rec_old = {"type": "record", "name": "Old", "fields": [
            {"name": "x", "type": "int"}]}
        rec_new = {"type": "record", "name": "New", "fields": [
            {"name": "x", "type": "int"}]}
        w = {"type": "record", "name": "E", "fields": [
            {"name": "v", "type": rec_old}]}
        r = {"type": "record", "name": "E", "fields": [
            {"name": "v", "type": ["null", rec_new]}]}
        data = encode_record(w, {"v": {"x": 3}})
        assert decode_record_resolved(w, r, data) == {"v": {"x": 3}}

    def test_namespace_qualifies_fullname(self):
        from scio_db_spark.functions.avroio import _fullname

        assert _fullname({"type": "record", "name": "X",
                          "namespace": "com.ex", "fields": []}) == "com.ex.X"
        assert _fullname({"type": "record", "name": "com.ex.X",
                          "namespace": "ignored", "fields": []}) == "com.ex.X"
        assert _fullname("int") is None

    def test_nested_named_type_inherits_enclosing_namespace(self):
        # spec 'Names': a nested named type with no namespace of its
        # own inherits the most tightly enclosing one. Writer nests a
        # bare-named record inside a namespaced envelope; the reader
        # union branch spells the fullname explicitly — dict-local
        # fullname computation would see 'A' vs 'com.ex.A' and refuse.
        from scio_db_spark.functions.avroio import (
            decode_record_resolved,
            encode_record,
        )

        w = {"type": "record", "name": "E", "namespace": "com.ex",
             "fields": [
                 {"name": "v", "type": {
                     "type": "record", "name": "A",  # inherits com.ex
                     "fields": [{"name": "x", "type": "int"}]}}]}
        r_a = {"type": "record", "name": "A", "namespace": "com.ex",
               "fields": [{"name": "x", "type": "int"}]}
        r_b = {"type": "record", "name": "B", "namespace": "com.ex",
               "fields": [{"name": "x", "type": "int"}]}
        r = {"type": "record", "name": "E", "namespace": "com.ex",
             "fields": [{"name": "v", "type": [r_b, r_a]}]}
        data = encode_record(w, {"v": {"x": 5}})
        assert decode_record_resolved(w, r, data) == {"v": {"x": 5}}

    def test_explicit_empty_namespace_stops_inheritance(self):
        from scio_db_spark.functions.avroio import (
            _fullname,
            _stamp_namespaces,
        )

        w = _stamp_namespaces(
            {"type": "record", "name": "E", "namespace": "com.ex",
             "fields": [
                 {"name": "v", "type": {
                     "type": "record", "name": "A", "namespace": "",
                     "fields": [{"name": "x", "type": "int"}]}}]}
        )
        inner = w["fields"][0]["type"]
        assert _fullname(inner) == "A"  # null namespace, not com.ex.A

    def test_reader_alias_matches_writer_fullname(self):
        # reader renamed Old -> New but carries aliases: ["Old"];
        # the alias is qualified with the reader branch's namespace.
        from scio_db_spark.functions.avroio import (
            decode_record_resolved,
            encode_record,
        )

        w_old = {"type": "record", "name": "Old", "namespace": "com.ex",
                 "fields": [{"name": "x", "type": "int"}]}
        w = {"type": "record", "name": "E", "fields": [
            {"name": "v", "type": w_old}]}
        r_new = {"type": "record", "name": "New", "namespace": "com.ex",
                 "aliases": ["Old"],
                 "fields": [{"name": "x", "type": "int"}]}
        r_other = {"type": "record", "name": "Other",
                   "namespace": "com.ex",
                   "fields": [{"name": "x", "type": "int"}]}
        r = {"type": "record", "name": "E", "fields": [
            {"name": "v", "type": [r_other, r_new]}]}
        data = encode_record(w, {"v": {"x": 8}})
        assert decode_record_resolved(w, r, data) == {"v": {"x": 8}}


class TestSchemaResolutionDefaultCoercion:
    def test_defaults_coerced_through_reader_types(self):
        from scio_db_spark.functions.avroio import (
            decode_record_resolved,
            encode_record,
        )

        w = {"type": "record", "name": "E", "fields": [
            {"name": "id", "type": "int"}]}
        r = {"type": "record", "name": "E", "fields": [
            {"name": "id", "type": "int"},
            # spec: bytes defaults are JSON strings, ISO-8859-1 mapped
            {"name": "blob", "type": "bytes", "default": "\u00ff\u0001"},
            {"name": "ratio", "type": "double", "default": 1},
            {"name": "opt", "type": ["null", "int"], "default": None},
            {"name": "nested", "type": {
                "type": "record", "name": "N", "fields": [
                    {"name": "f", "type": "float"}]},
             "default": {"f": 2}},
            {"name": "arr", "type": {"type": "array", "items": "double"},
             "default": [1, 2]},
        ]}
        data = encode_record(w, {"id": 4})
        got = decode_record_resolved(w, r, data)
        assert got["blob"] == b"\xff\x01"
        assert got["ratio"] == 1.0 and isinstance(got["ratio"], float)
        assert got["opt"] is None
        assert got["nested"] == {"f": 2.0}
        assert isinstance(got["nested"]["f"], float)
        assert got["arr"] == [1.0, 2.0]
        assert all(isinstance(v, float) for v in got["arr"])
