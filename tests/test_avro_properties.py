"""Property-based tests for the pure-Python Avro codec (hypothesis).

A hand-written binary codec lives or dies on edge values — int64
extremes, empty/unicode strings, NaN-free doubles, deep containers,
multi-block files. Round-trip identity over generated data pins the
whole encode/decode surface, complementing test_avro.py's fixed
vectors and Java-interop check.
"""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from scio_db_spark.functions import avroio as A

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

VALUE_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": ["string", "null"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "bytes"},
        {"name": "flag", "type": "boolean"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ],
}

records = st.fixed_dictionaries(
    {
        "i": I64,
        "s": st.one_of(st.none(), st.text(max_size=50)),
        # allow_nan=False: NaN != NaN breaks equality; the codec itself
        # carries NaN payloads fine (IEEE bits pass through struct.pack)
        "d": st.floats(allow_nan=False),
        "b": st.binary(max_size=50),
        "flag": st.booleans(),
        "arr": st.lists(I64, max_size=10),
        "m": st.dictionaries(st.text(max_size=10), st.text(max_size=10),
                             max_size=5),
    }
)


@given(I64)
def test_zigzag_varint_round_trip(n):
    enc = A.BinaryEncoder()
    enc.write_long(n)
    dec = A.BinaryDecoder(enc.getvalue())
    assert dec.read_long() == n
    assert dec.pos == len(enc.getvalue())  # no trailing bytes


@given(records)
def test_single_record_round_trip(rec):
    body = A.encode_record(VALUE_SCHEMA, rec)
    assert A.decode_record(VALUE_SCHEMA, body) == rec


@settings(max_examples=25, deadline=None)
@given(st.lists(records, max_size=20), st.sampled_from(["null", "deflate"]))
def test_container_round_trip_multiblock(rows, codec):
    buf = io.BytesIO()
    # block_records=3 forces multiple blocks for most generated lists,
    # covering the block/sync-marker framing, not just one happy block
    w = A.ContainerWriter(buf, VALUE_SCHEMA, codec=codec, block_records=3)
    w.write_rows(rows)
    w.close()
    _, back = A.read_container(buf.getvalue())
    assert back == rows
