"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from scio_db_spark.functions.multimodal import (
    byte_features,
    decode_media_meta,
    sample_frames,
    with_binary_payload,
)


def _media(spark):
    return with_binary_payload(
        spark.createDataFrame(
            [Row(doc_id=1, text="abcd" * 10), Row(doc_id=2, text="z")]
        )
    )


def test_real_codec_is_gated(spark):
    with pytest.raises(NotImplementedError, match="codec 'jpeg'"):
        decode_media_meta(_media(spark), codec="jpeg")


def test_fake_decode_reads_real_bytes(spark):
    out = {r.doc_id: r for r in decode_media_meta(_media(spark)).collect()}
    assert out[1].n_bytes == 40
    assert out[1].width == ord("a") * 256 + ord("b")
    assert out[1].first_byte == ord("a") and out[1].last_byte == ord("d")
    assert out[2].n_bytes == 1 and out[2].width == ord("z") * 256


def test_frame_fanout(spark):
    rows = sample_frames(_media(spark), frame_size=16).collect()
    f1 = sorted(
        (r.frame_idx, r.frame_len) for r in rows if r.doc_id == 1
    )
    assert f1 == [(0, 16), (1, 16), (2, 8)]  # 40 bytes / 16
    assert [(r.frame_idx, r.frame_len) for r in rows if r.doc_id == 2] == [
        (0, 1)
    ]


def test_byte_features_shape(spark):
    out = {r.doc_id: r for r in byte_features(_media(spark)).collect()}
    assert out[1].f_len == 40 and out[1].f_mod == 40
    assert out[2].f_first == out[2].f_last == ord("z")
