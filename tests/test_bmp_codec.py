"""The REAL BMP codec: roundtrip exactness on random pixels (all
padding classes), top-down variant, and loud rejection of compressed /
non-24-bit input."""

from __future__ import annotations

import numpy as np
import pytest

from scio_db_spark.functions.multimodal import (
    bmp_decode_rgb24,
    bmp_encode_rgb24,
)


def test_roundtrip_exact_all_padding_classes():
    """Widths mod 4 in {0,1,2,3} exercise every row-padding amount
    (3w % 4 = 0,3,2,1); random pixels catch BGR/flip mistakes."""
    rng = np.random.default_rng(11)
    for w in (4, 5, 6, 7):
        px = rng.integers(0, 256, size=(3, w, 3), dtype=np.int64).astype(
            np.uint8
        )
        out = bmp_decode_rgb24(bmp_encode_rgb24(px))
        assert np.array_equal(out, px), f"w={w}"


def test_top_down_negative_height_variant():
    """Real files also come top-down (negative height); the decoder
    must honor the sign instead of double-flipping."""
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    b = bytearray(bmp_encode_rgb24(px[::-1]))  # encode flipped...
    b[22:26] = (-2).to_bytes(4, "little", signed=True)  # ...mark top-down
    out = bmp_decode_rgb24(bytes(b))
    assert np.array_equal(out, px[::-1][::-1])  # == px? no: explicit
    assert np.array_equal(out, px)


def test_not_bmp_raises():
    with pytest.raises(ValueError, match="BMP"):
        bmp_decode_rgb24(b"PNG....definitely not a bitmap.....xxxxxxxxxxxxxxxxxxxx")


def test_compressed_or_wrong_depth_rejected():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    b = bytearray(bmp_encode_rgb24(px))
    b[30:34] = (1).to_bytes(4, "little")  # BI_RLE8 compression
    with pytest.raises(ValueError, match="uncompressed"):
        bmp_decode_rgb24(bytes(b))
    b = bytearray(bmp_encode_rgb24(px))
    b[28:30] = (8).to_bytes(2, "little")  # 8-bit palette
    with pytest.raises(ValueError, match="uncompressed"):
        bmp_decode_rgb24(bytes(b))


def test_truncated_pixel_data_raises():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    b = bmp_encode_rgb24(px)
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode_rgb24(b[:-5])


def test_bmp_roundtrip_property():
    """Property: ANY uint8 RGB image (1..12 x 1..12) survives encode →
    decode bit-exactly — all padding classes, all pixel values
    (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=12),
        h=st.integers(min_value=1, max_value=12),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def prop(w, h, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(
            np.uint8
        )
        assert np.array_equal(bmp_decode_rgb24(bmp_encode_rgb24(px)), px)

    prop()
