"""Real PNG codec laws: lossless roundtrip across every scanline
filter and both color types, byte-level fail-loudly behavior, and the
registered roundtrip query's numpy prediction."""

from __future__ import annotations

import numpy as np
import pytest

from scio_db_spark.functions.multimodal import (
    png_decode_rgb8,
    png_encode_rgb8,
)


def _img(h, w, ch, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, ch), dtype=np.uint8
    )


@pytest.mark.parametrize("ch", [3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(ch, ft):
    px = _img(6, 9, ch, seed=ft * 10 + ch)
    out = png_decode_rgb8(png_encode_rgb8(px, [ft] * 6))
    assert out.shape == px.shape
    assert (out == px).all()


def test_roundtrip_mixed_filters_and_edge_sizes():
    for h, w in ((1, 1), (1, 7), (5, 1), (8, 8)):
        px = _img(h, w, 3, seed=h * 16 + w)
        assert (png_decode_rgb8(png_encode_rgb8(px)) == px).all()


def test_not_png_raises():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode_rgb8(b"GIF89a definitely not a png")


def test_truncated_raises():
    b = png_encode_rgb8(_img(4, 4, 3))
    with pytest.raises(ValueError, match="truncated|missing"):
        png_decode_rgb8(b[:-6])


def test_corrupt_crc_raises():
    b = bytearray(png_encode_rgb8(_img(4, 4, 3)))
    b[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC mismatch"):
        png_decode_rgb8(bytes(b))


def test_unsupported_depth_named_not_misparsed():
    b = bytearray(png_encode_rgb8(_img(4, 4, 3)))
    # IHDR data starts at offset 16; depth byte is at 16+8
    import zlib

    b[24] = 16  # claim 16-bit depth
    # re-stamp the IHDR CRC so the failure is the VALIDATION, not CRC
    ihdr = bytes(b[12:16]) + bytes(b[16:29])
    b[29:33] = zlib.crc32(ihdr).to_bytes(4, "big")
    with pytest.raises(ValueError, match="8-bit RGB"):
        png_decode_rgb8(bytes(b))


def test_registered_query_matches_numpy_prediction(spark, sf_dir):
    from scio_db_spark.plans.registry import all_queries

    rows = (
        all_queries()["mm_png_rgb_roundtrip"].spark(spark, sf_dir)
        .limit(40)
        .collect()
    )
    assert rows
    for r in rows:
        i = r.doc_id
        w, h = 4 + i % 13, 2 + i % 7
        ch = 4 if i % 2 == 1 else 3
        xs = np.arange(w)[None, :]
        ys = np.arange(h)[:, None]
        red = np.broadcast_to((2 * xs + 11 * ys + i) % 256, (h, w))
        assert (r.width, r.height, r.n_channels) == (w, h, ch)
        assert r.sum_r == int(red.sum())
        assert r.wsum_rx == int((red * np.arange(w)[None, :]).sum())
        assert r.wsum_ry == int((red * np.arange(h)[:, None]).sum())
        assert r.dec_sum_r == int(red[::2, ::2].sum())
