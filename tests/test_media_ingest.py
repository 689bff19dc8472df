"""Streaming media ingestion e2e (streaming/media_ingest.py): real
codecs (WAV/BMP/PNG) over a binary-payload stream with record-level
poison routing — the W9 dead-letter contract for the multimodal tier."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from scio_db_spark.functions.multimodal import (
    bmp_encode_rgb24,
    png_encode_rgb8,
    wav_encode_pcm16,
)
from scio_db_spark.streaming.harness import StreamHarness
from scio_db_spark.streaming.media_ingest import build_media_ingest

SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def _png_valid_crc_garbage_idat() -> bytes:
    """Hand-built PNG: well-formed signature/IHDR/IEND, every chunk
    CRC correct, but the IDAT payload is garbage bytes that no
    DEFLATE decoder accepts (a buggy-encoder / bitflip-past-CRC
    shape)."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # 2x2 RGB8
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"\xff\x00\xde\xad\xbe\xef")
        + chunk(b"IEND", b"")
    )


def _img(h, w, ch, seed):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, ch), dtype=np.uint8
    )


def _rows():
    wav = wav_encode_pcm16(
        np.array([100, -200, 300, -400], dtype=np.int16), 8000
    )
    bmp_px = _img(3, 5, 3, seed=1)
    png_px = _img(4, 6, 4, seed=2)
    return (
        [
            Row(media_id=1, mime_type="audio/wav", payload=bytearray(wav)),
            Row(
                media_id=2,
                mime_type="image/bmp",
                payload=bytearray(bmp_encode_rgb24(bmp_px)),
            ),
            Row(
                media_id=3,
                mime_type="image/png",
                payload=bytearray(png_encode_rgb8(png_px)),
            ),
            # poison: truncated WAV (declared data size overruns buffer)
            Row(media_id=4, mime_type="audio/wav", payload=bytearray(wav[:-3])),
            # poison: PNG with a corrupted IDAT byte (CRC mismatch)
            Row(
                media_id=5,
                mime_type="image/png",
                payload=bytearray(
                    bytes(png_encode_rgb8(png_px))[:40]
                    + b"\xff"
                    + bytes(png_encode_rgb8(png_px))[41:]
                ),
            ),
            # poison: mime nobody has a codec for
            Row(media_id=6, mime_type="video/mp4", payload=bytearray(b"x")),
            # poison: PNG whose chunk CRCs are all VALID but whose
            # IDAT body is not a DEFLATE stream — zlib.decompress
            # raises zlib.error, not ValueError; before the ADVICE-r10
            # fix this killed the whole micro-batch instead of routing
            # the record to the KO lane
            Row(
                media_id=7,
                mime_type="image/png",
                payload=bytearray(_png_valid_crc_garbage_idat()),
            ),
        ],
        bmp_px,
        png_px,
    )


@pytest.fixture()
def split(spark):
    rows, bmp_px, png_px = _rows()
    outputs = {}
    for leg in ("ok", "ko"):
        h = StreamHarness(spark, SCHEMA)
        h.start(
            lambda s, leg=leg: build_media_ingest(s)[leg],
            output_mode="append",
        )
        h.add_batch(rows)
        outputs[leg] = h.results()
        h.stop()
    return outputs, bmp_px, png_px


def test_ok_rows_carry_exact_codec_features(split):
    outputs, bmp_px, png_px = split
    ok = {r.media_id: r for r in outputs["ok"]}
    assert set(ok) == {1, 2, 3}
    w = ok[1]
    assert (w.n_samples, w.sample_rate, w.peak) == (4, 8000, 400)
    b = ok[2]
    assert (b.width, b.height, b.n_channels) == (5, 3, 3)
    assert b.sum_r == int(bmp_px[:, :, 0].astype(np.int64).sum())
    p = ok[3]
    assert (p.width, p.height, p.n_channels) == (6, 4, 4)
    assert p.sum_r == int(png_px[:, :, 0].astype(np.int64).sum())


def test_poison_routes_to_dead_letter_with_codec_error(split):
    outputs, _b, _p = split
    ko = {r.media_id: r for r in outputs["ko"]}
    assert set(ko) == {4, 5, 6, 7}
    assert "truncated chunk" in ko[4].err
    assert "CRC mismatch" in ko[5].err
    assert "no codec" in ko[6].err
    # zlib.error (non-ValueError) must route KO, not kill the batch
    assert ko[7].err


def _fake_codec(exc_cls):
    def _codec(mime, b):
        raise exc_cls("injected")

    return _codec


def test_data_poison_classes_route_ko_programming_bugs_crash(spark):
    """Round-11 ADVICE regression: the per-record handler catches
    exactly the DATA-poison classes (ValueError, zlib.error,
    struct.error) — those route to the KO lane with the message in
    ``err`` — while a codec PROGRAMMING bug (TypeError et al.) must
    crash the query visibly instead of masquerading as 100% KO data.
    Batch mapInPandas exercises the identical closure the stream
    runs."""
    import struct as _struct
    import zlib as _zlib

    from scio_db_spark.streaming.media_ingest import decode_media_stream

    rows = [Row(media_id=1, mime_type="image/png", payload=bytearray(b"x"))]
    df = spark.createDataFrame(rows, SCHEMA)

    for exc in (ValueError, _zlib.error, _struct.error):
        out = decode_media_stream(
            df, _codec_override=_fake_codec(exc)
        ).collect()
        assert len(out) == 1
        assert out[0].ok is False and "injected" in out[0].err

    for exc in (TypeError, AttributeError, KeyError):
        with pytest.raises(Exception) as ei:
            decode_media_stream(
                df, _codec_override=_fake_codec(exc)
            ).collect()
        assert exc.__name__ in str(ei.value)


def test_image_neardup_screen_expr_kernel_parity(spark):
    """Image near-dup screen contract: an indexed hash flags (all 4
    bands match), a 1-bit-away hash flags (3 bands still match), a
    far hash does not, NULL (audio/KO/sub-grid) never flags — and the
    JVM expression and Arrow kernel return bit-equal verdicts,
    including on NULL."""
    import pandas as pd

    from scio_db_spark.streaming.media_ingest import (
        image_band_bitmaps,
        image_screen_expr,
        image_screen_udf,
    )

    indexed = [
        -5810724383175983021,  # bit-63 set: sign handling on all paths
        1234605616436508552,
        42,
    ]
    hist = spark.createDataFrame(
        [(h,) for h in indexed], "dhash64 long"
    )
    bitmaps = image_band_bitmaps(hist)

    near = indexed[0] ^ (1 << 5)          # 1 bit off: 3 bands match
    far = indexed[0] ^ 0x1111111111111111  # 1 bit off in EVERY band
    probe = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3, 4],
                "dhash64": pd.array(
                    [indexed[0], near, far, None], dtype="Int64"
                ),
            }
        )
    )
    expr_out = {
        r.media_id: r.flag
        for r in probe.select(
            "media_id",
            image_screen_expr(bitmaps).alias("flag"),
        ).collect()
    }
    udf_out = {
        r.media_id: r.flag
        for r in probe.select(
            "media_id",
            image_screen_udf(bitmaps)(F.col("dhash64")).alias("flag"),
        ).collect()
    }
    assert expr_out == {1: True, 2: True, 3: False, 4: False}
    assert udf_out == expr_out


def test_build_media_ingest_with_image_screen(spark):
    """End-to-end: decoded PNG rows carry dhash64; with a band index
    the OK lane flags re-encodes of indexed images and passes novel
    ones."""
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.multimodal import (
        dhash64_from_pixels,
        png_encode_rgb8,
    )
    from scio_db_spark.streaming.media_ingest import (
        build_media_ingest,
        image_band_bitmaps,
    )

    rng = np.random.RandomState(17)
    known = rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)
    novel = rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)
    hist = spark.createDataFrame(
        [(dhash64_from_pixels(known),)], "dhash64 long"
    )
    stream = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "mime_type": ["image/png", "image/png"],
                "payload": [
                    bytearray(png_encode_rgb8(px))
                    for px in (known, novel)
                ],
            }
        )
    )
    lanes = build_media_ingest(
        stream,
        image_band_index=image_band_bitmaps(hist),
    )
    got = {
        r.media_id: (r.dhash64, r.near_dup_image)
        for r in lanes["ok"].collect()
    }
    assert got[1] == (dhash64_from_pixels(known), True)
    assert got[2] == (dhash64_from_pixels(novel), False)


def test_mixed_batch_preserves_dhash_precision(spark):
    """Regression (round-12, found by the media bench): a batch mixing
    image rows (int dhash64) with audio/KO rows (None) made pandas
    infer float64 for the column, silently dropping the low ~11 bits
    of every 2^63-scale fingerprint. All rows flow through ONE
    partition here so the mixed-batch path is what executes."""
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.multimodal import (
        dhash64_from_pixels,
        png_encode_rgb8,
        wav_encode_pcm16,
    )
    from scio_db_spark.streaming.media_ingest import decode_media_stream

    px = np.random.RandomState(19).randint(0, 256, (16, 18, 3)).astype(
        np.uint8
    )
    pcm = np.zeros(256, dtype=np.int16)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3],
                "mime_type": ["image/png", "audio/wav", "image/png"],
                "payload": [
                    bytearray(png_encode_rgb8(px)),
                    bytearray(wav_encode_pcm16(pcm, 8000)),
                    bytearray(b"\x89PNGbad"),  # poison -> KO, None hash
                ],
            }
        )
    ).coalesce(1)
    got = {
        r.media_id: r.dhash64
        for r in decode_media_stream(df, id_col="media_id").collect()
    }
    assert got[1] == dhash64_from_pixels(px)  # exact, every bit
    assert got[2] is None and got[3] is None


def test_jpeg_decodes_in_media_stream(spark):
    """image/jpeg flows through the REAL baseline codec: a DC-exact
    image (constant 8x8 blocks) yields exact features and the same
    dHash as the PNG/BMP path would for identical pixels; a truncated
    JPEG routes KO with the codec's named error."""
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.jpegcodec import jpeg_encode_gray
    from scio_db_spark.functions.multimodal import dhash64_from_pixels
    from scio_db_spark.streaming.media_ingest import decode_media_stream

    vals = np.random.RandomState(23).randint(0, 256, (2, 3)).astype(
        np.uint8
    )
    gray = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)  # 16x24
    blob = jpeg_encode_gray(gray)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "mime_type": ["image/jpeg", "image/jpeg"],
                "payload": [bytearray(blob), bytearray(blob[:-4])],
            }
        )
    )
    rows = {r.media_id: r for r in decode_media_stream(df, id_col="media_id").collect()}
    ok = rows[1]
    assert ok.ok and (ok.width, ok.height, ok.n_channels) == (24, 16, 3)
    assert ok.sum_r == int(gray.astype(np.int64).sum())
    px3 = np.stack([gray, gray, gray], axis=-1)
    assert ok.dhash64 == dhash64_from_pixels(px3)
    ko = rows[2]
    assert not ko.ok and "EOI" in ko.err


def test_color_jpeg_decodes_in_media_stream(spark):
    """Color (4:4:4 YCbCr) JPEG flows through the general decoder:
    3 channels, plausible feature sums, and a dHash close to the
    original red plane's (the codec is lossy; the perceptual hash is
    the robust fingerprint)."""
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.jpegcodec import jpeg_encode_rgb
    from scio_db_spark.functions.multimodal import dhash64_from_pixels
    from scio_db_spark.streaming.media_ingest import decode_media_stream

    rng = np.random.RandomState(29)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1],
                "mime_type": ["image/jpeg"],
                "payload": [bytearray(jpeg_encode_rgb(img))],
            }
        )
    )
    row = decode_media_stream(df, id_col="media_id").collect()[0]
    assert row.ok and (row.width, row.height, row.n_channels) == (24, 16, 3)
    # lossy codec: red sum within the +-3/pixel roundtrip bound
    assert abs(row.sum_r - int(img[:, :, 0].astype(np.int64).sum())) <= 3 * 16 * 24
    ham = bin(
        (row.dhash64 ^ dhash64_from_pixels(img)) & ((1 << 64) - 1)
    ).count("1")
    assert ham <= 6  # perceptual stability across the lossy roundtrip
