"""Streaming media ingestion: the streaming face of the multimodal
tier.

Binary payloads (audio/image containers) arrive as a stream; each
micro-batch runs the REAL codecs (functions/multimodal.py — WAV PCM16,
BMP, PNG; functions/jpegcodec.py — baseline grayscale JPEG) through an
Arrow-batched ``mapInPandas`` that decodes at the
RECORD level: a well-formed payload yields its exact integer feature
row, a poison payload (truncated container, corrupt CRC, unsupported
depth) yields a KO row carrying the codec's own error message — the
W9 never-stall / dead-letter contract (reference:
StateAsyncParDoWithHttpHandler.scala error swallowing; dead-letter
routing MediationService.scala:128-131) applied to media.

Scale shape: zero shuffle — decode is embarrassingly parallel, the
scan stays columnar, and only (id, payload, mime) crosses into
Python per Arrow batch. OK/KO are two filters over ONE decoded frame,
so the codec runs once per record, not once per route.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Feature columns shared by every codec (unused ones are 0/NULL).
_DECODED_FIELDS = (
    "mime_type string, ok boolean, err string, width long, height long,"
    " n_channels long, sum_r long, n_samples long, sample_rate long,"
    " peak long, dhash64 long"
)


def decode_media_stream(
    stream_df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    mime_col: str = "mime_type",
    _codec_override=None,
) -> DataFrame:
    """Decode a mixed-mime binary stream with the real codecs,
    per-record fail-soft: output carries ``ok``/``err`` so the caller
    splits OK/KO with two filters. Unknown mimes are KO ("no codec"),
    never dropped silently.

    ``_codec_override`` is a TEST seam only: a (mime, bytes) -> tuple
    replacing the codec dispatch, cloudpickled into the executor
    closure so tests can prove the error-routing contract (data
    poison → KO lane, programming bug → visible crash) for exception
    classes the real codecs can't be made to raise on demand."""
    import numpy as np

    out_schema = f"{id_col} long, {_DECODED_FIELDS}"

    def _decode_one(mime: str, b: bytes) -> tuple:
        from scio_db_spark.functions.multimodal import (
            bmp_decode_rgb24,
            png_decode_rgb8,
            wav_decode_pcm16,
        )

        from scio_db_spark.functions.multimodal import (
            dhash64_from_pixels,
        )

        if mime == "audio/wav":
            rate, _ch, _bits, s = wav_decode_pcm16(b)
            s64 = s.astype(np.int64)
            peak = int(np.abs(s64).max()) if len(s64) else 0
            return (
                mime, True, None, 0, 0, 0, 0, len(s64), rate, peak,
                None,
            )
        if mime == "image/jpeg":
            from scio_db_spark.functions.jpegcodec import jpeg_decode

            # REAL baseline decoder (grayscale or 4:4:4 color; see
            # jpegcodec.py) — a gray plane is replicated to three
            # channels so the dHash/near-dup path is shared with
            # PNG/BMP
            dec = jpeg_decode(b).astype(np.int64)
            px = (
                dec
                if dec.ndim == 3
                else np.stack([dec, dec, dec], axis=-1)
            )
        elif mime in ("image/bmp", "image/png"):
            px = (
                bmp_decode_rgb24(b)
                if mime == "image/bmp"
                else png_decode_rgb8(b)
            ).astype(np.int64)
        if mime in ("image/bmp", "image/png", "image/jpeg"):
            h, w, ch = px.shape
            # perceptual fingerprint for the near-dup screen; images
            # below the 16x18 dHash grid carry NULL (screen ignores)
            dh = (
                dhash64_from_pixels(px) if h >= 16 and w >= 18 else None
            )
            return (
                mime, True, None, w, h, ch, int(px[:, :, 0].sum()),
                0, 0, 0, dh,
            )
        raise ValueError(f"no codec for mime {mime!r}")

    decode_fn = _codec_override or _decode_one

    def _decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            id_col, "mime_type", "ok", "err", "width", "height",
            "n_channels", "sum_r", "n_samples", "sample_rate", "peak",
            "dhash64",
        ]
        for pdf in pdfs:
            rows = []
            for i, mime, b in zip(
                pdf[id_col], pdf[mime_col], pdf[payload_col]
            ):
                if i is None or b is None:
                    continue
                try:
                    rows.append((int(i), *decode_fn(mime, bytes(b))))
                except (ValueError, zlib.error, struct.error) as e:
                    # the RECORD fails, the batch survives — the
                    # codec's message rides to the dead-letter sink.
                    # Exactly the DATA-poison classes: codecs raise
                    # ValueError for contract violations, zlib.error
                    # for a corrupt DEFLATE body behind a valid CRC,
                    # struct.error for truncated fixed-layout headers.
                    # Anything else (TypeError/AttributeError/...) is
                    # a codec PROGRAMMING bug and must crash the query
                    # visibly, not masquerade as 100% KO data
                    # (round-11 ADVICE).
                    rows.append(
                        (int(i), mime, False, str(e)[:200],
                         0, 0, 0, 0, 0, 0, 0, None)
                    )
            if rows:
                out = pd.DataFrame(rows, columns=cols)
                # dhash64 mixes 64-bit ints (images) with None (audio
                # / KO / sub-grid): DataFrame inference makes that
                # column FLOAT64, which silently drops the low ~11
                # bits of a 2^63-scale hash (float53 mantissa) — a
                # single mixed batch corrupted every fingerprint while
                # pure-image batches (the original unit tests) passed.
                # Build the column as nullable Int64 explicitly.
                out["dhash64"] = pd.array(
                    [r[11] for r in rows], dtype="Int64"
                )
                yield out

    return stream_df.select(id_col, mime_col, payload_col).mapInPandas(
        _decode, out_schema
    )


def build_media_ingest(
    stream_df: DataFrame,
    id_col: str = "media_id",
    image_band_index: tuple[tuple[int, ...], ...] | None = None,
) -> dict[str, DataFrame]:
    """OK/KO split over the decoded stream (two filters, one decode):
    ``ok`` rows carry exact integer features for the analytics sink;
    ``ko`` rows carry the codec error for the dead-letter sink.

    With ``image_band_index`` (exact band bitmaps from
    :func:`image_band_bitmaps` over the historical image corpus), OK
    rows additionally carry ``near_dup_image`` — the image near-dup
    screen, flagged when any dHash band matches an indexed image
    (candidate semantics: band match = possible near-dup, exactly the
    text screen's contract but with a zero-FP membership test)."""
    decoded = decode_media_stream(stream_df, id_col=id_col)
    ok = decoded.filter(F.col("ok")).drop("ok", "err")
    if image_band_index is not None:
        ok = ok.withColumn(
            "near_dup_image", image_screen_expr(image_band_index)
        )
    return {
        "ok": ok,
        "ko": decoded.filter(~F.col("ok")).select(
            id_col, "mime_type", "err"
        ),
    }


# ------------------------------------------------- image near-dup screen
# The image-modality twin of corpus_ingest's text LSH screen, with a
# stronger guarantee: dHash band values live in a 16-bit domain, so a
# 65,536-bit bitmap per band is EXACT membership — zero false
# positives, constant 8 KB per band regardless of corpus size (the
# text screen needs Bloom masks because its band-key domain is
# unbounded). Four bands cover Hamming<=6 by pigeonhole over 64/16:
# a new image whose dHash is within 6 bits of any indexed image
# matches at least one band exactly.

#: 4 bands x 16 bits, 1024 signed 64-bit words per band
_IMG_BANDS = 4
_IMG_BAND_WORDS = 65536 // 64


def image_band_bitmaps(
    hashes: DataFrame, col: str = "dhash64"
) -> tuple[tuple[int, ...], ...]:
    """Exact band-membership bitmaps over an indexed image corpus's
    dHashes — the build side of the screen. The collect is bounded by
    the band DOMAIN (<= 65,536 distinct values per band), never by
    corpus size; at 100 TB this is the persisted image-hash index
    folded to 32 KB of task-constant literals, refreshed on the J5
    side-input cadence."""
    words = [[0] * _IMG_BAND_WORDS for _ in range(_IMG_BANDS)]
    vals = (
        hashes.select(
            *[
                (
                    F.shiftright(F.col(col), 16 * k)
                    .bitwiseAND(F.lit(65535))
                ).alias(f"v{k}")
                for k in range(_IMG_BANDS)
            ]
        )
        .distinct()
        .collect()
    )
    for r in vals:
        for k in range(_IMG_BANDS):
            v = r[k]
            if v is None:
                continue
            words[k][v // 64] |= 1 << (v % 64)
    signed = tuple(
        tuple(w - (1 << 64) if w >= (1 << 63) else w for w in band)
        for band in words
    )
    return signed


def image_screen_expr(
    bitmaps: tuple[tuple[int, ...], ...], dhash_col: str = "dhash64"
) -> F.Column:
    """``near_dup_image`` flag as a pure JVM expression: any band's
    16-bit value has its bit set in that band's bitmap. NULL dhash
    (audio rows, sub-grid images, KO rows) never flags. Plan-size
    note: 4 x 1024 long literals, folded once by ConstantFolding —
    half the text screen's measured-fine 2K-word case."""
    hit = None
    for k in range(_IMG_BANDS):
        arr = "array(" + ", ".join(f"{w}L" for w in bitmaps[k]) + ")"
        v = f"(shiftright({dhash_col}, {16 * k}) & 65535)"
        check = F.expr(
            f"((element_at({arr}, CAST({v} DIV 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST({v} % 64 AS INT))) != 0)"
        )
        hit = check if hit is None else (hit | check)
    return F.coalesce(hit, F.lit(False))


def image_screen_udf(bitmaps: tuple[tuple[int, ...], ...]):
    """Arrow-kernel twin of :func:`image_screen_expr` (bit-equal
    verdicts pinned in tests/test_media_ingest.py), for the regime
    where per-micro-batch re-analysis of the literal arrays dominates
    (the text screen's measured size boundary)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    bands = [
        np.array(
            [w & ((1 << 64) - 1) for w in band], dtype=np.uint64
        )
        for band in bitmaps
    ]

    @pandas_udf("boolean")
    def _flag(dh: pd.Series) -> pd.Series:
        out = pd.Series(False, index=dh.index)
        mask = dh.notna()
        if mask.any():
            h = dh[mask].astype("int64").to_numpy().astype(np.uint64)
            flag = np.zeros(len(h), dtype=bool)
            for k in range(_IMG_BANDS):
                v = (h >> np.uint64(16 * k)) & np.uint64(0xFFFF)
                w = bands[k][(v >> np.uint64(6)).astype(np.int64)]
                flag |= (
                    w >> (v & np.uint64(63)) & np.uint64(1)
                ).astype(bool)
            out[mask] = flag
        return out

    return _flag
