"""Streaming media ingestion: the streaming face of the multimodal
tier.

Binary payloads (audio/image containers) arrive as a stream; each
micro-batch runs the REAL codecs (functions/multimodal.py — WAV PCM16,
BMP, PNG) through an Arrow-batched ``mapInPandas`` that decodes at the
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
    " peak long"
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

        if mime == "audio/wav":
            rate, _ch, _bits, s = wav_decode_pcm16(b)
            s64 = s.astype(np.int64)
            peak = int(np.abs(s64).max()) if len(s64) else 0
            return (mime, True, None, 0, 0, 0, 0, len(s64), rate, peak)
        if mime in ("image/bmp", "image/png"):
            px = (
                bmp_decode_rgb24(b)
                if mime == "image/bmp"
                else png_decode_rgb8(b)
            ).astype(np.int64)
            h, w, ch = px.shape
            return (
                mime, True, None, w, h, ch, int(px[:, :, 0].sum()),
                0, 0, 0,
            )
        raise ValueError(f"no codec for mime {mime!r}")

    decode_fn = _codec_override or _decode_one

    def _decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            id_col, "mime_type", "ok", "err", "width", "height",
            "n_channels", "sum_r", "n_samples", "sample_rate", "peak",
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
                         0, 0, 0, 0, 0, 0, 0)
                    )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return stream_df.select(id_col, mime_col, payload_col).mapInPandas(
        _decode, out_schema
    )


def build_media_ingest(
    stream_df: DataFrame,
    id_col: str = "media_id",
) -> dict[str, DataFrame]:
    """OK/KO split over the decoded stream (two filters, one decode):
    ``ok`` rows carry exact integer features for the analytics sink;
    ``ko`` rows carry the codec error for the dead-letter sink."""
    decoded = decode_media_stream(stream_df, id_col=id_col)
    return {
        "ok": decoded.filter(F.col("ok")).drop("ok", "err"),
        "ko": decoded.filter(~F.col("ok")).select(
            id_col, "mime_type", "err"
        ),
    }
