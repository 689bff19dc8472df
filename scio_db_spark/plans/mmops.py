"""Multimodal (binary-column) queries over the ``documents`` table.

The synthetic tables carry no real media, so the binary payload is the
UTF-8 encoding of ``text`` (deterministic on both engines: Spark
``encode``, DuckDB ``encode``) and the "codec" is the deterministic
fake in ``functions/multimodal.py``. What these queries actually
verify is the 100 TB-relevant plumbing: binary columns flowing through
Arrow into ``mapInPandas``, per-record byte access, one-to-many frame
fan-out, and columnar metadata staying in JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scio_db_spark.functions.multimodal import (
    byte_features,
    decode_media_meta,
    sample_frames,
    with_binary_payload,
)
from scio_db_spark.plans.catalog import table
from scio_db_spark.plans.registry import register

_FRAME = 32  # bytes per sampled frame


def _docs_with_payload(spark: SparkSession, sf: str) -> DataFrame:
    return with_binary_payload(table(spark, sf, "documents"))


# n_bytes of the UTF-8 payload, in DuckDB terms (text is ASCII-checked
# equal to length(text), but octet_length(encode()) is the honest form).
_NB = "octet_length(encode(text))"


# --------------------------------------------------------------------------
@register(
    "mm_decode_meta",
    oracle=f"""
    SELECT doc_id,
        CAST({_NB} AS BIGINT) AS n_bytes,
        CAST(ascii(substr(text, 1, 1)) * 256
             + ascii(substr(text, 2, 1)) AS INT) AS width,
        CAST({_NB} % 4096 AS INT) AS height,
        CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
        CAST(ascii(substr(text, length(text), 1)) AS INT) AS last_byte
    FROM documents
    """,
    doc="Multimodal decode: binary payload → typed media dimensions via "
    "Arrow-batched mapInPandas (fake codec over real bytes).",
)
def mm_decode_meta(spark: SparkSession, sf: str) -> DataFrame:
    return decode_media_meta(_docs_with_payload(spark, sf))


# --------------------------------------------------------------------------
@register(
    "mm_frame_sample",
    oracle=f"""
    SELECT d.doc_id,
        CAST(f.i AS INT) AS frame_idx,
        CAST(least({_FRAME}, {_NB} - f.i * {_FRAME}) AS INT) AS frame_len,
        CAST(ascii(substr(text, f.i * {_FRAME} + 1, 1)) AS INT)
            AS frame_first_byte
    FROM documents d,
        unnest(generate_series(
            0, CAST(ceil({_NB} / {_FRAME}.0) AS INT) - 1)) AS f(i)
    """,
    doc="Multimodal frame sampling: one row per fixed-size frame of the "
    "binary payload (video keyframe / audio chunk analogue), "
    "one-to-many mapInPandas fan-out.",
)
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    return sample_frames(_docs_with_payload(spark, sf), frame_size=_FRAME)


# --------------------------------------------------------------------------
@register(
    "mm_byte_features",
    oracle=f"""
    SELECT doc_id,
        CAST({_NB} AS BIGINT) AS f_len,
        CAST(ascii(substr(text, 1, 1)) AS INT) AS f_first,
        CAST(ascii(substr(text, length(text), 1)) AS INT) AS f_last,
        CAST({_NB} % 256 AS INT) AS f_mod
    FROM documents
    """,
    doc="Multimodal feature extraction stub: scalar features from raw "
    "bytes (embedding-encoder batch shape) via mapInPandas.",
)
def mm_byte_features(spark: SparkSession, sf: str) -> DataFrame:
    return byte_features(_docs_with_payload(spark, sf))


# --------------------------------------------------------------------------
@register(
    "mm_payload_metadata",
    oracle=f"""
    SELECT doc_id, 'image/fake' AS mime_type,
        CAST({_NB} AS BIGINT) AS n_bytes, source
    FROM documents
    """,
    doc="Multimodal metadata projection: typed metadata struct stays in "
    "JVM Column expressions (no Python), only payload bytes ever cross.",
)
def mm_payload_metadata(spark: SparkSession, sf: str) -> DataFrame:
    d = _docs_with_payload(spark, sf)
    return d.select(
        "doc_id",
        F.col("media_meta.mime_type").alias("mime_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        "source",
    )


# --------------------------------------------------------------------------
# REAL codec leg: synthesize genuine RIFF/WAVE PCM16 containers from
# per-doc parameters, run them through the REAL chunk-walking parser +
# integer DSP features (functions/multimodal.py::wav_decode_pcm16 /
# wav_audio_features), and let the oracle predict every output value
# from the SAME parameters arithmetically — the oracle never touches
# bytes, so a single mis-parsed header field or off-by-one in the
# feature math fails the hash. Square waves make the features exact
# integers: peak = amp, sum_sq = n * amp^2, zero crossings = block
# count - 1.
_WAV_RATE = 8000


@register(
    "mm_wav_pcm_roundtrip",
    oracle="""
    WITH p AS (
        SELECT doc_id,
            2 + doc_id % 7 AS half,
            1000 + (doc_id % 100) * 10 AS amp,
            800 + (doc_id % 50) * 16 AS n
        FROM documents
    )
    SELECT doc_id,
        CAST(8000 AS BIGINT) AS sample_rate,
        CAST(1 AS BIGINT) AS n_channels,
        CAST(16 AS BIGINT) AS bits,
        CAST(n AS BIGINT) AS n_samples,
        CAST(amp AS BIGINT) AS peak,
        CAST(n AS BIGINT) * amp * amp AS sum_sq,
        CAST((n + half - 1) // half - 1 AS BIGINT) AS zero_crossings
    FROM p ORDER BY doc_id
    """,
    doc="REAL audio decode path: encode a per-doc square wave as a "
    "genuine RIFF/WAVE PCM16 container (numpy-only encoder), parse it "
    "back with the real chunk-walking decoder, and extract exact "
    "integer DSP features — all inside Arrow-batched mapInPandas, the "
    "shape a production codec step has at 100 TB (only the binary "
    "payload crosses into Python; scan, partitioning and the census "
    "stay columnar). The oracle predicts every value from the "
    "synthesis parameters WITHOUT touching bytes, so the container "
    "layout, the parser, and the feature math are all on the hook. "
    "Compressed codecs stay capability-gated (NotImplementedError) — "
    "WAV/PCM is the format class honestly decodable with numpy alone.",
)
def mm_wav_pcm_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.multimodal import (
        wav_audio_features,
        wav_encode_pcm16,
    )

    d = table(spark, sf, "documents").select("doc_id")

    def _synth(pdfs):
        for pdf in pdfs:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                half = 2 + i % 7
                amp = 1000 + (i % 100) * 10
                n = 800 + (i % 50) * 16
                idx = np.arange(n)
                s = np.where(
                    (idx // half) % 2 == 0, amp, -amp
                ).astype(np.int16)
                rows.append((i, wav_encode_pcm16(s, _WAV_RATE)))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    wav = d.mapInPandas(_synth, "doc_id long, payload binary")
    return wav_audio_features(wav).orderBy("doc_id")


# --------------------------------------------------------------------------
# REAL image codec leg, the BMP sibling of mm_wav_pcm_roundtrip. The
# pixel formula is position-dependent and the census carries
# position-WEIGHTED sums, so the oracle's byte-free prediction fails
# on exactly the mistakes a hand-rolled BMP path invites: BGR order
# (sum_g/sum_b swap), bottom-up rows (wsum_ry), row padding (wsum_rx),
# decimation phase (dec_sum_r).
@register(
    "mm_bmp_rgb_roundtrip",
    oracle="""
    WITH p AS (
        SELECT doc_id, 5 + doc_id % 12 AS w, 3 + doc_id % 9 AS h
        FROM documents
    ),
    px AS (
        SELECT doc_id, w, h, tx.x AS x, ty.y AS y,
            (3 * tx.x + 7 * ty.y + doc_id) % 256 AS r,
            (tx.x + ty.y) % 256 AS g,
            (5 * tx.x + doc_id) % 256 AS b
        FROM p,
            unnest(generate_series(0, w - 1)) AS tx(x),
            unnest(generate_series(0, h - 1)) AS ty(y)
    )
    SELECT doc_id,
        CAST(any_value(w) AS BIGINT) AS width,
        CAST(any_value(h) AS BIGINT) AS height,
        CAST(sum(r) AS BIGINT) AS sum_r,
        CAST(sum(g) AS BIGINT) AS sum_g,
        CAST(sum(b) AS BIGINT) AS sum_b,
        CAST(sum(r * x) AS BIGINT) AS wsum_rx,
        CAST(sum(r * y) AS BIGINT) AS wsum_ry,
        CAST(sum(CASE WHEN x % 2 = 0 AND y % 2 = 0 THEN r ELSE 0 END)
             AS BIGINT) AS dec_sum_r
    FROM px GROUP BY doc_id ORDER BY doc_id
    """,
    doc="REAL image decode path: synthesize genuine uncompressed "
    "24-bit BMPs (BGR, bottom-up, row-padded — the true on-disk "
    "layout) from a position-dependent pixel formula, parse them back "
    "with the real numpy-only decoder, integer-decimate 2x (a real "
    "resize), and census exact integer features. Position-weighted "
    "sums put the layout itself on the hook: the oracle predicts "
    "every value from the formula without touching bytes. Compressed "
    "formats needing real codec libraries (JPEG/MP3/MP4) stay "
    "capability-gated; PNG is decodable with stdlib zlib (see "
    "mm_png_rgb_roundtrip), and uncompressed BMP with numpy alone.",
)
def mm_bmp_rgb_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.multimodal import (
        bmp_encode_rgb24,
        bmp_image_features,
    )

    d = table(spark, sf, "documents").select("doc_id")

    def _synth(pdfs):
        for pdf in pdfs:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 5 + i % 12, 3 + i % 9
                xs = np.arange(w)[None, :]
                ys = np.arange(h)[:, None]
                px = np.stack(
                    [
                        (3 * xs + 7 * ys + i) % 256,
                        (xs + ys + 0 * ys) % 256,
                        (5 * xs + i + 0 * ys) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                rows.append((i, bmp_encode_rgb24(px)))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    bmp = d.mapInPandas(_synth, "doc_id long, payload binary")
    return bmp_image_features(bmp).orderBy("doc_id")


# REAL compressed-image codec leg: PNG's body is DEFLATE, and zlib is
# Python stdlib — so unlike JPEG/MP3/MP4 (DCT/entropy codecs that
# genuinely need absent libraries) PNG earns a real decoder
# (functions/multimodal.py::png_decode_rgb8: CRC-checked chunks,
# multi-IDAT inflate, all five scanline unfilters). The synthesized
# containers CYCLE the filter type per row (None/Sub/Up/Average/
# Paeth), so the position-weighted census only matches the oracle's
# byte-free prediction if every unfilter path reconstructs exactly;
# odd doc_ids carry an alpha channel (color type 6) to exercise RGBA.
@register(
    "mm_png_rgb_roundtrip",
    oracle="""
    WITH p AS (
        SELECT doc_id, 4 + doc_id % 13 AS w, 2 + doc_id % 7 AS h,
            CASE WHEN doc_id % 2 = 1 THEN 4 ELSE 3 END AS ch
        FROM documents
    ),
    px AS (
        SELECT doc_id, w, h, ch, tx.x AS x, ty.y AS y,
            (2 * tx.x + 11 * ty.y + doc_id) % 256 AS r,
            (7 * tx.x + 3 * ty.y) % 256 AS g,
            (tx.x * ty.y + doc_id) % 256 AS b,
            CASE WHEN ch = 4 THEN (tx.x + 13 * ty.y) % 256 ELSE 0 END
                AS a
        FROM p,
            unnest(generate_series(0, w - 1)) AS tx(x),
            unnest(generate_series(0, h - 1)) AS ty(y)
    )
    SELECT doc_id,
        CAST(any_value(w) AS BIGINT) AS width,
        CAST(any_value(h) AS BIGINT) AS height,
        CAST(any_value(ch) AS BIGINT) AS n_channels,
        CAST(sum(r) AS BIGINT) AS sum_r,
        CAST(sum(g) AS BIGINT) AS sum_g,
        CAST(sum(b) AS BIGINT) AS sum_b,
        CAST(sum(a) AS BIGINT) AS sum_a,
        CAST(sum(r * x) AS BIGINT) AS wsum_rx,
        CAST(sum(r * y) AS BIGINT) AS wsum_ry,
        CAST(sum(CASE WHEN x % 2 = 0 AND y % 2 = 0 THEN r ELSE 0 END)
             AS BIGINT) AS dec_sum_r
    FROM px GROUP BY doc_id ORDER BY doc_id
    """,
    doc="REAL compressed-image decode path: synthesize genuine PNGs "
    "(stdlib zlib DEFLATE, CRC-checked chunks, per-row filter type "
    "cycling through None/Sub/Up/Average/Paeth; RGBA on odd doc_ids) "
    "from a position-dependent pixel formula, parse them back with "
    "the real stdlib+numpy decoder, and census exact integer "
    "position-weighted features the oracle predicts without touching "
    "bytes — a wrong unfilter, CRC skip, or channel mix-up cannot "
    "hash-match. Zero-shuffle Arrow map, embarrassingly parallel; "
    "JPEG/MP3/MP4 remain capability-gated (their codecs genuinely "
    "need absent libraries), PNG does not.",
)
def mm_png_rgb_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.multimodal import (
        png_encode_rgb8,
        png_image_features,
    )

    d = table(spark, sf, "documents").select("doc_id")

    def _synth(pdfs):
        for pdf in pdfs:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = 4 + i % 13, 2 + i % 7
                ch = 4 if i % 2 == 1 else 3
                xs = np.arange(w)[None, :]
                ys = np.arange(h)[:, None]
                planes = [
                    (2 * xs + 11 * ys + i) % 256,
                    (7 * xs + 3 * ys) % 256,
                    (xs * ys + i) % 256,
                ]
                if ch == 4:
                    planes.append((xs + 13 * ys) % 256)
                px = np.stack(
                    [np.broadcast_to(p, (h, w)) for p in planes], axis=-1
                ).astype(np.uint8)
                rows.append((i, png_encode_rgb8(px)))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    png = d.mapInPandas(_synth, "doc_id long, payload binary")
    return png_image_features(png).orderBy("doc_id")
