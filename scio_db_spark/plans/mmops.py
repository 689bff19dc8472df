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
    # spread_for_compute: payload synthesis + codec decode is the most
    # CPU-dense per-row work in the repo (see catalog.table's gate).
    return with_binary_payload(
        table(spark, sf, "documents", spread_for_compute=True)
    )


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

    d = table(
        # spread: codec synth + decode is CPU-dense per-row map
        # work and the single-file scan otherwise caps its
        # parallelism at the row-group count (byte-gated — see
        # catalog.table; at-scale layouts never add a shuffle)
        spark, sf, "documents", spread_for_compute=True
    ).select("doc_id")

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
    "formats needing real codec libraries (MP3/MP4) stay "
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

    d = table(
        # spread: codec synth + decode is CPU-dense per-row map
        # work and the single-file scan otherwise caps its
        # parallelism at the row-group count (byte-gated — see
        # catalog.table; at-scale layouts never add a shuffle)
        spark, sf, "documents", spread_for_compute=True
    ).select("doc_id")

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
# Python stdlib — so unlike MP3/MP4 (entropy codecs that
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
    "MP3/MP4 remain capability-gated (their codecs genuinely need "
    "absent libraries); PNG does not, and round-12 gives baseline "
    "JPEG a real codec too (jpegcodec.py).",
)
def mm_png_rgb_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.multimodal import (
        png_encode_rgb8,
        png_image_features,
    )

    d = table(
        # spread: codec synth + decode is CPU-dense per-row map
        # work and the single-file scan otherwise caps its
        # parallelism at the row-group count (byte-gated — see
        # catalog.table; at-scale layouts never add a shuffle)
        spark, sf, "documents", spread_for_compute=True
    ).select("doc_id")

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


# ------------------------------------------------- perceptual near-dup
# Image-modality NEAR-duplicate detection, the multimodal sibling of
# the text MinHash/SimHash family. Images are synthesized as GENUINE
# PNGs from a per-doc pixel formula (content id cid = doc_id % 40, so
# each content has ~a dozen verbatim re-encodes at sf0.01; docs with
# doc_id % 5 = 3 additionally carry a one-pixel +40 brightness edit —
# a true near-duplicate, 0-1 dHash bits away), decoded with the real
# stdlib codec, and fingerprinted with the exact-integer 64-bit dHash
# (functions/multimodal.py::dhash64_from_pixels). The oracle predicts
# every hash ANALYTICALLY from the pixel formula — a wrong unfilter,
# pooling, comparison or two's-complement wrap cannot hash-match.

_IMG_W, _IMG_H = 18, 16
_N_CONTENT = 40
#: red-channel pixel formula shared with the oracle (x in [0,18),
#: y in [0,16), cid = doc_id % 40; +40 single-pixel edit on variants)
_RED_SQL = (
    "(3 * x * x + 5 * y * y + 7 * (doc_id % 40)"
    " + x * y * (1 + (doc_id % 40) % 3)"
    " + CASE WHEN doc_id % 5 = 3 AND x = 1 AND y = 1"
    "        THEN 40 ELSE 0 END) % 256"
)

_DHASH_ORACLE = f"""
    WITH px AS (
        SELECT doc_id, tx.x AS x, ty.y AS y, {_RED_SQL} AS r
        FROM documents,
            unnest(generate_series(0, {_IMG_W - 1})) AS tx(x),
            unnest(generate_series(0, {_IMG_H - 1})) AS ty(y)
    ),
    cell AS (
        SELECT doc_id, x // 2 AS gx, y // 2 AS gy,
            CAST(sum(r) AS BIGINT) // 4 AS pooled
        FROM px GROUP BY doc_id, x // 2, y // 2
    ),
    bits AS (
        SELECT a.doc_id, a.gy * 8 + a.gx AS i,
            CASE WHEN b.pooled > a.pooled THEN 1 ELSE 0 END AS bit
        FROM cell a
        JOIN cell b ON a.doc_id = b.doc_id
            AND b.gx = a.gx + 1 AND b.gy = a.gy
        WHERE a.gx < 8
    ),
    h AS (
        SELECT doc_id, CAST(sum(CASE WHEN bit = 1 THEN
            CASE WHEN i = 63 THEN -9223372036854775808
                 ELSE (1::BIGINT << i) END ELSE 0 END) AS BIGINT)
            AS dhash64
        FROM bits GROUP BY doc_id
    )
"""


@register(
    "mm_image_dhash_census",
    oracle=_DHASH_ORACLE
    + "SELECT doc_id, dhash64 FROM h ORDER BY doc_id",
    doc="Perceptual image fingerprinting over the REAL PNG codec: "
    "synthesize genuine PNGs from the shared pixel formula, decode "
    "them back (CRC-checked chunks, zlib inflate, unfilter), 2x2 "
    "integer mean-pool the red channel to an 8x9 grid, and emit the "
    "64-bit dHash as a signed BIGINT. The oracle rebuilds every hash "
    "from the formula without touching bytes. Zero-shuffle Arrow "
    "map; at 100 TB this is the embarrassingly-parallel fingerprint "
    "pass that feeds the banded near-dup join below.",
)
def mm_image_dhash_census(spark: SparkSession, sf: str) -> DataFrame:
    return _image_dhashes(spark, sf).orderBy("doc_id")


def _image_dhashes(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.multimodal import (
        png_encode_rgb8,
        png_image_dhash64,
    )

    d = table(
        # spread: codec synth + decode is CPU-dense per-row map
        # work and the single-file scan otherwise caps its
        # parallelism at the row-group count (byte-gated — see
        # catalog.table; at-scale layouts never add a shuffle)
        spark, sf, "documents", spread_for_compute=True
    ).select("doc_id")
    w, h, ncont = _IMG_W, _IMG_H, _N_CONTENT

    def _synth(pdfs):
        for pdf in pdfs:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                cid = i % ncont
                xs = np.arange(w)[None, :]
                ys = np.arange(h)[:, None]
                r = (
                    3 * xs * xs + 5 * ys * ys + 7 * cid
                    + xs * ys * (1 + cid % 3)
                ) + np.zeros((h, w), dtype=np.int64)
                if i % 5 == 3:
                    r[1, 1] += 40  # one-pixel brightness edit
                g = (7 * xs + 3 * ys) % 256 + np.zeros((h, w), np.int64)
                b = (xs * ys + cid) % 256 + np.zeros((h, w), np.int64)
                px = np.stack(
                    [r % 256, g, b], axis=-1
                ).astype(np.uint8)
                rows.append((i, png_encode_rgb8(px)))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    png = d.mapInPandas(_synth, "doc_id long, payload binary")
    return png_image_dhash64(png)


@register(
    "mm_image_neardup_pairs",
    oracle=_DHASH_ORACLE
    + """,
    classes AS (
        SELECT dhash64, min(doc_id) AS canon FROM h GROUP BY dhash64
    ),
    star AS (
        SELECT c.canon AS doc_a, h.doc_id AS doc_b,
            CAST(0 AS BIGINT) AS hamming
        FROM h JOIN classes c ON h.dhash64 = c.dhash64
        WHERE h.doc_id <> c.canon
    ),
    bands AS (
        SELECT canon, dhash64, k.k AS k,
            (dhash64 >> (16 * k.k)) & 65535 AS v
        FROM classes, unnest(generate_series(0, 3)) AS k(k)
    ),
    cand AS (
        SELECT DISTINCT a.canon AS doc_a, b.canon AS doc_b,
            a.dhash64 AS ha, b.dhash64 AS hb
        FROM bands a JOIN bands b
            ON a.k = b.k AND a.v = b.v AND a.canon < b.canon
    ),
    cross_class AS (
        SELECT doc_a, doc_b,
            CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(ha, hb)) BETWEEN 1 AND 6
    )
    SELECT doc_a, doc_b, hamming FROM star
    UNION ALL
    SELECT doc_a, doc_b, hamming FROM cross_class
    ORDER BY doc_a, doc_b
    """,
    doc="Image near-duplicate pairing over perceptual hashes, shaped "
    "exactly like the bounded text-LSH family: EXACT-dup collapse "
    "first (identical dHash -> min-doc_id canonical + linear star "
    "edges, never c^2 pairs), then Hamming-LSH banding over DISTINCT "
    "hashes only (4 x 16-bit bands; two hashes within Hamming 6 "
    "collide on >=1 band by pigeonhole over 64/16) and a popcount "
    "verify (1 <= hamming <= 6). At 100 TB the star edges stay "
    "linear in re-encode cluster size and the band join runs over "
    "distinct fingerprints, mirroring bounded_lsh_pairs' scale "
    "shape.",
)
def mm_image_neardup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    hashes = _image_dhashes(spark, sf)
    classes = hashes.groupBy("dhash64").agg(
        F.min("doc_id").alias("canon")
    )
    star = (
        hashes.join(classes, "dhash64")
        .filter(F.col("doc_id") != F.col("canon"))
        .select(
            F.col("canon").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    bands = classes.select(
        "canon",
        "dhash64",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("k"),
                    (
                        F.shiftright(F.col("dhash64"), 16 * k)
                        .bitwiseAND(F.lit(65535))
                    ).alias("v"),
                )
                for k in range(4)
            ])
        ).alias("band"),
    ).select("canon", "dhash64", "band.k", "band.v")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.canon") < F.col("b.canon")),
        )
        .select(
            F.col("a.canon").alias("doc_a"),
            F.col("b.canon").alias("doc_b"),
            F.col("a.dhash64").alias("ha"),
            F.col("b.dhash64").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(
        F.col("ha").bitwiseXOR(F.col("hb"))
    ).cast("long")
    cross = cand.select(
        "doc_a", "doc_b", ham.alias("hamming")
    ).filter(F.col("hamming").between(1, 6))
    return star.unionByName(cross).orderBy("doc_a", "doc_b")


# ------------------------------------------------- audio fingerprint
# Audio-modality near-dup, completing the set (text MinHash/SimHash,
# embedding cosine, image dHash): synthesize REAL WAV PCM16 files —
# three 256-sample segments per doc, each one BIN-CENTERED sine whose
# frequency the shared formula picks (bin-centered means zero spectral
# leakage, so the FFT argmax is the chosen bin exactly, with the int16
# rounding noise ~5 orders of magnitude under the peak) — decode with
# the real RIFF parser, FFT each segment, and fingerprint the doc as
# its per-segment dominant-bin sequence. Docs share a content id
# (cid = doc_id % 40); variants (doc_id % 5 = 3) shift segment 1's
# sine up ONE bin — an audible-pitch-nudge near-duplicate whose
# fingerprint differs in exactly one segment.

_AUD_FRAME = 256
_AUD_SEGS = 3
_AUD_SR = 8000
_AUD_AMP = 12000
#: segment j's FFT bin for doc_id (shared with the oracle): bins stay
#: in [5, 105] << frame/2 = 128, and the variant's +1 never collides
#: with the modulus wrap
_AUD_BIN_SQL = (
    "5 + ((doc_id % 40) * 7 + {j} * 13) % 100"
    " + CASE WHEN {j} = 1 AND doc_id % 5 = 3 THEN 1 ELSE 0 END"
)


def _audio_peaks(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.multimodal import (
        wav_encode_pcm16,
        wav_spectral_peaks,
    )

    d = table(
        # spread: codec synth + decode is CPU-dense per-row map
        # work and the single-file scan otherwise caps its
        # parallelism at the row-group count (byte-gated — see
        # catalog.table; at-scale layouts never add a shuffle)
        spark, sf, "documents", spread_for_compute=True
    ).select("doc_id")
    frame, segs, sr, amp = _AUD_FRAME, _AUD_SEGS, _AUD_SR, _AUD_AMP

    def _synth(pdfs):
        for pdf in pdfs:
            rows = []
            t = np.arange(frame)
            for i in pdf["doc_id"]:
                i = int(i)
                cid = i % 40
                segments = []
                for j in range(segs):
                    k = 5 + (cid * 7 + j * 13) % 100
                    if j == 1 and i % 5 == 3:
                        k += 1  # one-bin pitch nudge: the variant
                    segments.append(
                        np.round(
                            amp * np.sin(2 * np.pi * k * t / frame)
                        ).astype(np.int16)
                    )
                rows.append(
                    (i, wav_encode_pcm16(np.concatenate(segments), sr))
                )
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    wav = d.mapInPandas(_synth, "doc_id long, payload binary")
    return wav_spectral_peaks(wav, frame=frame)


@register(
    "mm_audio_peak_census",
    oracle="SELECT doc_id, j.j AS frame_idx, CAST("
    + _AUD_BIN_SQL.replace("{j}", "j.j")
    + " AS BIGINT) AS peak_bin FROM documents, "
    "unnest(generate_series(0, 2)) AS j(j) "
    "ORDER BY doc_id, frame_idx",
    doc="Audio fingerprinting over the REAL WAV codec: synthesize "
    "genuine PCM16 WAVs (three bin-centered sine segments from the "
    "shared formula), decode with the real RIFF parser, FFT each "
    "256-sample window, and emit the dominant bin per window. The "
    "oracle predicts every peak analytically — a wrong chunk walk, "
    "sample decode, windowing or FFT indexing cannot hash-match. "
    "Zero-shuffle Arrow map; the 100 TB shape is the parallel "
    "fingerprint pass feeding the banded near-dup join.",
)
def mm_audio_peak_census(spark: SparkSession, sf: str) -> DataFrame:
    return _audio_peaks(spark, sf).orderBy("doc_id", "frame_idx")


@register(
    "mm_audio_neardup_pairs",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
            {_AUD_BIN_SQL.format(j=0)} AS b0,
            {_AUD_BIN_SQL.format(j=1)} AS b1,
            {_AUD_BIN_SQL.format(j=2)} AS b2
        FROM documents
    ),
    fp AS (
        SELECT doc_id, b0, b1, b2,
            b0 || '-' || b1 || '-' || b2 AS fp
        FROM f
    ),
    classes AS (
        SELECT fp, min(doc_id) AS canon,
            any_value(b0) AS b0, any_value(b1) AS b1,
            any_value(b2) AS b2
        FROM fp GROUP BY fp
    ),
    star AS (
        SELECT c.canon AS doc_a, fp.doc_id AS doc_b,
            CAST(0 AS BIGINT) AS n_segs_diff
        FROM fp JOIN classes c ON fp.fp = c.fp
        WHERE fp.doc_id <> c.canon
    ),
    bands AS (
        SELECT canon, b0, b1, b2, j.j AS j,
            CASE j.j
                WHEN 0 THEN '*-' || b1 || '-' || b2
                WHEN 1 THEN b0 || '-*-' || b2
                ELSE b0 || '-' || b1 || '-*'
            END AS v
        FROM classes, unnest(generate_series(0, 2)) AS j(j)
    ),
    cand AS (
        SELECT DISTINCT a.canon AS doc_a, b.canon AS doc_b,
            CAST((CASE WHEN a.b0 <> b.b0 THEN 1 ELSE 0 END)
               + (CASE WHEN a.b1 <> b.b1 THEN 1 ELSE 0 END)
               + (CASE WHEN a.b2 <> b.b2 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_segs_diff
        FROM bands a JOIN bands b
            ON a.j = b.j AND a.v = b.v AND a.canon < b.canon
    )
    SELECT doc_a, doc_b, n_segs_diff FROM star
    UNION ALL
    SELECT doc_a, doc_b, n_segs_diff FROM cand
    WHERE n_segs_diff = 1
    ORDER BY doc_a, doc_b
    """,
    doc="Audio near-duplicate pairing over spectral fingerprints, "
    "same scale shape as the image/text families: exact collapse "
    "(identical fingerprint -> min-doc_id canonical + linear star "
    "edges), then leave-one-segment-out banding over DISTINCT "
    "fingerprints (two fingerprints within one segment collide on "
    ">=1 band by pigeonhole) and an exact diff-count verify. Band "
    "joins run over distinct fingerprints only — re-encode clusters "
    "never produce c^2 pairs.",
)
def mm_audio_neardup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    peaks = _audio_peaks(spark, sf)
    fp = (
        peaks.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("frame_idx", "peak_bin"))
            ).alias("pb")
        )
        .select(
            "doc_id",
            *[
                F.col("pb")[j]["peak_bin"].alias(f"b{j}")
                for j in range(_AUD_SEGS)
            ],
        )
        .withColumn(
            "fp", F.concat_ws("-", *[f"b{j}" for j in range(_AUD_SEGS)])
        )
    )
    classes = fp.groupBy("fp").agg(
        F.min("doc_id").alias("canon"),
        *[F.first(f"b{j}").alias(f"b{j}") for j in range(_AUD_SEGS)],
    )
    star = (
        fp.select("doc_id", "fp")
        .join(classes.select("fp", "canon"), "fp")
        .filter(F.col("doc_id") != F.col("canon"))
        .select(
            F.col("canon").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.lit(0).cast("long").alias("n_segs_diff"),
        )
    )
    wild = [
        F.concat_ws(
            "-",
            *[
                F.lit("*") if j == k else F.col(f"b{j}").cast("string")
                for j in range(_AUD_SEGS)
            ],
        ).alias("v")
        for k in range(_AUD_SEGS)
    ]
    bands = classes.select(
        "canon",
        *[f"b{j}" for j in range(_AUD_SEGS)],
        F.explode(
            F.array(*[
                F.struct(F.lit(k).alias("j"), wild[k])
                for k in range(_AUD_SEGS)
            ])
        ).alias("band"),
    ).select(
        "canon",
        *[f"b{j}" for j in range(_AUD_SEGS)],
        "band.j",
        "band.v",
    )
    a, b = bands.alias("a"), bands.alias("b")
    diff = sum(
        F.when(F.col(f"a.b{j}") != F.col(f"b.b{j}"), 1).otherwise(0)
        for j in range(_AUD_SEGS)
    ).cast("long")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.canon") < F.col("b.canon")),
        )
        .select(
            F.col("a.canon").alias("doc_a"),
            F.col("b.canon").alias("doc_b"),
            diff.alias("n_segs_diff"),
        )
        .distinct()
    )
    return star.unionByName(
        cand.filter(F.col("n_segs_diff") == 1)
    ).orderBy("doc_a", "doc_b")


# ------------------------------------------------- video frame hashes
# Video modality: real PNG frames in the deterministic MPNG container
# (functions/multimodal.py — real codecs for the frames, a minimal
# length-prefixed index standing in for the env-gated MP4 demuxer).
# Six frames per doc; the kernel SAMPLES every 2nd frame (0, 2, 4 —
# unsampled frames are never inflated) and dHashes each sampled frame
# through the real PNG decoder. Content id cid = doc_id % 40 as in
# the image/audio legs; variants (doc_id % 5 = 3) carry the one-pixel
# +40 edit on SAMPLED frame 2 only, so the video fingerprint differs
# in exactly one sampled frame.

_VID_FRAMES = 6
_VID_STRIDE = 2
#: red-channel formula with frame index f (x*f term so consecutive
#: frames differ STRUCTURALLY — a uniform brightness shift would
#: cancel in the dHash differences)
_VID_RED_SQL = (
    "(3 * x * x + 5 * y * y + 7 * (doc_id % 40)"
    " + x * y * (1 + (doc_id % 40) % 3)"
    " + f * x * (2 + f % 3)"
    " + CASE WHEN doc_id % 5 = 3 AND f = 2 AND x = 1 AND y = 1"
    "        THEN 40 ELSE 0 END) % 256"
)

_VID_DHASH_ORACLE = f"""
    WITH px AS (
        SELECT doc_id, tf.f AS f, tx.x AS x, ty.y AS y,
            {_VID_RED_SQL} AS r
        FROM documents,
            unnest(generate_series(0, {_VID_FRAMES - 1}, {_VID_STRIDE}))
                AS tf(f),
            unnest(generate_series(0, {_IMG_W - 1})) AS tx(x),
            unnest(generate_series(0, {_IMG_H - 1})) AS ty(y)
    ),
    cell AS (
        SELECT doc_id, f, x // 2 AS gx, y // 2 AS gy,
            CAST(sum(r) AS BIGINT) // 4 AS pooled
        FROM px GROUP BY doc_id, f, x // 2, y // 2
    ),
    bits AS (
        SELECT a.doc_id, a.f, a.gy * 8 + a.gx AS i,
            CASE WHEN b.pooled > a.pooled THEN 1 ELSE 0 END AS bit
        FROM cell a
        JOIN cell b ON a.doc_id = b.doc_id AND a.f = b.f
            AND b.gx = a.gx + 1 AND b.gy = a.gy
        WHERE a.gx < 8
    ),
    h AS (
        SELECT doc_id, f AS frame_idx,
            CAST(sum(CASE WHEN bit = 1 THEN
                CASE WHEN i = 63 THEN -9223372036854775808
                     ELSE (1::BIGINT << i) END ELSE 0 END) AS BIGINT)
                AS dhash64
        FROM bits GROUP BY doc_id, f
    )
"""


def _video_framehashes(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.multimodal import (
        mpng_encode,
        mpng_sampled_framehash,
        png_encode_rgb8,
    )

    d = table(
        # spread: codec synth + decode is CPU-dense per-row map
        # work and the single-file scan otherwise caps its
        # parallelism at the row-group count (byte-gated — see
        # catalog.table; at-scale layouts never add a shuffle)
        spark, sf, "documents", spread_for_compute=True
    ).select("doc_id")
    w, h, nf = _IMG_W, _IMG_H, _VID_FRAMES

    def _synth(pdfs):
        for pdf in pdfs:
            rows = []
            xs = np.arange(w)[None, :]
            ys = np.arange(h)[:, None]
            for i in pdf["doc_id"]:
                i = int(i)
                cid = i % 40
                frames = []
                for f in range(nf):
                    r = (
                        3 * xs * xs + 5 * ys * ys + 7 * cid
                        + xs * ys * (1 + cid % 3)
                        + f * xs * (2 + f % 3)
                    ) + np.zeros((h, w), dtype=np.int64)
                    if i % 5 == 3 and f == 2:
                        r[1, 1] += 40
                    g = (5 * xs + f + ys) % 256 + np.zeros(
                        (h, w), np.int64
                    )
                    b = (xs + ys * f) % 256 + np.zeros((h, w), np.int64)
                    px = np.stack(
                        [r % 256, g, b], axis=-1
                    ).astype(np.uint8)
                    frames.append(png_encode_rgb8(px))
                rows.append((i, mpng_encode(frames)))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    vid = d.mapInPandas(_synth, "doc_id long, payload binary")
    return mpng_sampled_framehash(vid, stride=_VID_STRIDE)


@register(
    "mm_video_framehash_census",
    oracle=_VID_DHASH_ORACLE
    + "SELECT doc_id, frame_idx, dhash64 FROM h "
    "ORDER BY doc_id, frame_idx",
    doc="Video fingerprinting: real PNG frames in the MPNG container, "
    "every-2nd-frame SAMPLING (unsampled frames never inflated), "
    "per-sampled-frame 64-bit dHash through the real codec. The "
    "oracle rebuilds each sampled frame's hash analytically from the "
    "frame-indexed pixel formula. Zero-shuffle Arrow map; at 100 TB "
    "decode cost scales with the sample, not the footage.",
)
def mm_video_framehash_census(spark: SparkSession, sf: str) -> DataFrame:
    return _video_framehashes(spark, sf).orderBy("doc_id", "frame_idx")


@register(
    "mm_video_neardup_pairs",
    oracle=_VID_DHASH_ORACLE
    + """,
    fp AS (
        SELECT doc_id,
            min(CASE WHEN frame_idx = 0 THEN dhash64 END) AS h0,
            min(CASE WHEN frame_idx = 2 THEN dhash64 END) AS h1,
            min(CASE WHEN frame_idx = 4 THEN dhash64 END) AS h2
        FROM h GROUP BY doc_id
    ),
    fps AS (
        SELECT doc_id, h0, h1, h2,
            h0 || '-' || h1 || '-' || h2 AS fp
        FROM fp
    ),
    classes AS (
        SELECT fp, min(doc_id) AS canon,
            any_value(h0) AS h0, any_value(h1) AS h1,
            any_value(h2) AS h2
        FROM fps GROUP BY fp
    ),
    star AS (
        SELECT c.canon AS doc_a, fps.doc_id AS doc_b,
            CAST(0 AS BIGINT) AS n_frames_diff
        FROM fps JOIN classes c ON fps.fp = c.fp
        WHERE fps.doc_id <> c.canon
    ),
    bands AS (
        SELECT canon, h0, h1, h2, j.j AS j,
            CASE j.j
                WHEN 0 THEN '*-' || h1 || '-' || h2
                WHEN 1 THEN h0 || '-*-' || h2
                ELSE h0 || '-' || h1 || '-*'
            END AS v
        FROM classes, unnest(generate_series(0, 2)) AS j(j)
    ),
    cand AS (
        SELECT DISTINCT a.canon AS doc_a, b.canon AS doc_b,
            CAST((CASE WHEN a.h0 <> b.h0 THEN 1 ELSE 0 END)
               + (CASE WHEN a.h1 <> b.h1 THEN 1 ELSE 0 END)
               + (CASE WHEN a.h2 <> b.h2 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_frames_diff
        FROM bands a JOIN bands b
            ON a.j = b.j AND a.v = b.v AND a.canon < b.canon
    )
    SELECT doc_a, doc_b, n_frames_diff FROM star
    UNION ALL
    SELECT doc_a, doc_b, n_frames_diff FROM cand
    WHERE n_frames_diff = 1
    ORDER BY doc_a, doc_b
    """,
    doc="Video near-duplicate pairing over sampled-frame dHash "
    "sequences: exact collapse (identical fingerprint -> canonical + "
    "linear star edges) then leave-one-frame-out banding over "
    "DISTINCT fingerprints with an exact diff-count verify — the "
    "same bounded shape as the text/image/audio families, closing "
    "the modality set.",
)
def mm_video_neardup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    hashes = _video_framehashes(spark, sf)
    sampled = [0, 2, 4]
    fp = (
        hashes.groupBy("doc_id")
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("frame_idx") == fi, F.col("dhash64")
                    )
                ).alias(f"h{j}")
                for j, fi in enumerate(sampled)
            ]
        )
        .withColumn(
            "fp", F.concat_ws("-", *[f"h{j}" for j in range(3)])
        )
    )
    classes = fp.groupBy("fp").agg(
        F.min("doc_id").alias("canon"),
        *[F.first(f"h{j}").alias(f"h{j}") for j in range(3)],
    )
    star = (
        fp.select("doc_id", "fp")
        .join(classes.select("fp", "canon"), "fp")
        .filter(F.col("doc_id") != F.col("canon"))
        .select(
            F.col("canon").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.lit(0).cast("long").alias("n_frames_diff"),
        )
    )
    wild = [
        F.concat_ws(
            "-",
            *[
                F.lit("*") if j == k else F.col(f"h{j}").cast("string")
                for j in range(3)
            ],
        ).alias("v")
        for k in range(3)
    ]
    bands = classes.select(
        "canon",
        *[f"h{j}" for j in range(3)],
        F.explode(
            F.array(*[
                F.struct(F.lit(k).alias("j"), wild[k])
                for k in range(3)
            ])
        ).alias("band"),
    ).select(
        "canon", *[f"h{j}" for j in range(3)], "band.j", "band.v"
    )
    a, b = bands.alias("a"), bands.alias("b")
    diff = sum(
        F.when(F.col(f"a.h{j}") != F.col(f"b.h{j}"), 1).otherwise(0)
        for j in range(3)
    ).cast("long")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.canon") < F.col("b.canon")),
        )
        .select(
            F.col("a.canon").alias("doc_a"),
            F.col("b.canon").alias("doc_b"),
            diff.alias("n_frames_diff"),
        )
        .distinct()
    )
    return star.unionByName(
        cand.filter(F.col("n_frames_diff") == 1)
    ).orderBy("doc_a", "doc_b")


# ------------------------------------------------- baseline JPEG leg
# Round 12 closes the last image-format honesty gate: baseline
# sequential JPEG (grayscale, tables embedded per T.81) is markers +
# Huffman + DCT — implementable on numpy, so it gets a REAL codec
# (functions/jpegcodec.py), not a capability gate. The oracle-checked
# leg uses the codec's DC-exactness contract: an image of CONSTANT
# 8x8 blocks under a flat quant table round-trips bit-exactly (all
# block energy in DC; AC quantizes to zero), so every decoded pixel —
# and therefore every position-weighted census sum — is analytically
# predictable. Color (YCbCr + subsampling) and progressive stay
# named-unsupported.

_JPEG_BX, _JPEG_BY = 3, 2  # blocks per axis -> 24x16 pixels
_JPEG_VAL_SQL = (
    "(7 * doc_id + 11 * (x // 8) + 13 * (y // 8) * (y // 8)) % 256"
)


@register(
    "mm_jpeg_dc_roundtrip",
    oracle=f"""
    WITH px AS (
        SELECT doc_id, tx.x AS x, ty.y AS y, {_JPEG_VAL_SQL} AS g
        FROM documents,
            unnest(generate_series(0, {_JPEG_BX * 8 - 1})) AS tx(x),
            unnest(generate_series(0, {_JPEG_BY * 8 - 1})) AS ty(y)
    )
    SELECT doc_id,
        CAST({_JPEG_BX * 8} AS BIGINT) AS width,
        CAST({_JPEG_BY * 8} AS BIGINT) AS height,
        CAST(sum(g) AS BIGINT) AS sum_gray,
        CAST(sum(g * x) AS BIGINT) AS wsum_gx,
        CAST(sum(g * y) AS BIGINT) AS wsum_gy,
        CAST(sum(CASE WHEN x % 2 = 0 AND y % 2 = 0 THEN g ELSE 0 END)
             AS BIGINT) AS dec_sum_g
    FROM px GROUP BY doc_id ORDER BY doc_id
    """,
    doc="REAL baseline JPEG path: synthesize genuine grayscale JPEGs "
    "(markers, embedded quant + canonical Huffman tables, DCT, "
    "byte-stuffed entropy scan) from constant-8x8-block images, "
    "decode them back with the real T.81 decoder, and census exact "
    "position-weighted pixel sums the oracle predicts without "
    "touching bytes — DC-exactness makes the lossy format "
    "hash-verifiable. Zero-shuffle Arrow map; progressive/color "
    "JPEG remain named-unsupported.",
)
def mm_jpeg_dc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.jpegcodec import (
        jpeg_decode_gray,
        jpeg_encode_gray,
    )

    d = table(
        # spread: codec synth + decode is CPU-dense per-row map
        # work and the single-file scan otherwise caps its
        # parallelism at the row-group count (byte-gated — see
        # catalog.table; at-scale layouts never add a shuffle)
        spark, sf, "documents", spread_for_compute=True
    ).select("doc_id")
    nbx, nby = _JPEG_BX, _JPEG_BY

    def _rt(pdfs):
        for pdf in pdfs:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                vals = np.empty((nby, nbx), dtype=np.int64)
                for by in range(nby):
                    for bx in range(nbx):
                        vals[by, bx] = (
                            7 * i + 11 * bx + 13 * by * by
                        ) % 256
                img = np.repeat(
                    np.repeat(vals, 8, axis=0), 8, axis=1
                ).astype(np.uint8)
                g = jpeg_decode_gray(jpeg_encode_gray(img)).astype(
                    np.int64
                )
                h, w = g.shape
                xs = np.arange(w)
                ys = np.arange(h)
                rows.append(
                    (
                        i, w, h,
                        int(g.sum()),
                        int((g * xs[None, :]).sum()),
                        int((g * ys[:, None]).sum()),
                        int(g[::2, ::2].sum()),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "width", "height", "sum_gray",
                        "wsum_gx", "wsum_gy", "dec_sum_g",
                    ],
                )

    return d.mapInPandas(
        _rt,
        "doc_id long, width long, height long, sum_gray long,"
        " wsum_gx long, wsum_gy long, dec_sum_g long",
    ).orderBy("doc_id")
