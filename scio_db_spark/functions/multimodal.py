"""Multimodal (binary-column) operators.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; the heavy per-record work (decode, feature extraction, frame
sampling) runs as Arrow-batched ``mapInPandas`` — the UDF receives
whole record batches, operates on raw ``bytes``, and can fan one row
out to many (frame sampling), which is exactly the shape a real
image/audio codec step needs at 100 TB: the scan stays columnar, only
the binary payload crosses into Python, and partitioning/pushdown are
untouched because everything else remains Column expressions.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this environment,
so ``decode`` is a clearly-marked deterministic fake that parses a
fake header from the real bytes (``codec="fake"``); requesting a real
codec raises ``NotImplementedError``. The Spark-side plumbing —
schemas, batch iteration, row fan-out, partition behavior — is real
and oracle-tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Typed metadata carried alongside every binary payload.
MEDIA_META_FIELDS = "mime_type string, n_bytes long"

DECODE_META_FIELDS = (
    "n_bytes long, width int, height int, first_byte int, last_byte int"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", mime: str = "image/fake"
) -> DataFrame:
    """Attach an opaque binary payload + metadata struct.

    Test stand-in: the payload is the UTF-8 encoding of ``text_col``
    (the synthetic tables carry no real media). In production this
    column comes straight from the source (parquet ``binary``).
    """
    return df.withColumns(
        {
            "payload": F.encode(F.col(text_col), "UTF-8"),
            "media_meta": F.struct(
                F.lit(mime).alias("mime_type"),
                F.octet_length(F.col(text_col)).alias("n_bytes"),
            ),
        }
    )


def _fake_decode(b: bytes) -> tuple[int, int, int, int, int]:
    """Deterministic fake codec: 'header' = first two bytes.

    width = b[0]*256 + b[1]; height = n_bytes % 4096. A real codec
    would parse the container header the same way — from the bytes.
    """
    n = len(b)
    first = b[0] if n else 0
    second = b[1] if n > 1 else 0
    last = b[-1] if n else 0
    return n, first * 256 + second, n % 4096, first, last


def decode_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec: str = "fake",
) -> DataFrame:
    """Decode step: (id, payload) → typed media dimensions.

    ``codec='fake'`` is the deterministic stub; any other codec name
    raises until the corresponding library is provisioned.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} requires an image/audio library not present "
            "in this environment; only the 'fake' deterministic codec is "
            "implemented"
        )
    out_schema = f"{id_col} long, {DECODE_META_FIELDS}"

    def _decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                continue
            # NULL payload/id rows are skipped, not crashed on:
            # bytes(None)/int(None) raise TypeError, and one poison
            # record must never abort the whole decode job.
            rows = [
                (int(i), *_fake_decode(bytes(b)))
                for i, b in zip(pdf[id_col], pdf[payload_col])
                if i is not None and b is not None
            ]
            if not rows:
                continue
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_bytes", "width", "height",
                    "first_byte", "last_byte",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, out_schema)


def sample_frames(
    df: DataFrame,
    frame_size: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling: fan each binary out to one row per fixed-size
    frame (video keyframe / audio chunk analogue).

    Output: (id, frame_idx, frame_len, frame_first_byte). One input
    Arrow batch yields many output rows — the ``mapInPandas`` contract
    a real frame extractor needs.
    """
    if frame_size <= 0:
        raise ValueError("frame_size must be positive")
    out_schema = (
        f"{id_col} long, frame_idx int, frame_len int, frame_first_byte int"
    )

    def _frames(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if i is None or b is None:
                    continue  # NULL rows: zero frames, never a crash
                b = bytes(b)
                # Empty payload → zero frames (matches the oracle's
                # generate_series(0, -1) = empty).
                for idx in range(-(-len(b) // frame_size)):
                    chunk = b[idx * frame_size : (idx + 1) * frame_size]
                    out.append(
                        (int(i), idx, len(chunk), chunk[0] if chunk else 0)
                    )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[id_col, "frame_idx", "frame_len",
                             "frame_first_byte"],
                )

    return df.select(id_col, payload_col).mapInPandas(_frames, out_schema)


def byte_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-extraction stub: 4 scalar features from the raw bytes
    (embedding-model stand-in; same batch shape as a real encoder).
    """
    out_schema = (
        f"{id_col} long, f_len long, f_first int, f_last int, f_mod int"
    )

    def _feats(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                continue
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if i is None or b is None:
                    continue  # NULL rows skipped, never a crash
                b = bytes(b)
                rows.append(
                    (
                        int(i),
                        len(b),
                        b[0] if b else 0,
                        b[-1] if b else 0,
                        len(b) % 256,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "f_len", "f_first", "f_last", "f_mod"]
            )

    return df.select(id_col, payload_col).mapInPandas(_feats, out_schema)


def media_chunk_plan(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    chunk_bytes: int = 4096,
    stride_bytes: int | None = None,
):
    """Byte-range chunk plan for large media payloads — the media
    sibling of docs_chunk_plan (fixed windows, optional overlap).

    Emits (id, chunk_idx, byte_start, byte_len) WITHOUT materializing
    the chunks: a plan row is 4 scalars, so planning a 100 GB video's
    chunks costs kilobytes, and the actual byte slicing happens later
    (``substring`` on the binary column, or a ranged GET against
    object storage when the payload is a reference, readers.py S4
    style). Map-only Column expressions — no shuffle, no Python.

    stride_bytes < chunk_bytes gives overlapping windows (transcoder
    warm-up / boundary-artifact tolerance), mirroring the 500/400
    char/stride defaults of the text chunker.

    Memory note: ``sequence()`` materializes each row's chunk-index
    array before the explode, so per-payload chunk counts are capped
    (default 1M ≈ 8 MB per row) — a 100 GB payload at 4 KB chunks
    would otherwise build a ~26M-element array in executor memory.
    Past the cap, raise ``chunk_bytes``/``stride_bytes`` (or plan
    hierarchically: coarse chunks first, re-chunk each coarse piece).
    """
    stride = stride_bytes or chunk_bytes
    if stride <= 0 or chunk_bytes <= 0:
        raise ValueError("chunk_bytes and stride_bytes must be positive")
    max_chunks = 1_000_000
    n_bytes = F.octet_length(F.col(payload_col))
    # chunk starts: 0, stride, 2*stride, … while start < n_bytes
    n_chunks = F.when(
        n_bytes > 0, F.floor((n_bytes - 1) / stride) + 1
    ).otherwise(F.lit(0))
    # runtime guard, row-scoped: a payload exceeding the cap fails
    # with a clear message instead of an executor OOM
    n_chunks = F.when(
        n_chunks <= max_chunks, n_chunks
    ).otherwise(
        F.assert_true(
            F.lit(False),
            F.concat(
                F.lit("media_chunk_plan: payload needs more than "
                      f"{max_chunks} chunks; raise chunk_bytes/stride"),
            ),
        ).cast("long"),
    )
    idx = F.explode(
        F.when(
            n_chunks > 0, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
        ).otherwise(F.array().cast("array<int>"))
    )
    out = df.select(
        F.col(id_col), n_bytes.alias("__nb"), idx.alias("chunk_idx")
    )
    start = F.col("chunk_idx").cast("long") * stride
    return out.select(
        id_col,
        "chunk_idx",
        start.alias("byte_start"),
        F.least(
            F.lit(chunk_bytes).cast("long"), F.col("__nb") - start
        ).alias("byte_len"),
    )


# ------------------------------------------------------------------ WAV
# REAL audio codec: RIFF/WAVE PCM is self-describing and uncompressed,
# so it is fully decodable with numpy alone — no external audio
# library. This upgrades the audio leg of the multimodal surface from
# the capability-gated fake to a genuine encode → parse → DSP-feature
# path; compressed audio/video codecs (MP3/AAC/MP4) stay gated behind
# NotImplementedError because they need libraries this environment
# lacks.


def wav_encode_pcm16(samples, sample_rate: int) -> bytes:
    """Minimal RIFF/WAVE PCM16 mono encoder (numpy int16 in, bytes
    out). Exists so tests and synthetic pipelines can produce REAL
    WAV containers for the real decoder below."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    data = s.tobytes()
    n = len(data)

    def le(v: int, w: int) -> bytes:
        return int(v).to_bytes(w, "little")

    fmt = (
        b"fmt " + le(16, 4)
        + le(1, 2)              # PCM
        + le(1, 2)              # mono
        + le(sample_rate, 4)
        + le(sample_rate * 2, 4)  # byte rate
        + le(2, 2)              # block align
        + le(16, 2)             # bits
    )
    payload = b"WAVE" + fmt + b"data" + le(n, 4) + data
    return b"RIFF" + le(len(payload), 4) + payload


def wav_decode_pcm16(b: bytes):
    """REAL RIFF/WAVE parser: walks the chunk list (word-aligned,
    unknown chunks skipped), validates PCM16, returns
    ``(sample_rate, n_channels, bits, samples int16 ndarray)``.
    Raises ``ValueError`` on malformed or non-PCM16 input — a poison
    payload must fail loudly at the record level so the caller can
    dead-letter it (W9 contract), never mis-parse silently."""
    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        # A declared size that overruns the buffer is a TRUNCATED
        # container: fail loudly instead of silently decoding fewer
        # samples than declared (round-9 ADVICE — the silent form
        # broke the fail-loudly dead-letter contract this docstring
        # promises).
        if pos + 8 + size > len(b):
            raise ValueError(
                f"truncated chunk {cid!r}: declares {size} bytes, "
                f"{len(b) - pos - 8} remain"
            )
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only PCM16 is decodable without external codecs "
            f"(format={audio_format}, bits={bits})"
        )
    if len(data) % 2:
        # an odd-length PCM16 data chunk cannot hold whole samples;
        # dropping the trailing byte would mis-parse a poison payload
        # silently (round-9 ADVICE)
        raise ValueError(
            f"PCM16 data chunk has odd length {len(data)}"
        )
    samples = np.frombuffer(data, dtype="<i2")
    return sample_rate, n_channels, bits, samples


def wav_audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode + DSP features for a WAV PCM16 binary column, Arrow-
    batched: container metadata from the REAL parser plus exact
    integer features (peak = max |sample|, sum_sq = sum of squared
    samples, zero_crossings = sign flips between adjacent samples) —
    integer-exact so an oracle that KNOWS the synthesis parameters can
    predict every value without touching bytes. Multi-channel payloads
    are accepted and measured over the INTERLEAVED stream (n_samples
    counts frames x channels); deinterleave upstream for per-channel
    features."""
    import numpy as np

    out_schema = (
        f"{id_col} long, sample_rate long, n_channels long, bits long, "
        "n_samples long, peak long, sum_sq long, zero_crossings long"
    )

    def _feats(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if i is None or b is None:
                    continue  # NULL rows skipped, never a crash
                rate, ch, bits, s = wav_decode_pcm16(bytes(b))
                s64 = s.astype(np.int64)
                n = len(s64)
                peak = int(np.abs(s64).max()) if n else 0
                sum_sq = int((s64 * s64).sum())
                zc = (
                    int((np.sign(s64[1:]) != np.sign(s64[:-1])).sum())
                    if n > 1
                    else 0
                )
                rows.append(
                    (int(i), rate, ch, bits, n, peak, sum_sq, zc)
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        id_col, "sample_rate", "n_channels", "bits",
                        "n_samples", "peak", "sum_sq", "zero_crossings",
                    ],
                )

    return df.select(id_col, payload_col).mapInPandas(_feats, out_schema)


# ------------------------------------------------------------------ BMP
# REAL image codec: uncompressed 24-bit BMP is self-describing and
# numpy-decodable — the image sibling of the WAV leg. The layout is
# genuinely adversarial for a hand-rolled parser (pixels stored BGR,
# rows bottom-up, each row padded to 4 bytes), which is exactly why
# the roundtrip census uses position-weighted features: a swap/flip/
# padding mistake changes them even when plain sums survive.


def bmp_encode_rgb24(pixels) -> bytes:
    """Minimal uncompressed 24-bit BMP encoder for an (h, w, 3) uint8
    RGB array (numpy only): BGR byte order, bottom-up rows, 4-byte row
    padding — the real on-disk layout."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y, :, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * pad)
    data = b"".join(rows)

    def le(v: int, w_: int) -> bytes:
        return int(v).to_bytes(w_, "little")

    info = (
        le(40, 4) + le(w, 4) + le(h, 4) + le(1, 2) + le(24, 2)
        + le(0, 4) + le(len(data), 4) + le(2835, 4) + le(2835, 4)
        + le(0, 4) + le(0, 4)
    )
    header = b"BM" + le(14 + 40 + len(data), 4) + le(0, 4) + le(54, 4)
    return header + info + data


def bmp_decode_rgb24(b: bytes):
    """REAL BMP parser: validates the BITMAPINFOHEADER, undoes the
    BGR order, the bottom-up row storage, and the 4-byte row padding;
    returns an (h, w, 3) uint8 RGB array. Raises ``ValueError`` on
    anything that needs a real image library (compression, other bit
    depths) — the dead-letter contract."""
    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP file")
    offset = int.from_bytes(b[10:14], "little")
    hsize = int.from_bytes(b[14:18], "little")
    if hsize != 40:
        raise ValueError(f"unsupported BMP header size {hsize}")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP is decodable without an "
            f"image library (bpp={bpp}, compression={comp})"
        )
    if w <= 0 or h == 0:
        raise ValueError("degenerate dimensions")
    top_down = h < 0
    h = abs(h)
    row_raw = w * 3
    stride = row_raw + ((-row_raw) % 4)
    need = offset + stride * h
    if len(b) < need:
        raise ValueError("truncated pixel data")
    raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, :row_raw].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]  # undo bottom-up storage
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def bmp_image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode + exact integer image features for a 24-bit BMP binary
    column, Arrow-batched: per-channel sums, POSITION-WEIGHTED red
    sums (sum r*x, sum r*y — these catch BGR/flip/padding mistakes
    plain sums cannot), and the red sum of the 2x integer-decimated
    image (a REAL resize: every 2nd pixel in both axes)."""
    import numpy as np

    out_schema = (
        f"{id_col} long, width long, height long, sum_r long, "
        "sum_g long, sum_b long, wsum_rx long, wsum_ry long, "
        "dec_sum_r long"
    )

    def _feats(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if i is None or b is None:
                    continue
                px = bmp_decode_rgb24(bytes(b)).astype(np.int64)
                h, w, _ = px.shape
                xs = np.arange(w)
                ys = np.arange(h)
                r = px[:, :, 0]
                rows.append(
                    (
                        int(i), w, h,
                        int(r.sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                        int((r * xs[None, :]).sum()),
                        int((r * ys[:, None]).sum()),
                        int(r[::2, ::2].sum()),  # 2x decimation resize
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        id_col, "width", "height", "sum_r", "sum_g",
                        "sum_b", "wsum_rx", "wsum_ry", "dec_sum_r",
                    ],
                )

    return df.select(id_col, payload_col).mapInPandas(_feats, out_schema)


# ---------------------------------------------------------------- PNG
# REAL compressed-image codec, stdlib-only: PNG's container (CRC-32
# checked chunks), DEFLATE body (zlib — Python stdlib, no external
# image library), and the five per-scanline filters (None/Sub/Up/
# Average/Paeth) implemented per the PNG 1.2 spec. This upgrades the
# multimodal tier's honesty line: "compressed formats need absent
# libraries" is true for MP3/MP4 (entropy codecs), but PNG's
# compression IS zlib — so it gets a real decoder, not a gate.
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_encode_rgb8(pixels, row_filters=None) -> bytes:
    """Real PNG encoder for an (h, w, 3|4) uint8 array (bit depth 8,
    color type 2/6, non-interlaced): per-scanline filter bytes +
    zlib-compressed IDAT + CRC-checked chunks. ``row_filters`` picks
    each row's filter type 0-4 (default cycles through all five so a
    roundtrip exercises the decoder's whole unfilter matrix)."""
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch not in (3, 4):
        raise ValueError(f"RGB/RGBA only, got {ch} channels")
    color_type = 2 if ch == 3 else 6
    if row_filters is None:
        row_filters = [y % 5 for y in range(h)]
    fts = np.asarray([int(f) for f in row_filters], dtype=np.int64)
    bad = fts[(fts < 0) | (fts > 4)]
    if bad.size:
        raise ValueError(f"filter type {int(bad[0])} out of range")
    raw = px.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    # Every filter's predictor inputs are RAW neighbor pixels (unlike
    # decode, where they are reconstructed output), so the whole
    # image filters in one shot: build the left/up/upper-left planes
    # once and apply each filter type to all of its rows together —
    # including Paeth, whose predictor select vectorizes exactly.
    left = np.zeros_like(raw)
    left[:, ch:] = raw[:, :-ch]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    ul = np.zeros_like(raw)
    ul[1:, ch:] = raw[:-1, :-ch]
    filt = raw.copy()
    m = fts == 1  # Sub
    if m.any():
        filt[m] = raw[m] - left[m]
    m = fts == 2  # Up
    if m.any():
        filt[m] = raw[m] - up[m]
    m = fts == 3  # Average
    if m.any():
        filt[m] = raw[m] - (left[m] + up[m]) // 2
    m = fts == 4  # Paeth
    if m.any():
        p = left[m] + up[m] - ul[m]
        pa = np.abs(p - left[m])
        pb = np.abs(p - up[m])
        pc = np.abs(p - ul[m])
        pred = np.where(
            (pa <= pb) & (pa <= pc),
            left[m],
            np.where(pb <= pc, up[m], ul[m]),
        )
        filt[m] = raw[m] - pred
    body = np.empty((h, stride + 1), dtype=np.uint8)
    body[:, 0] = fts.astype(np.uint8)
    body[:, 1:] = (filt % 256).astype(np.uint8)
    out = body.tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(out))
        + chunk(b"IEND", b"")
    )


def png_decode_rgb8(b: bytes):
    """REAL PNG parser: signature + chunk walk with CRC-32
    verification, IHDR validation (bit depth 8, color type 2/6,
    non-interlaced), multi-IDAT zlib inflate, and full unfilter
    (None/Sub/Up/Average/Paeth). Returns an (h, w, channels) uint8
    array. Raises ``ValueError`` on anything else — truncated or
    corrupt payloads fail at the record level (the dead-letter
    contract), and palette/16-bit/interlaced files are named
    unsupported rather than mis-parsed."""
    import zlib

    import numpy as np

    if len(b) < 8 or b[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos = 8
    ihdr = None
    idat = bytearray()
    ended = False
    while pos + 8 <= len(b):
        size = int.from_bytes(b[pos : pos + 4], "big")
        ctype = b[pos + 4 : pos + 8]
        if pos + 12 + size > len(b):
            raise ValueError(f"truncated chunk {ctype!r}")
        data = b[pos + 8 : pos + 8 + size]
        crc = int.from_bytes(b[pos + 8 + size : pos + 12 + size], "big")
        if zlib.crc32(ctype + data) != crc:
            raise ValueError(f"CRC mismatch in chunk {ctype!r}")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + size
    if ihdr is None or not idat or not ended:
        raise ValueError("missing IHDR/IDAT/IEND")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color_type, comp, filt, interlace = ihdr[8:13]
    if depth != 8 or color_type not in (2, 6):
        raise ValueError(
            f"only 8-bit RGB/RGBA PNG is supported here "
            f"(depth={depth}, color_type={color_type})"
        )
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported compression/filter/interlace")
    if w <= 0 or h <= 0:
        raise ValueError("degenerate dimensions")
    ch = 3 if color_type == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"inflated size {len(raw)} != expected {h * (stride + 1)}"
        )
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    fts = arr[:, 0]
    over = fts[fts > 4]
    if over.size:
        raise ValueError(f"filter type {int(over[0])} out of range")
    lines = arr[:, 1:].astype(np.int32)
    if not fts.any():  # all rows filter 0: the scanlines ARE the pixels
        return lines.astype(np.uint8).reshape(h, w, ch)
    out = np.zeros((h, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    prior_l: list | None = None  # same row as ``prior``, as Python ints
    for y in range(h):
        ft = int(fts[y])
        line = lines[y]
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: rec[i] = line[i] + rec[i-ch] is a
            # per-channel prefix sum — vectorized, mod-256 at the end
            rec = (
                np.cumsum(line.reshape(w, ch), axis=0).reshape(stride)
                % 256
            )
        elif ft == 2:  # Up
            rec = (line + prior) % 256
        else:  # Average/Paeth: the left-pixel recurrence is truly
            # sequential; plain-int list arithmetic beats NumPy
            # scalar indexing several-fold on real scanline widths
            ll = line.tolist()
            pl = prior.tolist() if prior_l is None else prior_l
            rl = [0] * stride
            if ft == 3:
                for i in range(stride):
                    left = rl[i - ch] if i >= ch else 0
                    rl[i] = (ll[i] + (left + pl[i]) // 2) % 256
            else:
                for i in range(stride):
                    left = rl[i - ch] if i >= ch else 0
                    up = pl[i]
                    ulv = pl[i - ch] if i >= ch else 0
                    rl[i] = (ll[i] + _paeth(left, up, ulv)) % 256
            rec = np.asarray(rl, dtype=np.int32)
            out[y] = rec
            prior, prior_l = rec, rl
            continue
        out[y] = rec
        prior, prior_l = rec, None
    return out.astype(np.uint8).reshape(h, w, ch)


def png_image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode + exact integer features for a PNG binary column,
    Arrow-batched: same position-weighted census as
    :func:`bmp_image_features` plus the channel count and alpha sum
    (0 for RGB) — the weighted sums put the unfilter math itself on
    the hook."""
    import numpy as np

    out_schema = (
        f"{id_col} long, width long, height long, n_channels long, "
        "sum_r long, sum_g long, sum_b long, sum_a long, "
        "wsum_rx long, wsum_ry long, dec_sum_r long"
    )

    def _feats(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if i is None or b is None:
                    continue
                px = png_decode_rgb8(bytes(b)).astype(np.int64)
                h, w, ch = px.shape
                xs = np.arange(w)
                ys = np.arange(h)
                r = px[:, :, 0]
                rows.append(
                    (
                        int(i), w, h, ch,
                        int(r.sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                        int(px[:, :, 3].sum()) if ch == 4 else 0,
                        int((r * xs[None, :]).sum()),
                        int((r * ys[:, None]).sum()),
                        int(r[::2, ::2].sum()),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        id_col, "width", "height", "n_channels",
                        "sum_r", "sum_g", "sum_b", "sum_a",
                        "wsum_rx", "wsum_ry", "dec_sum_r",
                    ],
                )

    return df.mapInPandas(_feats, out_schema)


# ------------------------------------------------- perceptual hashing
# Image NEAR-duplicate detection — the image-modality sibling of the
# text MinHash/SimHash family. dHash (difference hash) is the standard
# cheap perceptual fingerprint: pool the image to a coarse grid and
# record only the sign of each horizontal neighbor difference, so
# re-encodes and small brightness edits leave the hash within a few
# bits while different images land far apart in Hamming space. All
# arithmetic is exact integer (mean-pool with floor division, strict
# '>' comparison), which is what makes the hash an engine-shared,
# hash-verifiable contract rather than a float heuristic.


def dhash64_from_pixels(px) -> int:
    """64-bit dHash of the RED channel of an (h, w, ch) uint8 array.

    The top-left 16x18 region is mean-pooled 2x2 (floor) to an 8x9
    grid; bit ``Y*8 + X`` is set iff ``pooled[Y, X+1] > pooled[Y, X]``
    (X, Y in [0, 8)). The result is two's-complement wrapped into a
    signed 64-bit int — the BIGINT form both engines share, so the
    oracle can rebuild the identical value additively (bit 63
    contributes -2**63)."""
    import numpy as np

    if px.shape[0] < 16 or px.shape[1] < 18:
        raise ValueError(
            f"dhash64 needs >=16x18 pixels, got {px.shape[0]}x{px.shape[1]}"
        )
    r = px[:16, :18, 0].astype(np.int64)
    pooled = r[0::2, :] + r[1::2, :]
    pooled = (pooled[:, 0::2] + pooled[:, 1::2]) // 4  # (8, 9) grid
    # bit y*8+x = pooled[y, x+1] > pooled[y, x]; little bit order
    bits = (pooled[:, 1:] > pooled[:, :8]).reshape(64)
    h = int.from_bytes(
        np.packbits(bits, bitorder="little").tobytes(), "little"
    )
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def png_image_dhash64(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode a PNG binary column (real codec) and emit its 64-bit
    dHash — ``(id, dhash64)``. Arrow-batched map, zero shuffle,
    embarrassingly parallel; the near-dup pairing over the hashes is
    plans/mmops.py's job (exact-collapse + Hamming banding)."""

    def _hash(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if i is None or b is None:
                    continue
                px = png_decode_rgb8(bytes(b))
                rows.append((int(i), dhash64_from_pixels(px)))
            if rows:
                yield pd.DataFrame(rows, columns=[id_col, "dhash64"])

    return df.select(id_col, payload_col).mapInPandas(
        _hash, f"{id_col} long, dhash64 long"
    )


def wav_spectral_peaks(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame: int = 256,
) -> DataFrame:
    """Spectral peak fingerprint of a WAV PCM16 binary column — the
    audio-modality sibling of the image dHash: decode with the real
    RIFF parser, cut the signal into non-overlapping ``frame``-sample
    windows (tail dropped), and emit each window's dominant FFT bin
    (argmax of rFFT magnitude over bins 1..frame/2 — DC excluded).
    One output row per (id, frame_idx, peak_bin); peak bins are exact
    integers, so the fingerprint is an engine-comparable contract
    (for a bin-centered sine the argmax margin is ~frame/2 orders of
    magnitude above the int16 rounding noise floor — never a float
    tie). Arrow-batched map, zero shuffle."""
    import numpy as np

    def _peaks(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if i is None or b is None:
                    continue
                _sr, _ch, _bits, samples = wav_decode_pcm16(bytes(b))
                n = (len(samples) // frame) * frame
                if n == 0:
                    continue
                wins = samples[:n].astype(np.float64).reshape(-1, frame)
                mags = np.abs(np.fft.rfft(wins, axis=1))
                # bins 1..frame/2: DC carries no pitch, and argmax
                # over the half-spectrum is unique for real signals
                peaks = mags[:, 1 : frame // 2 + 1].argmax(axis=1) + 1
                rows.extend(
                    (int(i), int(j), int(p))
                    for j, p in enumerate(peaks)
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=[id_col, "frame_idx", "peak_bin"]
                )

    return df.select(id_col, payload_col).mapInPandas(
        _peaks, f"{id_col} long, frame_idx long, peak_bin long"
    )


# ----------------------------------------------------- video container
# Deterministic multi-frame container for the video modality: real
# PNG frames inside a minimal length-prefixed index ("MPNG": magic +
# frame count + per-frame u32 length + PNG bytes). Real video codecs
# (H.264/MP4) genuinely need absent libraries — this container keeps
# the 100 TB-relevant plumbing REAL and testable: container parsing
# with loud truncation errors, frame-index walking, every-k-th frame
# SAMPLING (never decode-all), and per-sampled-frame decode through
# the real PNG codec.

_MPNG_MAGIC = b"MPNG"


def mpng_encode(frames: list[bytes]) -> bytes:
    """Pack encoded PNG frames into the MPNG container."""
    out = bytearray(_MPNG_MAGIC)
    out += len(frames).to_bytes(4, "big")
    for f in frames:
        out += len(f).to_bytes(4, "big")
        out += f
    return bytes(out)


def mpng_frame_iter(b: bytes):
    """Yield (frame_idx, png_bytes) walking the MPNG index; raises
    ``ValueError`` on a bad magic or truncated frame (the dead-letter
    contract: poison containers fail loudly at the record level)."""
    if len(b) < 8 or b[:4] != _MPNG_MAGIC:
        raise ValueError("not an MPNG container")
    n = int.from_bytes(b[4:8], "big")
    pos = 8
    for i in range(n):
        if pos + 4 > len(b):
            raise ValueError(f"truncated MPNG index at frame {i}")
        size = int.from_bytes(b[pos : pos + 4], "big")
        pos += 4
        if pos + size > len(b):
            raise ValueError(
                f"truncated MPNG frame {i}: declares {size} bytes, "
                f"{len(b) - pos} remain"
            )
        yield i, b[pos : pos + size]
        pos += size


def mpng_sampled_framehash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    stride: int = 2,
) -> DataFrame:
    """Frame-sample an MPNG video column (every ``stride``-th frame,
    starting at 0) and dHash each SAMPLED frame through the real PNG
    decoder — ``(id, frame_idx, dhash64)``. Frames outside the sample
    are never inflated (the point of sampling: at 100 TB, decode cost
    scales with the sample, not the footage)."""

    def _hash(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if i is None or b is None:
                    continue
                for fi, png in mpng_frame_iter(bytes(b)):
                    if fi % stride:
                        continue  # skipped frames stay compressed
                    px = png_decode_rgb8(png)
                    rows.append((int(i), fi, dhash64_from_pixels(px)))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[id_col, "frame_idx", "dhash64"]
                )

    return df.select(id_col, payload_col).mapInPandas(
        _hash, f"{id_col} long, frame_idx long, dhash64 long"
    )
