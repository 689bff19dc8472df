"""Streaming media-ingest throughput (round 12).

The media lane's cost profile differs from text ingest: every record
runs a REAL codec (PNG inflate+unfilter / WAV RIFF parse), poison
records take the dead-letter path, and with an image band index the
OK lane pays the near-dup screen. This lane measures records/min of
the exact mapInPandas closure the stream executes (batch-mode, same
code path), on a BENCH_MEDIA_DOCS-record corpus (default 250K):

- 40% PNG (18x16 RGB, content id mod 1000 -> duplication-heavy),
- 20% baseline JPEG (24x16 grayscale, constant 8x8 blocks — the
  DC-exact regime, real T.81 decode per record),
- 30% WAV (768-sample 3-tone PCM16),
- 10% poison (truncated containers, bad magic, odd-length PCM) that
  must land KO with the codec's own error, never crash the batch.

Legs: decode-only, then decode + image near-dup screen (exact band
bitmaps built from a 10K-image index). Output: one JSON line ->
BENCH_LOCAL_r{N}_media_ingest.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from benchgate import preflight_load_gate  # noqa: E402
from scio_db_spark.session import SessionFactory  # noqa: E402

N_DOCS = int(os.environ.get("BENCH_MEDIA_DOCS", 250_000))
N_CONTENT = 1000
N_INDEX = 10_000  # images in the historical band index


def _media_corpus(spark, n):
    """(media_id, mime_type, payload) mixed-media frame, synthesized
    in-kernel so the generation parallelizes with the scan."""
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.jpegcodec import jpeg_encode_gray
    from scio_db_spark.functions.multimodal import (
        png_encode_rgb8,
        wav_encode_pcm16,
    )

    def _synth(pdfs):
        t = np.arange(256)
        png_memo: dict[int, bytes] = {}
        jpg_memo: dict[int, bytes] = {}
        for pdf in pdfs:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                cid = i % N_CONTENT
                m = i % 10
                if m < 4:  # PNG: seeded-RNG pixels per content id, so
                    # dHashes are cid-distinct and band collisions are
                    # the realistic ~few-% rate (a formula-structured
                    # image made every hash band-collide); encode
                    # memoized per cid — re-encodes are the workload
                    blob = png_memo.get(cid)
                    if blob is None:
                        r = np.random.RandomState(cid).randint(
                            0, 256, (16, 18)
                        ).astype(np.uint8)
                        blob = png_encode_rgb8(
                            np.stack([r, r * 0, r * 0], axis=-1)
                        )
                        png_memo[cid] = blob
                    rows.append((i, "image/png", blob))
                elif m < 6:  # baseline JPEG, DC-exact constant blocks
                    blob = jpg_memo.get(cid)
                    if blob is None:
                        vals = np.random.RandomState(10_000 + cid).randint(
                            0, 256, (2, 3)
                        ).astype(np.uint8)
                        blob = jpeg_encode_gray(
                            np.repeat(np.repeat(vals, 8, 0), 8, 1)
                        )
                        jpg_memo[cid] = blob
                    rows.append((i, "image/jpeg", blob))
                elif m < 9:  # WAV
                    segs = [
                        np.round(
                            12000 * np.sin(
                                2 * np.pi
                                * (5 + (cid * 7 + j * 13) % 100)
                                * t / 256
                            )
                        ).astype(np.int16)
                        for j in range(3)
                    ]
                    rows.append((
                        i, "audio/wav",
                        wav_encode_pcm16(np.concatenate(segs), 8000),
                    ))
                else:  # poison: three flavors, all must route KO
                    if i % 3 == 0:
                        rows.append((i, "image/png", b"\x89PNGbad"))
                    elif i % 3 == 1:
                        rows.append((i, "audio/wav", b"RIFFxxxxWAVE"))
                    else:
                        rows.append((i, "video/mp4", b"nocodec"))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["media_id", "mime_type", "payload"]
                )

    return spark.range(n).mapInPandas(
        _synth, "media_id long, mime_type string, payload binary"
    )


def main() -> int:
    _gate = preflight_load_gate()
    spark = SessionFactory.create("bench-media-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    from scio_db_spark.streaming.media_ingest import (
        build_media_ingest,
        image_band_bitmaps,
    )

    corpus = _media_corpus(spark, N_DOCS)
    legs: dict = {}

    # historical index: HALF the content space (cid < 500), so the
    # screen has both members and novel images to discriminate
    idx_hashes = (
        build_media_ingest(
            _media_corpus(spark, N_INDEX).filter(
                F.col("media_id") % N_CONTENT < N_CONTENT // 2
            ),
            id_col="media_id",
        )["ok"]
        .filter(F.col("dhash64").isNotNull())
        .select("dhash64")
    )
    t0 = time.perf_counter()
    bitmaps = image_band_bitmaps(idx_hashes)
    legs["index_build_sec"] = round(time.perf_counter() - t0, 2)

    for name, band_index in (
        ("decode_only", None),
        ("decode_plus_screen", bitmaps),
    ):
        lanes = build_media_ingest(
            corpus, id_col="media_id", image_band_index=band_index
        )
        t0 = time.perf_counter()
        agg = [
            F.count(F.lit(1)).alias("n_ok"),
            F.count("dhash64").alias("n_hashed"),
        ]
        if band_index is not None:
            agg.append(
                F.sum(F.col("near_dup_image").cast("long")).alias(
                    "n_near_dup"
                )
            )
        ok = lanes["ok"].agg(*agg).collect()[0]
        n_ko = lanes["ko"].count()
        sec = time.perf_counter() - t0
        leg = {
            "sec": round(sec, 2),
            "records_per_min": round(N_DOCS / sec * 60),
            "n_ok": ok.n_ok,
            "n_ko": n_ko,
            "n_hashed": ok.n_hashed,
        }
        if band_index is not None:
            leg["n_near_dup"] = int(ok.n_near_dup)
        legs[name] = leg

    print(json.dumps({
        "metric": "media_ingest_records_per_min",
        "docs": N_DOCS,
        "index_images": N_INDEX,
        "legs": legs,
        "baseline_records_per_min": 200_000,
        "load_1m": list(os.getloadavg())[:2],
        **_gate,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
