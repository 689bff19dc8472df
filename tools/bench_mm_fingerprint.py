"""Multimodal fingerprint throughput + pairing flatness (round 12).

The image/audio/video fingerprint families are map-only Arrow passes
over REAL codecs; this lane measures their end-to-end rate (synthesize
container -> encode -> decode -> fingerprint, all inside the kernel,
so the number is honest about codec cost) and the near-dup pairing's
scale shape on a duplication-heavy corpus.

Legs (BENCH_MM_DOCS rows, default 250K; content id = doc_id % 1000,
so ~N/1000 verbatim re-encodes per content — duplication-heavy):

1. ``image_dhash``  — PNG encode -> real decode -> 64-bit dHash.
2. ``audio_peaks``  — 3-segment WAV encode -> real RIFF parse -> FFT
   peak per 256-sample window (3 rows/doc).
3. ``video_sample`` — 6-frame MPNG, stride-2 sampling: only 3 of 6
   frames are ever inflated; reported as frames_sampled/frames_total.
4. ``image_pairing`` — the near-dup consumer over leg 1's hashes:
   exact collapse to canonicals + star edges, 4x16-bit banding over
   DISTINCT hashes, popcount verify. Per-task record flatness is the
   claim (star edges are linear in cluster size; the band join never
   sees the re-encode copies).

Output: one JSON line -> BENCH_LOCAL_r{N}_mm_fingerprint.json.
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
from bench_skew import _completed_stage_ids  # noqa: E402
from scio_db_spark.session import SessionFactory  # noqa: E402

N_DOCS = int(os.environ.get("BENCH_MM_DOCS", 250_000))
N_CONTENT = 1000  # ~N/1000 verbatim re-encodes per content id


def _worst_record_ratio(spark, before) -> dict:
    from tools.bench_lsh_dupheavy import _worst_stage_ratio

    out = _worst_stage_ratio(spark, before)
    return {
        k: out.get(k)
        for k in (
            "n_stages", "worst_record_ratio", "worst_record_stage",
            "worst_material_ratio",
        )
    }


def main() -> int:
    _gate = preflight_load_gate()
    spark = SessionFactory.create("bench-mm-fingerprint")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    legs: dict = {}

    # --- leg 1: image dHash throughput -------------------------------
    def _image_hashes():
        import numpy as np
        import pandas as pd

        from scio_db_spark.functions.multimodal import (
            dhash64_from_pixels,
            png_decode_rgb8,
            png_encode_rgb8,
        )

        w, h, ncont = 18, 16, N_CONTENT

        def _k(pdfs):
            xs = np.arange(w)[None, :]
            ys = np.arange(h)[:, None]
            for pdf in pdfs:
                rows = []
                for i in pdf["doc_id"]:
                    i = int(i)
                    cid = i % ncont
                    r = (
                        3 * xs * xs + 5 * ys * ys + 7 * cid
                        + xs * ys * (1 + cid % 3)
                    ) % 256 + np.zeros((h, w), np.int64)
                    px = np.stack(
                        [r, (7 * xs + 3 * ys) % 256 + 0 * r,
                         (xs * ys + cid) % 256 + 0 * r],
                        axis=-1,
                    ).astype(np.uint8)
                    blob = png_encode_rgb8(px)
                    rows.append(
                        (i, dhash64_from_pixels(png_decode_rgb8(blob)))
                    )
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["doc_id", "dhash64"]
                    )

        return d.mapInPandas(_k, "doc_id long, dhash64 long")

    t0 = time.perf_counter()
    hashes = _image_hashes()
    n_h = hashes.count()
    sec = time.perf_counter() - t0
    legs["image_dhash"] = {
        "sec": round(sec, 2),
        "records": n_h,
        "records_per_min": round(n_h / sec * 60),
    }

    # --- leg 2: audio spectral peaks ---------------------------------
    def _audio():
        import numpy as np
        import pandas as pd

        from scio_db_spark.functions.multimodal import (
            wav_encode_pcm16,
            wav_spectral_peaks,
        )

        frame = 256

        def _k(pdfs):
            t = np.arange(frame)
            for pdf in pdfs:
                rows = []
                for i in pdf["doc_id"]:
                    i = int(i)
                    cid = i % N_CONTENT
                    segs = [
                        np.round(
                            12000 * np.sin(
                                2 * np.pi
                                * (5 + (cid * 7 + j * 13) % 100)
                                * t / frame
                            )
                        ).astype(np.int16)
                        for j in range(3)
                    ]
                    rows.append(
                        (i, wav_encode_pcm16(np.concatenate(segs), 8000))
                    )
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["doc_id", "payload"]
                    )

        wav = d.mapInPandas(_k, "doc_id long, payload binary")
        return wav_spectral_peaks(wav, frame=frame)

    t0 = time.perf_counter()
    n_peaks = _audio().count()
    sec = time.perf_counter() - t0
    legs["audio_peaks"] = {
        "sec": round(sec, 2),
        "docs": N_DOCS,
        "peak_rows": n_peaks,
        "docs_per_min": round(N_DOCS / sec * 60),
    }

    # --- leg 3: video frame sampling ---------------------------------
    def _video():
        import numpy as np
        import pandas as pd

        from scio_db_spark.functions.multimodal import (
            mpng_encode,
            mpng_sampled_framehash,
            png_encode_rgb8,
        )

        w, h = 18, 16

        def _k(pdfs):
            xs = np.arange(w)[None, :]
            ys = np.arange(h)[:, None]
            for pdf in pdfs:
                rows = []
                for i in pdf["doc_id"]:
                    i = int(i)
                    cid = i % N_CONTENT
                    frames = []
                    for f in range(6):
                        r = (
                            3 * xs * xs + 5 * ys * ys + 7 * cid
                            + f * xs * (2 + f % 3)
                        ) % 256 + np.zeros((h, w), np.int64)
                        px = np.stack(
                            [r, r * 0, r * 0], axis=-1
                        ).astype(np.uint8)
                        frames.append(png_encode_rgb8(px))
                    rows.append((i, mpng_encode(frames)))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["doc_id", "payload"]
                    )

        vid = d.mapInPandas(_k, "doc_id long, payload binary")
        return mpng_sampled_framehash(vid, stride=2)

    t0 = time.perf_counter()
    n_fr = _video().count()
    sec = time.perf_counter() - t0
    legs["video_sample"] = {
        "sec": round(sec, 2),
        "docs": N_DOCS,
        "frames_sampled": n_fr,
        "frames_total": N_DOCS * 6,
        "docs_per_min": round(N_DOCS / sec * 60),
    }

    # --- leg 4: near-dup pairing flatness ----------------------------
    def _pairing():
        h = hashes
        classes = h.groupBy("dhash64").agg(
            F.min("doc_id").alias("canon"),
            F.count(F.lit(1)).alias("sz"),
        )
        star_edges = (
            h.join(classes.select("dhash64", "canon"), "dhash64")
            .filter(F.col("doc_id") != F.col("canon"))
            .count()
        )
        bands = classes.select(
            "canon", "dhash64",
            F.explode(F.array(*[
                F.struct(
                    F.lit(k).alias("k"),
                    (F.shiftright(F.col("dhash64"), 16 * k)
                     .bitwiseAND(F.lit(65535))).alias("v"),
                )
                for k in range(4)
            ])).alias("b"),
        ).select("canon", "dhash64", "b.k", "b.v")
        a, b = bands.alias("a"), bands.alias("b")
        cross = (
            a.join(
                b,
                (F.col("a.k") == F.col("b.k"))
                & (F.col("a.v") == F.col("b.v"))
                & (F.col("a.canon") < F.col("b.canon")),
            )
            .select("a.canon", "b.canon", F.bit_count(
                F.col("a.dhash64").bitwiseXOR(F.col("b.dhash64"))
            ).alias("ham"))
            .distinct()
            .filter(F.col("ham").between(1, 6))
            .count()
        )
        return {"star_edges": star_edges, "cross_pairs": cross}

    before = _completed_stage_ids(spark)
    t0 = time.perf_counter()
    result = _pairing()
    sec = time.perf_counter() - t0
    legs["image_pairing"] = {
        "sec": round(sec, 2),
        "result": result,
        **_worst_record_ratio(spark, before),
    }

    print(json.dumps({
        "metric": "mm_fingerprint",
        "docs": N_DOCS,
        "n_content": N_CONTENT,
        "legs": legs,
        "load_1m": list(os.getloadavg())[:2],
        **_gate,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
