"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from scio_db_spark.functions.multimodal import (
    byte_features,
    decode_media_meta,
    sample_frames,
    with_binary_payload,
)


def _media(spark):
    return with_binary_payload(
        spark.createDataFrame(
            [Row(doc_id=1, text="abcd" * 10), Row(doc_id=2, text="z")]
        )
    )


def test_real_codec_is_gated(spark):
    with pytest.raises(NotImplementedError, match="codec 'jpeg'"):
        decode_media_meta(_media(spark), codec="jpeg")


def test_fake_decode_reads_real_bytes(spark):
    out = {r.doc_id: r for r in decode_media_meta(_media(spark)).collect()}
    assert out[1].n_bytes == 40
    assert out[1].width == ord("a") * 256 + ord("b")
    assert out[1].first_byte == ord("a") and out[1].last_byte == ord("d")
    assert out[2].n_bytes == 1 and out[2].width == ord("z") * 256


def test_frame_fanout(spark):
    rows = sample_frames(_media(spark), frame_size=16).collect()
    f1 = sorted(
        (r.frame_idx, r.frame_len) for r in rows if r.doc_id == 1
    )
    assert f1 == [(0, 16), (1, 16), (2, 8)]  # 40 bytes / 16
    assert [(r.frame_idx, r.frame_len) for r in rows if r.doc_id == 2] == [
        (0, 1)
    ]


def test_byte_features_shape(spark):
    out = {r.doc_id: r for r in byte_features(_media(spark)).collect()}
    assert out[1].f_len == 40 and out[1].f_mod == 40
    assert out[2].f_first == out[2].f_last == ord("z")


def test_media_chunk_plan_covers_payload_exactly(spark):
    from scio_db_spark.functions.multimodal import (
        media_chunk_plan,
        with_binary_payload,
    )

    docs = spark.createDataFrame(
        [("a", "x" * 10000), ("b", "y" * 4096), ("c", "z")],
        "doc_id string, text string",
    )
    plan = media_chunk_plan(
        with_binary_payload(docs), chunk_bytes=4096, stride_bytes=4096
    ).collect()
    by_doc = {}
    for r in plan:
        by_doc.setdefault(r.doc_id, []).append(r)
    # non-overlapping chunks tile the payload exactly
    assert sorted(r.chunk_idx for r in by_doc["a"]) == [0, 1, 2]
    assert sum(r.byte_len for r in by_doc["a"]) == 10000
    assert [r.byte_len for r in sorted(by_doc["a"], key=lambda r: r.chunk_idx)] == [4096, 4096, 1808]
    assert len(by_doc["b"]) == 1 and by_doc["b"][0].byte_len == 4096
    assert len(by_doc["c"]) == 1 and by_doc["c"][0].byte_len == 1
    for rows in by_doc.values():
        for r in rows:
            assert r.byte_start == r.chunk_idx * 4096


def test_media_chunk_plan_overlapping_stride(spark):
    from scio_db_spark.functions.multimodal import (
        media_chunk_plan,
        with_binary_payload,
    )

    docs = spark.createDataFrame(
        [("a", "x" * 1000)], "doc_id string, text string"
    )
    rows = media_chunk_plan(
        with_binary_payload(docs), chunk_bytes=500, stride_bytes=400
    ).collect()
    starts = sorted(r.byte_start for r in rows)
    assert starts == [0, 400, 800]
    # every byte of the payload is covered by at least one chunk
    covered = set()
    for r in rows:
        covered.update(range(r.byte_start, r.byte_start + r.byte_len))
    assert covered == set(range(1000))


def test_media_chunk_plan_is_map_only(spark):
    from scio_db_spark.functions.multimodal import (
        media_chunk_plan,
        with_binary_payload,
    )
    from scio_db_spark.plans.explain import plan_string

    docs = spark.createDataFrame(
        [("a", "x" * 100)], "doc_id string, text string"
    )
    plan = plan_string(media_chunk_plan(with_binary_payload(docs)))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "mapinpandas" not in plan.lower()


def test_null_payload_rows_are_skipped_not_crashed(spark):
    """A NULL text/payload row must not abort decode/frames/features
    (bytes(None) raised TypeError before) — poison stays row-scoped."""
    from scio_db_spark.functions.multimodal import (
        byte_features,
        decode_media_meta,
        sample_frames,
        with_binary_payload,
    )

    docs = with_binary_payload(
        spark.createDataFrame(
            [(0, "hello"), (1, None)], "doc_id long, text string"
        )
    )
    assert {r.doc_id for r in decode_media_meta(docs).collect()} == {0}
    assert {r.doc_id for r in sample_frames(docs, 2).collect()} == {0}
    assert {r.doc_id for r in byte_features(docs).collect()} == {0}


def test_sample_frames_rejects_nonpositive_frame_size(spark):
    import pytest as _pytest

    from scio_db_spark.functions.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    docs = with_binary_payload(
        spark.createDataFrame([(0, "x")], "doc_id long, text string")
    )
    with _pytest.raises(ValueError):
        sample_frames(docs, 0)


def test_dhash64_planted_variants():
    """Perceptual-hash contract: identical pixels hash identically, a
    one-pixel brightness edit moves <= 2 bits, a different image is
    far away; the value is a signed 64-bit int (BIGINT-compatible)."""
    import numpy as np

    from scio_db_spark.functions.multimodal import dhash64_from_pixels

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)
    tweak = base.copy()
    tweak[1, 1, 0] = np.uint8((int(tweak[1, 1, 0]) + 40) % 256)
    other = rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    h0 = dhash64_from_pixels(base)
    assert h0 == dhash64_from_pixels(base.copy())
    assert -(1 << 63) <= h0 < (1 << 63)
    assert ham(h0, dhash64_from_pixels(tweak)) <= 2
    assert ham(h0, dhash64_from_pixels(other)) > 6
    # green/blue channels are not part of the fingerprint contract
    recolor = base.copy()
    recolor[:, :, 1:] = 0
    assert dhash64_from_pixels(recolor) == h0


def test_dhash64_roundtrips_through_real_png(spark):
    """The Spark-side fingerprint runs on DECODED real PNGs — encode
    planted pixels, hash via the Arrow kernel, compare with the pure
    function on the same pixels."""
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.multimodal import (
        dhash64_from_pixels,
        png_encode_rgb8,
        png_image_dhash64,
    )

    rng = np.random.RandomState(12)
    imgs = {
        i: rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)
        for i in range(4)
    }
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(imgs),
                "payload": [
                    bytearray(png_encode_rgb8(px)) for px in imgs.values()
                ],
            }
        )
    )
    got = {
        r.doc_id: r.dhash64
        for r in png_image_dhash64(df).collect()
    }
    assert got == {
        i: dhash64_from_pixels(px) for i, px in imgs.items()
    }


def test_wav_spectral_peaks_planted_sines(spark):
    """Fingerprint contract on planted audio: bin-centered sines come
    back as exactly their bin, per window, through the REAL WAV
    encode->decode->FFT path; a one-bin pitch nudge moves exactly one
    window's peak."""
    import numpy as np
    import pandas as pd

    from scio_db_spark.functions.multimodal import (
        wav_encode_pcm16,
        wav_spectral_peaks,
    )

    frame = 256
    t = np.arange(frame)

    def tone(k: int) -> np.ndarray:
        return np.round(
            12000 * np.sin(2 * np.pi * k * t / frame)
        ).astype(np.int16)

    base = np.concatenate([tone(10), tone(33), tone(77)])
    nudged = np.concatenate([tone(10), tone(34), tone(77)])
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "payload": [
                    bytearray(wav_encode_pcm16(s, 8000))
                    for s in (base, nudged)
                ],
            }
        )
    )
    got = {
        (r.doc_id, r.frame_idx): r.peak_bin
        for r in wav_spectral_peaks(df, frame=frame).collect()
    }
    assert got == {
        (1, 0): 10, (1, 1): 33, (1, 2): 77,
        (2, 0): 10, (2, 1): 34, (2, 2): 77,
    }


def test_mpng_container_roundtrip_and_sampling(spark):
    """MPNG contract: frames round-trip in order; truncated payloads
    fail loudly (dead-letter contract); the sampling kernel inflates
    only every stride-th frame and hashes it through the real PNG
    codec."""
    import numpy as np
    import pandas as pd
    import pytest

    from scio_db_spark.functions.multimodal import (
        dhash64_from_pixels,
        mpng_encode,
        mpng_frame_iter,
        mpng_sampled_framehash,
        png_encode_rgb8,
    )

    rng = np.random.RandomState(13)
    frames_px = [
        rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)
        for _ in range(5)
    ]
    frames = [png_encode_rgb8(px) for px in frames_px]
    blob = mpng_encode(frames)
    assert [f for _, f in mpng_frame_iter(blob)] == frames
    with pytest.raises(ValueError, match="not an MPNG"):
        list(mpng_frame_iter(b"JUNK" + blob[4:]))
    with pytest.raises(ValueError, match="truncated"):
        list(mpng_frame_iter(blob[:-3]))

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "payload": [bytearray(blob)]})
    )
    got = {
        (r.frame_idx): r.dhash64
        for r in mpng_sampled_framehash(df, stride=2).collect()
    }
    assert got == {
        fi: dhash64_from_pixels(frames_px[fi]) for fi in (0, 2, 4)
    }
