"""The REAL WAV codec: roundtrip exactness, chunk-walking robustness
(unknown chunks, word alignment), and loud rejection of what numpy
alone cannot decode."""

from __future__ import annotations

import numpy as np
import pytest

from scio_db_spark.functions.multimodal import (
    wav_decode_pcm16,
    wav_encode_pcm16,
)


def test_roundtrip_exact():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=1234, dtype=np.int64).astype(
        np.int16
    )
    rate, ch, bits, out = wav_decode_pcm16(wav_encode_pcm16(s, 44100))
    assert (rate, ch, bits) == (44100, 1, 16)
    assert np.array_equal(out, s)


def test_unknown_chunks_are_skipped_word_aligned():
    """A LIST chunk with an ODD size before fmt/data: real files carry
    metadata chunks, and the spec word-aligns chunk boundaries — a
    parser that forgets the pad byte walks off the rails."""
    s = np.array([5, -5, 7], dtype=np.int16)
    b = bytearray(wav_encode_pcm16(s, 8000))
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    patched = bytes(b[:12]) + extra + bytes(b[12:])
    size = len(patched) - 8
    patched = patched[:4] + size.to_bytes(4, "little") + patched[8:]
    rate, ch, bits, out = wav_decode_pcm16(patched)
    assert np.array_equal(out, s)


def test_not_riff_raises():
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode_pcm16(b"not a wave file at all......")


def test_missing_data_chunk_raises():
    b = wav_encode_pcm16(np.array([1], dtype=np.int16), 8000)
    truncated = b[:20]  # fmt chunk cut off, no data chunk
    with pytest.raises(ValueError):
        wav_decode_pcm16(truncated)


def test_non_pcm16_rejected_loudly():
    """8-bit / compressed formats need external codecs: the decoder
    must refuse (dead-letter contract), never mis-read the payload."""
    b = bytearray(wav_encode_pcm16(np.array([1, 2], dtype=np.int16), 8000))
    # fmt chunk starts at offset 12; audioFormat is its first field
    # (offset 12+8), bits the field at offset 12+8+14
    b[12 + 8] = 85  # audioFormat = 0x55 (MP3)
    with pytest.raises(ValueError, match="PCM16"):
        wav_decode_pcm16(bytes(b))


def test_registered_query_matches_numpy_prediction(spark, sf_dir):
    """Spot-check the registered roundtrip census against a direct
    numpy recompute for a handful of doc ids (a third derivation,
    independent of both the oracle's closed forms and the engine)."""
    from scio_db_spark.plans.registry import all_queries

    rows = {
        r.doc_id: r
        for r in all_queries()["mm_wav_pcm_roundtrip"]
        .spark(spark, sf_dir)
        .collect()
    }
    for i in list(rows)[:25]:
        half, amp, n = 2 + i % 7, 1000 + (i % 100) * 10, 800 + (i % 50) * 16
        idx = np.arange(n)
        s = np.where((idx // half) % 2 == 0, amp, -amp).astype(np.int64)
        r = rows[i]
        assert r.n_samples == n
        assert r.peak == int(np.abs(s).max())
        assert r.sum_sq == int((s * s).sum())
        assert r.zero_crossings == int(
            (np.sign(s[1:]) != np.sign(s[:-1])).sum()
        )


def test_wav_roundtrip_property():
    """Property: ANY int16 sample array at ANY common rate survives
    encode → decode bit-exactly (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        samples=st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=0,
            max_size=400,
        ),
        rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    )
    def prop(samples, rate):
        s = np.array(samples, dtype=np.int16)
        r, ch, bits, out = wav_decode_pcm16(wav_encode_pcm16(s, rate))
        assert (r, ch, bits) == (rate, 1, 16)
        assert np.array_equal(out, s)

    prop()


def test_truncated_data_chunk_raises():
    """A container cut short of its declared data size must raise,
    not silently decode fewer samples (round-9 ADVICE: the silent
    truncation broke the fail-loudly dead-letter contract)."""
    b = wav_encode_pcm16(np.array([1, 2, 3, 4], dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="truncated chunk"):
        wav_decode_pcm16(b[:-4])  # 4 bytes short of declared size


def test_odd_length_data_chunk_raises():
    """An odd-length PCM16 data chunk cannot hold whole samples; the
    trailing byte must not be silently dropped."""
    b = bytearray(wav_encode_pcm16(np.array([1, 2], dtype=np.int16), 8000))
    # find the data chunk and shrink its declared size by 1, keeping
    # the container self-consistent (append a pad byte so no chunk
    # overruns the buffer)
    i = bytes(b).rindex(b"data")
    size = int.from_bytes(b[i + 4 : i + 8], "little")
    b[i + 4 : i + 8] = (size - 1).to_bytes(4, "little")
    with pytest.raises(ValueError, match="odd length"):
        wav_decode_pcm16(bytes(b[:-1]))
