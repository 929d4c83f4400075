"""Audio sample path: pure-Python PCM WAV decode, the energy-aHash
lemmas the planted oracle of ``multimodal_audio_audit`` relies on,
and the banded near-dup reuse.

Lemma inventory (mirrors tests/test_phash.py for the pixel path):
1. The fingerprint of the planted square-wave pattern == the pattern
   byte's bits replicated across the 64 frames (⇒ injective over v).
2. Invariant under clipping-free amplitude scaling (×3 plant).
3. Any two distinct pattern bytes differ in ≥8 fingerprint bits.
"""

from __future__ import annotations

import struct

import numpy as np

from tidb_cdc_spark.functions.multimodal import (
    audio_fingerprint64,
    audio_fingerprints,
    decode_wav_samples,
    phash_near_dup_pairs,
    synth_wav_pcm_media,
)

FRAMES, SPF = 64, 32


def _samples(v: int, gain: int) -> np.ndarray:
    """The synth's sample formula, reconstructed independently."""
    n = FRAMES * SPF
    sign = np.where(np.arange(n) % 2 == 0, 1, -1)
    bit = (v >> ((np.arange(n) // SPF) % 8)) & 1
    return (np.where(bit == 1, 180, 60) * gain * sign).astype(np.int64)


def _unsigned(h: int) -> int:
    return h + (1 << 64) if h < 0 else h


def test_fingerprint_replication_gain_invariance_and_margin():
    hashes = {}
    for v in range(1, 255):
        h1 = _unsigned(audio_fingerprint64(_samples(v, 1)))
        h3 = _unsigned(audio_fingerprint64(_samples(v, 3)))
        assert h1 == h3, f"gain-variant at v={v}"
        expect = sum(((v >> (k % 8)) & 1) << k for k in range(64))
        assert h1 == expect, f"fingerprint != bit replication at v={v}"
        hashes[v] = h1
    assert len(set(hashes.values())) == 254  # injective
    min_ham = min(
        bin(hashes[a] ^ hashes[b]).count("1")
        for a in range(1, 255)
        for b in range(a + 1, 255)
    )
    assert min_ham == 8


def test_wav_roundtrip_and_probe_agreement(spark):
    from tidb_cdc_spark.functions.multimodal import parse_media_header

    rows = [(1, 7, 1), (2, 8, 3), (3, 101, 1)]
    expected = {mid: (v, g) for mid, v, g in rows}
    df = spark.createDataFrame(rows, "media_id long, pattern int, gain int")
    for r in synth_wav_pcm_media(df, "media_id").collect():
        v, g = expected[r.media_id]
        x = decode_wav_samples(bytes(r.payload))
        assert x is not None and (x == _samples(v, g)).all()
        # the header probe agrees: 2048 samples @8 kHz = 256 ms
        assert parse_media_header(bytes(r.payload)) == ("audio/wav", 256)


def test_decode_rejects_non_pcm():
    assert decode_wav_samples(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks
    # non-PCM format code
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)  # 85 = MP3
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    assert decode_wav_samples(b"RIFF" + struct.pack("<I", len(body)) + body) is None
    assert decode_wav_samples(b"\xff\xd8junk") is None


def test_truncated_data_chunk_rejected(spark):
    df = spark.createDataFrame([(1, 2, 1)], "media_id long, pattern int, gain int")
    payload = bytes(synth_wav_pcm_media(df, "media_id").collect()[0].payload)
    assert decode_wav_samples(payload) is not None
    assert decode_wav_samples(payload[: len(payload) // 2]) is None


def test_stereo_averages_to_mono():
    # interleave two channels: L = 2k, R = 4k -> mono mean = 3k
    x = np.array([2000, 4000] * 2048, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(x)) + x
    )
    mono = decode_wav_samples(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert mono is not None and (mono == 3000).all()


def test_fingerprints_null_for_unrecognized(spark):
    from tidb_cdc_spark.functions.multimodal import synthesize_media

    out = audio_fingerprints(synthesize_media(spark, 6)).collect()
    assert len(out) == 6
    assert all(r.afp is None for r in out)


def test_audio_near_dup_pairs_planted(spark):
    rows = [
        (10, 5, 1),
        (11, 5, 1),   # byte-identical twin
        (12, 5, 3),   # scaled copy: different bytes, same fingerprint
        (20, 9, 1),
        (30, 77, 2),  # singleton
    ]
    df = spark.createDataFrame(rows, "media_id long, pattern int, gain int")
    fps = audio_fingerprints(synth_wav_pcm_media(df, "media_id"))
    pairs = phash_near_dup_pairs(
        fps, hash_col="afp", max_bucket_size=None
    ).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got == {(10, 11): 0, (10, 12): 0, (11, 12): 0}
