"""G.711 companding vs the stdlib reference implementation (audioop uses the
same Sun g711 algorithm as the reference's src/audiofilters/g711.c)."""
import numpy as np
import pytest

from mediastreamer2_tpu.ops.g711 import (
    ulaw_encode, ulaw_decode, alaw_encode, alaw_decode,
    float_to_pcm16, pcm16_to_float,
)

audioop = pytest.importorskip("audioop")


def _all_pcm():
    return np.arange(-32768, 32768, 7, dtype=np.int32)  # dense sweep


def test_ulaw_encode_matches_audioop():
    pcm = _all_pcm()
    ours = np.asarray(ulaw_encode(pcm))
    ref = np.frombuffer(audioop.lin2ulaw(pcm.astype("<i2").tobytes(), 2), np.uint8)
    assert np.array_equal(ours.astype(np.uint8), ref)


def test_ulaw_decode_matches_audioop():
    codes = np.arange(256, dtype=np.int32)
    ours = np.asarray(ulaw_decode(codes))
    ref = np.frombuffer(audioop.ulaw2lin(codes.astype(np.uint8).tobytes(), 2), "<i2")
    assert np.array_equal(ours.astype(np.int16), ref)


def test_alaw_encode_matches_audioop():
    pcm = _all_pcm()
    ours = np.asarray(alaw_encode(pcm))
    ref = np.frombuffer(audioop.lin2alaw(pcm.astype("<i2").tobytes(), 2), np.uint8)
    assert np.array_equal(ours.astype(np.uint8), ref)


def test_alaw_decode_matches_audioop():
    codes = np.arange(256, dtype=np.int32)
    ours = np.asarray(alaw_decode(codes))
    ref = np.frombuffer(audioop.alaw2lin(codes.astype(np.uint8).tobytes(), 2), "<i2")
    assert np.array_equal(ours.astype(np.int16), ref)


def test_roundtrip_snr():
    rng = np.random.default_rng(0)
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
         + 0.05 * rng.standard_normal(8000)).astype(np.float32)
    pcm = float_to_pcm16(x)
    y = np.asarray(pcm16_to_float(ulaw_decode(ulaw_encode(pcm))))
    err = x - y
    snr = 10 * np.log10((x ** 2).mean() / (err ** 2).mean())
    assert snr > 30  # mu-law SNR for speech-level signals
