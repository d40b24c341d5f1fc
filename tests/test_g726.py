"""G.726 ADPCM family (parity: src/audiofilters/g726.c:170-205 — the four
rates as filters).  Spec-structured implementation validated by round-trip
SNR at every rate, state continuity, and RFC 3551 nibble packing."""
import numpy as np
import jax.numpy as jnp
import pytest

from mediastreamer2_tpu.ops.g726 import (g726_state, g726_encode,
                                         g726_decode, pack_codes,
                                         unpack_codes)


def _speech(n=2400, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000
    sig = 7000 * np.sin(2 * np.pi * 440 * t) \
        + 2500 * np.sin(2 * np.pi * 1100 * t) \
        + np.convolve(rng.standard_normal(n), np.ones(6) / 6, "same") * 800
    return np.clip(sig, -32000, 32000).astype(np.int32)[None]


@pytest.mark.parametrize("bits,min_snr", [(2, 15), (3, 20), (4, 30), (5, 35)])
def test_roundtrip_snr(bits, min_snr):
    pcm = _speech()
    codes, _ = g726_encode(jnp.asarray(pcm), g726_state(1), bits)
    dec, _ = g726_decode(codes, g726_state(1), bits)
    dec = np.asarray(dec)[0]
    ref = pcm[0].astype(np.float64)
    e = ref[400:] - dec[400:]
    snr = 10 * np.log10((ref[400:] ** 2).mean() / max((e ** 2).mean(), 1e-9))
    assert snr > min_snr, f"{bits}-bit SNR {snr:.1f}"
    c = np.asarray(codes)
    assert c.min() >= 0 and c.max() < (1 << bits)
    assert c.max() >= (1 << bits) - 2          # full range exercised


@pytest.mark.slow
def test_tickwise_equals_oneshot():
    """Streaming 80-sample ticks == one-shot (state carries exactly)."""
    pcm = _speech(800)
    one, _ = g726_encode(jnp.asarray(pcm), g726_state(1), 4)
    st = g726_state(1)
    parts = []
    for k in range(10):
        c, st = g726_encode(jnp.asarray(pcm[:, k * 80:(k + 1) * 80]), st, 4)
        parts.append(np.asarray(c))
    np.testing.assert_array_equal(np.concatenate(parts, axis=1),
                                  np.asarray(one))


def test_batch_vectorization_independent():
    pcm = _speech(800)
    batch = np.concatenate([pcm, pcm // 3], axis=0)
    codes, _ = g726_encode(jnp.asarray(batch), g726_state(2), 4)
    solo, _ = g726_encode(jnp.asarray(pcm), g726_state(1), 4)
    np.testing.assert_array_equal(np.asarray(codes)[0], np.asarray(solo)[0])


@pytest.mark.parametrize("bits", [2, 3, 4, 5])
def test_rfc3551_packing(bits):
    n = 80
    rng = np.random.default_rng(bits)
    codes = rng.integers(0, 1 << bits, n).astype(np.int32)
    data = pack_codes(codes, bits)
    assert len(data) == (n * bits + 7) // 8
    np.testing.assert_array_equal(unpack_codes(data, bits, n), codes)


def test_filters_registered(factory):
    for kbps in (16, 24, 32, 40):
        assert factory.lookup(f"g726_{kbps}_enc") is not None
        assert factory.lookup(f"g726_{kbps}_dec") is not None
