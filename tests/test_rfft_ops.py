"""Matmul-DFT correctness incl. the structural shortcuts used by the EC core.

rfft/irfft match numpy.fft; rfft_tail / irfft_tail / apply_constraint are
MAC-halved forms that must be (near-)bitwise equivalent to the naive
compositions they replace in ops/aec.py — any drift here silently changes
AEC adaptation."""
import numpy as np
import jax.numpy as jnp
import pytest

from mediastreamer2_tpu.ops.rfft import (rfft, irfft, rfft_tail, irfft_tail,
                                         apply_constraint)


def _close(a, b, rel=3e-6):
    """f32-matmul equivalence: error budget scales with the spectrum
    magnitude (contraction length), not a fixed atol."""
    a, b = np.asarray(a), np.asarray(b)
    tol = rel * max(1.0, float(np.abs(b).max())) * np.sqrt(b.shape[-1])
    np.testing.assert_allclose(a, b, atol=tol, rtol=0)


@pytest.mark.parametrize("n", [160, 480, 960])
def test_rfft_matches_numpy(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, n)).astype(np.float32)
    re, im = rfft(jnp.asarray(x), n)
    ref = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3)
    back = irfft(re, im, n)
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-5)


@pytest.mark.parametrize("n", [480, 960])
def test_rfft_tail_equals_zero_padded_rfft(n):
    rng = np.random.default_rng(2)
    tail = rng.standard_normal((3, n // 2)).astype(np.float32)
    full = np.concatenate([np.zeros_like(tail), tail], axis=1)
    re_t, im_t = rfft_tail(jnp.asarray(tail), n)
    re_f, im_f = rfft(jnp.asarray(full), n)
    _close(re_t, re_f)
    _close(im_t, im_f)


@pytest.mark.parametrize("n", [480, 960])
def test_irfft_tail_equals_sliced_irfft(n):
    rng = np.random.default_rng(3)
    f = n // 2 + 1
    re = rng.standard_normal((3, f)).astype(np.float32)
    im = rng.standard_normal((3, f)).astype(np.float32)
    im[:, 0] = 0.0
    tail = irfft_tail(jnp.asarray(re), jnp.asarray(im), n)
    full = irfft(jnp.asarray(re), jnp.asarray(im), n)
    _close(tail, np.asarray(full)[:, n // 2:])


@pytest.mark.parametrize("n", [480, 960])
def test_apply_constraint_equals_projection(n):
    """One [F,F] operator == irfft -> zero tail -> rfft (the MDF causality
    constraint, ops/aec.py)."""
    rng = np.random.default_rng(4)
    f = n // 2 + 1
    re = rng.standard_normal((3, f)).astype(np.float32)
    im = rng.standard_normal((3, f)).astype(np.float32)
    gr, gi = apply_constraint(jnp.asarray(re), jnp.asarray(im), n)
    t = np.array(irfft(jnp.asarray(re), jnp.asarray(im), n))
    t[:, n // 2:] = 0.0
    rr, ri = rfft(jnp.asarray(t), n)
    # f64-precomputed product vs two chained f32 matmuls
    _close(gr, rr, rel=2e-5)
    _close(gi, ri, rel=2e-5)
    # idempotence: a causal spectrum is unchanged
    gr2, gi2 = apply_constraint(gr, gi, n)
    _close(gr2, gr, rel=2e-5)
