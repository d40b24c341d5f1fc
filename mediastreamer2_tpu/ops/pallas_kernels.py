"""Pallas TPU kernels for hot per-tick ops.

Where the reference hand-writes NEON (msvideo_neon.c, audiomixer inner
loops), this framework mostly rides XLA fusion — but a few per-tick chains
benefit from explicit kernels that keep a [legs, samples] tile resident in
VMEM across several logical stages:

* ``fused_volume``: DC removal + gain ramp + saturation + RMS metering in
  one VMEM pass (the MSVolume per-sample loop, msvolume.c). One HBM read
  and one write per tick block instead of one per stage; per-leg scalars
  ride along as lanes.

Kernels run compiled on TPU and in interpreter mode elsewhere (tests), and
every caller keeps a pure-jnp fallback (PALLAS_DISABLE=1).
"""
from __future__ import annotations

import os
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEG_TILE = 256


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def pallas_enabled() -> bool:
    return os.environ.get("PALLAS_DISABLE", "0") != "1"


def _fused_volume_kernel(x_ref, g0_ref, g1_ref, dc_ref, dcen_ref,
                         out_ref, energy_ref, mean_ref):
    """One batch-tile: y = clip((x - dc*dcen) * ramp(g0->g1));
    energy = mean(x'^2); mean = mean(x) (feeds the DC tracker)."""
    x = x_ref[:]                                   # [TB, S]
    tb, s = x.shape
    mean_ref[:] = jnp.mean(x, axis=1, keepdims=True)
    dc = dc_ref[:]                                 # [TB, 1]
    dcen = dcen_ref[:]                             # [TB, 1]
    x = x - dc * dcen
    # int32 iota then cast: float iota doesn't lower on some TPU toolchains
    ramp = jax.lax.broadcasted_iota(jnp.int32, (tb, s), 1).astype(jnp.float32) / float(s)
    g = g0_ref[:] * (1.0 - ramp) + g1_ref[:] * ramp
    out_ref[:] = jnp.clip(x * g, -1.0, 1.0)
    energy_ref[:] = jnp.mean(x * x, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=())
def fused_volume(x, gain_start, gain_end, dc, dc_enabled):
    """x [B,S]; per-leg scalars [B]. Returns (y [B,S], block_energy [B])."""
    B, S = x.shape
    tile = min(LEG_TILE, B)
    grid = (pl.cdiv(B, tile),)
    col = lambda v: v.reshape(B, 1).astype(jnp.float32)
    y, en, mn = pl.pallas_call(
        _fused_volume_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(x, col(gain_start), col(gain_end), col(dc), col(dc_enabled))
    return y, en[:, 0], mn[:, 0]


def fused_volume_reference(x, gain_start, gain_end, dc, dc_enabled):
    """Pure-jnp fallback with identical semantics."""
    B, S = x.shape
    mean = x.mean(axis=1)
    x = x - (dc * dc_enabled)[:, None]
    ramp = jnp.arange(S, dtype=jnp.float32)[None, :] / S
    g = gain_start[:, None] * (1 - ramp) + gain_end[:, None] * ramp
    return jnp.clip(x * g, -1.0, 1.0), (x * x).mean(axis=1), mean


# ---------------------------------------------------------------------------
# MDF (echo canceller) megakernels: keep the [B, P, F] tap/history tensors
# VMEM-resident across all elementwise stages of a tick, instead of letting
# XLA materialize each intermediate to HBM. Two passes (the error spectrum
# computed between them forces the split):
#   mdf_apply:  shift history + dual filter apply        (reads 6, writes 2+)
#   mdf_update: gradient + NLMS update + two-path copies (reads 6, writes 4)
# ---------------------------------------------------------------------------
MDF_TILE = 32


def _mdf_tile(B):
    t = min(MDF_TILE, B)
    return t if B % t == 0 else 0     # 0 => caller falls back to jnp path


def _mdf_apply_kernel(wm_r, wm_i, ws_r, ws_i, xh_r, xh_i, x_r, x_i,
                      ym_r, ym_i, ys_r, ys_i, xh2_r, xh2_i):
    P = wm_r.shape[1]
    accs = [jnp.zeros_like(x_r[:]) for _ in range(4)]
    am_r, am_i, as_r, as_i = accs
    for p in range(P):
        hr = x_r[:] if p == 0 else xh_r[:, p - 1, :]
        hi = x_i[:] if p == 0 else xh_i[:, p - 1, :]
        xh2_r[:, p, :] = hr
        xh2_i[:, p, :] = hi
        am_r += wm_r[:, p, :] * hr - wm_i[:, p, :] * hi
        am_i += wm_r[:, p, :] * hi + wm_i[:, p, :] * hr
        as_r += ws_r[:, p, :] * hr - ws_i[:, p, :] * hi
        as_i += ws_r[:, p, :] * hi + ws_i[:, p, :] * hr
    ym_r[:] = am_r
    ym_i[:] = am_i
    ys_r[:] = as_r
    ys_i[:] = as_i


def mdf_apply(Wm_r, Wm_i, Ws_r, Ws_i, Xh_r, Xh_i, Xr, Xi):
    """Returns (Ym_r, Ym_i, Ys_r, Ys_i, Xh2_r, Xh2_i)."""
    B, P, F = Wm_r.shape
    tb = _mdf_tile(B)
    grid = (B // tb,)
    b3 = lambda: pl.BlockSpec((tb, P, F), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    b2 = lambda: pl.BlockSpec((tb, F), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mdf_apply_kernel,
        grid=grid,
        in_specs=[b3()] * 6 + [b2()] * 2,
        out_specs=[b2()] * 4 + [b3()] * 2,
        out_shape=[jax.ShapeDtypeStruct((B, F), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((B, P, F), jnp.float32)] * 2,
        interpret=_use_interpret(),
    )(Wm_r, Wm_i, Ws_r, Ws_i, Xh_r, Xh_i, Xr, Xi)


def _mdf_update_kernel(cpos_ref, ws_r, ws_i, wm_r, wm_i, xh_r, xh_i,
                       e_r, e_i, inv_norm, gc_r, gc_i, mu, promote, reseed,
                       ws2_r, ws2_i, wm2_r, wm2_i):
    P = ws_r.shape[1]
    cpos = cpos_ref[0]
    er, ei = e_r[:], e_i[:]
    inv = inv_norm[:]
    m = mu[:]                                     # [TB, 1]
    pr = promote[:]                               # [TB, 1] (0/1)
    rs = reseed[:]
    for p in range(P):
        hr, hi = xh_r[:, p, :], xh_i[:, p, :]
        gr = (hr * er + hi * ei) * inv            # conj(Xh) * E
        gi = (hr * ei - hi * er) * inv
        use_c = (cpos == p)
        gr = jnp.where(use_c, gc_r[:], gr)
        gi = jnp.where(use_c, gc_i[:], gi)
        up_r = ws_r[:, p, :] + m * gr
        up_i = ws_i[:, p, :] + m * gi
        wm2_r[:, p, :] = pr * up_r + (1 - pr) * wm_r[:, p, :]
        wm2_i[:, p, :] = pr * up_i + (1 - pr) * wm_i[:, p, :]
        ws2_r[:, p, :] = rs * wm_r[:, p, :] + (1 - rs) * up_r
        ws2_i[:, p, :] = rs * wm_i[:, p, :] + (1 - rs) * up_i


def mdf_update(cpos, Ws_r, Ws_i, Wm_r, Wm_i, Xh_r, Xh_i, Er, Ei,
               inv_norm, Gc_r, Gc_i, mu, promote, reseed):
    """Returns (Ws2_r, Ws2_i, Wm2_r, Wm2_i) — updated shadow + transferred
    main, matching the two-path semantics of ops/aec.py."""
    B, P, F = Ws_r.shape
    tb = _mdf_tile(B)
    grid = (B // tb,)
    b3 = lambda: pl.BlockSpec((tb, P, F), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    b2 = lambda: pl.BlockSpec((tb, F), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    b1 = lambda: pl.BlockSpec((tb, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    col = lambda v: v.reshape(B, 1).astype(jnp.float32)
    return pl.pallas_call(
        _mdf_update_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [b3()] * 6 + [b2()] * 2 + [b2()] + [b2()] * 2 + [b1()] * 3,
        out_specs=[b3()] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, P, F), jnp.float32)] * 4,
        interpret=_use_interpret(),
    )(jnp.asarray(cpos).reshape(1), Ws_r, Ws_i, Wm_r, Wm_i, Xh_r, Xh_i,
      Er, Ei, inv_norm, Gc_r, Gc_i, col(mu), col(promote), col(reseed))


def mdf_available(B: int) -> bool:
    # Measured on v5e: XLA's own fusion of the MDF elementwise chain beats
    # these kernels — ~6% at f32 storage, ~19% after the bf16 tap/history
    # storage change (8.46 vs 7.10 ms/tick at 8192 legs; the kernels pay
    # f32 VMEM tiles + 481->512 lane padding that XLA avoids). Kept opt-in
    # (PALLAS_MDF=1) + correctness-tested; revisit with lane-aligned layouts.
    if os.environ.get("PALLAS_MDF", "0") != "1":
        return False
    return pallas_enabled() and _mdf_tile(B) > 0
