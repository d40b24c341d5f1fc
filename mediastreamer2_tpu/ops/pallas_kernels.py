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

# --------------------------------------------------------------------------
# Fused NLMS update + two-path transfer (the [B,P,F] elementwise tail of
# ops/aec.py) in NATIVE storage dtypes.  Motivation (tools/hlo_traffic.py
# on the optimized HLO, 8192 legs): XLA splits this tail into an update
# fusion, a promote-select fusion that REMATERIALIZES the whole update
# (second full read of the f32 shadow taps), and two 126 MB carry copies —
# ~1.7 GB/tick.  One kernel pass reads Ws/Wm/Xh once and writes Ws/Wm once
# (~1.0 GB), with the Ws/Wm inputs donated in place.
# Unlike the rejected PALLAS_MDF megakernel (f32 tiles everywhere), tap
# storage stays bf16 in VMEM and the filter APPLY stays on XLA's
# variadic-reduce fusion.
# --------------------------------------------------------------------------

def _mdf_update_fused_kernel(cpos_ref, ws_r, ws_i, wm_r, wm_i, xh_r, xh_i,
                             e_r, e_i, inv_norm, gc_r, gc_i, mu,
                             promote, reseed, hreset,
                             ws2_r, ws2_i, wm2_r, wm2_i):
    P = ws_r.shape[1]
    cpos = cpos_ref[0]
    er, ei = e_r[:], e_i[:]
    m = mu[:]                                     # [TB, 1]
    # same association order as the jnp branch ((mu*inv)*G and mu*gc) so
    # the two paths are BIT-identical, not merely close
    stepw = m * inv_norm[:]
    con_r = m * gc_r[:]
    con_i = m * gc_i[:]
    pr = promote[:] != 0.0                        # [TB, 1] masks
    rs = reseed[:] != 0.0
    hr_m = hreset[:] != 0.0
    for p in range(P):
        hr = xh_r[:, p, :].astype(jnp.float32)
        hi = xh_i[:, p, :].astype(jnp.float32)
        gr = hr * er + hi * ei                    # conj(Xh) * E
        gi = hr * ei - hi * er
        use_c = cpos == p
        wsp_r = ws_r[:, p, :]
        wsp_i = ws_i[:, p, :]
        up_r = wsp_r + jnp.where(use_c, con_r, stepw * gr)
        up_i = wsp_i + jnp.where(use_c, con_i, stepw * gi)
        wmp_r = wm_r[:, p, :]
        wmp_i = wm_i[:, p, :]
        wm2_r[:, p, :] = jnp.where(pr, up_r.astype(wmp_r.dtype), wmp_r)
        wm2_i[:, p, :] = jnp.where(pr, up_i.astype(wmp_i.dtype), wmp_i)
        out_r = jnp.where(rs, wmp_r.astype(jnp.float32), up_r)
        out_i = jnp.where(rs, wmp_i.astype(jnp.float32), up_i)
        ws2_r[:, p, :] = jnp.where(hr_m, 0.0, out_r)
        ws2_i[:, p, :] = jnp.where(hr_m, 0.0, out_i)


def update_tile(B: int) -> int:
    # MEASURED SLOWER on v5e (r4 interleaved A/B, ec_only: 5.93/5.73 vs
    # 4.59/4.59 ms/tick @8192, 8.93 vs 7.59 @12288 — +25-29%) despite
    # halving the modeled HBM traffic: the kernel pays 481->512 lane
    # padding on every [tb,P,F] tile plus a serialized per-partition loop,
    # while XLA's fusions pipeline the same work across its own tiling.
    # Fifth rejected structural alternative (megakernel, cond-gated tap
    # writes, select-reorder, half-update NLMS, fused update kernel).
    # Kept opt-in (AEC_PALLAS_UPDATE=1) + parity-tested for re-evaluation
    # on chips with different VMEM/lane geometry.
    if os.environ.get("AEC_PALLAS_UPDATE", "0") != "1" or not pallas_enabled():
        return 0
    return _mdf_tile(B)


def mdf_update_fused(cpos, Ws_r, Ws_i, Wm_r, Wm_i, Xh_r, Xh_i, Er, Ei,
                     inv_norm, Gc_r, Gc_i, mu, promote, reseed, hard_reset):
    """Returns (Ws2_r, Ws2_i, Wm2_r, Wm2_i); Ws/Wm inputs are donated.
    Expressions match the jnp path association-for-association; the
    residual difference is ~1 ulp/tick from FMA contraction choices
    inside XLA's fusions (measured 1.5e-7 on taps after 60 ticks) —
    within the project's quality-equivalence criterion, and the jnp
    branch stays available via AEC_PALLAS_UPDATE=0 / PALLAS_DISABLE=1."""
    B, P, F = Ws_r.shape
    tb = update_tile(B)
    grid = (B // tb,)
    b3 = lambda dt: pl.BlockSpec((tb, P, F), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    b2 = lambda: pl.BlockSpec((tb, F), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    b1 = lambda: pl.BlockSpec((tb, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    col = lambda v: v.reshape(B, 1).astype(jnp.float32)
    return pl.pallas_call(
        _mdf_update_fused_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [b3(None)] * 6 + [b2()] * 5 + [b1()] * 4,
        out_specs=[b3(None)] * 4,
        out_shape=[jax.ShapeDtypeStruct((B, P, F), Ws_r.dtype),
                   jax.ShapeDtypeStruct((B, P, F), Ws_i.dtype),
                   jax.ShapeDtypeStruct((B, P, F), Wm_r.dtype),
                   jax.ShapeDtypeStruct((B, P, F), Wm_i.dtype)],
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        interpret=_use_interpret(),
    )(jnp.asarray(cpos).reshape(1), Ws_r, Ws_i, Wm_r, Wm_i, Xh_r, Xh_i,
      Er, Ei, inv_norm, Gc_r, Gc_i, col(mu), col(promote), col(reseed),
      col(hard_reset))
