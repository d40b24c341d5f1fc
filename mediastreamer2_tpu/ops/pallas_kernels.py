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
