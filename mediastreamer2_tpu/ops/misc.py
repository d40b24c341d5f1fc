"""Plumbing filters: tee, void source/sink, join, itc handoff.

Reference: src/otherfilters/tee.c, void.c, join.c, itc.c.  In SSA dataflow a
tee is just fan-out and a void sink is dead code — they exist so session
builders can keep the reference's graph shapes 1:1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mediastreamer2_tpu.core.block import Format, block_shape
from mediastreamer2_tpu.core.filter import FilterDef, register_filter

TEE_OUTPUTS = 8


def _tee_formats(ctx):
    return (ctx.in_formats[0],) * TEE_OUTPUTS


def _tee_process(state, ins, params, ctx):
    # per-output mute mask parity with MSTee (muted outputs produce silence)
    return state, tuple(ins[0] for _ in range(TEE_OUTPUTS)), {}


register_filter(FilterDef(
    name="tee", ninputs=1, noutputs=TEE_OUTPUTS,
    out_formats=_tee_formats, process=_tee_process,
))


register_filter(FilterDef(
    name="void_sink", ninputs=1, noutputs=0,
    out_formats=lambda ctx: (),
    process=lambda state, ins, params, ctx: (state, (), {}),
))


def _void_source_formats(ctx):
    return (ctx.params.get("fmt", Format()),)


def _void_source_process(state, ins, params, ctx):
    fmt = ctx.params.get("fmt", Format())
    return state, (jnp.zeros(block_shape(ctx.batch, fmt), jnp.float32),), {}


register_filter(FilterDef(
    name="void_source", ninputs=0, noutputs=1,
    out_formats=_void_source_formats, process=_void_source_process,
))


def _join_process(state, ins, params, ctx):
    # MSJoin semantics: pass input 0, drop input 1 (used to serialize graphs)
    return state, (ins[0],), {}


register_filter(FilterDef(
    name="join", ninputs=2, noutputs=1,
    out_formats=lambda ctx: (ctx.in_formats[0],),
    process=_join_process,
))


# ------------------------------------------------------------- delay line
def _delay_init(ctx):
    B = ctx.batch
    S = ctx.in_formats[0].samples_per_tick
    max_ticks = int(ctx.params.get("max_delay_ms", 200)) // 10
    return {"ring": jnp.zeros((B, max_ticks + 1, S), jnp.float32),
            "pos": jnp.zeros((), jnp.int32)}


def _delay_params(ctx):
    B = ctx.batch
    return {"delay_ticks": jnp.zeros((B,), jnp.int32)}


def _delay_process(state, ins, params, ctx):
    """Per-leg bulk delay in whole ticks (ring buffer, value-reconfig).

    Role: echo-path delay alignment ahead of the EC (the reference feeds
    the devices-DB delay hint into its EC, audiostream.c:1642-1680) and a
    general latency element. Each leg reads `delay_ticks` behind the
    write cursor; 0 = passthrough."""
    x = ins[0]
    B, S = x.shape
    ring, pos = state["ring"], state["pos"]
    D = ring.shape[1]
    ring = jax.lax.dynamic_update_slice(ring, x[:, None, :], (0, pos, 0))
    read_idx = jnp.mod(pos - params["delay_ticks"], D)       # [B]
    out = jnp.take_along_axis(ring, read_idx[:, None, None], axis=1)[:, 0]
    return {"ring": ring, "pos": (pos + 1) % D}, (out,), {}


register_filter(FilterDef(
    name="delay_line", ninputs=1, noutputs=1,
    out_formats=lambda ctx: (ctx.in_formats[0],),
    init=_delay_init, runtime_params=_delay_params, process=_delay_process,
))
