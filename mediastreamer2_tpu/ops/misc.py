"""Plumbing filters: tee, void source/sink, join, itc handoff.

Reference: src/otherfilters/tee.c, void.c, join.c, itc.c.  In SSA dataflow a
tee is just fan-out and a void sink is dead code — they exist so session
builders can keep the reference's graph shapes 1:1.
"""
from __future__ import annotations

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
