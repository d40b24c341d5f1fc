"""G.711 mu-law / A-law companding — vectorized for the VPU.

Reference behavior: src/audiofilters/ulaw.c:170-238, alaw.c:168-237 (table
lookups over the classic Sun g711 algorithms in src/audiofilters/g711.c).
Re-designed: branch-free integer bit math over whole ``[legs, samples]``
blocks — thresholds-compare replaces the segment search so every leg/sample
companding runs as a handful of fused VPU ops instead of per-sample table
walks.

PCM convention: float32 in [-1, 1] <-> int16 full scale.  Encoded blocks are
int32 holding the 0..255 code (host narrows to uint8 at the RTP boundary).
"""
from __future__ import annotations

import jax.numpy as jnp

from mediastreamer2_tpu.core.filter import FilterDef, register_filter

_ULAW_SEG = jnp.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF],
                      dtype=jnp.int32)
_ALAW_SEG = jnp.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF],
                      dtype=jnp.int32)


def float_to_pcm16(x):
    return jnp.clip(jnp.round(x * 32768.0), -32768, 32767).astype(jnp.int32)


def pcm16_to_float(p):
    return p.astype(jnp.float32) / 32768.0


def ulaw_encode(pcm: jnp.ndarray) -> jnp.ndarray:
    """int16-range int32 -> mu-law code (int32 in 0..255)."""
    pcm = pcm >> 2                                   # 14-bit domain
    neg = pcm < 0
    mag = jnp.where(neg, -pcm, pcm)
    mag = jnp.minimum(mag, 8159) + 33                # clip + bias (BIAS>>2)
    seg = jnp.sum(mag[..., None] > _ULAW_SEG, axis=-1).astype(jnp.int32)
    uval = jnp.where(seg >= 8, 0x7F, (seg << 4) | ((mag >> (seg + 1)) & 0xF))
    mask = jnp.where(neg, 0x7F, 0xFF)
    return uval ^ mask


def ulaw_decode(u: jnp.ndarray) -> jnp.ndarray:
    u = (~u) & 0xFF
    t = (((u & 0xF) << 3) + 0x84) << ((u & 0x70) >> 4)
    return jnp.where((u & 0x80) != 0, 0x84 - t, t - 0x84)


def alaw_encode(pcm: jnp.ndarray) -> jnp.ndarray:
    pcm = pcm >> 3                                   # 13-bit domain
    neg = pcm < 0
    mag = jnp.where(neg, -pcm - 1, pcm)
    seg = jnp.sum(mag[..., None] > _ALAW_SEG, axis=-1).astype(jnp.int32)
    shifted = jnp.where(seg < 2, (mag >> 1) & 0xF, (mag >> seg) & 0xF)
    aval = jnp.where(seg >= 8, 0x7F, (seg << 4) | shifted)
    mask = jnp.where(neg, 0x55, 0xD5)
    return aval ^ mask


def alaw_decode(a: jnp.ndarray) -> jnp.ndarray:
    a = a ^ 0x55
    t = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    t = jnp.where(seg == 0, t + 8,
                  jnp.where(seg == 1, t + 0x108, (t + 0x108) << jnp.maximum(seg - 1, 0)))
    return jnp.where((a & 0x80) != 0, t, -t)


def _mk_codec(name, kind, enc_fn, dec_fn):
    def enc_formats(ctx):
        return (ctx.in_formats[0].with_(kind=kind),)

    def enc_process(state, ins, params, ctx):
        return state, (enc_fn(float_to_pcm16(ins[0])),), {}

    def dec_formats(ctx):
        return (ctx.in_formats[0].with_(kind="pcm"),)

    def dec_process(state, ins, params, ctx):
        return state, (pcm16_to_float(dec_fn(ins[0])),), {}

    register_filter(FilterDef(
        name=f"{name}_enc", ninputs=1, noutputs=1, out_formats=enc_formats,
        process=enc_process, category="encoder", enc_fmt=kind,
        interfaces=("audio_encoder",),
    ))
    register_filter(FilterDef(
        name=f"{name}_dec", ninputs=1, noutputs=1, out_formats=dec_formats,
        process=dec_process, category="decoder", enc_fmt=kind,
        interfaces=("audio_decoder",),
    ))


_mk_codec("ulaw", "ulaw", ulaw_encode, ulaw_decode)   # PCMU, cf. ulaw.c
_mk_codec("alaw", "alaw", alaw_encode, alaw_decode)   # PCMA, cf. alaw.c


# --- L16 (RFC 2586 big-endian PCM16) — reference src/audiofilters/l16.c ----
def _l16_enc_process(state, ins, params, ctx):
    return state, (float_to_pcm16(ins[0]),), {}


def _l16_dec_process(state, ins, params, ctx):
    return state, (pcm16_to_float(ins[0]),), {}


register_filter(FilterDef(
    name="l16_enc", ninputs=1, noutputs=1,
    out_formats=lambda ctx: (ctx.in_formats[0].with_(kind="l16"),),
    process=_l16_enc_process, category="encoder", enc_fmt="l16",
    interfaces=("audio_encoder",),
))
register_filter(FilterDef(
    name="l16_dec", ninputs=1, noutputs=1,
    out_formats=lambda ctx: (ctx.in_formats[0].with_(kind="pcm"),),
    process=_l16_dec_process, category="decoder", enc_fmt="l16",
    interfaces=("audio_decoder",),
))
