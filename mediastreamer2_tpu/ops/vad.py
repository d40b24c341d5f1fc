"""Energy VAD + DTX/comfort-noise signaling.

Reference: MSVadDtx (src/audiofilters/msvaddtx.c:176-192) — energy VAD
(bcg729's VAD when available) that emits silence-detected events and CN
payload parameters so the RTP sender can stop media and send RFC3389 CN.

TPU-native: smoothed block energy vs adaptive noise-floor estimate; the
``vad_update``/``silence_start``/``noise_level`` outputs surface as event
tensors the host RTP layer turns into DTX decisions and CN packets.
"""
from __future__ import annotations

import jax.numpy as jnp

from mediastreamer2_tpu.core.filter import FilterDef, register_filter

HANGOVER_TICKS = 30     # keep "voice" for 300 ms after last activity


def _vad_init(ctx):
    B = ctx.batch
    return {
        "floor": jnp.full((B,), 1e-6, jnp.float32),   # noise floor (energy)
        "energy": jnp.zeros((B,), jnp.float32),
        "hangover": jnp.zeros((B,), jnp.int32),
        "voice": jnp.ones((B,), jnp.bool_),
    }


def _vad_params(ctx):
    B = ctx.batch
    return {
        "enabled": jnp.ones((B,), jnp.bool_),
        "threshold_ratio": jnp.full((B,), 4.0, jnp.float32),  # energy over floor
    }


def _vad_process(state, ins, params, ctx):
    x = ins[0]
    e = (x * x).mean(axis=1)
    energy = 0.7 * state["energy"] + 0.3 * e
    # noise floor: fast down, slow up (classic minimum statistics lite)
    floor = jnp.where(e < state["floor"],
                      0.8 * state["floor"] + 0.2 * e,
                      state["floor"] * 1.02)
    floor = jnp.maximum(floor, 1e-9)
    # decide on instantaneous block energy so silence is caught within a tick
    active = e > params["threshold_ratio"] * floor
    hangover = jnp.where(active, HANGOVER_TICKS,
                         jnp.maximum(state["hangover"] - 1, 0))
    voice = active | (hangover > 0)
    voice = jnp.where(params["enabled"], voice, True)
    silence_start = state["voice"] & ~voice
    voice_start = ~state["voice"] & voice
    new_state = {"floor": floor, "energy": energy,
                 "hangover": hangover, "voice": voice}
    return new_state, (x,), {
        "silence_start": silence_start,    # cf. MS_VAD_DTX events
        "voice_start": voice_start,
        "noise_level": jnp.where(silence_start, jnp.sqrt(floor), 0.0),
    }


register_filter(FilterDef(
    name="vad_dtx", ninputs=1, noutputs=1,
    out_formats=lambda ctx: (ctx.in_formats[0],),
    init=_vad_init, runtime_params=_vad_params, process=_vad_process,
    interfaces=("vad",),
))
