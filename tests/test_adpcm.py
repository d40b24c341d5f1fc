"""DVI4/IMA ADPCM (lax.scan sequential-codec pattern) — bit-exact vs
CPython's audioop DVI implementation."""
import numpy as np
import jax.numpy as jnp
import pytest

from mediastreamer2_tpu.core.block import Format, tick_samples
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.ops.adpcm import adpcm_encode, adpcm_decode
from mediastreamer2_tpu.ops.fileio import recorder_get_audio
from mediastreamer2_tpu.utils.audiodiff import audio_diff
from conftest import make_speechlike

audioop = pytest.importorskip("audioop")


def test_encode_matches_audioop():
    sig = make_speechlike(1600, 8000, seed=1)
    pcm = np.clip(np.round(sig * 32768), -32768, 32767).astype(np.int32)
    codes, _, _ = adpcm_encode(jnp.asarray(pcm[None]),
                               jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
    codes = np.asarray(codes)[0]
    ref_bytes, _ = audioop.lin2adpcm(pcm.astype("<i2").tobytes(), 2, None)
    ref = np.frombuffer(ref_bytes, np.uint8)
    ref_codes = np.empty(len(ref) * 2, np.uint8)
    ref_codes[0::2] = ref >> 4
    ref_codes[1::2] = ref & 0xF
    assert np.array_equal(codes, ref_codes)


def test_decode_matches_audioop():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, 400).astype(np.int32)
    dec, _, _ = adpcm_decode(jnp.asarray(codes[None]),
                             jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
    dec = np.asarray(dec)[0]
    packed = bytes((int(codes[i]) << 4) | int(codes[i + 1])
                   for i in range(0, len(codes), 2))
    ref, _ = audioop.adpcm2lin(packed, 2, None)
    ref = np.frombuffer(ref, "<i2")
    assert np.array_equal(dec.astype(np.int16), ref)


def test_dvi4_graph_roundtrip(factory):
    B, ticks = 3, 60
    S = tick_samples(8000)
    sig = make_speechlike(S * ticks, 8000, seed=7)
    g = GraphBuilder(factory, batch=B)
    p = g.add("file_player", "play", fmt=Format(rate=8000), signal=sig)
    g.chain(p, g.add("dvi4_enc", "enc"), g.add("dvi4_dec", "dec"),
            g.add("file_recorder", "rec", max_ticks=ticks))
    cg = g.build()
    st, _, _ = cg.run_scan(cg.init_state(), cg.init_params(), None, length=ticks)
    rec = recorder_get_audio(st["rec"], ticks, S)
    sim, shift = audio_diff(sig, rec[0])
    assert sim > 0.9 and shift == 0
    assert factory.find_encoder("dvi4").name == "dvi4_enc"
