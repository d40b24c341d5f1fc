"""DTMF tones must survive codec compression — the basic_audio tester's
"dtmfgen-enc-dec-tonedet-{pcmu,opus,bv16}" cases
(mediastreamer2_basic_audio_tester.c): generate a dual tone, run it through
a real encode->decode roundtrip, and the Goertzel detector must still
classify the digit."""
import numpy as np
import jax.numpy as jnp
import pytest

from mediastreamer2_tpu.core.block import Format, tick_samples
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.ops.tones import dtmf_freqs, classify_dtmf
from mediastreamer2_tpu.ops import host_codecs as hc


def _gen_digit(factory, digit: str, rate: int, ticks: int) -> np.ndarray:
    S = tick_samples(rate)
    g = GraphBuilder(factory, batch=1)
    src = g.add("void_source", "vs", fmt=Format(rate=rate))
    gen = g.add("dtmf_gen", "gen")
    g.link(src, 0, gen, 0)
    g.link(gen, 0, g.add("ext_sink", "out"), 0)
    cg = g.build()
    params, st = cg.init_params(), cg.init_state()
    f1, f2 = dtmf_freqs(digit)
    params["gen"]["f1"] = jnp.array([f1], jnp.float32)
    params["gen"]["f2"] = jnp.array([f2], jnp.float32)
    params["gen"]["remaining"] = jnp.array([S * ticks], jnp.int32)
    blocks = []
    for _ in range(ticks):
        st, out, _ = cg.step(st, params, {})
        params["gen"]["remaining"] = jnp.maximum(
            params["gen"]["remaining"] - S, 0)
        blocks.append(np.asarray(out["out"])[0])
    return np.concatenate(blocks)


def _detect_digit(factory, audio: np.ndarray, rate: int) -> str:
    S = tick_samples(rate)
    g = GraphBuilder(factory, batch=1)
    src = g.add("ext_source", "in", fmt=Format(rate=rate))
    det = g.add("tone_detector", "det")
    g.link(src, 0, det, 0)
    g.link(det, 0, g.add("ext_sink", "out"), 0)
    cg = g.build()
    params, st = cg.init_params(), cg.init_state()
    peak = np.zeros(8, np.float32)
    for t in range(len(audio) // S):
        blk = audio[t * S:(t + 1) * S][None, :].astype(np.float32)
        st, _, _ = cg.step(st, params, {"in": blk})
        peak = np.maximum(peak, np.asarray(st["det"]["power"])[0])
    return classify_dtmf(peak)


def _roundtrip_ulaw(audio, rate):
    from mediastreamer2_tpu.ops.g711 import (ulaw_encode, ulaw_decode,
                                             float_to_pcm16, pcm16_to_float)
    pcm = float_to_pcm16(jnp.asarray(audio))
    return np.asarray(pcm16_to_float(ulaw_decode(ulaw_encode(pcm))))


def _roundtrip_g722(audio, rate):
    from mediastreamer2_tpu.ops.g722 import (g722_state, g722_encode,
                                             g722_decode)
    pcm = np.clip(np.round(audio * 32768), -32768, 32767).astype(np.int32)
    codes, _ = g722_encode(jnp.asarray(pcm[None, :]), g722_state(1))
    dec, _ = g722_decode(codes, g722_state(1))
    return np.asarray(dec)[0].astype(np.float32) / 32768.0


def _roundtrip_opus(audio, rate):
    enc = hc.OpusEncoder(rate=rate)
    dec = hc.OpusDecoder(rate=rate)
    F = rate // 100
    out = []
    for i in range(len(audio) // F):
        payload = enc.encode(audio[i * F:(i + 1) * F])
        out.append(dec.decode(payload, F))
    return np.concatenate(out)


def test_dtmf_through_ulaw(factory):
    rate = 8000
    tone = _gen_digit(factory, "7", rate, 30)
    assert _detect_digit(factory, _roundtrip_ulaw(tone, rate), rate) == "7"


def test_dtmf_through_g722(factory):
    rate = 16000
    tone = _gen_digit(factory, "3", rate, 30)
    assert _detect_digit(factory, _roundtrip_g722(tone, rate), rate) == "3"


@pytest.mark.skipif(not hc.opus_available(), reason="libopus missing")
def test_dtmf_through_opus(factory):
    rate = 8000
    tone = _gen_digit(factory, "9", rate, 30)
    assert _detect_digit(factory, _roundtrip_opus(tone, rate), rate) == "9"


@pytest.mark.skipif(not hc.bv16_available(), reason="libbv16 missing")
def test_dtmf_through_bv16(factory):          # pragma: no cover (lib absent)
    rate = 8000
    tone = _gen_digit(factory, "5", rate, 30)
    c = hc.Bv16Codec()
    dec = c.decode(c.encode(tone), frame_samples=len(tone))
    assert _detect_digit(factory, dec, rate) == "5"
