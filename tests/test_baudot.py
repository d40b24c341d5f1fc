"""Baudot TTY round trip (parity: reference baudot tester,
tester/mediastreamer2_baudot_tester.cpp)."""
import numpy as np
import jax
import pytest

from mediastreamer2_tpu.core.block import Format
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.ops.baudot import (load_text, BaudotFramer,
                                           text_to_bits, bits_to_text,
                                           char_to_code, LTRS_SHIFT)


def test_ita2_tables():
    assert char_to_code("E", False) == (1, False)
    assert char_to_code("3", False) == (1, True)     # FIGS table
    bits = text_to_bits("A")
    assert bits[:8] == [1] * 8                        # idle marks


def _run_roundtrip(factory, text, ticks=300, noise=0.0, B=2):
    g = GraphBuilder(factory, batch=B)
    src = g.add("void_source", "vs", fmt=Format(rate=8000))
    gen = g.add("baudot_gen", "gen")
    det = g.add("baudot_det", "det")
    g.chain(src, gen, det)
    g.link(det, 0, g.add("ext_sink", "out"), 0)
    cg = g.build()
    st, params = cg.init_state(), cg.init_params()
    st["gen"] = load_text(st["gen"], {0: text}, B)
    framers = [BaudotFramer() for _ in range(B)]
    step = jax.jit(cg.step)
    rng = np.random.default_rng(0)
    for i in range(ticks):
        st, out, ev = step(st, params, {})
        me = np.asarray(ev["det.mark_env"])
        se = np.asarray(ev["det.space_env"])
        for leg in range(B):
            framers[leg].push_envelopes(me[leg], se[leg])
    return framers


def test_baudot_roundtrip_text(factory):
    framers = _run_roundtrip(factory, "HELLO 123")
    assert framers[0].text() == "HELLO 123"
    assert framers[1].text() == ""           # silent leg decodes nothing


def test_baudot_roundtrip_figures_shift(factory):
    framers = _run_roundtrip(factory, "SOS 911 OK", ticks=400)
    assert framers[0].text() == "SOS 911 OK"


def test_decode_reference_recordings(factory):
    """Wire interop: decode the reference's REAL Baudot TTY recordings
    (tester/sounds/baudot_mono_*_us.wav — the baudot tester's fixtures),
    not just our own generator's output."""
    import os
    import pytest
    FIX = "/root/reference/tester/sounds"
    if not os.path.isdir(FIX):
        pytest.skip("reference fixtures not mounted")
    from mediastreamer2_tpu.io.wav import read_wav
    from mediastreamer2_tpu.core.block import tick_samples

    def decode(fname):
        sig, rate = read_wav(f"{FIX}/{fname}")
        S = tick_samples(rate)
        g = GraphBuilder(factory, batch=1)
        src = g.add("ext_source", "in", fmt=Format(rate=rate))
        det = g.add("baudot_det", "det")
        g.chain(src, det)
        g.link(det, 0, g.add("ext_sink", "out"), 0)
        cg = g.build()
        st, params = cg.init_state(), cg.init_params()
        framer = BaudotFramer(rate=rate)
        step = jax.jit(cg.step)
        for t in range(len(sig) // S):
            st, out, ev = step(st, params, {"in": sig[t * S:(t + 1) * S][None]})
            framer.push_envelopes(np.asarray(ev["det.mark_env"])[0],
                                  np.asarray(ev["det.space_env"])[0])
        return framer.text()

    assert decode("baudot_mono_alphabet_us.wav") == \
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    assert "0123456789" in decode("baudot_mono_digits_us.wav")


def test_baudot_over_audio_stream(factory):
    """Session-level TTY: audio_stream_send_baudot_string on one stream,
    decoded text surfaces on the peer (audiostream.c baudot_gen/baudot_det
    chain positions + baudot tester round trip)."""
    from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                        AudioStreamFeatures)
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    feats = AudioStreamFeatures(baudot=True, plc=False, volume=False)
    tx = AudioStreamBatch(factory, 1, features=feats)
    rx = AudioStreamBatch(factory, 1, features=feats)
    tx.ticker.warm_up(); rx.ticker.warm_up()
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.send_baudot_string(0, "SOS 911")
    tx.ticker.realtime = rx.ticker.realtime = False
    for _ in range(350):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
        rx.iterate()                      # pumps detector events
    assert rx.get_baudot_text(0) == "SOS 911"


def test_baudot_europe_mode_50_baud(factory):
    """The reference's EUROPE mode (50 baud vs US 45.45,
    baudot_generator_filter.cpp mode switch): the baud is a per-leg
    runtime param; gen and framer at 50 baud round-trip."""
    import jax.numpy as jnp
    B = 1
    g = GraphBuilder(factory, batch=B)
    src = g.add("void_source", "vs", fmt=Format(rate=8000))
    gen = g.add("baudot_gen", "gen")
    det = g.add("baudot_det", "det")
    g.chain(src, gen, det)
    g.link(det, 0, g.add("ext_sink", "out"), 0)
    cg = g.build()
    st, params = cg.init_state(), cg.init_params()
    params["gen"]["baud"] = jnp.full((B,), 50.0, jnp.float32)
    st["gen"] = load_text(st["gen"], {0: "EURO 50"}, B)
    framer = BaudotFramer(baud=50.0)
    step = jax.jit(cg.step)
    for i in range(300):
        st, out, ev = step(st, params, {})
        framer.push_envelopes(np.asarray(ev["det.mark_env"])[0],
                              np.asarray(ev["det.space_env"])[0])
    assert framer.text() == "EURO 50"
