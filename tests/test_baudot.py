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
