"""End-to-end slice: file_player -> ulaw_enc -> ulaw_dec -> file_recorder,
N legs batched — the reference basic_audio tester graph
(tester/mediastreamer2_basic_audio_tester.c) with the ms_audio_diff oracle.
"""
import numpy as np

from mediastreamer2_tpu.core.block import Format, tick_samples
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.ops.fileio import recorder_get_audio
from mediastreamer2_tpu.utils.audiodiff import audio_diff, snr_db

from conftest import make_speechlike

FMT8K = Format(kind="pcm", rate=8000, channels=1)


def _build(factory, B, sig, codec, n_ticks):
    g = GraphBuilder(factory, batch=B)
    p = g.add("file_player", "play", fmt=FMT8K, signal=sig)
    enc = g.add(f"{codec}_enc", "enc")
    dec = g.add(f"{codec}_dec", "dec")
    rec = g.add("file_recorder", "rec", max_ticks=n_ticks)
    g.chain(p, enc, dec, rec)
    return g.build()


def test_play_ulaw_record_similarity(factory):
    B, dur_ticks = 4, 100
    S = tick_samples(8000)
    sig = make_speechlike(S * dur_ticks, 8000)
    cg = _build(factory, B, sig, "ulaw", dur_ticks)
    st, params = cg.init_state(), cg.init_params()
    st, outs, evs = cg.run_scan(st, params, None, length=dur_ticks)
    rec = recorder_get_audio(st["rec"], dur_ticks, S)
    for leg in range(B):
        sim, shift = audio_diff(sig, rec[leg])
        assert sim > 0.98, f"leg {leg}: similarity {sim}"
        assert shift == 0
    assert snr_db(sig, rec[0]) > 30


def test_play_alaw_record_similarity(factory):
    B, dur_ticks = 2, 50
    S = tick_samples(8000)
    sig = make_speechlike(S * dur_ticks, 8000, seed=3)
    cg = _build(factory, B, sig, "alaw", dur_ticks)
    st, outs, evs = cg.run_scan(cg.init_state(), cg.init_params(), None,
                                length=dur_ticks)
    rec = recorder_get_audio(st["rec"], dur_ticks, S)
    sim, _ = audio_diff(sig, rec[0])
    assert sim > 0.98
