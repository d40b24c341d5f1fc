"""Video presets/quality controller + ITC bridge."""
import numpy as np

from mediastreamer2_tpu.models.video_presets import (VideoPresets,
                                                     VideoQualityController,
                                                     VideoConfiguration)
from mediastreamer2_tpu.utils.itc import ItcBridge
from mediastreamer2_tpu.core.block import Format, tick_samples
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.core.ticker import Ticker


def test_quality_controller_ladder():
    applied = []
    vqc = VideoQualityController(applied.append)
    c = vqc.on_bandwidth_estimate(2_000_000)
    assert c.width == 1280
    c = vqc.on_bandwidth_estimate(200_000)
    assert c.width == 320                    # first rung <= 200 kbps
    vqc.on_bandwidth_estimate(210_000)       # same rung -> no reapply
    assert len(applied) == 2
    c = vqc.on_bandwidth_estimate(10_000)    # below ladder -> lowest rung
    assert c.width == 160


def test_quality_controller_max_width():
    vqc = VideoQualityController(lambda c: None, max_width=640)
    c = vqc.on_bandwidth_estimate(5_000_000)
    assert c.width <= 640


def test_presets_registry():
    p = VideoPresets()
    assert p.get("default")[0].width == 1920
    p.register("screen", [VideoConfiguration(1920, 1080, 5.0, 400_000)])
    assert p.get("screen")[0].fps == 5.0


def test_itc_bridge_between_tickers(factory):
    B, rate = 2, 8000
    S = tick_samples(rate)
    # producer graph: mire-like tone into ext sink
    g1 = GraphBuilder(factory, batch=B)
    src = g1.add("ext_source", "in", fmt=Format(rate=rate))
    g1.link(src, 0, g1.add("ext_sink", "out"), 0)
    prod = Ticker(g1.build(), realtime=False)
    # consumer graph: ext source into recorder
    g2 = GraphBuilder(factory, batch=B)
    src2 = g2.add("ext_source", "in2", fmt=Format(rate=rate))
    g2.link(src2, 0, g2.add("file_recorder", "rec", max_ticks=20), 0)
    cons = Ticker(g2.build(), realtime=False)

    bridge = ItcBridge(shape=(B, S))
    sig = np.random.default_rng(0).uniform(-0.5, 0.5, (B, S)).astype(np.float32)
    prod.set_io(pull=lambda t: {"in": sig}, push=bridge.as_push_io("out"))
    cons.set_io(pull=bridge.as_pull_io("in2"))
    for _ in range(10):
        prod.do_tick()
        cons.do_tick()
    from mediastreamer2_tpu.ops.fileio import recorder_get_audio
    rec = recorder_get_audio(cons.state["rec"], 10, S)
    np.testing.assert_allclose(rec[:, S:2 * S], sig, atol=1e-6)
    assert bridge.underruns == 0
