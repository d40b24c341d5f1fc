"""Adaptive-bitrate integration test (reference adaptive tester pattern:
two streams + shaped network + RTCP feedback drives the encoder down;
tester/mediastreamer2_adaptive_tester.c)."""
import numpy as np

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
from mediastreamer2_tpu.models import qos
from mediastreamer2_tpu.net.rtp import LoopbackPair
from mediastreamer2_tpu.net.netsim import NetworkSimulator, NetSimParams
from conftest import make_speechlike

S = tick_samples(8000)


def test_rtcp_feedback_drives_bitrate_down(factory):
    ticks = 200
    sig = make_speechlike(S * ticks, 8000, seed=3)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks)
    # lossy channel both ways so RTCP reports loss back to the sender
    pair = LoopbackPair(netsim=NetworkSimulator(NetSimParams(loss_rate=18.0,
                                                             seed=5)))
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.enable_rtcp(interval_s=0.2)
    rx.enable_rtcp(interval_s=0.2)

    rates, ptimes = [], []
    drv = qos.AudioBitrateDriver(rates.append, ptimes.append, nominal_bps=64000)
    ctl = qos.BitrateController(qos.SimpleQosAnalyzer(), drv)
    tx.attach_bitrate_controller(0, ctl)
    qi = qos.QualityIndicator()
    tx.attach_quality_indicator(0, qi)

    tx.ticker.warm_up()
    rx.ticker.warm_up()
    rx.start(ticks + 40)
    for burst in range(ticks // 10):
        tx.ticker.realtime = True
        tx.run(10)
        tx.iterate()
        rx.iterate()
    tx.stop()
    rx.stop()
    # the sender saw loss reports and reduced bitrate or packet rate
    assert rates or ptimes, "controller never acted on RTCP feedback"
    if rates:
        assert rates[-1] < 64000
    assert qi.rating < 4.5          # MOS degraded under 18% loss
    assert rx.sessions[0].stats.recv_packets > 50


def test_tmmbr_caps_opus_bitrate(factory):
    """'Upload bitrate [opus]' adaptive tester shape: the receiver's
    BandwidthController emits TMMBR; the sender's iterate() applies it to
    the opus encoder (media_stream_process_rtcp TMMBR handling)."""
    import pytest
    from mediastreamer2_tpu.ops import host_codecs as hc
    from mediastreamer2_tpu.net.rtcp import Feedback
    if not hc.opus_available():
        pytest.skip("libopus missing")
    ticks = 60
    sig = make_speechlike(tick_samples(48000) * ticks, 48000, seed=9)
    tx = AudioStreamBatch(factory, 1, codec="opus", rate=48000,
                          mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, codec="opus", rate=48000,
                          record_ticks=ticks)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.enable_rtcp(interval_s=0.1)
    rx.enable_rtcp(interval_s=0.1)
    caps = []
    tx.on_tmmbr = lambda leg, bps: caps.append((leg, bps))
    tx.ticker.warm_up(); rx.ticker.warm_up()
    rx.start(ticks + 30)
    # run half the call, then the receiver signals congestion via TMMBR
    tx.ticker.realtime = True
    tx.run(ticks // 2)
    tmmbr = Feedback("tmmbr", rx.sessions[0].ssrc, tx.sessions[0].ssrc,
                     24000)
    pair.endpoint(1).send(tmmbr.pack())
    tx.run(ticks // 2)
    tx.iterate()
    tx.stop(); rx.stop()
    assert caps and caps[-1][1] in range(20000, 29000)
    assert tx.bitrate_caps[0] == caps[-1][1]
    # the opus encoder was actually re-targeted
    assert tx._host_enc[0].bitrate <= 24576
