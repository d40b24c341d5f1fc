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


def test_packet_duplication_stats():
    """'Packet duplication' (adaptive tester:401): duplication_ratio R
    makes packet_dup_recv == packet_recv / (R+1); ratio 0 -> none."""
    from mediastreamer2_tpu.net.rtp import LoopbackPair, RtpSession
    for ratio, n in ((0.0, 100), (1.0, 100), (0.5, 100)):
        pair = LoopbackPair()
        tx = RtpSession(pair.endpoint(0))
        rx = RtpSession(pair.endpoint(1))
        tx.set_duplication_ratio(ratio)
        for _ in range(n):
            tx.send_payload(b"\x00" * 80, ts_increment=80)
        rx.poll()
        expect_dup = int(n * ratio)
        assert rx.stats.packet_dup_recv == expect_dup, ratio
        assert rx.stats.recv_packets == n + expect_dup   # oRTP counts both


def test_upload_bandwidth_with_duplication():
    """'Upload bandwidth computation' (adaptive tester:430): PCMU at
    ~80 kbit/s measures 80*(1+R) kbit/s with duplication ratio R."""
    import time as _time
    from mediastreamer2_tpu.net.rtp import LoopbackPair, RtpSession
    for ratio in (0, 1, 2):
        pair = LoopbackPair()
        tx = RtpSession(pair.endpoint(0))
        tx.set_duplication_ratio(ratio)
        for i in range(50):                    # 0.5 s of 10 ms G.711,
            tx.send_payload(b"\x00" * 160, ts_increment=160)
            _time.sleep(0.002)                 # compressed-time pacing
        # all sends fall inside the meter's 1 s window: the measured rate
        # scales exactly with (1+R), the tester's 80*(1+R) arithmetic
        kbps = tx.up_bw.bps() / 1000.0
        expect = 50 * (160 + 12) * 8 * (1 + ratio) / 1000.0
        assert abs(kbps - expect) / expect < 0.1, (ratio, kbps, expect)
