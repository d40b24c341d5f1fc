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


def test_qos_ptime_ladder_drives_real_opus_leg(factory):
    """The full loop the reference runs from media_stream_iterate: loss ->
    analyzer action -> AudioBitrateDriver ptime ladder -> the leg really
    packs more ms per packet (now that host codecs aggregate frames)."""
    import pytest
    from mediastreamer2_tpu.ops import host_codecs as hc
    if not hc.opus_available():
        pytest.skip("libopus missing")
    from mediastreamer2_tpu.core.block import tick_samples
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    from mediastreamer2_tpu.models import qos
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    from conftest import make_speechlike

    rate, ticks = 48000, 180
    S = tick_samples(rate)
    sig = make_speechlike(S * (ticks + 40), rate, seed=12)
    tx = AudioStreamBatch(factory, 1, codec="opus", rate=rate,
                          mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, codec="opus", rate=rate,
                          record_ticks=ticks + 40)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    drv = qos.AudioBitrateDriver(
        set_bitrate=lambda bps: tx._host_enc[0].set_bitrate(bps),
        set_ptime=lambda ms: tx.set_ptime(0, ms),
        nominal_bps=64000)
    ctl = qos.BitrateController(qos.SimpleQosAnalyzer(), drv)
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    sent_phase1 = sent_phase2 = 0
    mark = None
    for t in range(ticks + 30):
        if t == 60:
            sent_phase1 = tx.sessions[0].stats.sent_packets
            # moderate sustained loss: the analyzer answers with
            # DECREASE_PACKET_RATE -> the ptime ladder climbs
            for _ in range(6):
                ctl.update(qos.QosStats(loss_rate=0.05, rtt_ms=80,
                                        jitter_ms=10))
            mark = tx.get_ptime(0)
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    sent_phase2 = tx.sessions[0].stats.sent_packets - sent_phase1
    assert mark is not None and mark >= 20        # the ladder climbed
    # packet rate in phase 2 reflects the new ptime (ticks/packets ratio)
    phase2_ticks = ticks + 30 - 60
    assert sent_phase2 <= phase2_ticks // (mark // 10) + 3, \
        (mark, sent_phase2)
