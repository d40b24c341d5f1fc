"""Packet-cluster bandwidth estimators — parity with the adaptive tester's
"Video bandwidth estimator" / "Audio bandwidth estimator" cases
(mediastreamer2_adaptive_tester.c:630-785): a netsim-limited link's
available bandwidth is measured from burst arrival spacing, without loss
and without saturating the link."""
import time

import numpy as np
import pytest

from mediastreamer2_tpu.net.bwe import (AudioBandwidthEstimator, BweParams,
                                        VideoBandwidthEstimator)
from mediastreamer2_tpu.net.netsim import NetSimParams, NetworkSimulator
from mediastreamer2_tpu.net.rtp import LoopbackPair, RtpSession


def test_video_estimator_unit():
    """Synthetic frames through a known 1 Mb/s serialization schedule."""
    bw = 1_000_000.0
    vbe = VideoBandwidthEstimator()
    t = 0.0
    for frame in range(10):
        ts = frame * 3000
        for k in range(8):                     # 8 x 1200 B per frame
            vbe.on_packet(t, 1200, ts, marker=(k == 7))
            t += 1200 * 8 / bw                 # serialization spacing
        t += 0.033                             # frame interval
    est = vbe.available_bw_bps()
    assert 0.85 * bw < est < 1.15 * bw, est
    assert vbe.frames_measured == 10


def test_video_estimator_ignores_small_frames():
    vbe = VideoBandwidthEstimator(BweParams(packet_count_min=5))
    for frame in range(10):
        for k in range(2):                     # 2-packet frames: too small
            vbe.on_packet(frame * 0.03 + k * 0.001, 1200, frame * 3000,
                          marker=(k == 1))
    assert vbe.available_bw_bps() == 0.0


def test_video_estimator_over_netsim():
    """End-to-end: RtpSession video-shaped bursts over a 1 Mb/s netsim
    link -> estimate within the tester's (750k, 1300k) window
    (video_bandwidth_estimator, adaptive_tester.c:640)."""
    bw = 1_000_000.0
    pair = LoopbackPair(netsim=NetworkSimulator(NetSimParams(
        max_bandwidth_bps=bw, max_buffer_size_bytes=1 << 20)))
    tx = RtpSession(pair.endpoint(0), payload_type=102, clock_rate=90000)
    rx = RtpSession(pair.endpoint(1), payload_type=102, clock_rate=90000)
    rx.accepted_payload_types = {102}
    rx.enable_video_bandwidth_estimator()
    payload = bytes(1188)                      # 1200 B on the wire
    for frame in range(12):
        for k in range(8):
            tx.send_payload(payload, ts_increment=(3000 if k == 7 else 0),
                            marker=(k == 7))
        # pace below link rate; the burst itself rides at link speed
        time.sleep(0.09)
        rx.poll()
    time.sleep(0.15)
    rx.poll()
    est = rx.vbe.available_bw_bps()
    assert 750_000 < est < 1_300_000, est


def test_audio_estimator_unit():
    bw = 24_000.0
    abe = AudioBandwidthEstimator()
    t = 0.0
    seq = 100
    for i in range(100):
        abe.on_packet(t, 92, seq)
        if i % 10 == 9:                        # duplicate cluster
            t += 0.0001
            abe.on_packet(t, 92, seq)          # dup of the same seq
            t += 92 * 8 / bw                   # next glued behind it
        else:
            t += 0.02                          # normal 20 ms pacing
        seq += 1
    est = abe.available_bw_bps()
    assert 0.85 * bw < est < 1.15 * bw, est
    assert abe.duplicates_seen == 10


def test_audio_estimator_over_netsim():
    """Sender duplicates glued to the next packet measure a 24 kb/s link
    (audio_bandwidth_estimator scenario, adaptive_tester.c:662)."""
    bw = 24_000.0
    pair = LoopbackPair(netsim=NetworkSimulator(NetSimParams(
        max_bandwidth_bps=bw, max_buffer_size_bytes=1 << 20)))
    tx = RtpSession(pair.endpoint(0), payload_type=0, clock_rate=8000)
    rx = RtpSession(pair.endpoint(1), payload_type=0, clock_rate=8000)
    tx.enable_audio_bandwidth_estimator(BweParams(duplicate_every=5))
    rx.enable_audio_bandwidth_estimator(BweParams(duplicate_every=5))
    tx.set_abe_duplicates(True)
    payload = bytes(80)                        # G.711 10 ms
    for i in range(60):
        tx.send_payload(payload, ts_increment=80)
        time.sleep(0.04)                       # paced WELL below the link
        rx.poll()
    time.sleep(0.2)
    rx.poll()
    assert tx.abe_duplicates_sent >= 8
    assert rx.abe.duplicates_seen >= 8
    est = rx.abe.available_bw_bps()
    assert 0.6 * bw < est < 1.6 * bw, est
    # the duplicates don't pollute the media path
    assert rx.stats.recv_packets == 60


def test_controller_uses_estimate():
    """BandwidthController sends TMMBR at 0.7x the estimator's figure when
    congested and 0.9x when it clears (the tester's scenario arithmetic)."""
    from mediastreamer2_tpu.models.qos import BandwidthController
    sent = []
    bc = BandwidthController(lambda bps: sent.append(bps))
    bc.update_estimate(100_000, kind="video")
    assert bc.download_video_bandwidth_available_estimated == 100_000
    # drive into congestion: rising jitter + loss
    for _ in range(6):
        bc.on_interval(10_000, 1.0, jitter_rising=True, loss_rate=0.06)
    assert bc.congested and sent and sent[-1] == 70_000
    # congestion clears -> 0.9x estimate
    bc.on_interval(10_000, 1.0, jitter_rising=False, loss_rate=0.0)
    assert not bc.congested
    assert sent[-1] == 90_000


def test_stream_bandwidth_controller_wiring(factory):
    """ms_bandwidth_controller_add_stream parity: the leg's estimator
    feeds the controller through iterate(); congestion then caps at
    0.7x the MEASURED bandwidth (bandwidthcontroller.c arithmetic)."""
    from mediastreamer2_tpu.core.block import tick_samples
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    from mediastreamer2_tpu.models.qos import BandwidthController
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    from mediastreamer2_tpu.net.netsim import NetSimParams, NetworkSimulator
    from conftest import make_speechlike
    import time as _time

    bw = 64_000.0
    ticks = 60
    sig = make_speechlike(80 * (ticks + 20), 8000, seed=41)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 20)
    pair = LoopbackPair(netsim=NetworkSimulator(NetSimParams(
        max_bandwidth_bps=bw, max_buffer_size_bytes=1 << 20)))
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.sessions[0].enable_audio_bandwidth_estimator()
    tx.sessions[0].set_abe_duplicates(True)
    sent = []
    bc = BandwidthController(lambda bps: sent.append(bps))
    rx.attach_bandwidth_controller(0, bc)
    tx.ticker.realtime = rx.ticker.realtime = True   # real pacing: the
    tx.ticker.warm_up(); rx.ticker.warm_up()         # estimator measures
    rx.start(ticks + 20)                             # wall-clock spacing
    tx.run(ticks)
    _time.sleep(0.2)
    rx.iterate()
    tx.stop(); rx.stop()
    est = bc.download_audio_bandwidth_available_estimated
    assert est > 0, "estimator never fed the controller"
    assert 0.4 * bw < est < 2.5 * bw, est
    # congestion onset -> TMMBR at 0.7x the measured figure
    for _ in range(6):
        bc.on_interval(800, 1.0, jitter_rising=True, loss_rate=0.06)
    assert sent and abs(sent[-1] - 0.7 * est) < 1, (sent[-1], est)
