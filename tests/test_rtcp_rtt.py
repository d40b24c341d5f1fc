"""RFC3550 jitter accumulation and LSR/DLSR round-trip-time estimation."""
import time

import numpy as np

from mediastreamer2_tpu.net.rtp import RtpSession, LoopbackPair
from mediastreamer2_tpu.net.jitter import JitterBuffer, JBParams


def test_interarrival_jitter_tracks_variance():
    pair = LoopbackPair()
    tx = RtpSession(pair.endpoint(0), payload_type=0, clock_rate=8000)
    rx = RtpSession(pair.endpoint(1), payload_type=0, clock_rate=8000)
    # steady arrivals but RTP clocks advancing unevenly => jitter
    for i in range(30):
        tx.send_payload(b"x" * 80, ts_increment=80 if i % 2 == 0 else 240)
        rx.poll()
    assert rx.jitter_units > 0
    assert rx.jitter_ms > 0


def test_rtcp_rtt_measurement():
    pair = LoopbackPair()
    a = RtpSession(pair.endpoint(0), payload_type=0)
    b = RtpSession(pair.endpoint(1), payload_type=0)
    a.jitter_buffer = JitterBuffer(JBParams(nom_depth_ticks=1))
    b.jitter_buffer = JitterBuffer(JBParams(nom_depth_ticks=1))
    ra = a.attach_rtcp(interval_s=0.0)
    rb = b.attach_rtcp(interval_s=0.0)
    # a -> media -> b so b has a recv_ssrc to report on
    for _ in range(3):
        a.send_payload(b"m" * 80, 80)
    b.poll()
    # a emits SR; b processes it, then emits its own SR w/ report block
    ra.maybe_emit(a.transport)
    b.poll()
    time.sleep(0.03)
    rb._next_emit = 0
    rb.maybe_emit(b.transport)
    a.poll()
    assert ra.last_rtt_ms is not None
    assert 0.0 <= ra.last_rtt_ms < 200.0


def test_rtcp_bye_on_teardown(factory):
    """RFC 3550 BYE: stopping a stream emits BYE; the peer's RTCP session
    flags it (rtp_session uninit parity)."""
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    a = AudioStreamBatch(factory, 1)
    b = AudioStreamBatch(factory, 1)
    pair = LoopbackPair()
    a.set_transport(0, pair.endpoint(0))
    b.set_transport(0, pair.endpoint(1))
    a.enable_rtcp(interval_s=100.0)
    b.enable_rtcp(interval_s=100.0)
    a.ticker.realtime = b.ticker.realtime = False
    a.ticker.warm_up(); b.ticker.warm_up()
    for _ in range(5):
        a.ticker.do_tick(); b.ticker.do_tick()
    a.stop()
    b.ticker.do_tick()                      # drains the BYE
    assert getattr(b.sessions[0].rtcp, "bye_received", False)
