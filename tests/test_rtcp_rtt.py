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


def test_sli_rpsi_feedback_roundtrip():
    """AVPF SLI + RPSI PSFB messages (videostream.c:2076-2100 senders;
    RFC 4585 §6.3.2/§6.3.3 FCI layouts)."""
    from mediastreamer2_tpu.net import rtcp
    sli = rtcp.Feedback("sli", 0xA, 0xB,
                        rtcp.sli_value(first=100, number=5, picture_id=33))
    msgs = rtcp.parse_compound(sli.pack())
    assert len(msgs) == 1 and msgs[0].kind == "sli"
    w = msgs[0].value
    assert (w >> 19, (w >> 6) & 0x1FFF, w & 0x3F) == (100, 5, 33)

    rpsi = rtcp.Feedback("rpsi", 0xA, 0xB, 96, b"\x81\x23")  # vp8 pid bits
    msgs = rtcp.parse_compound(rpsi.pack())
    assert len(msgs) == 1 and msgs[0].kind == "rpsi"
    assert msgs[0].value == 96 and msgs[0].data == b"\x81\x23"
    assert len(rpsi.pack()) % 4 == 0


def test_frame_marking_extension():
    """RFC 7941 frame marking rides the one-byte header extension; the
    receiver reads S/E/I/D without touching the payload (msrtp.c
    frame-marking role, used by the packet router's keyframe indicator)."""
    from mediastreamer2_tpu.net.rtp import RtpSession, RtpPacket, LoopbackPair
    pair = LoopbackPair()
    tx = RtpSession(pair.endpoint(0), payload_type=96, clock_rate=90000)
    tx.enable_frame_marking_ext(ext_id=5)
    tx.set_frame_marking(start=True, end=False, independent=True)
    tx.send_payload(b"frag0", 0)
    tx.send_payload(b"frag1", 0)               # no marking set: none carried
    tx.set_frame_marking(start=False, end=True, independent=True)
    tx.send_payload(b"frag2", 3000, marker=True)
    pkts = [RtpPacket.unpack(d) for d in pair.endpoint(1).recv_all()]
    assert RtpSession.parse_frame_marking(pkts[0].extensions[5]) \
        == (True, False, True, False)
    assert not pkts[1].extensions
    s, e, i, d = RtpSession.parse_frame_marking(pkts[2].extensions[5])
    assert (s, e, i) == (False, True, True)


def test_video_stream_frame_marking(factory):
    """VideoStreamBatch stamps S/E/I across a frame's fragments."""
    from mediastreamer2_tpu.models.video_stream import VideoStreamBatch
    from mediastreamer2_tpu.net.rtp import RtpSession, RtpPacket, LoopbackPair
    from mediastreamer2_tpu.core.block import Format
    vs = VideoStreamBatch(factory, 1,
                          fmt=Format(kind="yuv420", width=64, height=48,
                                     fps=10), fps=10)
    vs.ticker.warm_up()
    pair = LoopbackPair()
    vs.set_transport(0, pair.endpoint(0))
    vs.sessions[0].enable_frame_marking_ext(ext_id=5)
    vs.ticker.realtime = False
    for _ in range(12):
        vs.ticker.do_tick()
    pkts = [RtpPacket.unpack(d) for d in pair.endpoint(1).recv_all()]
    assert pkts, "no video packets sent"
    # group by timestamp = frame; check S/E/I placement per frame
    frames = {}
    for p in pkts:
        frames.setdefault(p.timestamp, []).append(p)
    first_ts = sorted(frames)[0]
    for ts, group in frames.items():
        marks = [RtpSession.parse_frame_marking(p.extensions[5])
                 for p in group]
        assert marks[0][0] and marks[-1][1]     # S first, E last
        if ts == first_ts:
            assert marks[0][2]                  # first frame independent
