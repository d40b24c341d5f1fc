"""Two-endpoint video stream test (reference video_stream tester pattern:
two VideoStreams with MSMire synthetic camera over RTP)."""
import numpy as np

from mediastreamer2_tpu.core.block import Format
from mediastreamer2_tpu.models.video_stream import (VideoStreamBatch,
                                                    FrameAssembler,
                                                    fragment_frame)
from mediastreamer2_tpu.net.rtp import (LoopbackPair, RtpPacket,
                                         UdpTransport)
from mediastreamer2_tpu.net.netsim import NetworkSimulator, NetSimParams


def test_fragment_and_reassemble():
    data = bytes(range(256)) * 40          # 10240 bytes
    chunks = fragment_frame(data, mtu=1400)
    assert all(len(c) <= 1400 for c in chunks)
    asm = FrameAssembler()
    for k, c in enumerate(chunks):
        asm.push(RtpPacket(97, 100 + k, 5555, 1, c, marker=(k == len(chunks) - 1)))
    assert asm.pop() == data


def test_reassembler_drops_incomplete():
    data = b"x" * 5000
    chunks = fragment_frame(data, mtu=1400)
    asm = FrameAssembler()
    for k, c in enumerate(chunks):
        if k == 1:
            continue                        # lose a middle fragment
        asm.push(RtpPacket(97, k, 777, 1, c, marker=(k == len(chunks) - 1)))
    assert asm.pop() is None
    assert asm.dropped_incomplete == 1


def test_reassembler_interframe_seq_gap():
    """Whole frames lost BETWEEN complete AUs break the decoder's
    reference chain without any incomplete AU; seq_gaps must flag it
    (vp8rtpfmt.c discontinuity-detection parity), and a continuity reset
    (new session seq space) must not count as loss."""
    asm = FrameAssembler()
    for k, (seq, ts) in enumerate([(10, 100), (11, 200)]):
        asm.push(RtpPacket(97, seq, ts, 1, b"f%d" % k, marker=True))
    assert asm.seq_gaps == 0 and asm.dropped_incomplete == 0
    # frames with seq 12-13 lost entirely; next AU arrives complete
    asm.push(RtpPacket(97, 14, 500, 1, b"later", marker=True))
    assert asm.seq_gaps == 1 and asm.dropped_incomplete == 0
    assert asm.pop() == b"f0"
    # rebind to a fresh session: seq space restarts, not a loss event
    asm.reset_continuity()
    asm.push(RtpPacket(97, 40000, 600, 1, b"new", marker=True))
    assert asm.seq_gaps == 1


def test_video_call_mire_to_display(factory):
    B = 2
    fmt = Format(kind="yuv420", width=64, height=48, fps=25.0)
    tx = VideoStreamBatch(factory, B, fmt=fmt, fps=25.0)
    rx = VideoStreamBatch(factory, B, fmt=fmt, fps=25.0)
    for leg in range(B):
        pair = LoopbackPair()
        tx.set_transport(leg, pair.endpoint(0))
        rx.set_transport(leg, pair.endpoint(1))
    tx.bind_assemblers()
    rx.bind_assemblers()
    tx.ticker.warm_up()
    rx.ticker.warm_up()
    tx.ticker.realtime = False
    rx.ticker.realtime = False
    for _ in range(60):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    assert tx.stats[0].frames_sent >= 10
    assert rx.stats[0].frames_received >= 5
    # display actually saw the moving pattern (nonzero mean frames)
    assert np.abs(rx._last_rx[0]).mean() > 0.05


def test_video_call_under_loss_counts_incomplete(factory):
    B = 1
    fmt = Format(kind="yuv420", width=64, height=48, fps=25.0)
    tx = VideoStreamBatch(factory, B, fmt=fmt, fps=25.0)
    rx = VideoStreamBatch(factory, B, fmt=fmt, fps=25.0)
    ns = NetworkSimulator(NetSimParams(loss_rate=20.0, seed=7))
    pair = LoopbackPair(netsim=ns)
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.bind_assemblers()
    rx.bind_assemblers()
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(80):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    a = rx.assemblers[0]
    assert a.dropped_incomplete > 0          # loss produced partial frames
    assert rx.stats[0].frames_received > 0   # but some frames still got through


def test_video_bundle_aggregator_multi_ssrc(factory):
    """Three senders multiplexed on ONE transport by SSRC; the receiver
    auto-discovers branches and decodes all of them (parity:
    videostream.c bundle recv branches + video-aggregator.c)."""
    from mediastreamer2_tpu.models.video_stream import VideoBundleReceiver
    from mediastreamer2_tpu.net.rtp import RtpSession
    fmt = Format(kind="yuv420", width=32, height=24, fps=25.0)
    pair = LoopbackPair()
    shape = (24 * 3 // 2, 32)
    rxr = VideoBundleReceiver(pair.endpoint(1), frame_shape=shape)
    senders = []
    for k in range(3):
        s = RtpSession(pair.endpoint(0), payload_type=97, ssrc=0x100 + k,
                       clock_rate=90000)
        senders.append(s)
    rng = np.random.default_rng(5)
    frames = {s.ssrc: (rng.random(shape) * 255).astype(np.uint8)
              for s in senders}
    from mediastreamer2_tpu.models.video_stream import fragment_frame
    for _ in range(3):                      # a few frames each
        for s in senders:
            chunks = fragment_frame(frames[s.ssrc].tobytes(), 512)
            s.ts += 3600
            for i, c in enumerate(chunks):
                s.send_payload(c, ts_increment=0,
                               marker=(i == len(chunks) - 1))
        rxr.poll()
    got = rxr.latest_frames()
    assert sorted(got) == [0x100, 0x101, 0x102]
    for ssrc, frame in got.items():
        np.testing.assert_array_equal(frame, frames[ssrc])
    assert all(b["frames_received"] >= 2 for b in rxr.branches.values())


def test_preview_only_graph(factory):
    """Preview-only parity (videostream.c:2452-2496): a VideoStreamBatch
    with no transports is camera->display — frames reach the analyse
    display with zero network activity."""
    fmt = Format(kind="yuv420", width=64, height=48, fps=25.0)
    vs = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0)
    vs.ticker.realtime = False
    vs.ticker.warm_up()
    for _ in range(30):
        vs.ticker.do_tick()
    # mire produced moving frames through the pixel path (tx side state
    # advanced); no sessions => nothing sent anywhere
    assert vs.sessions == [None]
    assert int(np.asarray(vs.ticker.state["cam"]["frame_idx"])[0]) == 30


class _DropFirstN:
    """Transport filter: swallow the first N delivered packets (the
    'first iframe lost' tester scenario)."""
    def __init__(self, inner, n):
        self.inner, self.n = inner, n

    def send(self, data):
        self.inner.send(data)

    def recv_all(self):
        out = self.inner.recv_all()
        while self.n > 0 and out:
            out.pop(0)
            self.n -= 1
        return out

    def close(self):
        self.inner.close()


def test_first_iframe_lost_recovers_via_starter(factory):
    """'AVPF video stream first iframe lost': the initial keyframe never
    arrives; the VideoStarter notices nothing decodes and requests an
    I-frame (videostarter.c role), after which the stream runs."""
    import pytest as _pytest
    from mediastreamer2_tpu.core.block import Format
    from mediastreamer2_tpu.ops.vp8 import vp8_available
    if not vp8_available():
        _pytest.skip("libvpx unavailable")
    fmt = Format(kind="yuv420", width=64, height=48, fps=10.0)
    tx = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0, codec="vp8")
    rx = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0, codec="vp8")
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, _DropFirstN(pair.endpoint(1), 4))  # eat 1st frame
    tx.bind_assemblers(); rx.bind_assemblers()
    rx.fir_limiters[0].min_interval_s = 0.2
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(150):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    assert rx.stats[0].fir_sent > 0            # starter asked for an iframe
    assert rx.stats[0].frames_received >= 5    # and the stream recovered


def test_video_codec_change_over_reclaimed_sessions(factory):
    """'Codec change for video stream': stop, reclaim sessions, restart
    with a different codec — transport/SSRC identity survives."""
    from mediastreamer2_tpu.core.block import Format
    fmt = Format(kind="yuv420", width=64, height=48, fps=10.0)
    tx1 = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0)        # dummy codec
    rx1 = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0)
    pair = LoopbackPair()
    tx1.set_transport(0, pair.endpoint(0))
    rx1.set_transport(0, pair.endpoint(1))
    tx1.bind_assemblers(); rx1.bind_assemblers()
    tx1.ticker.realtime = rx1.ticker.realtime = False
    tx1.ticker.warm_up(); rx1.ticker.warm_up()
    for _ in range(30):
        tx1.ticker.do_tick(); rx1.ticker.do_tick()
    assert rx1.stats[0].frames_received >= 2
    tx_sess = tx1.reclaim_sessions()[0]
    rx_sess = rx1.reclaim_sessions()[0]
    ssrc = tx_sess.ssrc

    import pytest as _pytest
    from mediastreamer2_tpu.ops.vp8 import vp8_available
    if not vp8_available():
        _pytest.skip("libvpx unavailable")
    tx2 = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0, codec="vp8")
    rx2 = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0, codec="vp8")
    tx2.ticker.warm_up(); rx2.ticker.warm_up()
    tx2.adopt_session(0, tx_sess)
    rx2.adopt_session(0, rx_sess)
    tx2.bind_assemblers(); rx2.bind_assemblers()
    tx2.ticker.realtime = rx2.ticker.realtime = False
    for _ in range(60):
        tx2.ticker.do_tick(); rx2.ticker.do_tick()
    assert rx2.stats[0].frames_received >= 3
    assert tx_sess.ssrc == ssrc          # same identity continued


def test_video_stats_getters(factory):
    """video_stream_get_sent/received_framerate + video_size parity."""
    from mediastreamer2_tpu.core.block import Format
    fmt = Format(kind="yuv420", width=64, height=48, fps=10.0)
    tx = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0)
    rx = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.bind_assemblers(); rx.bind_assemblers()
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(100):
        tx.ticker.do_tick(); rx.ticker.do_tick()
    assert 7.0 <= tx.get_sent_framerate(0) <= 11.0
    assert rx.get_received_framerate(0) > 5.0
    assert tx.get_sent_video_size() == (64, 48)
    assert rx.get_received_video_size(0) == (64, 48)


def test_legacy_codec_calls_h263_mpeg4(factory):
    """Legacy ffmpeg family as full CALLS (videoenc.c/videodec.c +
    RFC 4629 for H.263; theora.c with RFC 5215-style in-band config):
    mire -> encode -> RTP -> decode -> display."""
    import pytest
    from mediastreamer2_tpu.ops.h264 import legacy_codec_available
    for name in ("h263", "mpeg4", "theora", "snow"):
        if not legacy_codec_available(name):
            pytest.skip(f"{name} missing from avcodec")
        # H.263 baseline only takes specific sizes; QCIF works for both
        fmt = Format(kind="yuv420", width=176, height=144, fps=10.0)
        tx = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0, codec=name)
        rx = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0, codec=name)
        pair = LoopbackPair()
        tx.set_transport(0, pair.endpoint(0))
        rx.set_transport(0, pair.endpoint(1))
        tx.bind_assemblers()
        rx.bind_assemblers()
        tx.ticker.realtime = rx.ticker.realtime = False
        tx.ticker.warm_up(); rx.ticker.warm_up()
        for _ in range(80):
            tx.ticker.do_tick()
            rx.ticker.do_tick()
        assert tx.stats[0].frames_sent >= 5, name
        assert rx.stats[0].frames_received >= 3, name
        assert np.abs(rx._last_rx[0]).mean() > 0.05, name


def test_video_iterate_applies_tmmbr(factory):
    """media_stream_iterate for video: an inbound TMMBR re-targets the
    VP8 encoder and walks the VideoQualityController ladder
    (mediastream.c:983-1078 + msvideoqualitycontroller.c)."""
    from mediastreamer2_tpu.ops.vp8 import vp8_available
    if not vp8_available():
        import pytest
        pytest.skip("libvpx missing")
    from mediastreamer2_tpu.net.rtcp import Feedback
    from mediastreamer2_tpu.models.video_presets import VideoQualityController
    fmt = Format(kind="yuv420", width=64, height=48, fps=25.0)
    tx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="vp8")
    rx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="vp8")
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.sessions[0].attach_rtcp()
    rx.sessions[0].attach_rtcp()
    applied = []
    tx.attach_quality_controller(VideoQualityController(applied.append))
    tx.bind_assemblers(); rx.bind_assemblers()
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(20):
        tx.ticker.do_tick(); rx.ticker.do_tick()
    # receiver signals congestion: cap the sender at 150 kb/s
    fb = Feedback("tmmbr", rx.sessions[0].ssrc, tx.sessions[0].ssrc, 150_000)
    pair.endpoint(1).send(fb.pack())
    tx.ticker.do_tick()
    tx.iterate()
    assert tx.stats[0].bitrate_cap == 150_000
    assert applied and applied[-1].bitrate_bps <= 150_000
    # the call keeps running at the lower rate
    for _ in range(20):
        tx.ticker.do_tick(); rx.ticker.do_tick()
    assert rx.stats[0].frames_received > 0


def test_rx_keyframe_sniff():
    """_rx_is_keyframe: VP8 frame-tag bit (RFC 6386 §9.1), H.264 IDR/SPS
    NALs, H.265 IRAP; unknown codecs return None (decode success clears
    the damage latch for those)."""
    from mediastreamer2_tpu.models.video_stream import _rx_is_keyframe
    assert _rx_is_keyframe("vp8", bytes([0x10, 0, 0, 1, 2])) is True
    assert _rx_is_keyframe("vp8", bytes([0x11, 0, 0, 1, 2])) is False
    idr = b"\x00\x00\x00\x01\x65" + b"\x00" * 8
    p = b"\x00\x00\x00\x01\x41" + b"\x00" * 8
    assert _rx_is_keyframe("h264", idr) is True
    assert _rx_is_keyframe("h264", p) is False
    irap = b"\x00\x00\x01" + bytes([19 << 1, 1]) + b"\x00" * 8
    trail = b"\x00\x00\x01" + bytes([1 << 1, 1]) + b"\x00" * 8
    assert _rx_is_keyframe("h265", irap) is True
    assert _rx_is_keyframe("h265", trail) is False
    assert _rx_is_keyframe("mjpeg", b"\xff\xd8\xff") is None
    assert _rx_is_keyframe("vp8", b"") is None


def test_fir_latch_survives_limiter_window(factory):
    """A seq-gap FIR suppressed by the rate limiter must RETRY on later
    ticks until a keyframe decodes (the damage event is edge-triggered;
    the want-keyframe state is not).  Reference: decoder error callbacks
    keep firing while errors persist and msiframerequestslimiter paces
    the PLIs — a suppressed request is deferred, never dropped."""
    try:
        from mediastreamer2_tpu.ops.vp8 import vp8_available
        if not vp8_available():
            import pytest
            pytest.skip("libvpx missing")
    except ImportError:
        import pytest
        pytest.skip("libvpx missing")
    fmt = Format(kind="yuv420", width=64, height=48, fps=25.0)
    vs = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="vp8")
    t = UdpTransport()
    t.set_remote("127.0.0.1", t.local_port)      # self-loop
    vs.set_transport(0, t)
    vs.bind_assemblers()
    vs.ticker.realtime = False
    vs.ticker.warm_up()
    for _ in range(12):
        vs.ticker.do_tick()
    assert vs.stats[0].frames_received > 0
    # damage the leg while the limiter window is CLOSED: latch must hold
    vs._await_kf_rx[0] = True
    vs.fir_limiters[0]._last = vs._now_s()            # window just opened
    fir0 = vs.stats[0].fir_sent
    vs.ticker.do_tick()
    assert vs.stats[0].fir_sent == fir0               # suppressed, latched
    assert vs._await_kf_rx[0]
    # run past the limiter interval: the deferred FIR fires and the
    # sender's keyframe clears the latch
    for _ in range(int(vs.fir_limiters[0].min_interval_s / 0.01) + 30):
        vs.ticker.do_tick()
        if not vs._await_kf_rx[0]:
            break
    assert vs.stats[0].fir_sent > fir0
    assert not vs._await_kf_rx[0]
    t.close()
