"""H.264 end-to-end: libx264 encode -> RFC 6184 packetization -> loopback
RTP (with loss) -> depacketize -> avcodec decode -> display, with RTCP
FIR-driven keyframe recovery.  Parity: h26x-encoder/decoder-filter.cpp +
tester/mediastreamer2_video_stream_tester.c:735-1349 (AVPF recovery under
simulated loss)."""
import numpy as np
import pytest

from mediastreamer2_tpu.core.block import Format
from mediastreamer2_tpu.models.video_stream import VideoStreamBatch
from mediastreamer2_tpu.net.rtp import LoopbackPair
from mediastreamer2_tpu.net.netsim import NetworkSimulator, NetSimParams
from mediastreamer2_tpu.ops.h264 import h264_available

pytestmark = pytest.mark.skipif(not h264_available(),
                                reason="libx264/avcodec unavailable")


def test_h264_codec_roundtrip_quality():
    from mediastreamer2_tpu.ops.h264 import H264Encoder, H264Decoder
    w, h = 128, 96
    enc = H264Encoder(w, h, bitrate_bps=400_000, fps=25)
    dec = H264Decoder()
    rng = np.random.default_rng(0)
    base = (rng.random((h, w)) * 255).astype(np.uint8)
    got = None
    for k in range(10):
        y = np.roll(base, k * 3, axis=1)
        frame = y.tobytes() + bytes([128] * (w * h // 4)) * 2
        for out in dec.decode(enc.encode(frame, keyframe=(k == 0))):
            got = (k, out)
    assert got is not None
    k, out = got
    y_ref = np.roll(base, k * 3, axis=1).astype(np.float32)
    y_out = np.frombuffer(out[: w * h], np.uint8).astype(np.float32)
    psnr = 10 * np.log10(255 ** 2 / np.mean((y_ref - y_out.reshape(h, w)) ** 2))
    assert psnr > 28, psnr


def test_h264_call_mire_to_display(factory):
    fmt = Format(kind="yuv420", width=128, height=96, fps=25.0)
    tx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="h264")
    rx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="h264")
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.bind_assemblers(); rx.bind_assemblers()
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(80):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    assert tx.stats[0].frames_sent >= 15
    assert rx.stats[0].frames_received >= 8
    assert np.abs(rx._last_rx[0]).mean() > 0.05   # mire actually displayed


def test_h264_fir_recovery_under_loss(factory):
    """Loss breaks access units (dropped, not displayed); the receiver's
    FIR makes the sender emit a fresh IDR and the stream recovers once the
    network heals — the video_stream_tester AVPF pattern."""
    fmt = Format(kind="yuv420", width=128, height=96, fps=25.0)
    tx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="h264")
    rx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="h264")
    ns = NetworkSimulator(NetSimParams(loss_rate=25.0, seed=3))
    pair = LoopbackPair(netsim=ns)
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.bind_assemblers(); rx.bind_assemblers()
    rx.fir_limiters[0].min_interval_s = 0.3   # faster re-requests for test
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(100):                      # lossy phase
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    assert rx.packetizers[0].dropped_incomplete > 0
    ns.p.loss_rate = 0.0                 # network heals
    before = rx.stats[0].frames_received
    for _ in range(200):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    after = rx.stats[0].frames_received
    assert after - before >= 10, (before, after)
    assert rx.stats[0].fir_sent > 0           # receiver asked for keyframes


H264_SCENARIOS = "/root/reference/tester/scenarios"


@pytest.mark.skipif(not __import__("os").path.isdir(H264_SCENARIOS),
                    reason="reference scenarios not mounted")
def test_h264_real_capture_interop():
    """Depacketize + decode the reference's REAL captured H.264 RTP streams
    (tester/scenarios/h264_*.pcap) — wire-format interop evidence against
    a third-party sender, incl. missing-PPS and corrupted-IDR pathologies
    (the h264dec tester's fixtures)."""
    import os
    from mediastreamer2_tpu.io.pcap import read_capture
    from mediastreamer2_tpu.net.rtp import RtpPacket
    from mediastreamer2_tpu.models.video_stream import H264Packetizer
    from mediastreamer2_tpu.ops.h264 import H264Decoder

    def run(fname):
        pkts = []
        for cp in read_capture(os.path.join(H264_SCENARIOS, fname)):
            try:
                p = RtpPacket.unpack(cp.udp_payload)
            except ValueError:
                continue
            pkts.append(p)
        assert pkts, f"{fname}: no RTP parsed"
        pk = H264Packetizer(mtu=1400)
        dec = H264Decoder()
        frames = aus = 0
        for p in pkts:
            pk.push(p)
            while True:
                au = pk.pop()
                if au is None:
                    break
                aus += 1
                frames += len(dec.decode(au))
        # flush the last AU (no trailing packet to close it)
        pk._close_au()
        au = pk.pop()
        if au:
            aus += 1
            frames += len(dec.decode(au))
        return frames, dec, aus

    # clean stream: one NAL per frame over IPv6, no marker bits
    frames, dec, _ = run("h264_one_nalu_per_frame.pcap")
    assert frames >= 5, frames
    assert dec.width > 0 and dec.height > 0
    # pathological: second I-frame missing its PPS — decoder survives and
    # still produces the earlier frames
    frames2, _, _ = run("h264_missing_pps_in_second_i_frame.pcap")
    assert frames2 >= 1, frames2
    # pathological: corrupted IDR — the whole stream is undecodable (the
    # IDR is the only keyframe and it is broken), so the property is
    # survival: the depacketizer still yields access units, nothing raises
    frames3, _, aus3 = run("h264_one_nalu_per_frame_with_corrupted_idr.pcap")
    assert aus3 >= 1, aus3


@pytest.mark.parametrize("name,size", [("h263", (176, 144)),
                                       ("mpeg4", (128, 96)),
                                       ("mjpeg", (128, 96)),
                                       ("theora", (128, 96)),
                                       ("snow", (320, 240))])
def test_legacy_ffmpeg_codecs(name, size):
    """The reference's legacy ffmpeg codec family (videoenc.c:916-1032):
    encode->decode roundtrip per codec through the probed avcodec layer."""
    from mediastreamer2_tpu.ops.h264 import (make_legacy_codec,
                                             legacy_codec_available)
    if not legacy_codec_available(name):
        pytest.skip(f"{name} unavailable")
    w, h = size
    Enc, Dec = make_legacy_codec(name)
    enc = Enc(w, h, bitrate_bps=800_000, fps=10, gop=5)
    if name == "theora":                 # out-of-band stream headers
        from mediastreamer2_tpu.ops.h264 import encoder_extradata
        dec = Dec(extradata=encoder_extradata(enc))
    elif name == "snow":                 # dims are out-of-band (no
        dec = Dec(dims=(w, h))           # size in the experimental stream)
    else:
        dec = Dec()
    rng = np.random.default_rng(3)
    base = (rng.random((h, w)) * 255).astype(np.uint8)
    got = None
    for k in range(6):
        y = np.roll(base, k * 2, axis=1)
        frame = y.tobytes() + bytes([128] * (w * h // 4)) * 2
        for out in dec.decode(enc.encode(frame, keyframe=(k == 0))):
            got = (k, out)
    assert got is not None, f"{name}: nothing decoded"
    k, out = got
    assert len(out) == w * h * 3 // 2
    y_ref = np.roll(base, k * 2, axis=1).astype(np.float32)
    y_out = np.frombuffer(out[: w * h], np.uint8
                          ).astype(np.float32).reshape(h, w)
    psnr = 10 * np.log10(255 ** 2 / max(np.mean((y_ref - y_out) ** 2), 1e-9))
    assert psnr > 22, f"{name} psnr {psnr:.1f}"


def test_h264_nack_retransmission_recovers_frames(factory):
    """video_stream_enable_retransmission_on_nack parity: under loss, the
    receiver NACKs the hole, the sender retransmits from history, the
    reorder buffer fills the AU before it closes — frames survive loss
    WITHOUT waiting for a keyframe."""
    fmt = Format(kind="yuv420", width=128, height=96, fps=25.0)
    tx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="h264")
    rx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="h264")
    ns = NetworkSimulator(NetSimParams(loss_rate=10.0, seed=5))
    pair = LoopbackPair(netsim=ns)
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.enable_nack(0)
    rx.enable_nack(0)
    tx.bind_assemblers(); rx.bind_assemblers()
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(200):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    # with rtx recovery, most frames get through despite 10% loss
    assert rx.stats[0].frames_received >= tx.stats[0].frames_sent * 0.6, (
        rx.stats[0].frames_received, tx.stats[0].frames_sent)
    # and fewer AUs dropped than a no-NACK run under the same loss
    tx2 = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="h264")
    rx2 = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="h264")
    ns2 = NetworkSimulator(NetSimParams(loss_rate=10.0, seed=5))
    pair2 = LoopbackPair(netsim=ns2)
    tx2.set_transport(0, pair2.endpoint(0))
    rx2.set_transport(0, pair2.endpoint(1))
    tx2.bind_assemblers(); rx2.bind_assemblers()
    tx2.ticker.realtime = rx2.ticker.realtime = False
    tx2.ticker.warm_up(); rx2.ticker.warm_up()
    for _ in range(200):
        tx2.ticker.do_tick()
        rx2.ticker.do_tick()
    assert rx.stats[0].frames_received > rx2.stats[0].frames_received
