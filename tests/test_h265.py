"""H.265/HEVC RTP payloads (RFC 7798) against the reference's raw fixtures
(tester/raw/h265-iframe, h265-parameter-sets-frame) — the HEVC half of the
h26x framework (h26x tools tester parity)."""
import os

import numpy as np
import pytest

from mediastreamer2_tpu.net.h26x import (split_annexb, to_annexb,
                                         h265_nal_type, h265_is_irap,
                                         h265_packetize, H265Unpacker,
                                         H265ParameterSetStore)

RAW = "/root/reference/tester/raw"
pytestmark = pytest.mark.skipif(not os.path.isdir(RAW),
                                reason="reference fixtures not mounted")


def _nals(fname):
    data = open(os.path.join(RAW, fname), "rb").read()
    return split_annexb(data)


def test_parameter_sets_fixture_parses():
    nals = _nals("h265-parameter-sets-frame")
    assert [h265_nal_type(n) for n in nals] == [32, 33, 34]  # VPS SPS PPS
    ps = H265ParameterSetStore()
    for n in nals:
        ps.process(n)
    assert ps.ready


def test_iframe_roundtrip_small_mtu():
    """The real 27 kB I-frame fragments into FUs and reassembles exactly."""
    nals = _nals("h265-iframe")
    assert nals and any(h265_is_irap(n) for n in nals)
    payloads = h265_packetize(nals, mtu=1400)
    assert len(payloads) > len(nals)          # FU fragmentation happened
    assert all(len(p) <= 1403 for p in payloads)
    un = H265Unpacker()
    out = []
    for p in payloads:
        out.extend(un.push(p))
    assert out == nals
    assert un.errors == 0


def test_aggregation_packet_roundtrip():
    """Small parameter sets aggregate into one AP and unpack in order."""
    nals = _nals("h265-parameter-sets-frame")
    payloads = h265_packetize(nals, mtu=1400)
    assert len(payloads) == 1                 # one AP carries all three
    assert (payloads[0][0] >> 1) & 0x3F == 48
    un = H265Unpacker()
    assert un.push(payloads[0]) == nals


def test_prepend_for_irap():
    ps = H265ParameterSetStore()
    for n in _nals("h265-parameter-sets-frame"):
        ps.process(n)
    frame = _nals("h265-iframe")
    irap_only = [n for n in frame if h265_is_irap(n)]
    out = ps.prepend_for_irap(irap_only)
    assert [h265_nal_type(n) for n in out[:3]] == [32, 33, 34]
    # annexb round trip preserved
    assert split_annexb(to_annexb(out)) == out


def test_h263_rfc4629_roundtrip_with_real_codec():
    """RFC 4629: a real avcodec H.263 frame packs (PSC zeros elided, P=1),
    fragments, reassembles, and decodes."""
    import numpy as np
    from mediastreamer2_tpu.ops.h264 import (make_legacy_codec,
                                             legacy_codec_available)
    from mediastreamer2_tpu.net.h26x import h263_packetize, H263Depacketizer
    if not legacy_codec_available("h263"):
        pytest.skip("h263 unavailable")
    w, h = 176, 144
    Enc, Dec = make_legacy_codec("h263")
    enc = Enc(w, h, bitrate_bps=400_000, fps=10, gop=5)
    dec = Dec()
    rng = np.random.default_rng(8)
    y = (rng.random((h, w)) * 255).astype(np.uint8)
    frame = enc.encode(y.tobytes() + bytes([128] * (w * h // 4)) * 2,
                       keyframe=True)
    assert frame.startswith(b"\x00\x00")     # PSC present
    payloads = h263_packetize(frame, mtu=500)
    assert len(payloads) > 1                 # fragmented
    assert payloads[0][0] & 0x04             # P=1 on the PSC payload
    assert not payloads[1][0] & 0x04
    d = H263Depacketizer()
    for k, p in enumerate(payloads):
        d.push(p, marker=(k == len(payloads) - 1))
    out = d.pop()
    assert out == frame                      # bit-exact reassembly
    frames = dec.decode(out)
    assert frames and len(frames[0]) == w * h * 3 // 2


def test_h265_call_mire_to_display(factory):
    """Full HEVC legs: mire -> x265 encode -> RFC 7798 RTP -> depacketize
    -> avcodec decode -> display (the h26x framework's H.265 path)."""
    from mediastreamer2_tpu.ops.h264 import h265_available
    if not h265_available():
        pytest.skip("libx265/hevc unavailable")
    from mediastreamer2_tpu.core.block import Format
    from mediastreamer2_tpu.models.video_stream import VideoStreamBatch
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    fmt = Format(kind="yuv420", width=64, height=64, fps=25.0)
    tx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="h265")
    rx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="h265")
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.bind_assemblers(); rx.bind_assemblers()
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(100):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    assert tx.stats[0].frames_sent >= 15
    assert rx.stats[0].frames_received >= 8
    assert np.abs(rx._last_rx[0]).mean() > 0.05
