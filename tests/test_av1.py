"""AV1 host codec (libaom via probed-ABI ctypes) — unit + video call
(parity: src/videofilters/av1/*)."""
import numpy as np
import pytest

from mediastreamer2_tpu.ops import av1
from mediastreamer2_tpu.core.block import Format
from mediastreamer2_tpu.models.video_stream import VideoStreamBatch
from mediastreamer2_tpu.net.rtp import LoopbackPair

pytestmark = pytest.mark.skipif(not av1.av1_available(),
                                reason="libaom missing")
W, H = 64, 48


def _planes(off=0):
    y = ((np.arange(H)[:, None] * 3 + np.arange(W)[None, :] + off) % 210
         ).astype(np.uint8)
    u = np.full((H // 2, W // 2), 110, np.uint8)
    v = np.full((H // 2, W // 2), 150, np.uint8)
    return y, u, v


def test_av1_roundtrip():
    enc = av1.Av1Encoder(W, H, bitrate_bps=300_000)
    dec = av1.Av1Decoder()
    for i in range(4):
        y, u, v = _planes(i * 7)
        data, is_key = enc.encode_planes(y, u, v)
        assert (i == 0) == is_key
        out = dec.decode(data)
        assert out is not None
    mse = float(((out[0].astype(float) - y.astype(float)) ** 2).mean())
    assert mse < 30.0, f"av1 mse {mse}"


def test_av1_forced_keyframe():
    enc = av1.Av1Encoder(W, H)
    y, u, v = _planes()
    enc.encode_planes(y, u, v)
    _, k = enc.encode_planes(y, u, v, force_keyframe=True)
    assert k


def test_av1_video_call(factory):
    fmt = Format(kind="yuv420", width=W, height=H, fps=25.0)
    mk = lambda: av1.Av1FrameCodec(W, H, bitrate_bps=250_000)
    tx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec_factory=mk)
    rx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec_factory=mk)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.bind_assemblers(); rx.bind_assemblers()
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(60):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    assert rx.stats[0].frames_received >= 5
    assert float(np.abs(rx._last_rx[0]).mean()) > 0.05
