"""RTP/JPEG payload format (RFC 2435) — the MJPEG wire transport
(reference: ffmpeg MJPEG codec on the RTP profile's static PT 26). The
payloader strips the JFIF wrapper (explicit Q=255 quant tables on the
first fragment); the depacketizer rebuilds baseline JFIF with the spec's
standard Huffman tables."""
import io

import numpy as np
import pytest

from mediastreamer2_tpu.net.jpeg_rtp import (JpegDepacketizer,
                                             jpeg_packetize, _parse_jfif)


def _make_jpeg(w=160, h=128, quality=85, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    img = np.clip(np.cumsum(rng.standard_normal((h, w, 3)), axis=1) * 8
                  + 128, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality, subsampling=2)
    return buf.getvalue()


def test_parse_jfif_fields():
    jpeg = _make_jpeg()
    jtype, w, h, qt, scan, dri = _parse_jfif(jpeg)
    assert (w, h) == (160, 128)
    assert jtype & 0x3F == 1                    # 4:2:0
    assert 0 in qt and len(qt[0]) == 64
    assert len(scan) > 1000


@pytest.mark.parametrize("mtu", [200, 500, 1400])
def test_roundtrip_bit_faithful(mtu):
    from PIL import Image
    jpeg = _make_jpeg()
    payloads = jpeg_packetize(jpeg, mtu=mtu)
    assert all(len(p) <= mtu for p in payloads)
    de = JpegDepacketizer()
    for k, p in enumerate(payloads):
        de.push(p, marker=(k == len(payloads) - 1))
    out = de.pop()
    assert out is not None
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"), np.float64)
    ref = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"), np.float64)
    psnr = 10 * np.log10(255 ** 2 / max(((dec - ref) ** 2).mean(), 1e-9))
    assert psnr > 60, psnr                      # standard-tables rebuild


def test_lost_marker_discards_frame():
    jpeg = _make_jpeg()
    payloads = jpeg_packetize(jpeg, mtu=400)
    de = JpegDepacketizer()
    for p in payloads[:-1]:                     # marker packet lost
        de.push(p, marker=False)
    assert de.pop() is None
    # the next frame still comes through clean
    p2 = jpeg_packetize(_make_jpeg(seed=2), mtu=400)
    for k, p in enumerate(p2):
        de.push(p, marker=(k == len(p2) - 1))
    assert de.pop() is not None


def test_mjpeg_video_call_rfc2435(factory):
    """Full MJPEG call over RFC 2435 payloads (legacy family transport)."""
    from mediastreamer2_tpu.ops.h264 import legacy_codec_available
    if not legacy_codec_available("mjpeg"):
        pytest.skip("mjpeg missing from avcodec")
    from mediastreamer2_tpu.core.block import Format
    from mediastreamer2_tpu.models.video_stream import VideoStreamBatch
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    fmt = Format(kind="yuv420", width=176, height=144, fps=10.0)
    tx = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0, codec="mjpeg")
    rx = VideoStreamBatch(factory, 1, fmt=fmt, fps=10.0, codec="mjpeg")
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
    assert tx.stats[0].frames_sent >= 5
    assert rx.stats[0].frames_received >= 3
    assert np.abs(rx._last_rx[0]).mean() > 0.05
