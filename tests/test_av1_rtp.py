"""AV1 RTP OBU packetization (parity: src/videofilters/av1/obu/):
LEB128 elements, Z/Y fragmentation, temporal-delimiter removal, and a
full encode->packetize->depacketize->decode chain when libaom is up."""
import numpy as np
import pytest

from mediastreamer2_tpu.net import av1_rtp as A


def _mk_obu(obu_t, body, has_size=True):
    hdr = (obu_t & 0x0F) << 3 | (0x02 if has_size else 0)
    if has_size:
        return bytes([hdr]) + A.leb128_encode(len(body)) + body
    return bytes([hdr]) + body


def test_leb128():
    for v in (0, 1, 127, 128, 300, 2**20, 2**32 - 1):
        enc = A.leb128_encode(v)
        dec, off = A.leb128_decode(enc)
        assert dec == v and off == len(enc)


def test_split_join_strips_sizes_and_restores():
    tu = _mk_obu(1, b"SEQHDR") + _mk_obu(6, b"F" * 40)
    obus = A.split_obus(tu)
    assert len(obus) == 2
    assert all(not (o[0] & 0x02) for o in obus)      # size fields stripped
    assert A.join_obus(obus) == tu                   # restored for decoder


def test_packetize_removes_temporal_delimiter():
    tu = _mk_obu(A.OBU_TEMPORAL_DELIMITER, b"") + _mk_obu(6, b"X" * 30)
    pls = A.packetize(tu, mtu=100)
    d = A.Depacketizer()
    for p in pls:
        d.push(p)
    out = d.pop_tu()
    obus = A.split_obus(out)
    assert [A.obu_type(o) for o in obus] == [6]


def test_fragmentation_z_y_roundtrip():
    body = bytes(range(256)) * 20                    # 5120B frame OBU
    tu = _mk_obu(1, b"HDR") + _mk_obu(6, body)
    pls = A.packetize(tu, mtu=500, new_sequence=True)
    assert len(pls) > 10
    assert pls[0][0] & 0x08                          # N bit on first packet
    assert any(p[0] & 0x40 for p in pls)             # Y continuations
    assert any(p[0] & 0x80 for p in pls)             # Z continuations
    d = A.Depacketizer()
    for p in pls:
        d.push(p)
    out = d.pop_tu()
    obus = A.split_obus(out)
    assert [A.obu_type(o) for o in obus] == [1, 6]
    assert obus[1][1:] == body


from mediastreamer2_tpu.ops.av1 import av1_available  # noqa: E402


@pytest.mark.skipif(not av1_available(), reason="libaom/dav1d unavailable")
def test_av1_codec_over_rtp_packetization():
    from mediastreamer2_tpu.ops.av1 import Av1Encoder, Av1Decoder
    enc = Av1Encoder(64, 48, fps=25)
    dec = Av1Decoder()
    rng = np.random.default_rng(7)
    y = (rng.random((48, 64)) * 255).astype(np.uint8)
    u = v = np.full((24, 32), 128, np.uint8)
    tu, key = enc.encode_planes(y, u, v, force_keyframe=True)
    pls = A.packetize(tu, mtu=300, new_sequence=key)
    d = A.Depacketizer()
    for p in pls:
        d.push(p)
    out_tu = d.pop_tu()
    assert out_tu is not None
    frame = dec.decode(out_tu)
    assert frame is not None and frame[0].shape == (48, 64)


@pytest.mark.skipif(not av1_available(), reason="libaom/dav1d unavailable")
def test_av1_call_mire_to_display(factory):
    """Full AV1 legs: mire -> aom encode -> OBU RTP -> depacketize ->
    dav1d decode -> display (the av1 encoder/decoder filter chain)."""
    from mediastreamer2_tpu.core.block import Format
    from mediastreamer2_tpu.models.video_stream import VideoStreamBatch
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    fmt = Format(kind="yuv420", width=64, height=48, fps=25.0)
    tx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="av1")
    rx = VideoStreamBatch(factory, 1, fmt=fmt, fps=25.0, codec="av1")
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
    assert np.abs(rx._last_rx[0]).mean() > 0.05
