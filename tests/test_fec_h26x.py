"""FEC recovery, NACK retransmission, H.264 packetization round trips."""
import numpy as np

from mediastreamer2_tpu.net.fec import FecEncoder, FecDecoder, FEC_PT
from mediastreamer2_tpu.net.rtp import RtpPacket, RtpSession, LoopbackPair
from mediastreamer2_tpu.net import h26x


# ------------------------------------------------------------------- FEC
def test_fec_recovers_single_loss():
    enc = FecEncoder(L=5)
    dec = FecDecoder()
    rng = np.random.default_rng(0)
    media = [RtpPacket(0, seq, seq * 160, 7, rng.bytes(40 + seq % 13))
             for seq in range(10)]
    repairs = [r for p in media for r in enc.push(p)]
    assert len(repairs) == 2
    lost_seq = 3
    for p in media:
        if p.seq != lost_seq:
            dec.push_media(p)
    recs = dec.push_repair(repairs[0])
    assert len(recs) == 1
    rec = recs[0]
    assert rec.seq == lost_seq
    assert rec.payload == media[lost_seq].payload
    assert rec.timestamp == media[lost_seq].timestamp
    assert dec.recovered == 1


def test_fec_double_loss_unrecoverable():
    enc = FecEncoder(L=4)
    dec = FecDecoder()
    media = [RtpPacket(0, s, s, 7, bytes([s]) * 20) for s in range(4)]
    repair = [r for p in media for r in enc.push(p)][0]
    dec.push_media(media[0])
    dec.push_media(media[3])
    assert dec.push_repair(repair) == []     # parked as pending
    # row FEC alone cannot fix a double loss; pending eventually ages out


def test_fec_column_recovers_burst():
    """Column FEC survives a burst of L consecutive losses that row FEC
    cannot touch (RFC 8627 column scheme; oRTP FecStream parity)."""
    L, D = 4, 3
    enc = FecEncoder(L=L, D=D, scheme="col")
    dec = FecDecoder()
    rng = np.random.default_rng(1)
    media = [RtpPacket(0, s, s * 160, 7, rng.bytes(30 + s % 7))
             for s in range(L * D)]
    repairs = [r for p in media for r in enc.push(p)]
    assert len(repairs) == L                  # one repair per column
    # burst: one whole row (L consecutive packets) lost
    lost = set(range(L, 2 * L))
    for p in media:
        if p.seq not in lost:
            dec.push_media(p)
    recovered = [r for rp in repairs for r in dec.push_repair(rp)]
    assert sorted(r.seq for r in recovered) == sorted(lost)
    for r in recovered:
        assert r.payload == media[r.seq].payload


def test_fec_2d_iterative_recovery():
    """2-D: a loss pattern with two losses in one row AND two in one
    column resolves by iterating rows<->columns."""
    L, D = 4, 4
    enc = FecEncoder(L=L, D=D, scheme="2d")
    dec = FecDecoder()
    rng = np.random.default_rng(2)
    media = [RtpPacket(0, s, s * 160, 7, rng.bytes(25 + s % 5))
             for s in range(L * D)]
    repairs = [r for p in media for r in enc.push(p)]
    assert len(repairs) == D + L              # D rows + L columns
    # L-shaped loss: (r0,c0),(r0,c1),(r1,c0) — row 0 has 2 losses, col 0
    # has 2 losses; only iterative 2-D decoding resolves it
    lost = {0, 1, L}
    for p in media:
        if p.seq not in lost:
            dec.push_media(p)
    recovered = []
    for rp in repairs:
        recovered.extend(dec.push_repair(rp))
    assert sorted(r.seq for r in recovered) == sorted(lost)
    for r in recovered:
        assert r.payload == media[r.seq].payload
    assert dec.recovered == 3


# ------------------------------------------------------------------ NACK
def test_nack_retransmission():
    pair = LoopbackPair()
    tx = RtpSession(pair.endpoint(0), payload_type=96)
    rx = RtpSession(pair.endpoint(1), payload_type=96)
    tx.enable_retransmission(history=16)
    first_seq = tx.seq
    for i in range(5):
        tx.send_payload(bytes([i]) * 50, 100)
    rx.poll()
    assert rx.stats.recv_packets == 5
    assert tx.retransmit((first_seq + 2) & 0xFFFF)
    rx.poll()
    assert rx.stats.recv_packets == 6
    assert not tx.retransmit((first_seq + 500) & 0xFFFF)   # not in history


# ------------------------------------------------------------------ h26x
def _fake_nal(t, size, fill=0xAB):
    return bytes([t]) + bytes([fill]) * (size - 1)


def test_annexb_split_and_join():
    nals = [_fake_nal(h26x.NAL_SPS, 20), _fake_nal(h26x.NAL_PPS, 8),
            _fake_nal(h26x.NAL_IDR, 3000)]
    stream = h26x.to_annexb(nals)
    back = h26x.split_annexb(stream)
    assert back == nals
    # 3-byte start codes too
    stream3 = b"\x00\x00\x01" + nals[0] + b"\x00\x00\x01" + nals[1]
    assert h26x.split_annexb(stream3) == nals[:2]


def test_h264_packetize_unpack_roundtrip():
    nals = [_fake_nal(h26x.NAL_SPS, 18), _fake_nal(h26x.NAL_PPS, 9),
            _fake_nal(h26x.NAL_IDR, 5000), _fake_nal(1, 900)]
    payloads = h26x.packetize(nals, mtu=1400)
    assert any(p[0] & 0x1F == h26x.NAL_FU_A for p in payloads)   # big IDR fragmented
    assert all(len(p) <= 1400 for p in payloads)
    un = h26x.H264Unpacker()
    out = []
    for p in payloads:
        out.extend(un.push(p))
    assert out == nals
    assert un.errors == 0


def test_h264_stap_aggregation():
    small = [_fake_nal(h26x.NAL_SPS, 12), _fake_nal(h26x.NAL_PPS, 6)]
    payloads = h26x.packetize(small, mtu=1400)
    assert len(payloads) == 1
    assert payloads[0][0] & 0x1F == h26x.NAL_STAP_A
    un = h26x.H264Unpacker()
    assert un.push(payloads[0]) == small


def test_parameter_set_store():
    ps = h26x.ParameterSetStore()
    sps, pps = _fake_nal(h26x.NAL_SPS, 15), _fake_nal(h26x.NAL_PPS, 7)
    ps.process(sps)
    ps.process(pps)
    assert ps.ready
    idr = [_fake_nal(h26x.NAL_IDR, 100)]
    out = ps.prepend_for_idr(idr)
    assert out == [sps, pps] + idr
    # non-IDR untouched
    assert ps.prepend_for_idr([_fake_nal(1, 50)]) == [_fake_nal(1, 50)]
