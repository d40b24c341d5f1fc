"""SRTCP protect/unprotect + RTCP-over-SRTP transport; ICE srflx gathering
against a fake STUN server."""
import numpy as np

from mediastreamer2_tpu.net.srtp import (SrtpContext, SrtcpContext,
                                         SrtpTransport)
from mediastreamer2_tpu.net.rtp import RtpPacket, LoopbackPair
from mediastreamer2_tpu.net import rtcp, stun
from mediastreamer2_tpu.net.ice import IceSession, Candidate

KEY, SALT = bytes(range(16)), bytes(range(14))


def test_srtcp_roundtrip():
    tx = SrtcpContext(KEY, SALT)
    rx = SrtcpContext(KEY, SALT)
    sr = rtcp.SenderReport(7, 1, 2, 3, 4, 5, []).pack()
    prot = tx.protect(sr)
    assert prot != sr and len(prot) == len(sr) + 4 + 10
    assert rx.unprotect(prot) == sr
    assert rx.unprotect(prot) is None         # replay


def test_srtcp_tamper_rejected():
    tx = SrtcpContext(KEY, SALT)
    rx = SrtcpContext(KEY, SALT)
    prot = bytearray(tx.protect(rtcp.ReceiverReport(9, []).pack()))
    prot[5] ^= 0xFF
    assert rx.unprotect(bytes(prot)) is None


def test_transport_protects_rtcp_too():
    pair = LoopbackPair()
    mk = lambda ep: SrtpTransport(ep, tx=SrtpContext(KEY, SALT),
                                  rx=SrtpContext(KEY, SALT),
                                  tx_rtcp=SrtcpContext(KEY, SALT),
                                  rx_rtcp=SrtcpContext(KEY, SALT))
    a, b = mk(pair.endpoint(0)), mk(pair.endpoint(1))
    sr = rtcp.SenderReport(7, 1, 2, 3, 4, 5, []).pack()
    rtp = RtpPacket(0, 1, 0, 7, b"media").pack()
    a.send(sr)
    a.send(rtp)
    # wire is encrypted: raw inner transport shows no parseable SR
    got = b.recv_all()
    assert sr in got and rtp in got


def test_ice_srflx_gathering():
    sess = IceSession(controlling=True)
    sent = []
    cl = sess.add_check_list(lambda addr, data: sent.append((addr, data)),
                             ("192.168.1.10", 4000))
    cl.start_srflx_gather(("99.99.99.99", 3478))
    assert sent and sent[-1][0] == ("99.99.99.99", 3478)
    req = stun.StunMessage.unpack(sent[-1][1])
    # fake STUN server answers with the public mapping
    resp = stun.make_binding_response(req, "203.0.113.7", 61000)
    cl.handle_stun(resp.pack(), ("99.99.99.99", 3478))
    srflx = [c for c in cl.local_candidates if c.typ == "srflx"]
    assert len(srflx) == 1
    assert (srflx[0].host, srflx[0].port) == ("203.0.113.7", 61000)
    assert srflx[0].priority >> 24 == 100      # srflx type preference


def test_srtp_header_extension_not_encrypted():
    """RFC 3711: the RTP header extension (X=1) is part of the
    authenticated-but-not-encrypted portion."""
    import os
    from mediastreamer2_tpu.net.srtp import SrtpContext, _rtp_header_len
    key, salt = os.urandom(16), os.urandom(14)
    tx, rx = SrtpContext(key, salt), SrtpContext(key, salt)
    # V=2, X=1, CC=0; one-word extension (profile 0xBEDE, len 1)
    hdr = bytes([0x90, 96, 0, 1]) + (1234).to_bytes(4, "big") \
        + (0xCAFEBABE).to_bytes(4, "big")
    ext = b"\xbe\xde\x00\x01" + b"\x10\x41\x00\x00"
    payload = bytes(range(40))
    pkt = hdr + ext + payload
    assert _rtp_header_len(pkt) == 12 + 8
    prot = tx.protect(pkt)
    # header + extension survive in the clear
    assert prot[:20] == pkt[:20]
    # payload is actually encrypted
    assert prot[20:20 + 40] != payload
    assert rx.unprotect(prot) == pkt


def test_srtcp_replay_window_bounded():
    import os
    from mediastreamer2_tpu.net.srtp import SrtcpContext
    key, salt = os.urandom(16), os.urandom(14)
    tx, rx = SrtcpContext(key, salt), SrtcpContext(key, salt)
    pkt = bytes([0x80, 200, 0, 6]) + (77).to_bytes(4, "big") + b"\x00" * 20
    protected = [tx.protect(pkt) for _ in range(3000)]
    for p in protected:
        assert rx.unprotect(p) is not None
    assert len(rx.replay) <= rx.REPLAY_WINDOW + 1
    # replay of a recent packet rejected via the set...
    assert rx.unprotect(protected[-1]) is None
    # ...and of an ancient (pruned) one rejected via the window floor
    assert rx.unprotect(protected[0]) is None
