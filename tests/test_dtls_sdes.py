"""DTLS-SRTP handshake + key export, SDES negotiation, and the full
DTLS->SRTP->media pipeline (parity: src/crypto/dtls_srtp.cpp and SDES key
handling in ms_srtp.cpp)."""
import numpy as np
import pytest

from mediastreamer2_tpu.net import dtls
from mediastreamer2_tpu.net.srtp import (SrtpContext, SrtpTransport,
                                         sdes_generate, sdes_parse)
from mediastreamer2_tpu.net.rtp import RtpPacket, RtpSession, LoopbackPair

pytestmark = pytest.mark.skipif(not dtls.dtls_available(),
                                reason="libssl missing")


def _handshake():
    client = dtls.DtlsSrtpSession(is_server=False)
    server = dtls.DtlsSrtpSession(is_server=True)
    for _ in range(10):
        client.handshake_step()
        for p in client.pop_packets():
            server.put_packet(p)
        server.handshake_step()
        for p in server.pop_packets():
            client.put_packet(p)
        if client.is_established and server.is_established:
            break
    return client, server


def test_dtls_handshake_and_key_export():
    client, server = _handshake()
    assert client.is_established and server.is_established
    assert client.export_srtp_keys() == server.export_srtp_keys()
    assert client.local_fingerprint() == server.peer_fingerprint()
    assert server.local_fingerprint() == client.peer_fingerprint()


def test_dtls_demux_predicate():
    client = dtls.DtlsSrtpSession(is_server=False)
    client.handshake_step()
    for p in client.pop_packets():
        assert dtls.is_dtls(p)
    rtp = RtpPacket(0, 1, 2, 3, b"x").pack()
    assert not dtls.is_dtls(rtp)


def test_dtls_derived_srtp_media_flow():
    """Full chain: DTLS handshake -> exported keys -> SRTP transport."""
    client, server = _handshake()
    ck, cs, sk, ss = client.export_srtp_keys()
    # the default offer prefers AEAD GCM; both sides agree on the profile
    suite = client.srtp_suite()
    assert suite == server.srtp_suite() == "AEAD_AES_128_GCM"
    # RFC 5764: client writes with client key, server with server key
    pair = LoopbackPair()
    t_client = SrtpTransport(pair.endpoint(0),
                             tx=SrtpContext(ck, cs, suite),
                             rx=SrtpContext(sk, ss, suite))
    t_server = SrtpTransport(pair.endpoint(1),
                             tx=SrtpContext(sk, ss, suite),
                             rx=SrtpContext(ck, cs, suite))
    a = RtpSession(t_client, payload_type=0)
    b = RtpSession(t_server, payload_type=0)
    got = []
    b.on_packet = lambda pkt: got.append(pkt.payload)
    for i in range(5):
        a.send_payload(bytes([i]) * 60, 80)
    b.poll()
    assert got == [bytes([i]) * 60 for i in range(5)]
    assert t_server.auth_failures == 0


def test_sdes_generate_parse_roundtrip():
    line, key, salt = sdes_generate()
    suite, k2, s2 = sdes_parse("1 " + line)       # with tag prefix
    assert (k2, s2) == (key, salt)
    assert suite == "AES_CM_128_HMAC_SHA1_80"


def test_sdes_interop_srtp():
    line_a, ka, sa = sdes_generate()
    line_b, kb, sb = sdes_parse("AES_CM_128_HMAC_SHA1_80 inline:" +
                                __import__("base64").b64encode(
                                    ka + sa).decode())[0], ka, sa
    tx = SrtpContext(ka, sa)
    rx = SrtpContext(kb, sb)
    pkt = RtpPacket(0, 9, 0, 5, b"hello").pack()
    assert rx.unprotect(tx.protect(pkt)) == pkt
