"""ZRTP key agreement: handshake, SAS match, SRTP key handoff, key
continuity cache (parity: src/crypto/zrtp.c + bzrtp roles)."""
import numpy as np
import pytest

from mediastreamer2_tpu.net.zrtp import ZrtpSession, is_zrtp, sas_b32
from mediastreamer2_tpu.net.srtp import SrtpContext
from mediastreamer2_tpu.net.rtp import RtpPacket


def _run(cache_a=None, cache_b=None, drop_first_n=0):
    wires = {"a": [], "b": []}
    a = ZrtpSession(send=wires["a"].append, cache=cache_a)
    b = ZrtpSession(send=wires["b"].append, cache=cache_b)
    out = {}
    a.on_secrets = lambda *k: out.__setitem__("a", k)
    b.on_secrets = lambda *k: out.__setitem__("b", k)
    a.start()
    b.start()
    dropped = 0
    for _ in range(30):
        moved = False
        for src, dst in (("a", b), ("b", a)):
            q = list(wires[src])
            wires[src].clear()          # keep list identity (send binds it)
            for m in q:
                if dropped < drop_first_n:
                    dropped += 1
                    continue
                dst.process(m)
                moved = True
        if a.secrets_ready and b.secrets_ready:
            break
        if not moved:
            break
    return a, b, out


def test_zrtp_handshake_completes():
    a, b, out = _run()
    assert a.state == "secure" and b.state == "secure"
    assert a.sas == b.sas and len(a.sas) == 4
    # keys are complementary: a.tx == b.rx and vice versa
    assert out["a"][0:2] == out["b"][2:4]
    assert out["a"][2:4] == out["b"][0:2]


def test_zrtp_keys_drive_srtp():
    a, b, out = _run()
    tx = SrtpContext(out["a"][0], out["a"][1])
    rx = SrtpContext(out["b"][2], out["b"][3])
    pkt = RtpPacket(0, 1, 0, 9, b"secret media").pack()
    assert rx.unprotect(tx.protect(pkt)) == pkt


def test_zrtp_key_continuity_cache():
    cache_a, cache_b = {}, {}
    a1, b1, _ = _run(cache_a, cache_b)
    assert a1.peer_zid in cache_a and b1.peer_zid in cache_b
    rs_a = cache_a[a1.peer_zid]
    # second call between same endpoints refreshes the retained secret
    a2 = ZrtpSession(send=lambda m: None, zid=a1.zid, cache=cache_a)
    assert cache_a[a1.peer_zid] == rs_a   # unchanged until next completion


def test_zrtp_sessions_unique_sas():
    a1, b1, _ = _run()
    a2, b2, _ = _run()
    # 20-bit SAS: two independent sessions almost surely differ
    assert (a1.sas != a2.sas) or (a1.s0 != a2.s0)


def test_zrtp_demux():
    a = ZrtpSession(send=lambda m: None)
    a.start is not None
    msgs = []
    a2 = ZrtpSession(send=msgs.append)
    a2.start()
    assert is_zrtp(msgs[0])
    assert not is_zrtp(RtpPacket(0, 1, 2, 3, b"x").pack())


def test_sas_encoding():
    assert sas_b32(b"\x00\x00\x00\x00") == "yyyy"
    s = sas_b32(b"\xff\xff\xf0")
    assert len(s) == 4


def test_goclear_authenticated_downgrade():
    """RFC 6189 GoClear: secure -> clear on both ends, authenticated by
    the shared-secret HMAC; a forged GoClear is ignored."""
    from mediastreamer2_tpu.net.zrtp import (ZrtpSession, T_GOCLEAR,
                                             make_message, wrap_packet)
    a_out, b_out = [], []
    a = ZrtpSession(send=a_out.append)
    b = ZrtpSession(send=b_out.append)
    a.start(); b.start()
    for _ in range(12):                    # pump until secure
        for m in a_out[:]:
            a_out.remove(m); b.process(m)
        for m in b_out[:]:
            b_out.remove(m); a.process(m)
    assert a.state == "secure" and b.state == "secure"

    cleared = []
    b.on_goclear = lambda: cleared.append("b")
    a.on_goclear = lambda: cleared.append("a")
    # forged GoClear (wrong mac) must be ignored
    b.process(wrap_packet(make_message(T_GOCLEAR, b"\x00" * 8), 1, 7))
    assert b.state == "secure" and cleared == []
    # genuine GoClear
    a.go_clear()
    for _ in range(3):
        for m in a_out[:]:
            a_out.remove(m); b.process(m)
        for m in b_out[:]:
            b_out.remove(m); a.process(m)
    assert b.state == "clear" and a.state == "clear"
    assert sorted(cleared) == ["a", "b"]


def test_zrtp_wire_format_rfc6189():
    """Structural wire check (RFC 6189 §5): RTP-lookalike header with the
    ZRTP magic cookie, CRC-32C trailer (RFC 3309 check value), 0x505a
    message preamble, word length, 8-octet type blocks."""
    from mediastreamer2_tpu.net.zrtp import (crc32c, wrap_packet,
                                             unwrap_packet, make_message,
                                             parse_message, T_HELLO,
                                             ZrtpSession, is_zrtp)
    import struct
    # CRC-32C standard check value
    assert crc32c(b"123456789") == 0xE3069283
    msg = make_message(T_HELLO, b"\x01\x02\x03")        # padded to a word
    assert len(msg) % 4 == 0
    pre, words = struct.unpack("!HH", msg[:4])
    assert pre == 0x505A and words * 4 == len(msg)
    t, body = parse_message(msg)
    assert t == T_HELLO and body[:3] == b"\x01\x02\x03"
    pkt = wrap_packet(msg, seq=42, ssrc=0xDEADBEEF)
    assert pkt[0] == 0x10 and pkt[1] == 0x00
    assert struct.unpack("!H", pkt[2:4])[0] == 42
    assert struct.unpack("!I", pkt[4:8])[0] == 0x5A525450   # 'ZRTP'
    assert struct.unpack("!I", pkt[8:12])[0] == 0xDEADBEEF
    assert is_zrtp(pkt)
    assert unwrap_packet(pkt) == msg
    # corrupted CRC rejected
    bad = pkt[:-1] + bytes([pkt[-1] ^ 1])
    assert unwrap_packet(bad) is None
    # a real Hello from a session has the RFC fields in place
    out = []
    z = ZrtpSession(send=out.append)
    z.start()
    hello = unwrap_packet(out[0])
    t, body = parse_message(hello)
    assert t == T_HELLO
    assert body[:4] == b"1.10"                  # protocol version
    assert body[20:52] == z.h[3]                # H3 hash-chain tip
    assert body[52:64] == z.zid


def test_zrtp_tampered_handshake_fails():
    """Hash-chain + hvi commitment: a MitM substituting DH values breaks
    the chain MACs and the session refuses to complete."""
    from mediastreamer2_tpu.net.zrtp import (ZrtpSession, unwrap_packet,
                                             parse_message, wrap_packet,
                                             T_DH2)
    a_out, b_out = [], []
    a = ZrtpSession(send=a_out.append)
    b = ZrtpSession(send=b_out.append)
    a.start(); b.start()
    tampered = [False]

    def tamper(m):
        # DH2 comes from whichever side won the initiator role (the
        # commit contention is nonce-random), so intercept both directions
        msg = unwrap_packet(m)
        t, body = parse_message(msg)
        if t == T_DH2 and not tampered[0]:
            # swap in an attacker's public value
            body = body[:64] + b"\x99" * 32 + body[96:]
            from mediastreamer2_tpu.net.zrtp import make_message
            m = wrap_packet(make_message(T_DH2, body), 1, 1)
            tampered[0] = True
        return m

    def pump_once():
        for m in a_out[:]:
            a_out.remove(m)
            b.process(tamper(m))
        for m in b_out[:]:
            b_out.remove(m)
            a.process(tamper(m))

    for _ in range(12):
        pump_once()
    assert tampered[0], "no DH2 was ever exchanged"
    assert (b.state == "failed" or not b.secrets_ready
            or a.state == "failed" or not a.secrets_ready)
