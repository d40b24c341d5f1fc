"""ZRTP wire-format validation against INDEPENDENT byte assembly — a
foreign Hello hand-built from the RFC 6189 §5 text (sharing no code with
net/zrtp.py, including a bitwise CRC-32C) must be accepted by our session,
and our emitted packets must parse/checksum under the foreign arithmetic.
Complements the self-interop handshake tests the same way the foreign
STUN agent does for ICE."""
import os
import struct

from mediastreamer2_tpu.net.zrtp import ZrtpSession, unwrap_packet, \
    parse_message


def crc32c_bitwise(data: bytes) -> int:
    """CRC-32C (Castagnoli, RFC 3309) computed bit by bit — deliberately a
    different implementation from net/zrtp.py's table-driven one."""
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def build_foreign_hello(seq=1, ssrc=0xDEADBEEF):
    """§5.2 Hello assembled field by field from the RFC layout."""
    h3 = os.urandom(32)
    zid = b"FOREIGNZID0!"                       # 12 octets
    body = (b"1.10"                             # version
            + b"foreign-zrtp 1.0".ljust(16)     # client id, 16 octets
            + h3                                # H3 hash-chain top
            + zid                               # ZID
            + bytes([0x00, 0x11, 0x11, 0x11])   # flags + algo counts (1 each)
            + b"S256" + b"AES1" + b"HS80" + b"X255" + b"B32 ")
    # §5.1 message block: 0x505a | length in 32-bit words | type | body+MAC
    mac = os.urandom(8)                          # the MAC is verified
    body += mac                                  # retroactively; random ok
    length_words = (4 + 8 + len(body)) // 4
    msg = struct.pack("!HH", 0x505A, length_words) + b"Hello   " + body
    # §5 packet: 0x10 0x00 | seq | 'ZRTP' magic | ssrc | msg | CRC-32C
    pkt = struct.pack("!BBHII", 0x10, 0x00, seq, 0x5A525450, ssrc) + msg
    return pkt + struct.pack("!I", crc32c_bitwise(pkt)), zid


def test_session_accepts_foreign_hello():
    sent = []
    s = ZrtpSession(send=sent.append)
    s.start()
    pkt, zid = build_foreign_hello()
    s.process(pkt)
    assert s.peer_zid == zid                   # parsed the §5.2 layout
    # the session answered with a HelloACK
    acks = [m for m in sent
            if parse_message(unwrap_packet(m))[0] == b"HelloACK"]
    assert acks, "no HelloACK to a foreign Hello"


def test_our_packets_verify_under_foreign_arithmetic():
    sent = []
    s = ZrtpSession(send=sent.append)
    s.start()
    assert sent
    pkt = sent[0]
    # foreign-side structural parse, field by field
    b0, b1, seq, magic, ssrc = struct.unpack("!BBHII", pkt[:12])
    assert b0 == 0x10 and magic == 0x5A525450
    crc = struct.unpack("!I", pkt[-4:])[0]
    assert crc == crc32c_bitwise(pkt[:-4]), "CRC-32C mismatch"
    pre, words = struct.unpack("!HH", pkt[12:16])
    assert pre == 0x505A
    assert 12 + words * 4 + 4 == len(pkt), "length-in-words wrong"
    assert pkt[16:24] == b"Hello   "
    body = pkt[24:-4]
    assert body[:4] == b"1.10"                 # §5.2 version
    assert len(body[4:20]) == 16               # client id
    # H3 (32) + ZID (12) follow
    assert len(body) >= 4 + 16 + 32 + 12 + 4 + 20 + 8


def test_corrupted_crc_rejected():
    pkt, _ = build_foreign_hello()
    bad = pkt[:-1] + bytes([pkt[-1] ^ 0x01])
    assert unwrap_packet(bad) is None
