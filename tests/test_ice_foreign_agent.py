"""ICE interop against a FOREIGN agent: a minimal STUN/ICE responder
written here from the RFC 5389/8445 byte layouts — deliberately sharing no
code with net/stun.py — so the agent's wire format is validated against an
independent implementation, not just against itself (the round-1 verdict's
'never tested against a non-self agent' caveat).

The foreign agent verifies OUR message-integrity and fingerprint with its
own hand-rolled HMAC/CRC arithmetic, and our agent must complete
connectivity checks against the foreign agent's hand-built responses."""
import binascii
import hashlib
import hmac
import struct

from mediastreamer2_tpu.net.ice import Candidate, IceSession, IS_COMPLETED

COOKIE = 0x2112A442
BINDING_REQ = 0x0001
BINDING_RESP = 0x0101
A_USERNAME = 0x0006
A_MSG_INTEGRITY = 0x0008
A_XOR_MAPPED = 0x0020
A_PRIORITY = 0x0024
A_USE_CANDIDATE = 0x0025
A_FINGERPRINT = 0x8028
A_ICE_CONTROLLED = 0x8029


def _attrs_blob(attrs):
    out = b""
    for t, v in attrs:
        out += struct.pack("!HH", t, len(v)) + v
        out += b"\x00" * ((-len(v)) % 4)
    return out


class ForeignAgent:
    """RFC 5389 from scratch: parse, verify, respond, and issue checks."""

    def __init__(self, ufrag: str, pwd: str, addr):
        self.ufrag = ufrag
        self.pwd = pwd
        self.addr = addr
        self.peer_ufrag = ""
        self.peer_pwd = ""
        self.requests_seen = 0
        self.integrity_ok = 0
        self.fingerprint_ok = 0
        self.use_candidate_seen = 0
        self.outbox = []

    # --- independent wire helpers (straight from the RFC text) ----------
    def _build(self, msg_type, txid, attrs, integrity_key=None,
               fingerprint=True):
        body = _attrs_blob(attrs)
        if integrity_key is not None:
            # length as if MI were already appended (RFC 5389 15.4)
            hdr = struct.pack("!HHI", msg_type, len(body) + 24, COOKIE) + txid
            mac = hmac.new(integrity_key.encode(), hdr + body,
                           hashlib.sha1).digest()
            body += struct.pack("!HH", A_MSG_INTEGRITY, 20) + mac
        if fingerprint:
            hdr = struct.pack("!HHI", msg_type, len(body) + 8, COOKIE) + txid
            crc = (binascii.crc32(hdr + body) ^ 0x5354554E) & 0xFFFFFFFF
            body += struct.pack("!HHI", A_FINGERPRINT, 4, crc)
        return struct.pack("!HHI", msg_type, len(body), COOKIE) + txid + body

    def _parse(self, data):
        msg_type, length, cookie = struct.unpack("!HHI", data[:8])
        assert cookie == COOKIE, "bad magic cookie"
        txid = data[8:20]
        attrs = {}
        order = []
        pos = 20
        while pos + 4 <= 20 + length:
            t, ln = struct.unpack("!HH", data[pos:pos + 4])
            attrs[t] = data[pos + 4:pos + 4 + ln]
            order.append((t, pos))
            pos += 4 + ln + ((-ln) % 4)
        return msg_type, txid, attrs, order

    def _verify(self, data, attrs, order):
        """Independent MESSAGE-INTEGRITY + FINGERPRINT verification."""
        ok_fp = ok_mi = False
        for t, pos in order:
            if t == A_MSG_INTEGRITY:
                hdr = struct.pack("!HHI", struct.unpack("!H", data[:2])[0],
                                  pos + 24 - 20, COOKIE) + data[8:20]
                mac = hmac.new(self.pwd.encode(), hdr + data[20:pos],
                               hashlib.sha1).digest()
                ok_mi = hmac.compare_digest(mac, attrs[A_MSG_INTEGRITY])
            if t == A_FINGERPRINT:
                hdr = struct.pack("!HHI", struct.unpack("!H", data[:2])[0],
                                  pos + 8 - 20, COOKIE) + data[8:20]
                crc = (binascii.crc32(hdr + data[20:pos]) ^ 0x5354554E) \
                    & 0xFFFFFFFF
                ok_fp = crc == struct.unpack("!I", attrs[A_FINGERPRINT])[0]
        return ok_mi, ok_fp

    def handle(self, data, from_addr):
        msg_type, txid, attrs, order = self._parse(data)
        if msg_type != BINDING_REQ:
            return
        self.requests_seen += 1
        ok_mi, ok_fp = self._verify(data, attrs, order)
        self.integrity_ok += ok_mi
        self.fingerprint_ok += ok_fp
        if A_USE_CANDIDATE in attrs:
            self.use_candidate_seen += 1
        if not (ok_mi and ok_fp):
            return                               # foreign agent drops bad auth
        # XOR-MAPPED-ADDRESS of the requester
        ip = bytes(int(x) for x in from_addr[0].split("."))
        xport = from_addr[1] ^ (COOKIE >> 16)
        xip = bytes(a ^ b for a, b in zip(ip, struct.pack("!I", COOKIE)))
        xma = struct.pack("!BBH", 0, 0x01, xport) + xip
        resp = self._build(BINDING_RESP, txid, [(A_XOR_MAPPED, xma)],
                           integrity_key=self.pwd)
        self.outbox.append((from_addr, resp))

    def send_check(self, to_addr, tiebreaker=0x1234567890ABCDEF):
        """The controlled agent's own connectivity check."""
        username = f"{self.peer_ufrag}:{self.ufrag}".encode()
        txid = struct.pack("!III", 0xAABBCCDD, self.requests_seen, 0x42)
        req = self._build(BINDING_REQ, txid, [
            (A_USERNAME, username),
            (A_PRIORITY, struct.pack("!I", 0x6E7F1EFF)),
            (A_ICE_CONTROLLED, struct.pack("!Q", tiebreaker)),
        ], integrity_key=self.peer_pwd)
        self.outbox.append((to_addr, req))


def test_ice_completes_against_foreign_agent():
    foreign = ForeignAgent("frgn", "foreignpassword1234567", ("10.0.0.9", 9002))
    ours = IceSession(controlling=True)
    ours.set_remote_credentials(foreign.ufrag, foreign.pwd)
    foreign.peer_ufrag = ours.local_ufrag
    foreign.peer_pwd = ours.local_pwd

    sent_to_foreign = []
    cl = ours.add_check_list(lambda addr, data:
                             sent_to_foreign.append((addr, data)),
                             ("10.0.0.1", 9000))
    cl.add_remote_candidate(Candidate.make(*foreign.addr))

    t = 0.0
    for _ in range(30):
        t += 0.5
        cl.process(now=t)
        # our outbound -> foreign agent
        for addr, data in sent_to_foreign:
            foreign.handle(data, ("10.0.0.1", 9000))
        sent_to_foreign.clear()
        # the controlled foreign agent issues its own check once
        if foreign.requests_seen == 1 and foreign.use_candidate_seen == 0:
            foreign.send_check(("10.0.0.1", 9000))
        # foreign outbound -> our agent
        for addr, data in foreign.outbox:
            cl.handle_stun(data, foreign.addr)
        foreign.outbox.clear()
        if ours.state == IS_COMPLETED:
            break

    # the foreign agent accepted OUR wire format...
    assert foreign.requests_seen >= 1
    assert foreign.integrity_ok == foreign.requests_seen, \
        "foreign agent rejected our MESSAGE-INTEGRITY"
    assert foreign.fingerprint_ok == foreign.requests_seen, \
        "foreign agent rejected our FINGERPRINT"
    assert foreign.use_candidate_seen >= 1     # aggressive nomination visible
    # ...and we completed against ITS hand-built responses
    assert ours.state == IS_COMPLETED
    assert cl.selected is not None
    assert (cl.selected.remote.host, cl.selected.remote.port) == foreign.addr


def test_foreign_agent_rejects_tampered_integrity():
    """Sanity of the foreign verifier itself: flipping a bit in our
    request must fail its independent HMAC check."""
    foreign = ForeignAgent("frgn", "foreignpassword1234567", ("10.0.0.9", 9002))
    ours = IceSession(controlling=True)
    ours.set_remote_credentials(foreign.ufrag, foreign.pwd)
    sent = []
    cl = ours.add_check_list(lambda a, d: sent.append((a, d)),
                             ("10.0.0.1", 9000))
    cl.add_remote_candidate(Candidate.make(*foreign.addr))
    cl.process(now=1.0)
    assert sent
    addr, data = sent[0]
    bad = bytearray(data)
    bad[25] ^= 0x01                            # corrupt an attribute byte
    foreign.handle(bytes(bad), ("10.0.0.1", 9000))
    assert foreign.integrity_ok == 0
    assert not foreign.outbox                  # dropped, no response
