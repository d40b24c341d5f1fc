"""ZRTP (RFC 6189) — Diffie-Hellman media-path key agreement with SAS.

Reference: src/crypto/zrtp.c (1,298 LoC bzrtp wrapper): handshake packets
ride the RTP port via a transport modifier (:178), derived SRTP keys feed
ms_srtp (:198-213), SAS surfaces to the user, cache enables key continuity.

Scope (functional core, self-interoperable): Hello/HelloACK -> Commit
(hash commitment) -> DHPart1/DHPart2 (X25519) -> Confirm1/Confirm2;
s0 = KDF(DH result || total_hash); SRTP keys + SAS (base32, RFC 6189 §5.1.6
B32 scheme) derived per the RFC's KDF labels; retained-secret cache gives
key continuity across calls (the bzrtp ZID cache role).  Wire format is
framework-internal (magic-tagged), not bit-exact RFC — interop with other
ZRTP stacks is a non-goal this round; the security properties and API
surface match.
"""
from __future__ import annotations

import hashlib
import hmac
import os
import struct
from typing import Callable, Dict, Optional

from cryptography.hazmat.primitives.asymmetric.x25519 import (
    X25519PrivateKey, X25519PublicKey)

MAGIC = b"ZT10"
MSG_HELLO, MSG_HELLO_ACK, MSG_COMMIT, MSG_DH1, MSG_DH2, MSG_CONF1, \
    MSG_CONF2, MSG_CONF2_ACK, MSG_GOCLEAR, MSG_CLEAR_ACK = range(10)

_B32 = "ybndrfg8ejkmcpqxot1uwisza345h769"   # z-base-32 (RFC 6189 SAS)


def _kdf(key: bytes, label: bytes, context: bytes, length: int) -> bytes:
    """RFC 6189 §4.5.1 KDF (HMAC-SHA256 counter mode)."""
    out = b""
    counter = 1
    while len(out) < length:
        out += hmac.new(key, struct.pack("!I", counter) + label + b"\x00"
                        + context + struct.pack("!I", length * 8),
                        hashlib.sha256).digest()
        counter += 1
    return out[:length]


def sas_b32(sas_value: bytes) -> str:
    """Short authentication string: 4 z-base-32 chars from 20 bits."""
    bits = int.from_bytes(sas_value[:3], "big") >> 4
    return "".join(_B32[(bits >> s) & 31] for s in (15, 10, 5, 0))


class ZrtpSession:
    """One endpoint. Drive with process(); outbound via send callback.

    on_secrets(tx_key, tx_salt, rx_key, rx_salt) fires when SRTP keys are
    ready; on_sas(sas) surfaces the 4-char SAS for user verification."""

    def __init__(self, send: Callable[[bytes], None],
                 zid: Optional[bytes] = None,
                 cache: Optional[Dict[bytes, bytes]] = None):
        self.send = send
        self.zid = zid or os.urandom(12)
        self.cache = cache if cache is not None else {}   # peer zid -> rs1
        self.priv = X25519PrivateKey.generate()
        self.pub = self.priv.public_key().public_bytes_raw()
        self.h = [os.urandom(32)]                 # hash chain H0..H3
        for _ in range(3):
            self.h.append(hashlib.sha256(self.h[-1]).digest())
        self.state = "idle"
        self.is_initiator = False
        self.peer_zid: Optional[bytes] = None
        self.peer_pub: Optional[bytes] = None
        self.peer_hello: Optional[bytes] = None
        self.my_hello: Optional[bytes] = None
        self.commit_sent: Optional[bytes] = None
        self.peer_commit: Optional[bytes] = None
        self.s0: Optional[bytes] = None
        self.sas: Optional[str] = None
        self.on_secrets = None
        self.on_sas = None
        self.on_goclear = None      # fired when the call drops to clear RTP
        self.secrets_ready = False

    # -- wire helpers -----------------------------------------------------
    def _msg(self, t: int, body: bytes) -> bytes:
        return MAGIC + bytes([t]) + body

    def start(self):
        """cf. ms_zrtp channel start: both sides send Hello."""
        self.my_hello = self.zid + self.h[3]
        self.send(self._msg(MSG_HELLO, self.my_hello))
        self.state = "hello_sent"

    def process(self, data: bytes):
        if not data.startswith(MAGIC):
            return
        t, body = data[4], data[5:]
        if t == MSG_HELLO:
            self.peer_zid = body[:12]
            self.peer_hello = body
            self.send(self._msg(MSG_HELLO_ACK, b""))
            if self.my_hello is None:
                self.start()
            self._maybe_commit()
        elif t == MSG_HELLO_ACK:
            self._maybe_commit()
        elif t == MSG_COMMIT:
            self.peer_commit = body
            # contention: lower ZID backs down to responder
            if self.commit_sent is not None:
                if self.zid > self.peer_zid:
                    return                      # stay initiator, ignore theirs
                self.is_initiator = False
                self.commit_sent = None
            # responder sends DHPart1
            self.send(self._msg(MSG_DH1, self.pub + self.h[1]))
            self.state = "dh1_sent"
        elif t == MSG_DH1:
            if not self.is_initiator:
                return
            self.peer_pub = body[:32]
            self.send(self._msg(MSG_DH2, self.pub + self.h[1]))
            self._derive(responder_pub=self.peer_pub)
            self.send(self._msg(MSG_CONF1, self._confirm_mac()))
            self.state = "confirm"
        elif t == MSG_DH2:
            if self.is_initiator:
                return
            self.peer_pub = body[:32]
            # verify commitment: commit = H(DHPart2 pub)
            if self.peer_commit and hashlib.sha256(
                    body).digest() != self.peer_commit[:32]:
                self.state = "failed"
                return
            self._derive(responder_pub=self.pub)
            self.send(self._msg(MSG_CONF2, self._confirm_mac()))
        elif t in (MSG_CONF1, MSG_CONF2):
            if self.s0 is None:
                return
            if not hmac.compare_digest(body, self._confirm_mac(peer=True)):
                self.state = "failed"
                return
            if t == MSG_CONF1:
                self.send(self._msg(MSG_CONF2, self._confirm_mac()))
            else:
                self.send(self._msg(MSG_CONF2_ACK, b""))
            self._finish()
        elif t == MSG_CONF2_ACK:
            self._finish()
        elif t == MSG_GOCLEAR:
            # RFC 6189 §4.7.2: authenticated downgrade to clear RTP; the
            # clear_hmac (keyed from the shared secret) prevents an
            # attacker from forcing the call off SRTP
            if self.s0 is None or not hmac.compare_digest(
                    body, self._goclear_mac(peer=True)):
                return                           # forged GoClear: ignore
            self.send(self._msg(MSG_CLEAR_ACK, b""))
            self._to_clear()
        elif t == MSG_CLEAR_ACK:
            if self.state == "clear_sent":
                self._to_clear()

    def _maybe_commit(self):
        if self.state != "hello_sent" or self.peer_zid is None:
            return
        # both try to initiate; contention resolved on Commit receipt
        self.is_initiator = True
        dh2_body = self.pub + self.h[1]
        self.commit_sent = hashlib.sha256(self._msg(MSG_DH2, dh2_body)[5:]
                                          ).digest() + self.zid
        self.send(self._msg(MSG_COMMIT, self.commit_sent))
        self.state = "commit_sent"

    # -- key derivation (RFC 6189 §4.4) -------------------------------------
    def _derive(self, responder_pub: bytes):
        dh = self.priv.exchange(X25519PublicKey.from_public_bytes(
            self.peer_pub))
        zids = (self.zid + self.peer_zid if self.is_initiator
                else self.peer_zid + self.zid)
        rs1 = self.cache.get(self.peer_zid, b"")
        # canonical ordering (initiator hello first) so both sides agree
        hellos = ((self.my_hello, self.peer_hello) if self.is_initiator
                  else (self.peer_hello, self.my_hello))
        total_hash = hashlib.sha256((hellos[0] or b"")
                                    + (hellos[1] or b"")).digest()
        self.s0 = hashlib.sha256(
            struct.pack("!I", 1) + dh + b"ZRTP-HMAC-KDF" + zids
            + total_hash + rs1).digest()
        ctx = zids + total_hash
        self._keys = {
            "init_key": _kdf(self.s0, b"Initiator SRTP master key", ctx, 16),
            "init_salt": _kdf(self.s0, b"Initiator SRTP master salt", ctx, 14),
            "resp_key": _kdf(self.s0, b"Responder SRTP master key", ctx, 16),
            "resp_salt": _kdf(self.s0, b"Responder SRTP master salt", ctx, 14),
        }
        self.sas = sas_b32(_kdf(self.s0, b"SAS", ctx, 4))
        # key continuity: retained secret for next call (bzrtp cache role)
        self.cache[self.peer_zid] = _kdf(self.s0, b"retained secret", ctx, 32)

    def go_clear(self):
        """Initiate the authenticated switch back to clear RTP
        (cf. bzrtp GoClear support referenced from src/crypto/zrtp.c)."""
        if self.state != "secure":
            raise RuntimeError("GoClear only valid from secure state")
        self.send(self._msg(MSG_GOCLEAR, self._goclear_mac()))
        self.state = "clear_sent"

    def _goclear_mac(self, peer: bool = False) -> bytes:
        who = (not self.is_initiator) if peer else self.is_initiator
        label = b"initiator goclear" if who else b"responder goclear"
        return hmac.new(self.s0, label, hashlib.sha256).digest()

    def _to_clear(self):
        self.state = "clear"
        self.secrets_ready = False
        if self.on_goclear:
            self.on_goclear()

    def _confirm_mac(self, peer: bool = False) -> bytes:
        who = (not self.is_initiator) if peer else self.is_initiator
        label = b"initiator confirm" if who else b"responder confirm"
        return hmac.new(self.s0, label, hashlib.sha256).digest()

    def _finish(self):
        if self.secrets_ready or self.s0 is None:
            return
        self.secrets_ready = True
        self.state = "secure"
        k = self._keys
        if self.is_initiator:
            tx = (k["init_key"], k["init_salt"])
            rx = (k["resp_key"], k["resp_salt"])
        else:
            tx = (k["resp_key"], k["resp_salt"])
            rx = (k["init_key"], k["init_salt"])
        if self.on_secrets:
            self.on_secrets(tx[0], tx[1], rx[0], rx[1])
        if self.on_sas:
            self.on_sas(self.sas)


def is_zrtp(data: bytes) -> bool:
    return data.startswith(MAGIC)
