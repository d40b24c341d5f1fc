"""Forward error correction — XOR repair packets (FlexFEC-style).

Reference: oRTP's FlexFEC ``FecStream`` (RFC 8627) managed by
``media_stream_create_or_update_fec_session`` (src/voip/mediastream.c:
1229-1268).  Round-1 scope: the row-FEC core — every L media packets emit
one repair packet that XORs their payloads (+ the length/timestamp fields),
letting the receiver reconstruct any single loss per row.  The repair
stream rides its own SSRC/payload type like FlexFEC; interleaved column FEC
slots into the same structure later.
"""
from __future__ import annotations

import struct
from typing import Dict, Optional

from mediastreamer2_tpu.net.rtp import RtpPacket

FEC_PT = 115


def _xor_bytes(a: bytes, b: bytes) -> bytes:
    if len(a) < len(b):
        a, b = b, a
    return bytes(x ^ y for x, y in zip(a, b + b"\x00" * (len(a) - len(b))))


class FecEncoder:
    """Every L protected packets -> one repair packet."""

    def __init__(self, L: int = 5, ssrc: int = 0xFEC0FEC0):
        self.L = L
        self.ssrc = ssrc
        self.repair_seq = 0
        self._acc: Optional[bytes] = None
        self._base_seq: Optional[int] = None
        self._count = 0
        self._ts_xor = 0

    def push(self, pkt: RtpPacket) -> Optional[RtpPacket]:
        """Feed a media packet; returns a repair packet when a row closes."""
        payload_with_len = struct.pack("!H", len(pkt.payload)) + pkt.payload
        if self._acc is None:
            self._acc = payload_with_len
            self._base_seq = pkt.seq
            self._ts_xor = pkt.timestamp
            self._count = 1
        else:
            self._acc = _xor_bytes(self._acc, payload_with_len)
            self._ts_xor ^= pkt.timestamp
            self._count += 1
        if self._count < self.L:
            return None
        hdr = struct.pack("!HHI", self._base_seq, self.L, self._ts_xor)
        repair = RtpPacket(FEC_PT, self.repair_seq, 0, self.ssrc,
                           hdr + self._acc)
        self.repair_seq = (self.repair_seq + 1) & 0xFFFF
        self._acc = None
        return repair


class FecDecoder:
    """Buffers media + repair packets; recovers single losses per row."""

    def __init__(self, history: int = 128):
        self.media: Dict[int, RtpPacket] = {}
        self.history = history
        self.recovered = 0
        self.unrecoverable = 0

    def push_media(self, pkt: RtpPacket):
        self.media[pkt.seq] = pkt
        if len(self.media) > self.history:
            for s in sorted(self.media)[: len(self.media) - self.history]:
                del self.media[s]

    def push_repair(self, repair: RtpPacket) -> Optional[RtpPacket]:
        """Returns the reconstructed media packet if exactly one of the
        row's packets is missing."""
        base_seq, L, ts_xor = struct.unpack("!HHI", repair.payload[:8])
        acc = repair.payload[8:]
        missing = []
        for k in range(L):
            seq = (base_seq + k) & 0xFFFF
            pkt = self.media.get(seq)
            if pkt is None:
                missing.append(seq)
            else:
                acc = _xor_bytes(acc,
                                 struct.pack("!H", len(pkt.payload)) + pkt.payload)
                ts_xor ^= pkt.timestamp
        if not missing:
            return None
        if len(missing) > 1:
            self.unrecoverable += 1
            return None
        ln = struct.unpack("!H", acc[:2])[0]
        if ln > len(acc) - 2:
            self.unrecoverable += 1
            return None
        rec = RtpPacket(payload_type=0, seq=missing[0], timestamp=ts_xor,
                        ssrc=0, payload=acc[2:2 + ln])
        self.recovered += 1
        self.media[rec.seq] = rec
        return rec
