"""Bandwidth controller against the reference's REAL congestion capture
(tester/scenarios/opus-edge-congestion20_60_40.pcapng — a call crossing
20/60/40 kbit/s bandwidth phases; the adaptive tester's fixture).  The
controller must detect the congested phase and emit a reduced TMMBR
target (bandwidthcontroller.c parity)."""
import os

import numpy as np
import pytest

from mediastreamer2_tpu.io.pcap import read_capture
from mediastreamer2_tpu.net.rtp import RtpPacket
from mediastreamer2_tpu.net.jitter import JitterBuffer, JBParams
from mediastreamer2_tpu.models.qos import BandwidthController

SCEN = "/root/reference/tester/scenarios/opus-edge-congestion20_60_40.pcapng"
pytestmark = pytest.mark.skipif(not os.path.exists(SCEN),
                                reason="reference scenarios not mounted")


def test_congestion_detected_on_real_capture():
    pkts = []
    for cp in read_capture(SCEN):
        try:
            p = RtpPacket.unpack(cp.udp_payload)
        except ValueError:
            continue
        pkts.append((cp.ts, p))
    assert len(pkts) > 500
    t0 = pkts[0][0]

    feedback = []
    bc = BandwidthController(emit_feedback=feedback.append)
    jb = JitterBuffer(JBParams(algorithm="rls"))

    # walk the capture in 1 s intervals, feeding interval stats like
    # media_stream_iterate does from RTP session counters; congestion in
    # this capture is buffering (delay ramp + rate dip), not loss
    interval = 1.0
    edge = t0 + interval
    got_bytes = 0
    last_seq = None
    lost = recv = 0
    transits = []
    prev_transit = None
    congested_intervals = 0
    for ts, p in pkts:
        jb.put(p, now=ts)
        got_bytes += len(p.payload)
        recv += 1
        transits.append(ts - p.timestamp / 48000.0)
        if last_seq is not None:
            gap = (p.seq - last_seq) & 0xFFFF
            if 1 < gap < 0x8000:
                lost += gap - 1
        last_seq = p.seq
        if ts >= edge:
            mean_transit = sum(transits) / max(len(transits), 1)
            jitter_rising = (prev_transit is not None
                             and mean_transit - prev_transit > 0.02)
            prev_transit = mean_transit
            transits = []
            loss_rate = lost / max(recv + lost, 1)
            bc.on_interval(got_bytes, interval,
                           jitter_rising=jitter_rising, loss_rate=loss_rate)
            if bc.congested:
                congested_intervals += 1
            got_bytes = 0
            lost = recv = 0
            edge += interval
    # the 20 kbit/s phase starves the stream -> losses -> congestion
    assert congested_intervals >= 1, feedback
    assert feedback, "controller never emitted a TMMBR/REMB target"
    # at least one emitted target was a *reduction* (below the estimate)
    assert min(feedback) < bc.est_bps
