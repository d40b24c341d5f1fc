"""Jitter buffer vs the reference's REAL captured network pathologies
(tester/scenarios/*.pcapng), replayed in capture time — the reference's
jitterbuffer tester harness (mediastreamer2_jitterbuffer_tester.c:86-122):
basic vs RLS algorithms, loss/late/underrun counters as oracles."""
import os

import pytest

from mediastreamer2_tpu.net.jitter import JitterBuffer, JBParams, \
    replay_capture

SCEN = "/root/reference/tester/scenarios"
pytestmark = pytest.mark.skipif(not os.path.isdir(SCEN),
                                reason="reference scenarios not mounted")


def _run(fname, algo, max_depth=50):
    jb = JitterBuffer(JBParams(min_depth_ticks=2, nom_depth_ticks=4,
                               max_depth_ticks=max_depth, algorithm=algo,
                               refresh_ticks=250))
    return replay_capture(os.path.join(SCEN, fname), jb)


def test_534late_24loss_7000total():
    """The reference's hardest audio scenario: 142 s, bursty arrival, 24
    genuine losses, hundreds of late packets. RLS must adapt the depth and
    beat basic decisively (ref: outoftime 580-690 basic vs 190-240 rls)."""
    basic = _run("rtp-534late-24loss-7000total.pcapng", "basic")
    rls = _run("rtp-534late-24loss-7000total.pcapng", "rls")
    assert basic["recv"] == 7108 and rls["recv"] == 7108  # parity: packet_recv
    # RLS recovers every late packet: only the 24 real losses remain
    assert rls["lost"] == 24
    assert rls["late"] == 0
    # and conceals far fewer ticks than basic
    basic_missed = basic["underruns"] + basic["late"] + basic["lost"]
    rls_missed = rls["underruns"] + rls["late"] + rls["lost"]
    assert rls_missed * 3 < basic_missed, (basic, rls)
    # adapted depth grew beyond nominal to cover the late envelope
    assert rls["depth_target"] > 4


def test_120late_1000total():
    basic = _run("rtp-120late-1000total.pcapng", "basic")
    rls = _run("rtp-120late-1000total.pcapng", "rls")
    assert basic["recv"] == 904 and rls["recv"] == 904
    assert rls["lost"] == 0 and rls["late"] == 0
    assert rls["underruns"] < basic["underruns"]


def test_no_jitter_clean_capture():
    """pcmu_8k_no_jitter.pcap: clean 50 s capture -> essentially everything
    plays, nothing late (ref asserts outoftime <= 2, discarded == 0)."""
    for algo in ("basic", "rls"):
        r = _run("pcmu_8k_no_jitter.pcap", algo)
        assert r["recv"] == 2524          # parity: packet_recv == 2524
        assert r["late"] <= 2
        assert r["lost"] == 0
        assert r["played"] >= 2500


def test_opus_poor_quality_capture_through_jitter_and_decoder():
    """The adaptive tester's opus-poor-quality capture: RLS jitter buffer +
    libopus decode with PLC on every miss -> gapless audio out
    (ref asserts packet_recv == 4228 on this file)."""
    import numpy as np
    from mediastreamer2_tpu.ops import host_codecs as hc
    if not hc.opus_available():
        pytest.skip("libopus missing")
    from mediastreamer2_tpu.io.pcap import read_capture
    from mediastreamer2_tpu.net.rtp import RtpPacket

    pkts = []
    for cp in read_capture(os.path.join(SCEN, "opus-poor-quality.pcapng")):
        try:
            p = RtpPacket.unpack(cp.udp_payload)
        except ValueError:
            continue
        pkts.append((cp.ts, p))
    assert len(pkts) == 4228                 # parity: packet_recv

    jb = JitterBuffer(JBParams(min_depth_ticks=2, nom_depth_ticks=4,
                               max_depth_ticks=50, algorithm="rls",
                               refresh_ticks=250))
    dec = hc.OpusDecoder(rate=48000)
    frame = 960                              # 20 ms nominal at 48 kHz
    t = pkts[0][0]
    end = pkts[-1][0] + 0.2
    i = 0
    samples = 0
    peak = 0.0
    concealed = 0
    ticks = 0
    while t < end:
        while i < len(pkts) and pkts[i][0] <= t:
            jb.put(pkts[i][1], now=pkts[i][0])
            i += 1
        payload = jb.get_tick()
        if payload is None:
            pcm = dec.decode(None, frame)       # PLC fill (20 ms)
            concealed += 1
        else:
            # capture carries variable opus frame sizes: give decode room
            pcm = dec.decode(payload, 5760)
        samples += len(pcm)
        if len(pcm):
            peak = max(peak, float(np.abs(pcm).max()))
        ticks += 1
        t += 0.02
    # playout produced ~realtime audio for the whole capture
    assert samples >= ticks * frame * 0.9
    assert peak > 0.05
    # nearly every captured packet played (the rest of the ticks are the
    # capture's DTX silence gaps, concealed by opus PLC)
    played = ticks - concealed
    assert played >= 4000, (played, ticks)
    assert jb.lost + jb.late < 600              # envelope like the reference


def _synthetic_run(packets, algo, ticks_extra=40):
    """Drive the jitter buffer with synthetic (arrival_tick, seq, ts)
    triples; returns counters (the tester's synthetic half:
    ideal_network / ts_rollover / chaotic_start cases)."""
    from mediastreamer2_tpu.net.rtp import RtpPacket
    jb = JitterBuffer(JBParams(min_depth_ticks=2, nom_depth_ticks=4,
                               max_depth_ticks=50, algorithm=algo))
    by_tick = {}
    for tick, seq, ts in packets:
        by_tick.setdefault(tick, []).append((seq, ts))
    last = max(by_tick) + ticks_extra
    played = 0
    for tick in range(last):
        for seq, ts in by_tick.get(tick, ()):
            jb.put(RtpPacket(0, seq & 0xFFFF, ts & 0xFFFFFFFF, 1,
                             b"\x00" * 80), now=tick * 0.01)
        if jb.get_tick() is not None:
            played += 1
    return jb, played


@pytest.mark.parametrize("algo", ["basic", "rls"])
def test_ideal_network_with_ts_rollover(algo):
    """ideal_network_with_ts_rollover_{basic,rls}: timestamps wrap through
    2^32 mid-stream; counters must stay clean and playout continuous."""
    n = 400
    start_ts = (1 << 32) - 80 * (n // 2)      # wraps halfway
    packets = [(i, 7000 + i, start_ts + 80 * i) for i in range(n)]
    jb, played = _synthetic_run(packets, algo)
    assert jb.lost == 0
    assert jb.late == 0
    assert played >= n - 10                   # prebuffer only


@pytest.mark.parametrize("algo", ["basic", "rls"])
def test_ideal_network_with_seq_rollover(algo):
    """Sequence numbers wrap through 65535 (the same scenarios exercise
    both wraps)."""
    n = 300
    packets = [(i, 65_450 + i, 80 * i) for i in range(n)]
    jb, played = _synthetic_run(packets, algo)
    assert jb.lost == 0 and jb.late == 0
    assert played >= n - 10


@pytest.mark.parametrize("algo", ["basic", "rls"])
def test_chaotic_start(algo):
    """chaotic_start_{basic,rls}: the first packets arrive as one
    disordered burst (late join / ICE unfreeze), then the stream settles.
    The buffer must resync and play the steady tail without residue."""
    import random
    rng = random.Random(7)
    burst = [(rng.randrange(0, 3), 100 + i, 80 * i) for i in range(30)]
    steady = [(3 + i, 130 + i, 80 * (30 + i)) for i in range(300)]
    jb, played = _synthetic_run(burst + steady, algo)
    # everything after the chaos plays; at most the burst itself is spent
    # syncing (reference asserts the tail is clean)
    assert played >= 300 - 5
    assert jb.lost <= 30
