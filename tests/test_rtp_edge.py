"""Batched native RTP edge: sendmmsg tx -> localhost -> recvmmsg rx with
jitter-ring playout. Parity target: src/otherfilters/msrtp.c send/recv +
oRTP jitter buffering, done for N legs in three C calls per tick."""
import socket
import time

import numpy as np
import pytest

from mediastreamer2_tpu.native import (rtp_edge_available, BatchRtpTx,
                                       BatchRtpRx)

pytestmark = pytest.mark.skipif(not rtp_edge_available(),
                                reason="g++ build failed")

PSZ = 80  # G.711 8k / 10ms


def _mk_pair(n_legs, prefill=2, gso=False):
    tx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx_sock.bind(("127.0.0.1", 0))
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    rx_sock.setblocking(False)
    port = rx_sock.getsockname()[1]
    tx = BatchRtpTx(tx_sock, n_legs, PSZ)
    rx = BatchRtpRx(n_legs, PSZ, ring_depth=64)
    rx.add_socket(rx_sock, gro=gso)
    for i in range(n_legs):
        ssrc = 0x1000 + i
        tx.config(i, "127.0.0.1", port, ssrc, seq0=100 + i, ts0=0, pt=0)
        rx.map_ssrc(ssrc, i)
        rx.set_prefill(i, prefill)
    if gso:
        tx.enable_gso(("127.0.0.1", port))
    return tx, rx, tx_sock, rx_sock


def test_roundtrip_gso_gro():
    """UDP_SEGMENT / UDP_GRO fast path delivers identical semantics."""
    n = 200
    tx, rx, s1, s2 = _mk_pair(n, prefill=1, gso=True)
    sent = []
    for t in range(6):
        pay = np.random.randint(0, 255, (n, PSZ), np.uint8)
        sent.append(pay.copy())
        assert tx.send(pay, ts_inc=PSZ) == n
        time.sleep(0.003)
        rx.poll()
        out, flags = rx.read_tick()
        if t >= 1:
            assert flags.all()
            np.testing.assert_array_equal(out, sent[t - 1])
    s1.close(); s2.close(); tx.close(); rx.close()


def test_roundtrip_ordered():
    n = 32
    tx, rx, s1, s2 = _mk_pair(n, prefill=1)
    ticks = 20
    sent = []
    for t in range(ticks):
        pay = np.random.randint(0, 255, (n, PSZ), np.uint8)
        sent.append(pay.copy())
        assert tx.send(pay, ts_inc=PSZ) == n
        time.sleep(0.002)
        rx.poll()
        out, flags = rx.read_tick()
        if t >= 1:                       # prefill=1 -> one tick warmup
            assert flags.all(), f"tick {t} missing legs"
            np.testing.assert_array_equal(out, sent[t - 1])
    st = rx.stats(0)
    assert st["recv"] == ticks and st["got"] == ticks - 1
    s1.close(); s2.close(); tx.close(); rx.close()


def test_mask_skips_legs_and_keeps_clock():
    n = 4
    tx, rx, s1, s2 = _mk_pair(n, prefill=1)
    mask = np.array([1, 0, 1, 0], np.uint8)
    for _ in range(5):
        assert tx.send(np.zeros((n, PSZ), np.uint8), ts_inc=PSZ,
                       mask=mask) == 2
    time.sleep(0.005)
    rx.poll()
    assert rx.stats(0)["recv"] == 5 and rx.stats(1)["recv"] == 0
    s1.close(); s2.close(); tx.close(); rx.close()


def test_reorder_within_ring_recovers():
    """Out-of-order arrival inside the ring depth plays out in order."""
    n = 1
    tx, rx, s1, s2 = _mk_pair(n, prefill=3)
    # craft 6 packets, deliver 0,2,1,3,4,5 by sending via raw socket
    port = s2.getsockname()[1]
    raw = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    pkts = []
    for seq in range(6):
        hdr = bytes([0x80, 0, (200 + seq) >> 8, (200 + seq) & 0xFF]) + \
            (seq * PSZ).to_bytes(4, "big") + (0x1000).to_bytes(4, "big")
        pkts.append(hdr + bytes([seq]) * PSZ)
    order = [0, 2, 1, 3, 4, 5]
    for i in order:
        raw.sendto(pkts[i], ("127.0.0.1", port))
    time.sleep(0.01)
    rx.poll()
    got = []
    for _ in range(3 + 6):
        out, flags = rx.read_tick()
        if flags[0]:
            got.append(out[0, 0])
    assert got == [0, 1, 2, 3, 4, 5]
    assert rx.stats(0)["lost"] == 0
    raw.close(); s1.close(); s2.close(); tx.close(); rx.close()


def test_loss_flags_missing():
    n = 2
    tx, rx, s1, s2 = _mk_pair(n, prefill=1)
    port = s2.getsockname()[1]
    raw = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def pkt(ssrc, seq, fill):
        hdr = bytes([0x80, 0, seq >> 8, seq & 0xFF]) + \
            (seq * PSZ).to_bytes(4, "big") + ssrc.to_bytes(4, "big")
        return hdr + bytes([fill]) * PSZ

    for seq in (10, 11, 13):             # 12 lost
        raw.sendto(pkt(0x1000, seq, seq & 0xFF), ("127.0.0.1", port))
    time.sleep(0.01)
    rx.poll()
    rx.read_tick()                        # warmup tick
    flags_seen = []
    for _ in range(4):
        out, flags = rx.read_tick()
        flags_seen.append(int(flags[0]))
    # 10 ok, 11 ok, 12 missing -> PLC flag, 13 ok
    assert flags_seen == [1, 1, 0, 1]
    raw.close(); s1.close(); s2.close(); tx.close(); rx.close()


def test_host_edge_throughput():
    """The point of the native edge: a full tick of tx+rx for 2048 legs in
    well under the 10 ms budget on one core."""
    n = 2048
    tx, rx, s1, s2 = _mk_pair(n, prefill=1, gso=True)
    import resource
    # bump socket buffers so a tick's burst fits
    for s in (s1, s2):
        try:
            s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1 << 22)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 1 << 22)
        except OSError:
            pass
    pay = np.random.randint(0, 255, (n, PSZ), np.uint8)
    # warm
    tx.send(pay, ts_inc=PSZ); time.sleep(0.005); rx.poll(); rx.read_tick()
    t0 = time.perf_counter()
    ticks = 20
    for _ in range(ticks):
        tx.send(pay, ts_inc=PSZ)
        rx.poll()
        rx.read_tick()
    dt_ms = (time.perf_counter() - t0) / ticks * 1e3
    st = rx.stats(0)
    assert st["recv"] >= ticks // 2       # most packets actually moved
    assert dt_ms < 8.0, f"host edge tick took {dt_ms:.2f} ms at {n} legs"
    s1.close(); s2.close(); tx.close(); rx.close()


def test_audio_stream_batch_edge(factory):
    """AudioStreamBatch over the native batched edge: two 8-leg streams on
    one real UDP socket pair (BUNDLE-style SSRC mux), whole-batch pull/
    push — the production fast path at scale."""
    import jax
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    from mediastreamer2_tpu.core.block import tick_samples
    from conftest import make_speechlike

    B, ticks = 8, 100
    S = tick_samples(8000)
    sig = make_speechlike(S * ticks, 8000, seed=9)
    a_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    a_sock.bind(("127.0.0.1", 0))
    b_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    b_sock.bind(("127.0.0.1", 0))
    b_sock.setblocking(False)
    a_sock.setblocking(False)

    tx = AudioStreamBatch(factory, B, mic_signal=sig)
    rx = AudioStreamBatch(factory, B, record_ticks=ticks + 40)
    tx.enable_batch_edge(rx_sock=a_sock, tx_sock=a_sock,
                         remote=b_sock.getsockname())
    rx.enable_batch_edge(rx_sock=b_sock, tx_sock=b_sock,
                         remote=a_sock.getsockname())
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    import time as _time
    for _ in range(ticks + 20):
        tx.ticker.do_tick()
        _time.sleep(0.0005)
        rx.ticker.do_tick()
    rec = rx.get_recording()
    sims = [audio_diff(sig, rec[i])[0] for i in range(B)]
    assert min(sims) > 0.9, sims
    st = rx._edge_rx.stats(0)
    assert st["recv"] >= ticks
    a_sock.close(); b_sock.close()


def test_batch_edge_dtx_mask(factory):
    """VAD/DTX gates the batched sender: silent legs skip packets (the
    send mask) while the RTP clock keeps running underneath."""
    from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                        AudioStreamFeatures)
    from mediastreamer2_tpu.core.block import tick_samples
    from conftest import make_speechlike
    B, ticks = 2, 120
    S = tick_samples(8000)
    # leg signal: speech then silence (file_player shares the signal;
    # both legs go quiet together)
    sig = make_speechlike(S * ticks, 8000, seed=71)
    sig[50 * S:] = 0.0
    a_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    a_sock.bind(("127.0.0.1", 0)); a_sock.setblocking(False)
    b_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    b_sock.bind(("127.0.0.1", 0)); b_sock.setblocking(False)
    tx = AudioStreamBatch(factory, B, mic_signal=sig,
                          features=AudioStreamFeatures(vad_dtx=True))
    rx = AudioStreamBatch(factory, B)
    tx.enable_batch_edge(rx_sock=a_sock, tx_sock=a_sock,
                         remote=b_sock.getsockname())
    rx.enable_batch_edge(rx_sock=b_sock, tx_sock=b_sock,
                         remote=a_sock.getsockname())
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    import time as _time
    for _ in range(ticks):
        tx.ticker.do_tick()
        _time.sleep(0.0003)
        rx.ticker.do_tick()
    st = rx._edge_rx.stats(0)
    # packets flowed during speech, stopped during silence
    assert 40 <= st["recv"] <= 90, st
    a_sock.close(); b_sock.close()


def test_batch_edge_adaptive_prefill():
    """BatchEdgeJitterController: delivery stalls deeper than the playout
    cushion grow the prefill; sustained clean intervals shrink it back —
    oRTP's adaptive jitter buffer for native batch legs, applied as
    value-reconfig (rx.set_prefill) only."""
    from mediastreamer2_tpu.net.jitter import BatchEdgeJitterController
    n = 2
    tx, rx, s1, s2 = _mk_pair(n, prefill=2)
    ctrl = BatchEdgeJitterController(rx, n, min_prefill=1, max_prefill=12,
                                     shrink_after=4)
    pay = np.zeros((n, PSZ), np.uint8)

    def clean_ticks(k, control_every=10):
        for t in range(k):
            tx.send(pay, ts_inc=PSZ)
            time.sleep(0.0005)
            rx.poll()
            rx.read_tick()
            if t % control_every == control_every - 1:
                ctrl.control()

    def stall_cycle():
        """Withhold 4 sends while reads continue (starves any cushion
        shallower than 4), then deliver the burst."""
        for _ in range(4):
            rx.poll()
            rx.read_tick()
        for _ in range(4):
            tx.send(pay, ts_inc=PSZ)
        time.sleep(0.002)
        rx.poll()
        rx.read_tick()
        ctrl.control()

    clean_ticks(20)
    base = max(ctrl.prefill)
    for _ in range(6):
        stall_cycle()
        clean_ticks(10, control_every=100)   # re-prime between stalls
    grown = max(ctrl.prefill)
    assert grown > base, (base, grown)       # depth adapted UP under stalls
    for _ in range(10):                      # long clean run shrinks back
        clean_ticks(10)
    assert max(ctrl.prefill) < grown         # depth recovered DOWN
    s1.close(); s2.close(); tx.close(); rx.close()
