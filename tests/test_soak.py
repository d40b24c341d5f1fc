"""Long-run soak: thousands of ticks with features toggling — guards
unbounded growth (replay windows, event queues, jitter maps, FEC pending)
and state sanity over time (the reference gets this from long CI calls)."""
import numpy as np
import pytest

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                    AudioStreamFeatures)
from mediastreamer2_tpu.net.rtp import LoopbackPair
from conftest import make_speechlike

S = tick_samples(8000)


@pytest.mark.slow
def test_soak_2000_ticks_features_toggling(factory):
    ticks = 2000
    sig = make_speechlike(S * 200, 8000, seed=55)
    sig = np.tile(sig, 10)[: S * ticks]
    ft = AudioStreamFeatures(vad_dtx=True, dtmf=True, local_play=True)
    tx = AudioStreamBatch(factory, 2, mic_signal=sig, features=ft)
    rx = AudioStreamBatch(factory, 2, features=ft)
    pair0, pair1 = LoopbackPair(), LoopbackPair()
    tx.set_transport(0, pair0.endpoint(0))
    rx.set_transport(0, pair0.endpoint(1))
    tx.set_transport(1, pair1.endpoint(0))
    rx.set_transport(1, pair1.endpoint(1))
    tx.enable_srtp(0, b"k" * 16, b"s" * 14, b"k" * 16, b"s" * 14)
    rx.enable_srtp(0, b"k" * 16, b"s" * 14, b"k" * 16, b"s" * 14)
    tx.enable_rtcp(interval_s=1.0)
    rx.enable_rtcp(interval_s=1.0)
    rx.enable_dtmf_receive(0)
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for t in range(ticks):
        if t % 500 == 100:
            tx.send_dtmf(0, "5", duration_ms=40)
        if t % 700 == 300:
            tx.play_announcement(
                0.2 * np.sin(np.arange(S * 10) / 5).astype(np.float32),
                legs=[0])
        tx.ticker.do_tick()
        rx.ticker.do_tick()
        if t % 100 == 0:
            tx.iterate()
            rx.iterate()
    # bounded state everywhere
    sess = rx.sessions[0]
    srtp = sess.transport
    assert len(srtp.rx.replay.get(sess.recv_ssrc or 0, ())) <= 1100
    if srtp.rx_rtcp is not None:
        assert len(srtp.rx_rtcp.replay) <= 1100
    assert len(rx.ticker.event_queue._q if hasattr(
        rx.ticker.event_queue, "_q") else []) <= 1024
    # jitter buffers drained, no runaway dicts
    assert len(sess.jitter_buffer.buf) < 64
    # digits arrived exactly once each
    assert rx.dtmf_received.count((0, "5")) == len(rx.dtmf_received)
    assert len(rx.dtmf_received) >= 3
    # streams stayed alive the whole time
    assert sess.alive(timeout_s=5.0)


@pytest.mark.slow
def test_soak_encrypted_conference_long_run(factory):
    """Long-run stability of the encrypted batch-edge conference: 3,000
    ticks (30 s of media) of SRTP-protected self-looped legs — no auth
    failures, no counter drift, no ring leaks, fidelity intact at the end
    (the deployment loop run long enough to catch slow leaks/drift)."""
    import socket
    import numpy as np
    from mediastreamer2_tpu.core.factory import Factory
    from mediastreamer2_tpu.models.e2e_bench import E2EConferenceBench
    b = E2EConferenceBench(Factory(), 16, k_block=10, pipeline_depth=2,
                           srtp=True)
    try:
        res = b.run(n_blocks=300, paced=False)       # 3,000 ticks
        assert res.auth_failures == 0
        assert res.loss_rate < 0.01, res.loss_rate
        assert res.fidelity >= 0.95, res.fidelity
        # per-leg counters stayed sane over the whole run
        for i in range(16):
            st = b.rx.stats(i)
            assert st["late"] <= st["recv"] * 0.02, (i, st)
    finally:
        b.close()
