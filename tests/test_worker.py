"""WorkerThread/Task (msasync parity), MTU discovery, echo-limiter wiring."""
import time

import numpy as np
import jax.numpy as jnp

from mediastreamer2_tpu.core.worker import WorkerThread, discover_mtu


def test_worker_runs_tasks():
    w = WorkerThread()
    t1 = w.add_task(lambda: 41 + 1)
    assert t1.wait(2.0)
    assert t1.result == 42
    t2 = w.add_task(lambda: 1 / 0)
    assert t2.wait(2.0)
    assert isinstance(t2.error, ZeroDivisionError)
    w.destroy()


def test_worker_repeated_and_cancel():
    w = WorkerThread()
    hits = []
    t = w.add_repeated_task(lambda: hits.append(1), interval_s=0.02)
    # wait on the COUNT, not wall time — a loaded single-core host can
    # starve the worker thread for hundreds of ms
    deadline = time.monotonic() + 5.0
    while len(hits) < 3 and time.monotonic() < deadline:
        time.sleep(0.02)
    t.cancel()
    n = len(hits)
    assert n >= 3
    time.sleep(0.08)
    assert len(hits) <= n + 1        # no further runs after cancel
    w.destroy()


def test_discover_mtu_loopback():
    mtu = discover_mtu("127.0.0.1")
    assert mtu >= 1500               # loopback MTU is large


def test_echo_limiter_wiring(factory):
    from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                        AudioStreamFeatures)
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    from mediastreamer2_tpu.core.block import tick_samples
    from conftest import make_speechlike
    S = tick_samples(8000)
    # remote talks loudly; local mic sends noise; echo limiter must duck
    sig = make_speechlike(S * 120, 8000, seed=3)
    remote = AudioStreamBatch(factory, 1, mic_signal=sig)
    feats = AudioStreamFeatures()
    local = AudioStreamBatch(factory, 1, features=feats, record_ticks=120)
    pair = LoopbackPair()
    remote.set_transport(0, pair.endpoint(0))
    local.set_transport(0, pair.endpoint(1))
    local.ticker.params["vol_send"]["ea_enabled"] = jnp.array([True])
    local.ticker.warm_up()
    remote.ticker.warm_up()
    local.ticker.realtime = remote.ticker.realtime = False
    for _ in range(100):
        remote.ticker.do_tick()
        local.ticker.do_tick()
    # peer (speaker) energy reached the send-side volume params
    pe = float(np.asarray(local.ticker.params["vol_send"]["peer_energy"])[0])
    assert pe > 1e-6
    # and the send gain was ducked toward ea_gain
    g = float(np.asarray(local.ticker.state["vol_send"]["gain"])[0])
    assert g < 0.5
