"""Co-resident device-dispatch serialization (core/devlock.py): the lock
must serialize held() blocks across threads when enabled, stay reentrant
(Ticker._publish can nest inside do_tick paths), and cost nothing when
disabled. CPU-only; the real-chip behavior it guards (concurrent dispatch
wedging the tunnel client) is exercised by the mixed-fleet bench."""
import threading
import time

from mediastreamer2_tpu.core import devlock


def _reset():
    devlock.enable(False)


def test_disabled_is_passthrough():
    _reset()
    assert not devlock.enabled()
    with devlock.held():
        pass  # no lock taken; nothing to assert beyond "does not block"


def test_enabled_serializes_across_threads():
    _reset()
    devlock.enable(True)
    try:
        active = []
        overlap = []

        def worker():
            for _ in range(25):
                with devlock.held():
                    active.append(1)
                    if len(active) > 1:
                        overlap.append(1)
                    time.sleep(0.0005)
                    active.pop()

        threads = [threading.Thread(target=worker) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not overlap, "two threads were inside held() concurrently"
    finally:
        devlock.enable(False)


def test_reentrant_within_one_thread():
    _reset()
    devlock.enable(True)
    try:
        with devlock.held():
            with devlock.held():     # Ticker.do_tick -> _publish nesting
                assert devlock.enabled()
    finally:
        devlock.enable(False)


def test_disable_releases_waiters_semantics():
    """enable(False) while another thread is INSIDE held() must not break
    the exiting thread (the flag only gates future entries)."""
    _reset()
    devlock.enable(True)
    entered = threading.Event()
    release = threading.Event()
    done = threading.Event()

    def holder():
        with devlock.held():
            entered.set()
            release.wait(timeout=5)
        done.set()

    th = threading.Thread(target=holder)
    th.start()
    assert entered.wait(timeout=5)
    devlock.enable(False)       # flipped mid-hold
    release.set()
    assert done.wait(timeout=5)
    th.join(timeout=5)
    assert not th.is_alive()
