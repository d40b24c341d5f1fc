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


def test_read_all_values_and_tree_shape():
    """read_all returns host numpy values for a mixed tree (jax arrays,
    numpy arrays, None) with the tree structure preserved."""
    import jax
    import numpy as np
    _reset()
    devlock.enable(True)
    try:
        tree = ({"a": jax.numpy.arange(4.0), "b": np.ones(3)}, None)
        (out, none_part) = devlock.read_all(tree)
        assert none_part is None
        assert np.allclose(out["a"], [0, 1, 2, 3])
        assert np.allclose(out["b"], 1.0)
        assert isinstance(out["a"], np.ndarray)
    finally:
        _reset()


def test_read_all_issues_under_lock_waits_outside():
    """The async-copy ISSUE runs while the devlock is held; the wait
    (np.asarray) runs after the lock is released."""
    import numpy as np
    _reset()
    devlock.enable(True)
    seen = {}

    class FakeDeviceVal:
        def copy_to_host_async(self):
            # RLock._is_owned: true only while read_all holds the lock
            seen["issue_locked"] = devlock._lock._is_owned()

        def __array__(self, dtype=None, copy=None):
            seen["wait_locked"] = devlock._lock._is_owned()
            return np.zeros(2, np.float32)

    try:
        out = devlock.read_all([FakeDeviceVal()])
        assert seen == {"issue_locked": True, "wait_locked": False}
        assert np.allclose(out[0], 0.0)
    finally:
        _reset()


def test_read_all_async_copy_failure_falls_back_to_locked_read():
    import numpy as np
    _reset()
    devlock.enable(True)
    seen = {}

    class Stubborn:
        def copy_to_host_async(self):
            raise RuntimeError("unsupported")

        def __array__(self, dtype=None, copy=None):
            seen["read_locked"] = devlock._lock._is_owned()
            return np.ones(2, np.float32)

    try:
        out = devlock.read_all([Stubborn()])
        assert seen == {"read_locked": True}   # conservative: wait locked
        assert np.allclose(out[0], 1.0)
    finally:
        _reset()
