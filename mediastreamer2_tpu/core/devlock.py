"""Process-wide device-dispatch serialization for co-resident workloads.

Observed on the tunnel-attached chip (round 4): a 4-member mixed fleet —
8+ host threads concurrently issuing dispatches and readbacks through the
experimental axon client — wedged the device (all member ops blocked
forever; single-member runs with two worker threads are routinely fine).
Until concurrent dispatch over that client is proven safe, co-resident
benches serialize every device touch (dispatch, device_put, readback)
under ONE process-wide lock. Pipelining between members survives: the
lock is held for the dispatch/transfer, not for the device compute.

Off by default — a single bench keeps its two-worker overlap, and a
PCIe-attached deployment never needs this. `MixedFleetBench` turns it on
for the duration of a co-resident run.

cf. the reference's equivalent discipline: one ticker thread per stream
but ONE lock inside each filter graph boundary (msticker.c:448 +
ms_filter_process locking).
"""
from __future__ import annotations

import contextlib
import os
import threading
import time

_lock = threading.RLock()
_enabled = False
_unlocked_wait_ok = None     # None = not probed yet (see _probe below)


def _probe_unlocked_wait() -> bool:
    """Decide whether read_all may WAIT outside the lock (ADVICE r4
    medium): jax's ArrayImpl._value makes a synchronous client call, and
    if the client did NOT cache the host literal from the earlier
    copy_to_host_async, concurrent waiting threads issue concurrent
    commands — exactly the wedge the lock exists to prevent.

    Probe (once, at enable() time, before any member thread exists): time
    a cold blocking readback to get the round-trip scale, then an
    async-issued-then-waited readback.  If the post-issue asarray is far
    below round-trip cost the literal was cached and the wait is
    command-free in practice; otherwise fall back to fully-locked reads.
    MS2TPU_DEVLOCK_UNLOCKED_WAIT=0/1 overrides the probe."""
    env = os.environ.get("MS2TPU_DEVLOCK_UNLOCKED_WAIT", "")
    if env:
        return env != "0"
    try:
        import jax
        import numpy as np
        cold = jax.device_put(np.ones(1024, np.float32))
        t0 = time.perf_counter()
        np.asarray(cold)
        rtt = time.perf_counter() - t0
        x = jax.device_put(np.ones(1024, np.float32))
        f = getattr(x, "copy_to_host_async", None)
        if f is None:
            return False
        f()
        time.sleep(min(0.5, rtt * 3 + 0.02))   # let the async copy land
        t0 = time.perf_counter()
        np.asarray(x)
        wait = time.perf_counter() - t0
        return wait < max(0.25 * rtt, 0.002)
    except Exception:                          # unknown client: be safe
        return False


def enable(on: bool = True) -> None:
    """Turn co-resident serialization on/off (process-wide)."""
    global _enabled, _unlocked_wait_ok
    if on and _unlocked_wait_ok is None:
        _unlocked_wait_ok = _probe_unlocked_wait()
    _enabled = on


def enabled() -> bool:
    return _enabled


@contextlib.contextmanager
def held():
    """Run the block under the device lock iff serialization is enabled."""
    if _enabled:
        with _lock:
            yield
    else:
        yield


def read_all(tree):
    """Device->host readback that holds the lock only while ISSUING.

    Holding the lock across a blocking ``np.asarray`` serializes the whole
    dispatch->compute->download wait (measured ~50-110 ms per block over
    the tunnel), starving every co-resident member on a 10 ms cadence —
    the r4 fleet probe's opus class was late on 273/500 ticks for exactly
    this.  The hazard the lock exists for is concurrent *issuance* of
    client commands; concurrent *waiting* on already-issued transfers is
    the same overlap single-member benches run unlocked all day.  So:
    issue ``copy_to_host_async`` under the lock (measured ~0.15 ms), wait
    outside it.  Values without the method (host numpy, or a client that
    rejects async copies) are read under the lock — the conservative
    pre-fix behavior."""
    import jax
    import numpy as np
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = [None] * len(leaves)
    pend = []
    # the enable()-time probe decides whether the post-issue wait is safe
    # outside the lock on this client (see _probe_unlocked_wait)
    unlocked_wait = bool(_unlocked_wait_ok) or not _enabled
    with _lock if _enabled else contextlib.nullcontext():
        for i, v in enumerate(leaves):
            f = getattr(v, "copy_to_host_async", None)
            if f is None:
                out[i] = np.asarray(v)
            else:
                try:
                    f()
                    if unlocked_wait:
                        pend.append(i)
                    else:              # conservative: wait under the lock
                        out[i] = np.asarray(v)
                except Exception:          # unsupported: blocking fallback
                    out[i] = np.asarray(v)
    for i in pend:                         # wait OUTSIDE the lock
        out[i] = np.asarray(leaves[i])
    return jax.tree_util.tree_unflatten(treedef, out)


def issue_copies(tree) -> None:
    """Start device->host copies for every leaf that supports it (no wait).

    Calling this at pipeline-pop time makes a single-worker publish queue
    bandwidth-bound instead of RTT-bound: without it the worker issues
    tick N's copy only when it reaches that item, so each publish costs a
    full round-trip (~26 ms over the tunnel) and a 10 ms-cadence member's
    publish backlog grows without bound (fleet probe: opus delivery 0.69).
    Issuing is idempotent — read_all on the same values later just waits."""
    import jax
    with _lock if _enabled else contextlib.nullcontext():
        for v in jax.tree_util.tree_leaves(tree):
            f = getattr(v, "copy_to_host_async", None)
            if f is not None:
                try:
                    f()
                except Exception:
                    pass
