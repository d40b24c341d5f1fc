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
import threading

_lock = threading.RLock()
_enabled = False


def enable(on: bool = True) -> None:
    """Turn co-resident serialization on/off (process-wide)."""
    global _enabled
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
    with _lock if _enabled else contextlib.nullcontext():
        for i, v in enumerate(leaves):
            f = getattr(v, "copy_to_host_async", None)
            if f is None:
                out[i] = np.asarray(v)
            else:
                try:
                    f()
                    pend.append(i)
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
