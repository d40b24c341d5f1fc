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
