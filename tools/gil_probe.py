"""GIL-hold attribution for the tunnel client's hot calls.

A 1 ms-sleep heartbeat thread measures its max wakeup gap while the main
thread exercises each device-path call the fleet uses:

  * device_put of a flagship-sized block upload (~655 KB)
  * jit dispatch of the flagship step
  * np.asarray readback of a packed block (~3 MB) after copy_to_host_async
  * the same readback with an is_ready() poll loop before asarray

If a call holds the GIL while blocking on the tunnel, the heartbeat gap
~= the call's duration; if it releases, the gap stays ~1-3 ms.  This
names the process-wide stall source behind mixed-fleet late-tick
clusters (opus pull_max 33 ms, loop tick max 75 ms with GC already off).
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class Heartbeat:
    def __init__(self):
        self.max_gap_ms = 0.0
        self._stop = threading.Event()
        self._th = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        last = time.perf_counter()
        while not self._stop.is_set():
            time.sleep(0.001)
            now = time.perf_counter()
            self.max_gap_ms = max(self.max_gap_ms, (now - last) * 1e3)
            last = now

    def __enter__(self):
        self._th.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._th.join()


def measure(name, fn, reps=8):
    # warm once outside the heartbeat
    fn()
    with Heartbeat() as hb:
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps * 1e3
    return {"op": name, "ms_per_call": round(dt, 2),
            "heartbeat_max_gap_ms": round(hb.max_gap_ms, 2)}


def main():
    import bench
    lock = bench._acquire_device_lock(600)
    if lock is None:
        print(json.dumps({"ok": False, "error": "device lock held"}))
        return
    import jax
    import numpy as np

    out = []
    up = np.full((32, 256, 80), 0x7F, np.uint8)          # flagship block
    out.append(measure("device_put_655KB", lambda: jax.device_put(up)))

    big = np.random.rand(32, 296, 80).astype(np.float32)  # ~3 MB packed

    @jax.jit
    def step(x):
        return x * 1.000001 + 0.5

    xdev = jax.device_put(big)
    out.append(measure("jit_dispatch_3MB", lambda: step(xdev)))

    def read_cold():
        y = step(xdev)                      # fresh value each call
        f = getattr(y, "copy_to_host_async", None)
        if f:
            f()
        np.asarray(y)
    out.append(measure("asarray_3MB_after_async_issue", read_cold))

    def read_polled():
        y = step(xdev)
        f = getattr(y, "copy_to_host_async", None)
        if f:
            f()
        r = getattr(y, "is_ready", None)
        if r:
            while not r():
                time.sleep(0.0005)
        np.asarray(y)
    out.append(measure("asarray_3MB_with_is_ready_poll", read_polled))

    def is_ready_cost():
        xdev.is_ready()
    if hasattr(xdev, "is_ready"):
        out.append(measure("is_ready_on_landed", is_ready_cost, reps=50))

    print(json.dumps({"ok": True, "results": out}, indent=1), flush=True)


if __name__ == "__main__":
    main()
