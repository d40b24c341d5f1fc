"""Tunnel head-of-line-blocking probe.

Measures the latency of a tiny jit dispatch (the opus class's per-tick
device call) while a flagship-block-sized readback is in flight on
another thread — the exact overlap the mixed fleet creates every 160 ms.
If the tunnel serializes commands, small dispatches stall for the
remaining transfer time and show up as the opus class's duration-late
ticks (fleet probe r5f: dispatch_max 15.7 ms vs 0.64 ms mean).

Also measures asarray cost on an ALREADY-LANDED value (is_ready()-true)
to decide whether copy_to_host_async caches the literal (if not, every
block read pays the transfer twice).
"""
import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    lock = bench._acquire_device_lock(600)
    if lock is None:
        print(json.dumps({"ok": False, "error": "device lock held"}))
        return
    import jax
    import numpy as np

    out = {}

    # --- small dispatch baseline (no competing traffic)
    small = jax.device_put(np.random.rand(8, 480).astype(np.float32))

    @jax.jit
    def mix(x):
        s = x.sum(axis=0, keepdims=True)
        return x + (s - x) * 0.125

    mix(small)                                   # compile
    lats = []
    for _ in range(50):
        t0 = time.perf_counter()
        mix(small)
        lats.append((time.perf_counter() - t0) * 1e3)
    out["dispatch_idle_ms"] = {"p50": round(statistics.median(lats), 2),
                               "max": round(max(lats), 2)}

    # --- big readback machinery (flagship-block-sized, ~758 KB u8)
    big_in = jax.device_put(np.full((32, 296, 80), 0x7F, np.uint8))

    @jax.jit
    def passthrough(x):
        return x ^ 1

    passthrough(big_in)

    def one_read():
        y = passthrough(big_in)
        f = getattr(y, "copy_to_host_async", None)
        if f:
            f()
        np.asarray(y)
        return y

    t0 = time.perf_counter()
    one_read()
    out["block_read_ms"] = round((time.perf_counter() - t0) * 1e3, 2)

    # --- asarray on a landed value (second asarray of the same array)
    y = passthrough(big_in)
    np.asarray(y)                                # first: pays the transfer
    t0 = time.perf_counter()
    np.asarray(y)                                # second: cached?
    out["asarray_landed_ms"] = round((time.perf_counter() - t0) * 1e3, 2)

    # --- dispatch latency DURING a big read on another thread
    stop = threading.Event()
    windows = []

    def reader():
        while not stop.is_set():
            t0 = time.perf_counter()
            one_read()
            windows.append((t0, time.perf_counter()))

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    time.sleep(0.05)
    contested = []
    for _ in range(200):
        t0 = time.perf_counter()
        mix(small)
        contested.append((time.perf_counter() - t0) * 1e3)
        time.sleep(0.005)
    stop.set()
    th.join()
    contested.sort()
    out["dispatch_during_reads_ms"] = {
        "p50": round(contested[len(contested) // 2], 2),
        "p90": round(contested[int(len(contested) * 0.9)], 2),
        "max": round(contested[-1], 2),
        "n_reads_overlapped": len(windows),
    }
    print(json.dumps({"ok": True, **out}, indent=1), flush=True)


if __name__ == "__main__":
    main()
