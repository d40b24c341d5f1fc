"""Benchmark: concurrent 48 kHz AEC+resample+mix legs per chip at the 10 ms
real-time deadline (BASELINE.md north-star; the reference analogue is
tools/bench.c — add legs until the ticker misses its deadline).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "legs", "vs_baseline": N/1000}

Methodology notes (tunnel-aware):
* The driver runs this over a TPU relay where dispatch round-trip is ~25 ms
  and `block_until_ready` does not actually block, so timing forces a
  **scalar checksum readback** and subtracts the independently measured
  null-op RTT; K ticks are fused per device call (lax.scan) to amortize.
* Inputs are synthesized on device (rolled noise) so no K-sized host
  buffers inflate HBM; the only transfer per call is one float32.
* A batch passes if net compute per tick <= 10 ms * SAFETY.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

DEADLINE_MS = 10.0
SAFETY = 0.9            # require 10% headroom under the deadline
K_TICKS = 50            # ticks fused per device call
TARGET_BASELINE = 1000.0  # BASELINE.md: >=1000 legs/chip
MAX_BATCH = 1 << 20


def _rtt_ms():
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda a: a.sum())
    x = jnp.ones((8, 8), jnp.float32)
    float(f(x))
    vals = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(f(x))
        vals.append((time.perf_counter() - t0) * 1e3)
    return min(vals)


def measure_batch(batch: int, rtt_ms: float, repeats: int = 3):
    """Net ms of device compute per tick at `batch` legs (None = infeasible)."""
    import jax
    import jax.numpy as jnp
    from mediastreamer2_tpu.core.block import tick_samples
    from mediastreamer2_tpu.core.factory import Factory
    from mediastreamer2_tpu.models.flagship import build_flagship

    S = tick_samples(48000)
    factory = Factory()
    try:
        cg, params = build_flagship(factory, batch=batch)
        state = cg.init_state()
        key = jax.random.key(0)
        mic0 = 0.1 * jax.random.normal(key, (batch, S), jnp.float32)

        def body(st, t):
            ext = {"mic": jnp.roll(mic0, t, axis=1),
                   "spk_ref": jnp.roll(mic0, t + 7, axis=1)}
            st, out, _ = cg.step(st, params, ext)
            return st, out["out"][:, 0].sum()

        @jax.jit
        def run(st):
            st, sums = jax.lax.scan(body, st, jnp.arange(K_TICKS))
            return st, sums.sum()

        state, chk = run(state)
        float(chk)                                   # warm + force
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            state, chk = run(state)
            float(chk)                               # forces full execution
            dt = (time.perf_counter() - t0) * 1e3
            best = min(best, dt)
        return max(0.0, (best - rtt_ms)) / K_TICKS
    except Exception as e:                           # OOM or compile failure
        print(f"# batch={batch}: infeasible ({type(e).__name__}: "
              f"{str(e)[:120]})", file=sys.stderr)
        return None


def main():
    import jax
    backend = jax.default_backend()
    rtt = _rtt_ms()
    print(f"# null-op RTT {rtt:.2f} ms", file=sys.stderr)
    budget = DEADLINE_MS * SAFETY

    lo, hi = 0, None
    b = 1024
    timings = {}
    while hi is None:
        ms = measure_batch(b, rtt)
        timings[b] = ms
        print(f"# batch={b}: {ms if ms is None else round(ms, 3)} ms/tick",
              file=sys.stderr)
        if ms is not None and ms <= budget:
            lo = b
            if b >= MAX_BATCH:
                hi = b + 1
                break
            b *= 2
        else:
            hi = b
    while hi - lo > max(256, lo // 8):
        mid = (lo + hi) // 2 // 256 * 256
        if mid <= lo or mid >= hi:
            break
        ms = measure_batch(mid, rtt)
        timings[mid] = ms
        print(f"# batch={mid}: {ms if ms is None else round(ms, 3)} ms/tick",
              file=sys.stderr)
        if ms is not None and ms <= budget:
            lo = mid
        else:
            hi = mid

    value = lo
    result = {
        "metric": "concurrent 48kHz AEC+resample+mix legs per chip at 10ms deadline",
        "value": int(value),
        "unit": "legs",
        "vs_baseline": round(value / TARGET_BASELINE, 3),
        "backend": backend,
        "ms_per_tick_at_value": (None if timings.get(value) is None
                                 else round(timings.get(value, float("nan")), 3)),
        "rtt_ms": round(rtt, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
