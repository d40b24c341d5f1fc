"""Focused latency-row probe: run e2e trials at the low-latency (K,D)
configs from bench.py's LATENCY_LADDER on the real TPU, printing one
line per trial.  Usage: python tools/lat_probe.py "4,2,256 4,2,384 8,2,512"
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    specs = (sys.argv[1] if len(sys.argv) > 1
             else "4,2,256 4,2,384 8,2,512").split()
    rtt = bench._rtt_ms()
    print(f"# null-op RTT {rtt:.2f} ms", file=sys.stderr)
    for spec in specs:
        K, D, n = (int(x) for x in spec.split(","))
        res = bench.e2e_trial(n, K, D, blocks=max(12, 256 // max(K, 8)))
        ok = bench.e2e_passes(res)
        print(f"K={K} D={D} n={n}: "
              f"{None if res is None else round(res.ms_per_tick, 2)} ms/tick "
              f"late={getattr(res, 'late_ticks', '-')} "
              f"loss={None if res is None else round(res.loss_rate, 4)} "
              f"fid={None if res is None else round(res.fidelity, 3)} "
              f"lat={None if res is None else res.mouth_to_ear_ms} "
              f"-> {'PASS' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
