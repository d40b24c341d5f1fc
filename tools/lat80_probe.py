"""Chip probe for the two open e2e rows (VERDICT r4 items 4/5).

1. 80 ms latency row (K=1, D=4): per-tick dispatch with 4 blocks in
   flight — 40 ms of budget against the ~26-32 ms tunnel RTT.  Viable
   only if D2H copies are issued at dispatch time (e2e_bench._gpu_block
   issue_copies); this probe measures whether the row now passes and at
   what leg count.
2. SRTP-vs-cleartext attribution at matched N: one traced cleartext and
   one traced SRTP trial at the same (N, K, D), so the capacity delta
   reads off the edge_tx/edge_rx phase split.

Usage (one device job at a time — serializes on the bench device lock):

    nohup python -u tools/lat80_probe.py > /tmp/lat80_probe.log 2>&1 &
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    lock = bench._acquire_device_lock(
        float(os.environ.get("LAT80_LOCK_WAIT_S", "900")))
    if lock is None:
        print(json.dumps({"ok": False, "error": "device lock held"}),
              flush=True)
        return
    hard_s = float(os.environ.get("LAT80_DEADLINE_S", "1500"))

    def fire():
        print(json.dumps({"ok": False,
                          "error": f"watchdog: {hard_s:.0f}s"}), flush=True)
        os._exit(1)

    t = threading.Timer(hard_s, fire)
    t.daemon = True
    t.start()

    out = {"rtt_ms": round(bench._rtt_ms(), 2)}
    print(f"# rtt {out['rtt_ms']} ms", file=sys.stderr, flush=True)

    def row(res):
        if res is None:
            return None
        return {"legs": res.n_legs, "ms_per_tick": round(res.ms_per_tick, 3),
                "late_ticks": res.late_ticks, "ticks": res.ticks,
                "loss": round(res.loss_rate, 4),
                "fid": round(res.fidelity, 3),
                "auth_fail": res.auth_failures,
                "phases_ms": res.phases_ms,
                "passes": bench.e2e_passes(res)}

    # --- 1: K=1,D=4 ladder at small N ---------------------------------
    if os.environ.get("LAT80_SKIP_K1", "0") == "0":
        out["k1d4"] = []
        for n in (64, 128, 256):
            res = bench.e2e_trial(n, 1, 4, blocks=300)   # ~3 s measured
            r = row(res)
            out["k1d4"].append({"n": n, **(r or {"error": "trial failed"})})
            print(f"# k1d4 n={n}: {json.dumps(out['k1d4'][-1])}",
                  file=sys.stderr, flush=True)
            if r is None or not r["passes"]:
                break

    # --- 2: SRTP attribution at matched N ------------------------------
    n_match = int(os.environ.get("LAT80_SRTP_N", "896"))
    if n_match:
        K, D = bench._kd_for(n_match)
        res_c = bench.e2e_trial(n_match, K, D)
        out["clear"] = row(res_c)
        print(f"# clear n={n_match}: {json.dumps(out['clear'])}",
              file=sys.stderr, flush=True)
        res_s = bench.e2e_trial(n_match, K, D, srtp=True)
        out["srtp"] = row(res_s)
        print(f"# srtp n={n_match}: {json.dumps(out['srtp'])}",
              file=sys.stderr, flush=True)

    t.cancel()
    print(json.dumps({"ok": True, **out}), flush=True)


if __name__ == "__main__":
    main()
