"""Cautious mixed-fleet validation probe for the real chip.

The first (pre-devlock) mixed-fleet run wedged the tunnel for hours
(ROUND4_NOTES.md "late-round hardening"), so co-resident dispatch is never
trusted blindly again: this probe runs a SMALL fleet (sizes far below the
homogeneous headlines) under the devlock serialization, bounded by a hard
watchdog that prints a JSON verdict and exits even if a member wedges.

Run it as the FIRST device job after an outage / before a full `bench.py`:

    nohup python -u tools/fleet_probe.py > /tmp/fleet_probe.log 2>&1 &

Exit line: one JSON object {"ok": bool, "summary": {...}} — `ok` means the
fleet ran to completion (per-class pass/fail is in the summary; the probe
is about SAFETY, not capacity).
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # one device job per host (single-lease tunnel): share bench.py's
    # cross-process lock so a probe can't overlap a running bench.
    # Acquired BEFORE the watchdog arms — a lock wait is not a wedge.
    import bench
    lock = bench._acquire_device_lock(
        float(os.environ.get("FLEET_PROBE_LOCK_WAIT_S", "600")))
    if lock is None:
        print(json.dumps({"ok": False,
                          "error": "device lock held by another job"}),
              flush=True)
        return

    # Cold-cache compile of all 4 classes over the tunnel measures ~11 min
    # (flagship+srtp ~5 min, opus/video the rest); 600 s tripped the
    # watchdog mid-compile and the os._exit left a stale device claim.
    # With bench.py's persistent XLA compile cache a re-run is minutes.
    hard_s = float(os.environ.get("FLEET_PROBE_DEADLINE_S", "1500"))

    def fire():
        print(json.dumps({"ok": False,
                          "error": f"watchdog: fleet did not finish in "
                                   f"{hard_s:.0f}s (device likely wedged)"}),
              flush=True)
        os._exit(1)

    t = threading.Timer(hard_s, fire)
    t.daemon = True
    t.start()

    from mediastreamer2_tpu.core.factory import Factory
    from mediastreamer2_tpu.models.mixed_fleet import MixedFleetBench

    sizes = {"n_flagship": int(os.environ.get("FLEET_PROBE_FLAGSHIP", "256")),
             "n_srtp": int(os.environ.get("FLEET_PROBE_SRTP", "128")),
             "n_opus": int(os.environ.get("FLEET_PROBE_OPUS", "8")),
             "n_video": int(os.environ.get("FLEET_PROBE_VIDEO", "2"))}
    try:
        from mediastreamer2_tpu.ops import host_codecs as hc
        if not hc.opus_available():
            sizes["n_opus"] = 0
        from mediastreamer2_tpu.ops.vp8 import vp8_available
        if not vp8_available():
            sizes["n_video"] = 0
    except Exception:
        pass

    t0 = time.monotonic()
    fleet = MixedFleetBench(Factory, k_block=32, depth=3, video_depth=2,
                            **sizes)
    try:
        res = fleet.run(seconds=float(
            os.environ.get("FLEET_PROBE_SECONDS", "5.0")))
    finally:
        fleet.close()
    summary = res.summary()
    t.cancel()
    print(json.dumps({"ok": True, "sizes": sizes,
                      "wall_s": round(time.monotonic() - t0, 1),
                      "summary": summary}), flush=True)


if __name__ == "__main__":
    main()
