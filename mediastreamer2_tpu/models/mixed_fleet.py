"""Mixed-fleet co-residency bench: heterogeneous graph classes on ONE chip.

The reference trivially runs arbitrary stream mixes concurrently — G.711
calls + opus calls + video + conferences — because every stream owns a
ticker thread (src/base/msticker.c:448, src/voip/mediastream.c:227-239) and
the OS scheduler shares the cores.  This repo's answer is shape-class
bucketing (SURVEY §7): each class compiles to ONE batched device program,
and co-residency means those programs SHARE the chip under one deadline.

This bench runs the deployment mix for real (VERDICT r3 missing item 3):

  * ``flagship``: N G.711 legs — device DSP (AEC+AGC+mix-minus) + native
    sendmmsg/GSO UDP edge (models/e2e_bench.py), cleartext.
  * ``srtp``: M more of the same with per-leg SRTP inline on the edge.
  * ``opus``: P host-codec conference legs (libopus encode/decode on the
    host, device conference mix) over per-leg self-looped UDP.
  * ``video``: Q VP8 streams — device pixel path + libvpx + RTP/UDP
    (models/video_e2e_bench.py).

Each class keeps its own paced loop/ticker on its own host thread (the
reference's per-stream-ticker shape); the device interleaves their
programs.  All classes are built + compiled FIRST, then released through a
barrier so the measured windows coincide.  A class passes by its own
bench's criteria while co-resident; the fleet passes iff every class does.
"""
from __future__ import annotations

import dataclasses
import threading
import time
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class MixedFleetResult:
    seconds: float
    flagship: Optional[object]          # E2EResult
    srtp: Optional[object]              # E2EResult
    opus: Optional[dict]
    video: Optional[object]             # VideoE2EResult
    errors: Dict[str, str]

    def summary(self) -> dict:
        def _e2e(r):
            return None if r is None else {
                "legs": r.n_legs, "ms_per_tick": round(r.ms_per_tick, 3),
                "late_ticks": r.late_ticks,
                "loss_rate": round(r.loss_rate, 5),
                "fidelity": round(r.fidelity, 4),
                "auth_failures": getattr(r, "auth_failures", 0),
            }
        return {
            "flagship": _e2e(self.flagship),
            "srtp": _e2e(self.srtp),
            "opus": self.opus,
            "video": None if self.video is None else {
                "streams": self.video.n_streams,
                "fps_min": round(self.video.fps_received_min, 2),
                "late_ticks": self.video.late_ticks,
            },
            "errors": self.errors or None,
            "passes": self.passes(),
        }

    def passes(self) -> bool:
        if self.errors:
            return False

        def _e2e_ok(r):
            return (r is not None
                    and r.late_ticks <= max(1, r.ticks // 50)
                    and r.ms_per_tick <= 10.0 * 1.03
                    and r.loss_rate < 0.02 and r.fidelity >= 0.9)
        ok = True
        if self.flagship is not None or "flagship" in self.errors:
            ok &= _e2e_ok(self.flagship)
        if self.srtp is not None or "srtp" in self.errors:
            ok &= _e2e_ok(self.srtp) and self.srtp.auth_failures == 0
        if self.opus is not None:
            ok &= (self.opus["late_ticks"] <= max(1, self.opus["ticks"] // 50)
                   and self.opus["delivery"] >= 0.95)
        if self.video is not None:
            ok &= self.video.passes()
        return bool(ok)


def _elevate_paced_thread() -> None:
    """Best-effort SCHED_RR for the calling (paced member) thread.

    Parity with the reference ticker's elevated priority
    (ms_ticker_set_priority, msticker.c:330-399; env MS_TICKER_SCHEDPRIO).

    Default: per-thread niceness -10 (CFS weight ~10x) — the paced thread
    wins the wakeup race at its tick edge but canNOT starve the
    normal-priority publish/codec workers it depends on (CFS always
    schedules everyone).  SCHED_RR is available via MS2TPU_SCHEDPRIO=<prio>
    but measured DANGEROUS on the 1-core bench host: an RT loop that falls
    behind stops sleeping (catch-up path) and livelocks the fleet — the
    probe run hit its 600 s watchdog.  MS2TPU_SCHEDPRIO=0 disables both;
    non-root / non-Linux silently degrade."""
    import os
    import threading
    env = os.environ.get("MS2TPU_SCHEDPRIO", "")
    try:
        prio = int(env) if env else None
        if prio is not None and prio > 0:
            os.sched_setscheduler(0, os.SCHED_RR, os.sched_param(prio))
        elif prio is None:               # default: safe CFS boost
            os.setpriority(os.PRIO_PROCESS, threading.get_native_id(), -10)
    except (AttributeError, OSError, ValueError):
        pass


class MixedFleetBench:
    """Build the classes, compile everything, then run them concurrently."""

    def __init__(self, factory_cls, n_flagship: int = 1024,
                 n_srtp: int = 256, n_opus: int = 32, n_video: int = 2,
                 k_block: int = 32, depth: int = 3,
                 opus_depth: int = 4, video_depth: int = 2):
        """factory_cls: the Factory class (each member builds its own
        instance; registries are cheap and per-class isolation keeps graph
        names independent)."""
        from mediastreamer2_tpu.models.e2e_bench import E2EConferenceBench
        self._members: Dict[str, object] = {}
        self._closers = []
        if n_flagship:
            b = E2EConferenceBench(factory_cls(), n_flagship,
                                   k_block=k_block, pipeline_depth=depth)
            self._members["flagship"] = b
            self._closers.append(b.close)
        if n_srtp:
            b = E2EConferenceBench(factory_cls(), n_srtp, k_block=k_block,
                                   pipeline_depth=depth, srtp=True, seed=7)
            self._members["srtp"] = b
            self._closers.append(b.close)
        if n_opus:
            self._members["opus"] = self._build_opus(factory_cls(), n_opus,
                                                     opus_depth)
        if n_video:
            from mediastreamer2_tpu.models.video_e2e_bench import VideoE2EBench
            b = VideoE2EBench(factory_cls(), n_video, codec="vp8", fps=15.0,
                              pipeline_depth=video_depth, frame_tick=True)
            self._members["video"] = b
            self._closers.append(b.close)

    def _build_opus(self, factory, n: int, depth: int):
        from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
        from mediastreamer2_tpu.net.rtp import UdpTransport
        rate = 48000
        S = rate // 100
        t = np.arange(S * 100, dtype=np.float32) / rate
        mic = (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        ab = AudioStreamBatch(factory, n, codec="opus", rate=rate,
                              conference=True, mic_signal=mic)
        transports = []
        for i in range(n):
            tr = UdpTransport()
            tr.set_remote("127.0.0.1", tr.local_port)      # self-loop
            ab.set_transport(i, tr)
            transports.append(tr)
        if depth:
            ab.ticker.pipeline_depth = depth
            ab.ticker.async_publish = True
        self._closers.append(lambda: [tr.close() for tr in transports])
        return ab

    def close(self):
        for c in self._closers:
            try:
                c()
            except Exception:
                pass

    def run(self, seconds: float = 8.0) -> MixedFleetResult:
        """Compile all members, then run every class concurrently for
        `seconds` of paced wall time; returns per-class results."""
        results: Dict[str, object] = {}
        errors: Dict[str, str] = {}
        # ---- phase 1: compile everything (serial; device is shared) ----
        for name in ("flagship", "srtp"):
            if name in self._members:
                self._members[name].warm()
        if "opus" in self._members:
            self._members["opus"].ticker.warm_up()
        if "video" in self._members:
            self._members["video"].vs.ticker.warm_up()
        # ---- phase 2: concurrent paced runs behind one barrier ---------
        barrier = threading.Barrier(len(self._members))

        def guarded(name, fn):
            try:
                _elevate_paced_thread()
                barrier.wait(timeout=120)
                results[name] = fn()
            except Exception as e:                     # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {str(e)[:200]}"

        def run_e2e(b):
            blocks = max(3, int(seconds * 100 / b.K))
            return lambda: b.run(blocks, paced=True)

        def run_opus(ab):
            def go():
                tk = ab.ticker
                tk.realtime = True
                n_ticks = int(seconds * 100)
                sent0 = sum(s.stats.sent_packets for s in ab.sessions if s)
                recv0 = sum(s.stats.recv_packets for s in ab.sessions if s)
                base_late, base_ticks = tk.stats.late_ticks, tk.stats.ticks
                tk.run(n_ticks)
                tk.drain()
                # let the tail of in-flight self-loop packets land
                time.sleep(0.05)
                for s in ab.sessions:
                    if s:
                        s.poll()
                sent = sum(s.stats.sent_packets for s in ab.sessions if s) \
                    - sent0
                recv = sum(s.stats.recv_packets for s in ab.sessions if s) \
                    - recv0
                ticks = tk.stats.ticks - base_ticks
                return {
                    "legs": ab.batch, "ticks": ticks,
                    "late_ticks": tk.stats.late_ticks - base_late,
                    "sent_packets": sent, "recv_packets": recv,
                    # self-loop: everything sent must come back (minus the
                    # in-flight tail) — delivery is the class's loss oracle
                    "delivery": round(min(1.0, recv / max(sent, 1)), 4),
                }
            return go

        def run_video(b):
            return lambda: b.run(seconds=max(1.0, seconds - 1.0),
                                 paced=True, warmup_seconds=1.0)

        runners = {}
        for name, m in self._members.items():
            fn = {"flagship": run_e2e, "srtp": run_e2e,
                  "opus": run_opus, "video": run_video}[name](m)
            runners[name] = threading.Thread(
                target=guarded, args=(name, fn), name=f"fleet-{name}",
                daemon=True)
        # Serialize device touches while co-resident: concurrent dispatch
        # from many threads wedged the tunnel-attached chip (see
        # core/devlock.py). Pipelining between members survives — the
        # lock covers dispatch/transfer, not device compute.
        from mediastreamer2_tpu.core import devlock
        devlock.enable(True)
        try:
            for th in runners.values():
                th.start()
            # a member must NEVER hang the fleet (a hung join here would
            # cost the whole bench artifact): bounded join, report the
            # straggler as an error and move on (threads are daemonic)
            deadline = time.monotonic() + seconds * 3 + 240
            for name, th in runners.items():
                th.join(timeout=max(5.0, deadline - time.monotonic()))
                if th.is_alive():
                    errors[name] = "hung (member did not finish in time)"
        finally:
            devlock.enable(False)
        return MixedFleetResult(
            seconds=seconds,
            flagship=results.get("flagship"),
            srtp=results.get("srtp"),
            opus=results.get("opus"),
            video=results.get("video"),
            errors=errors)
