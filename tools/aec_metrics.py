#!/usr/bin/env python
"""Offline AEC analysis — parity with the reference's
tools/audio/aec/aec_metrics.py toolkit (estimated delay / ERL / ERLE over
time, convergence detection), computed directly from wav files instead of
tester log dumps.

    python tools/aec_metrics.py --far far.wav --mic mic.wav --out out.wav

Prints one JSON line: echo-path delay estimate, ERL, per-second ERLE,
convergence time (first second reaching within 3 dB of the steady tail),
and steady-state ERLE.  With --run, runs the framework's echo canceller on
far/mic first and analyses its output.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def estimated_delay_ms(far, mic, rate, max_ms=500):
    """Cross-correlation delay of the echo path (AecMetrics 'estimated
    delay' role)."""
    n = min(len(far), len(mic), rate * 10)
    f, m = far[:n], mic[:n]
    spec = np.fft.rfft(m, 2 * n) * np.conj(np.fft.rfft(f, 2 * n))
    xc = np.fft.irfft(spec)
    lim = max_ms * rate // 1000
    lag = int(np.argmax(np.abs(xc[:lim])))
    return lag * 1000.0 / rate


def erl_db(far, mic):
    """Echo Return Loss: how much the room attenuates the far signal."""
    ef = float((np.asarray(far, np.float64) ** 2).mean())
    em = float((np.asarray(mic, np.float64) ** 2).mean())
    return 10 * np.log10(max(ef, 1e-12) / max(em, 1e-12))


def erle_series_db(mic, out, rate):
    """Per-second ERLE: mic (echo) energy over residual energy."""
    n = min(len(mic), len(out))
    secs = n // rate
    series = []
    for s in range(secs):
        a, b = s * rate, (s + 1) * rate
        em = float((mic[a:b] ** 2).mean())
        eo = float((out[a:b] ** 2).mean())
        series.append(round(10 * np.log10(max(em, 1e-12)
                                          / max(eo, 1e-12)), 2))
    return series


def analyse(far, mic, out, rate):
    series = erle_series_db(mic, out, rate)
    steady = float(np.median(series[-3:])) if len(series) >= 3 else \
        (series[-1] if series else 0.0)
    conv = None
    for s, v in enumerate(series):
        if v >= steady - 3.0 and v > 3.0:
            conv = s + 1
            break
    return {
        "estimated_delay_ms": round(estimated_delay_ms(far, mic, rate), 1),
        "erl_db": round(erl_db(far, mic), 2),
        "erle_db_per_second": series,
        "steady_erle_db": round(steady, 2),
        "convergence_s": conv,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--far", required=True)
    ap.add_argument("--mic", required=True)
    ap.add_argument("--out", help="echo-cancelled output wav")
    ap.add_argument("--run", action="store_true",
                    help="run the framework's EC on far/mic to produce out")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mediastreamer2_tpu.io.wav import read_wav
    far, rate = read_wav(args.far)
    mic, r2 = read_wav(args.mic)
    assert rate == r2, "rate mismatch"
    if args.run:
        from mediastreamer2_tpu.core.factory import Factory
        from mediastreamer2_tpu.core.block import Format, tick_samples
        from mediastreamer2_tpu.core.graph import GraphBuilder
        from mediastreamer2_tpu.core.ticker import Ticker
        S = tick_samples(rate)
        g = GraphBuilder(Factory(), batch=1)
        m = g.add("ext_source", "mic", fmt=Format(rate=rate))
        sp = g.add("ext_source", "far", fmt=Format(rate=rate))
        ec = g.add("echo_canceller", "ec", tail_ms=120)
        g.link(m, 0, ec, 0)
        g.link(sp, 0, ec, 1)
        g.chain(ec, g.add("ext_sink", "out"))
        tk = Ticker(g.build(), realtime=False)
        outs = []
        n = min(len(mic), len(far)) // S
        tk.set_io(pull=lambda t: {"mic": mic[t * S:(t + 1) * S][None],
                                  "far": far[t * S:(t + 1) * S][None]},
                  push=lambda t, o: outs.append(np.asarray(o["out"])[0]))
        tk.warm_up()
        for _ in range(n):
            tk.do_tick()
        out = np.concatenate(outs)
        if args.out:
            from mediastreamer2_tpu.io.wav import write_wav
            write_wav(args.out, out, rate)
    else:
        if not args.out:
            ap.error("--out required unless --run")
        out, _ = read_wav(args.out)
    print(json.dumps(analyse(far, mic, out, rate)))


if __name__ == "__main__":
    main()
