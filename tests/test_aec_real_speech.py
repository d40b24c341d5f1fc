"""AEC on the reference's REAL speech fixtures (tester/sounds/
{far,near}end_double_talk.wav — the aec3 tester's material): far speech
through a synthetic room IR (25 ms bulk + reflections) forms the echo,
near speech overlaps for double-talk. Mirrors
tester/mediastreamer2_aec3_tester.c's convergence/ERLE gates."""
import os

import numpy as np
import pytest

FIX = "/root/reference/tester/sounds"
pytestmark = pytest.mark.skipif(not os.path.isdir(FIX),
                                reason="reference fixtures not mounted")


def _run_ec(mic, far_sig, rate, factory):
    from mediastreamer2_tpu.core.block import Format, tick_samples
    from mediastreamer2_tpu.core.graph import GraphBuilder
    from mediastreamer2_tpu.core.ticker import Ticker
    S = tick_samples(rate)
    ticks = min(len(mic), len(far_sig)) // S
    g = GraphBuilder(factory, batch=1)
    m = g.add("ext_source", "mic", fmt=Format(rate=rate))
    sp = g.add("ext_source", "far", fmt=Format(rate=rate))
    ec = g.add("echo_canceller", "ec", tail_ms=120)
    g.link(m, 0, ec, 0)
    g.link(sp, 0, ec, 1)
    g.chain(ec, g.add("ext_sink", "out"))
    tk = Ticker(g.build(), realtime=False)
    outs = []
    tk.set_io(pull=lambda t: {"mic": mic[t * S:(t + 1) * S][None],
                              "far": far_sig[t * S:(t + 1) * S][None]},
              push=lambda t, o: outs.append(np.asarray(o["out"])[0]))
    tk.warm_up()
    for _ in range(ticks):
        tk.do_tick()
    return np.concatenate(outs), ticks * S


def _room_echo(far, rate):
    d = int(0.025 * rate)
    ir = np.zeros(d + int(0.020 * rate) + 1, np.float32)
    ir[d] = 0.7
    ir[d + int(0.008 * rate)] = 0.25
    ir[d + int(0.020 * rate)] = 0.12
    return np.convolve(far, ir)[: len(far)].astype(np.float32)


def test_erle_on_real_far_speech(factory):
    from mediastreamer2_tpu.io.wav import read_wav
    far, rate = read_wav(f"{FIX}/farend_double_talk.wav")
    echo = _room_echo(far, rate)
    out, n = _run_ec(echo, far, rate, factory)
    a = 5 * rate                           # post-convergence window
    erle = 10 * np.log10((echo[a:n] ** 2).mean()
                         / max((out[a:n] ** 2).mean(), 1e-12))
    assert erle > 12.0, f"ERLE {erle:.1f} dB"


def test_double_talk_preserves_near_speech(factory):
    from mediastreamer2_tpu.io.wav import read_wav
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    far, rate = read_wav(f"{FIX}/farend_double_talk.wav")
    near, _ = read_wav(f"{FIX}/nearend_double_talk.wav")
    echo = _room_echo(far, rate)
    mic = echo + near[: len(echo)]
    out, n = _run_ec(mic, far, rate, factory)
    a = 5 * rate
    sim_near, _ = audio_diff(near[a:n], out[a:n])
    sim_far, _ = audio_diff(far[a:n], out[a:n])
    assert sim_near > 0.75, sim_near       # near speech survives
    assert sim_near > sim_far + 0.15       # and dominates residual echo


def test_echo_path_change_reconverges(factory):
    """The echo_delay_change scenario: the room impulse (delay+gain)
    changes mid-call; the canceller must regain ERLE through shadow
    re-adaptation (two-path transfer), without destroying the signal."""
    from mediastreamer2_tpu.io.wav import read_wav
    far, rate = read_wav(f"{FIX}/farend_double_talk.wav")

    def ir(delay_ms, g0):
        d = int(delay_ms * rate / 1000)
        v = np.zeros(d + 200, np.float32)
        v[d] = g0
        v[d + 80] = g0 * 0.3
        return v

    n = len(far)
    from mediastreamer2_tpu.core.block import tick_samples
    S = tick_samples(rate)
    half = (n // 2 // S) * S
    echo = np.concatenate([
        np.convolve(far[:half], ir(20, 0.7))[:half],
        np.convolve(far[half:], ir(55, 0.6))[: n - half]]).astype(np.float32)
    out, end = _run_ec(echo, far, rate, factory)

    def erle(a, b):
        return 10 * np.log10((echo[a:b] ** 2).mean()
                             / max((out[a:b] ** 2).mean(), 1e-12))

    assert erle(4 * rate, half) > 14.0          # converged on path A
    assert erle(half, half + rate) < 6.0        # change really broke it
    assert erle(end - 3 * rate, end) > 8.0      # re-converged on path B
