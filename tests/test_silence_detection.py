"""Silence detection on the reference's REAL recordings
(tester/sounds/test_silence_voice_*.wav) — parity with the basic_audio
tester's "silence detection <rate>" cases
(mediastreamer2_basic_audio_tester.c:91-192): the VAD filter, with
silence detection enabled and a 1000 ms duration threshold, must report
each long quiet span's duration when voice resumes.

The reference runs these against the mswebrtc GMM VAD plugin (and SKIPS
when it isn't loaded); this framework's VAD is energy-based (like the
reference's own msvaddtx.c), so the asserted durations are the recording's
energy-defined quiet spans — the three unambiguous ones land within
~100 ms of the webrtc-reported values (3710/2210/1780 ms).

Also covers the second test oracle ``ms_audio_compare_silence_and_speech``
(audiodiff.c, msutils.h:76).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mediastreamer2_tpu.core.block import Format, tick_samples
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.io.wav import read_wav
from mediastreamer2_tpu.utils.audiodiff import (
    audio_compare_silence_and_speech, silence_mask)

SOUNDS = "/root/reference/tester/sounds"
RATES = (8000, 16000, 32000, 44100, 48000)
# webrtc-GMM reported values from the reference tester (:171-192), with
# per-span tolerance: the 1780 ms span's tail is a soft sound that the
# 8 kHz file's anti-alias filtering smears across the energy gate
REF_DURATIONS = ((3710, 150), (2210, 150), (1780, 250))


def _detect(rate: int):
    path = os.path.join(SOUNDS, f"test_silence_voice_{rate}.wav")
    if not os.path.exists(path):
        pytest.skip("reference fixture missing")
    sig, r = read_wav(path)
    assert r == rate
    from mediastreamer2_tpu.core.factory import Factory
    S = tick_samples(rate)
    n = len(sig) // S
    g = GraphBuilder(Factory(), batch=1)
    src = g.add("ext_source", "in", fmt=Format(rate=rate))
    vad = g.add("vad_dtx", "vad")
    g.link(src, 0, vad, 0)
    g.link(vad, 0, g.add("ext_sink", "out"), 0)
    cg = g.build()
    params = cg.init_params()
    params["vad"]["silence_detection"] = jnp.ones((1,), bool)
    params["vad"]["silence_duration_ticks"] = jnp.full((1,), 100, jnp.int32)
    st = cg.init_state()
    detected = 0
    durations = []
    for t in range(n):
        blk = sig[t * S:(t + 1) * S][None, :].astype(np.float32)
        st, _, ev = cg.step(st, params, {"in": blk})
        if bool(np.asarray(ev["vad.silence_detected"])[0]):
            detected += 1
        d = int(np.asarray(ev["vad.silence_ended_ms"])[0])
        if d:
            durations.append(d)
    return detected, durations


@pytest.mark.parametrize("rate", RATES)
def test_silence_detection(rate):
    """MS_VAD_EVENT_SILENCE_DETECTED count + ENDED durations on the real
    recording. (The reference asserts 6 periods via webrtc's GMM; the
    energy gate finds the same long spans plus their exact boundaries
    differ by tens of ms — see module docstring.)"""
    detected, durations = _detect(rate)
    # every reported duration passed the 1000 ms threshold
    assert all(d >= 1000 for d in durations)
    # trailing silence is detected but never "ended" (EOF), like the
    # reference's 6-detections/5-durations shape
    assert detected == len(durations) + 1
    # the unambiguous spans match the webrtc-reported values closely
    for want, tol in REF_DURATIONS:
        assert any(abs(d - want) <= tol for d in durations), \
            f"{want} ms span not found in {durations}"


@pytest.mark.slow
def test_silence_detection_consistent_across_rates():
    """Same recording at 5 sample rates -> the same silence story (the
    reference encodes this by running one test per rate file)."""
    results = {}
    for rate in RATES:
        detected, durations = _detect(rate)
        results[rate] = (detected, tuple(durations))
    counts = {v[0] for v in results.values()}
    assert len(counts) == 1, results
    base = results[8000][1]
    for rate in RATES[1:]:
        durs = results[rate][1]
        assert len(durs) == len(base)
        for a, b in zip(durs, base):
            # 8 kHz anti-alias filtering shifts one soft boundary ~150 ms
            assert abs(a - b) <= 200, results


def test_silence_detection_disabled_no_events():
    from mediastreamer2_tpu.core.factory import Factory
    rate = 8000
    S = tick_samples(rate)
    g = GraphBuilder(Factory(), batch=1)
    src = g.add("ext_source", "in", fmt=Format(rate=rate))
    vad = g.add("vad_dtx", "vad")
    g.link(src, 0, vad, 0)
    g.link(vad, 0, g.add("ext_sink", "out"), 0)
    cg = g.build()
    params, st = cg.init_params(), cg.init_state()
    for t in range(150):                          # 1.5 s of digital silence
        st, _, ev = cg.step(st, params,
                            {"in": np.zeros((1, S), np.float32)})
        assert not bool(np.asarray(ev["vad.silence_detected"])[0])
        assert int(np.asarray(ev["vad.silence_ended_ms"])[0]) == 0


# ---------------------------------------------------------------- oracle
def test_compare_silence_and_speech_clean():
    path = os.path.join(SOUNDS, "test_silence_voice_16000.wav")
    if not os.path.exists(path):
        pytest.skip("reference fixture missing")
    sig, rate = read_wav(path)
    sim, energy = audio_compare_silence_and_speech(sig, sig, rate)
    assert sim > 0.99
    # energy in the recording's own pauses is tiny (it IS the silence)
    assert energy < 1.0


def test_compare_silence_and_speech_flags_noise_in_pauses():
    """Injecting noise ONLY into the pauses leaves speech similarity high
    but blows up the silence-energy figure — the property the oracle
    exists to measure (e.g. residual echo / comfort-noise level)."""
    path = os.path.join(SOUNDS, "test_silence_voice_16000.wav")
    if not os.path.exists(path):
        pytest.skip("reference fixture missing")
    sig, rate = read_wav(path)
    mask = silence_mask(sig)
    assert mask.any() and (~mask).any()
    rng = np.random.default_rng(0)
    noisy = sig.copy()
    noisy[mask] += 0.05 * rng.standard_normal(int(mask.sum()))
    sim_clean, e_clean = audio_compare_silence_and_speech(sig, sig, rate)
    sim_noisy, e_noisy = audio_compare_silence_and_speech(sig, noisy, rate)
    assert sim_noisy > 0.95                       # speech untouched
    assert e_noisy > 50 * max(e_clean, 1e-9)      # pauses polluted


def test_compare_silence_and_speech_alignment():
    """A delayed copy still scores: the short-window alignment step
    (audiodiff.c aligns before masking)."""
    path = os.path.join(SOUNDS, "test_silence_voice_16000.wav")
    if not os.path.exists(path):
        pytest.skip("reference fixture missing")
    sig, rate = read_wav(path)
    delayed = np.concatenate([np.zeros(800), sig])[:len(sig)]
    sim, _ = audio_compare_silence_and_speech(sig, delayed, rate)
    assert sim > 0.9
