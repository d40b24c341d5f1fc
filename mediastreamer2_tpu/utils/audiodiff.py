"""Audio similarity oracle — re-implementation of the reference's
``ms_audio_diff`` (src/utils/audiodiff.c, include/mediastreamer2/msutils.h:49-76).

The reference computes a normalized cross-correlation between a recorded
file and a reference file, searching over time shifts (it tolerates codec /
jitter delay), and testers assert similarity >= ~0.9.  Same contract here:
``audio_diff`` returns (similarity in [0,1], best_shift_samples).

Implemented with FFT cross-correlation so comparing long captures stays
O(n log n) on the host.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _normalize(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    x = x - x.mean()
    return x


def audio_diff(ref: np.ndarray, rec: np.ndarray,
               max_shift: int | None = None) -> Tuple[float, int]:
    """Normalized peak cross-correlation between ref and rec.

    Returns (similarity, shift) where shift>0 means rec lags ref.
    Similarity ~1.0 for identical-up-to-delay-and-gain signals.
    """
    a, b = _normalize(ref), _normalize(rec)
    n = max(len(a), len(b))
    if n == 0:
        return 0.0, 0
    size = 1 << (2 * n - 1).bit_length()
    fa = np.fft.rfft(a, size)
    fb = np.fft.rfft(b, size)
    xc = np.fft.irfft(fa.conj() * fb, size)
    # valid lags: rec delayed by k in [0, n) -> xc[k]; rec early -> xc[size-k]
    lags = np.concatenate([xc[: n], xc[size - n + 1:]])
    if max_shift is not None:
        mask = np.zeros_like(lags, dtype=bool)
        mask[: max_shift + 1] = True
        mask[-max_shift:] = True
        lags = np.where(mask, lags, -np.inf)
    k = int(np.argmax(lags))
    shift = k if k < n else k - (2 * n - 1)
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    if denom == 0:
        return 0.0, 0
    sim = float(lags[k] / denom)
    return max(0.0, min(1.0, sim)), shift


def silence_mask(ref: np.ndarray, threshold: float = 0.001,
                 half_window: int = 200,
                 smooth_half_window: int = 1400) -> np.ndarray:
    """Boolean silence mask of the reference signal — the reference's
    two-stage detector (audiodiff.c ms_audio_compute_energy_in_silence):
    sliding-mean |x| below threshold, then a majority vote over a wider
    window removes speckle."""
    x = np.abs(np.asarray(ref, np.float64))
    if x.size and x.max() > 1.5:                   # int16-scaled input
        x = x / 32768.0
    n = len(x)
    if n == 0:
        return np.zeros(0, bool)
    w = 2 * half_window + 1
    csum = np.cumsum(np.concatenate([[0.0], x]))
    idx = np.arange(n)
    w0 = np.maximum(0, idx - half_window)
    wn = np.minimum(n, idx + half_window + 1)
    mean = (csum[wn] - csum[w0]) / (wn - w0)
    raw = (mean < threshold).astype(np.float64)
    csum2 = np.cumsum(np.concatenate([[0.0], raw]))
    w0 = np.maximum(0, idx - smooth_half_window)
    wn = np.minimum(n, idx + smooth_half_window + 1)
    frac = (csum2[wn] - csum2[w0]) / (wn - w0)
    return frac >= 0.5


def audio_compare_silence_and_speech(ref: np.ndarray, rec: np.ndarray,
                                     rate: int,
                                     align_window_ms: tuple = (0, 2000),
                                     ) -> Tuple[float, float]:
    """(speech_similarity, silence_energy) — the reference's second test
    oracle ``ms_audio_compare_silence_and_speech`` (audiodiff.c /
    msutils.h:76): align on a short window, detect the reference's silence
    spans, then measure cross-correlation similarity on the SPEECH samples
    only and the summed energy of the matched signal on the SILENCE
    samples (quantifies noise/echo injected into pauses)."""
    ref = np.asarray(ref, np.float64)
    rec = np.asarray(rec, np.float64)
    s0 = int(align_window_ms[0] * rate / 1000)
    s1 = min(int(align_window_ms[1] * rate / 1000), len(ref), len(rec))
    _, shift = audio_diff(ref[s0:s1], rec[s0:s1])
    if shift > 0:                                  # rec lags: drop its head
        rec = rec[shift:]
    elif shift < 0:
        ref = ref[-shift:]
    n = min(len(ref), len(rec))
    ref, rec = ref[:n], rec[:n]
    mask = silence_mask(ref)
    energy = float((rec[mask] ** 2).sum())
    speech_ref = ref[~mask]
    speech_rec = rec[~mask]
    max_shift = max(1, len(speech_ref) // 100)     # 1% like the reference
    sim, _ = audio_diff(speech_ref, speech_rec, max_shift=max_shift)
    return sim, energy


def energy_db(x: np.ndarray) -> float:
    x = np.asarray(x, np.float64)
    p = (x * x).mean() if len(x) else 0.0
    return 10.0 * np.log10(p + 1e-12)


def snr_db(ref: np.ndarray, test: np.ndarray, align: bool = True) -> float:
    """Signal-to-noise ratio of test vs ref after optimal alignment+gain."""
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    if align:
        _, shift = audio_diff(ref, test)
        if shift > 0:
            test = test[shift:]
        elif shift < 0:
            ref = ref[-shift:]
    n = min(len(ref), len(test))
    ref, test = ref[:n], test[:n]
    denom = (ref * ref).sum()
    if denom == 0:
        return -np.inf
    g = (ref * test).sum() / ((test * test).sum() + 1e-30)
    err = ref - g * test
    return 10.0 * np.log10(denom / ((err * err).sum() + 1e-30))
