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
