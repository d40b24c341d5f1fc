"""Host-side WAV read/write (reference: waveheader.h, msfileplayer/msfilerec).

Only PCM16 and mu-law/A-law WAVs, which is what the reference's testers use.
"""
from __future__ import annotations

import wave
from typing import Tuple

import numpy as np


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Returns (float32 [-1,1] interleaved samples [n*ch], rate)."""
    with wave.open(path, "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    return x, rate


def write_wav(path: str, x: np.ndarray, rate: int, channels: int = 1):
    pcm = np.clip(np.round(np.asarray(x, np.float32) * 32768.0), -32768, 32767
                  ).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
