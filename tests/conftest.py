"""Test config: run on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware (the driver dry-runs multi-chip separately).
"""
import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU tunnel
# (and a sitecustomize hook imports jax before conftest runs, so the env var
# alone is not enough — use jax.config). Tests exercise the same XLA programs
# on a virtual 8-device CPU host; bench.py uses the real chip.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def factory():
    from mediastreamer2_tpu.core.factory import Factory
    return Factory()


def make_speechlike(n: int, rate: int, seed: int = 0, channels: int = 1) -> np.ndarray:
    """Synthetic speech-like test signal: AM-modulated harmonic stack + noise
    bursts (replaces the reference's tester/sounds/*.wav fixtures)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / rate
    sig = sum((0.5 / k) * np.sin(k * phase) for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 1.3 * t + rng.uniform(0, 6.28)))
    sig = sig * env + 0.01 * rng.standard_normal(n)
    sig = 0.5 * sig / np.max(np.abs(sig))
    if channels > 1:
        sig = np.repeat(sig[:, None], channels, axis=1).reshape(-1)
    return sig.astype(np.float32)
