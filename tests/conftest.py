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


from mediastreamer2_tpu.utils.signals import make_speechlike  # noqa: F401,E402
