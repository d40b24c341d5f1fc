"""MDF Pallas megakernels match the jnp reference path exactly."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mediastreamer2_tpu.core.block import Format
from mediastreamer2_tpu.core.graph import GraphBuilder
from conftest import make_speechlike


def _run_ec(factory, disable_pallas, ticks=20, B=2, seed=0):
    os.environ["PALLAS_DISABLE"] = "1" if disable_pallas else "0"
    os.environ["PALLAS_MDF"] = "0" if disable_pallas else "1"
    # parity is defined on the f32-shadow algorithm both kernels
    # implement; the default bf16+stochastic-rounding shadow is a
    # different (intentionally noisier) storage mode, tested by the AEC
    # quality suite instead
    os.environ["AEC_BF16_SHADOW"] = "0"
    try:
        g = GraphBuilder(factory, batch=B)
        ns = g.add("ext_source", "near", fmt=Format(rate=16000))
        fs = g.add("ext_source", "far", fmt=Format(rate=16000))
        ec = g.add("echo_canceller", "ec", tail_ms=80)
        g.link(ns, 0, ec, 0)
        g.link(fs, 0, ec, 1)
        g.link(ec, 0, g.add("ext_sink", "out"), 0)
        cg = g.build()
        st, p = cg.init_state(), cg.init_params()
        S = 160
        far = make_speechlike(S * ticks, 16000, seed=seed)
        near = 0.5 * np.roll(far, 30) + 0.01 * make_speechlike(
            S * ticks, 16000, seed=seed + 1)
        outs = []
        for i in range(ticks):
            ext = {"near": np.broadcast_to(near[i*S:(i+1)*S], (B, S)).astype(np.float32),
                   "far": np.broadcast_to(far[i*S:(i+1)*S], (B, S)).astype(np.float32)}
            st, out, _ = cg.step(st, p, ext)
            outs.append(np.asarray(out["out"]))
        return np.stack(outs), st
    finally:
        os.environ["PALLAS_DISABLE"] = "0"
        os.environ["PALLAS_MDF"] = "0"
        os.environ.pop("AEC_BF16_SHADOW", None)


@pytest.mark.slow
def test_mdf_pallas_matches_jnp(factory):
    if os.environ.get("AEC_HALF_UPDATE", "0") != "0":
        pytest.skip("pallas kernel implements the full NLMS update; the "
                    "AEC_HALF_UPDATE A/B knob intentionally diverges")
    out_p, st_p = _run_ec(factory, disable_pallas=False)
    out_j, st_j = _run_ec(factory, disable_pallas=True)
    np.testing.assert_allclose(out_p, out_j, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_p["ec"]["Wm_r"]),
                               np.asarray(st_j["ec"]["Wm_r"]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_p["ec"]["Es"]),
                               np.asarray(st_j["ec"]["Es"]),
                               rtol=2e-4, atol=1e-7)


def _run_ec_knob(factory, pallas_update, ticks=40, B=4, seed=3):
    os.environ["AEC_PALLAS_UPDATE"] = pallas_update
    try:
        return _run_ec(factory, disable_pallas=(pallas_update == "0"),
                       ticks=ticks, B=B, seed=seed)
    finally:
        os.environ.pop("AEC_PALLAS_UPDATE", None)


def test_fused_update_matches_jnp(factory):
    """The fused update+transfer kernel (mdf_update_fused — measured
    slower than XLA's fusions and kept OPT-IN behind AEC_PALLAS_UPDATE=1,
    see pallas_kernels.update_tile) matches the default jnp branch to
    ~1 ulp/tick — the residual is FMA contraction inside XLA's fusions,
    within the project's quality-equivalence criterion."""
    if os.environ.get("AEC_HALF_UPDATE", "0") != "0":
        pytest.skip("AEC_HALF_UPDATE A/B knob intentionally diverges")
    out_f, st_f = _run_ec_knob(factory, "1")
    out_j, st_j = _run_ec_knob(factory, "0")
    np.testing.assert_allclose(out_f, out_j, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_f["ec"]["Ws_r"]),
                               np.asarray(st_j["ec"]["Ws_r"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_f["ec"]["Wm_r"],
                                          dtype=np.float32),
                               np.asarray(st_j["ec"]["Wm_r"],
                                          dtype=np.float32),
                               rtol=1e-2, atol=1e-4)   # bf16 storage
