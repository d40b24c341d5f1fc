"""Sharded execution on the 8-device virtual CPU mesh: leg-parallel step
equals unsharded step; conference groups spanning shards mix correctly
(cross-device segment-sum collectives)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mediastreamer2_tpu.models.flagship import build_flagship, example_inputs
from mediastreamer2_tpu.parallel.sharding import make_mesh, shard_tree


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


@pytest.mark.slow
def test_sharded_flagship_matches_unsharded(factory):
    B = 16
    cg, params = build_flagship(factory, batch=B, conf_size=4)
    state = cg.init_state()
    ext = example_inputs(B, seed=7)

    ref_state, ref_out, _ = jax.jit(cg.step)(state, params, ext)

    mesh = make_mesh(8)
    st_s = shard_tree(state, mesh, B)
    pr_s = shard_tree(params, mesh, B)
    ext_s = shard_tree(ext, mesh, B)
    sh_state, sh_out, _ = jax.jit(cg.step)(st_s, pr_s, ext_s)

    np.testing.assert_allclose(np.asarray(ref_out["out"]),
                               np.asarray(sh_out["out"]), atol=2e-5)


def test_cross_shard_conference_mixing(factory):
    """Groups of 4 with 2 legs per shard: every conference spans 2 devices,
    and the cross-device segment-sum must produce exact mix-minus — leg i
    hears its groupmates' (distinct) DC levels, never its own."""
    B = 16
    cg, params = build_flagship(factory, batch=B, conf_size=4)
    params["agc"]["agc_enabled"] = jnp.zeros((B,), bool)   # deterministic gain
    mesh = make_mesh(8)
    state = shard_tree(cg.init_state(), mesh, B)
    params = shard_tree(params, mesh, B)
    dc = 0.01 * (1.0 + np.arange(B, dtype=np.float32))     # distinct per leg
    ext = {"mic": np.broadcast_to(dc[:, None], (B, 480)).copy(),
           "spk_ref": np.zeros((B, 480), np.float32)}
    ext = shard_tree(ext, mesh, B)
    step = jax.jit(cg.step)
    out = None
    for _ in range(4):                   # let the resampler FIR settle on DC
        state, out, _ = step(state, params, ext)
    got = np.asarray(out["out"])[:, -40:].mean(axis=1)     # steady-state tail
    group = dc.reshape(-1, 4).sum(axis=1)
    want = np.repeat(group, 4) - dc                        # sum minus self
    np.testing.assert_allclose(got, want, rtol=0.05)


@pytest.mark.slow
def test_graft_entry_contract():
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    new_state, ext_out = jax.jit(fn)(*args)
    assert "out" in ext_out
    mod.dryrun_multichip(8)


def test_sharded_e2e_graph_with_codec_boundary(factory):
    """The production e2e step — mu-law decode -> resample -> AEC -> AGC ->
    cross-shard mix-minus -> downsample -> mu-law encode — compiles and
    matches unsharded on the 8-device mesh, u8 payloads at the boundary
    (conference groups span shards: ICI collectives on the hot path)."""
    from mediastreamer2_tpu.models.e2e_bench import build_e2e_graph
    from mediastreamer2_tpu.ops.g711 import (ulaw_decode, ulaw_encode,
                                             float_to_pcm16, pcm16_to_float)
    B = 16
    cg, params = build_e2e_graph(factory, B, conf_size=4)
    state = cg.init_state()
    rng = np.random.default_rng(3)
    rx_u8 = rng.integers(0, 255, (B, 80)).astype(np.uint8)
    mic = (0.1 * rng.standard_normal((B, 480))).astype(np.float32)

    def step(st, pr, rx, mic):
        dec = pcm16_to_float(ulaw_decode(rx.astype(jnp.int32)))
        st, out, _ = cg.step(st, pr, {"rx": dec, "mic": mic})
        return st, ulaw_encode(float_to_pcm16(out["out"])).astype(jnp.uint8)

    _, ref = jax.jit(step)(state, params, rx_u8, mic)

    mesh = make_mesh(8)
    st_s = shard_tree(state, mesh, B)
    pr_s = shard_tree(params, mesh, B)
    rx_s = shard_tree({"x": rx_u8}, mesh, B)["x"]
    mic_s = shard_tree({"x": mic}, mesh, B)["x"]
    _, sh = jax.jit(step)(st_s, pr_s, rx_s, mic_s)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(sh))


def test_sharded_video_pixel_path(factory):
    """Video legs shard like audio legs: the mire->sizeconv pixel path on
    the 8-device mesh equals the unsharded result (the embarrassingly
    parallel video half of the leg axis)."""
    from mediastreamer2_tpu.core.block import Format
    from mediastreamer2_tpu.core.graph import GraphBuilder
    B = 16
    g = GraphBuilder(factory, batch=B)
    mire = g.add("mire", "cam", fmt=Format(kind="yuv420", width=64,
                                           height=48, fps=25.0))
    sc = g.add("size_conv", "sc", out_w=32, out_h=24)
    g.link(mire, 0, sc, 0)
    g.link(sc, 0, g.add("ext_sink", "out"), 0)
    cg = g.build()
    state, params = cg.init_state(), cg.init_params()
    ref_state, ref_out, _ = jax.jit(cg.step)(state, params, {})
    mesh = make_mesh(8)
    st_s = shard_tree(state, mesh, B)
    pr_s = shard_tree(params, mesh, B)
    sh_state, sh_out, _ = jax.jit(cg.step)(st_s, pr_s, {})
    np.testing.assert_allclose(np.asarray(ref_out["out"]),
                               np.asarray(sh_out["out"]), atol=1e-5)
