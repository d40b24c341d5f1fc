"""Sharded execution on the 8-device virtual CPU mesh: leg-parallel step
equals unsharded step; conference groups spanning shards mix correctly
(cross-device segment-sum collectives)."""
import numpy as np
import jax
import jax.numpy as jnp

from mediastreamer2_tpu.models.flagship import build_flagship, example_inputs
from mediastreamer2_tpu.parallel.sharding import make_mesh, shard_tree


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


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
    """Groups of 4 with 2 legs per shard: every conference spans 2 devices."""
    B = 16
    cg, params = build_flagship(factory, batch=B, conf_size=4)
    mesh = make_mesh(8)
    state = shard_tree(cg.init_state(), mesh, B)
    params = shard_tree(params, mesh, B)
    ext = example_inputs(B, seed=3)
    # distinctive per-leg DC levels to verify mix-minus arithmetic
    ext["mic"] = np.zeros_like(ext["mic"])
    ext["spk_ref"] = np.zeros_like(ext["spk_ref"])
    ext = shard_tree(ext, mesh, B)
    st, out, _ = jax.jit(cg.step)(state, params, ext)
    out = np.asarray(out["out"])
    assert out.shape == (B, 160)
    assert np.isfinite(out).all()


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
