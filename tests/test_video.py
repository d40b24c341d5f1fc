"""Video op tests — pixconv/sizeconv/rotation parity targets from
src/voip/msvideo.c and videofilters (mire, pixconv, sizeconv)."""
import numpy as np
import jax
import pytest

from mediastreamer2_tpu.core.block import Format
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.ops.video import (yuv420_to_rgb, rgb_to_yuv420,
                                          scale_yuv420, rotate_yuv420,
                                          split_yuv420)

W, H = 64, 48
VFMT = Format(kind="yuv420", width=W, height=H, fps=100.0)


def _rand_rgb(B=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)


def test_rgb_yuv_roundtrip():
    rgb = _rand_rgb()
    # smooth the chroma (420 halves chroma resolution; use a blurred image)
    rgb = np.array(jax.image.resize(
        jax.image.resize(rgb, (2, H // 4, W // 4, 3), "linear"),
        (2, H, W, 3), "linear"))
    back = np.asarray(yuv420_to_rgb(rgb_to_yuv420(rgb), W, H))
    assert np.abs(back - rgb).mean() < 0.02


def test_scale_yuv420_shapes_and_content():
    rgb = _rand_rgb(1)
    yuv = rgb_to_yuv420(rgb)
    scaled = scale_yuv420(yuv, W, H, W // 2, H // 2)
    assert scaled.shape == (1, (H // 2) * 3 // 2, W // 2)
    y0, _, _ = split_yuv420(np.asarray(yuv), W, H)
    y1, _, _ = split_yuv420(np.asarray(scaled), W // 2, H // 2)
    assert abs(float(y0.mean()) - float(y1.mean())) < 0.01  # brightness kept


def test_rotation_90():
    rgb = _rand_rgb(1)
    yuv = np.asarray(rgb_to_yuv420(rgb))
    rot = np.asarray(rotate_yuv420(yuv, W, H, 90))
    assert rot.shape == (1, W * 3 // 2, H)   # swapped dims
    y, _, _ = split_yuv420(yuv, W, H)
    yr, _, _ = split_yuv420(rot, H, W)
    np.testing.assert_allclose(yr[0], np.rot90(y[0], k=-1), atol=1e-6)


def test_mire_pipeline(factory):
    B = 2
    g = GraphBuilder(factory, batch=B)
    m = g.add("mire", "cam", fmt=VFMT)
    pc = g.add("pix_conv", "pc", to="rgb")
    sc = g.add("size_conv", "sc", out_w=32, out_h=24)
    sink = g.add("ext_sink", "disp")
    g.chain(m, pc, sc, sink)
    cg = g.build()
    st, params = cg.init_state(), cg.init_params()
    frames = []
    for _ in range(3):
        st, out, _ = cg.step(st, params, {})
        frames.append(np.asarray(out["disp"]))
    assert frames[0].shape == (B, 24, 32, 3)
    assert np.isfinite(frames[0]).all()
    # pattern moves between frames
    assert np.abs(frames[2] - frames[0]).max() > 0.05


def test_analyse_display_event(factory):
    g = GraphBuilder(factory, batch=1)
    m = g.add("mire", "cam", fmt=VFMT)
    a = g.add("analyse_display", "ana")
    g.chain(m, a)
    cg = g.build()
    st, out, ev = cg.step(cg.init_state(), cg.init_params(), {})
    assert 0.0 < float(np.asarray(ev["ana.frame_mean"])[0]) < 1.0


def test_compose_selfview_pip():
    """MSVideoOut composite self-view: pip lands in the corner, main
    picture elsewhere untouched (videoout.c + layouts.c parity)."""
    import jax.numpy as jnp
    from mediastreamer2_tpu.ops.video import compose_selfview
    B, w, h = 1, 64, 48
    main = jnp.full((B, h * 3 // 2, w), 0.2, jnp.float32)
    pip = jnp.full((B, h * 3 // 2, w), 0.9, jnp.float32)
    out = np.asarray(compose_selfview(main, pip, "bottom_right",
                                      scale=0.25, margin=4))
    assert out.shape == (B, h * 3 // 2, w)
    # bottom-right corner contains pip luma, top-left stays main
    assert abs(out[0, 2, 2] - 0.2) < 0.05
    assert abs(out[0, h - 6, w - 6] - 0.9) < 0.1


def test_stream_regulator_paces_by_timestamp():
    from mediastreamer2_tpu.core.worker import StreamRegulator
    reg = StreamRegulator(clock_rate=90000)
    for k in range(5):
        reg.push(k * 3000, f"f{k}")          # 30 fps timestamps
    assert reg.pop_due(0.0) == ["f0"]
    assert reg.pop_due(0.034) == ["f1"]       # 1 frame due
    assert reg.pop_due(0.100) == ["f2", "f3"]
    assert reg.pop_due(0.200) == ["f4"]
    assert reg.pop_due(0.3) == []


def test_rtp_audio_level_extension_roundtrip():
    """RFC 6464 one-byte header extension at the RTP edge (msrtp.c
    audio-level insertion) — packs, survives transport, parses."""
    from mediastreamer2_tpu.net.rtp import RtpSession, RtpPacket, LoopbackPair
    pair = LoopbackPair()
    tx = RtpSession(pair.endpoint(0), payload_type=0, clock_rate=8000)
    tx.enable_audio_level_ext(ext_id=1)
    tx.set_audio_level(23, voice=True)
    tx.send_payload(b"\xff" * 80, ts_increment=80)
    data = pair.endpoint(1).recv_all()[0]
    pkt = RtpPacket.unpack(data)
    assert pkt.extensions == {1: bytes([0x80 | 23])}
    assert pkt.payload == b"\xff" * 80


def test_biplanar_conversions():
    """Framework-tester parity: ycbcrbiplanar (NV12/NV21) <-> planar, with
    the rotation/downscale combos of the reference's copy matrix."""
    import numpy as np
    import jax.numpy as jnp
    from mediastreamer2_tpu.ops.video import (nv12_to_i420, i420_to_nv12,
                                              nv12_to_yuv420_frame,
                                              split_yuv420)
    rng = np.random.default_rng(7)
    B, w, h = 2, 32, 24
    y = jnp.asarray(rng.random((B, h, w)), jnp.float32)
    u = jnp.asarray(rng.random((B, h // 2, w // 2)), jnp.float32)
    v = jnp.asarray(rng.random((B, h // 2, w // 2)), jnp.float32)
    for nv21 in (False, True):
        yy, uv = i420_to_nv12(y, u, v, nv21=nv21)
        y2, u2, v2 = nv12_to_i420(yy, uv, nv21=nv21)
        assert np.allclose(u2, u) and np.allclose(v2, v)
        assert np.allclose(y2, y)
    # rotation 90: dimensions swap, content rotates
    _, uv = i420_to_nv12(y, u, v)
    f90 = nv12_to_yuv420_frame(y, uv, degrees=90)
    y90, u90, _ = split_yuv420(f90, h, w)       # rotated: w x h
    assert y90.shape == (B, w, h)
    # rotation 180 + downscale by 2 (the tester's combined case)
    f = nv12_to_yuv420_frame(y, uv, degrees=180, out_w=w // 2, out_h=h // 2)
    yd, ud, vd = split_yuv420(f, w // 2, h // 2)
    assert yd.shape == (B, h // 2, w // 2)
    # 180 rotation = flip both axes; compare downsampled means coarsely
    ref = np.asarray(y)[:, ::-1, ::-1]
    got = np.asarray(yd)
    assert abs(ref.mean() - got.mean()) < 0.05


def test_jitter_packet_duplication():
    """'Packet duplication' tester case: duplicated packets neither corrupt
    playout order nor inflate loss/late stats (dict-by-seq dedupe)."""
    from mediastreamer2_tpu.net.jitter import JitterBuffer, JBParams
    from mediastreamer2_tpu.net.rtp import RtpPacket
    jb = JitterBuffer(JBParams(min_depth_ticks=1, adaptive=False))
    for seq in range(20):
        pkt = RtpPacket(0, seq, seq * 80, 1, bytes([seq]) * 10)
        jb.put(pkt)
        jb.put(pkt)                  # exact duplicate
    got = []
    for _ in range(25):
        p = jb.get_tick()
        if p is not None:
            got.append(p[0])
    assert got == list(range(20))    # each packet exactly once, in order
    assert jb.lost == 0
