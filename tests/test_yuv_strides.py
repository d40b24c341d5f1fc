"""ms_yuv_buf_copy_with_pix_strides parity — the framework tester's
"Copy yuv buffer with pixel strides: {planar,semi-planar} x
{planar,semi-planar} [with sliding]" matrix
(mediastreamer2_framework_tester.c:396-499)."""
import numpy as np
import pytest

from mediastreamer2_tpu.ops.video import yuv_copy_with_pix_strides

W, H = 32, 24


def _make_planar(fill=0):
    y = np.full(W * H, fill, np.uint8)
    u = np.full(W * H // 4, fill, np.uint8)
    v = np.full(W * H // 4, fill, np.uint8)
    planes = [y, u, v]
    row_strides = [W, W // 2, W // 2]
    pix_strides = [1, 1, 1]
    return planes, row_strides, pix_strides


def _make_semiplanar(fill=0):
    """NV12: Y plane + interleaved UV plane. U and V are views into the
    same buffer at pixel stride 2 (the reference models it the same way)."""
    y = np.full(W * H, fill, np.uint8)
    uv = np.full(W * H // 2, fill, np.uint8)
    planes = [y, uv, uv[1:]]
    row_strides = [W, W, W]
    pix_strides = [1, 2, 2]
    return planes, row_strides, pix_strides


def _pattern(planes, pix_strides, row_strides):
    """Deterministic pattern over each plane's logical pixels."""
    sizes = [(W, H), (W // 2, H // 2), (W // 2, H // 2)]
    for p, (pl, ps, rs) in enumerate(zip(planes, pix_strides, row_strides)):
        pw, ph = sizes[p]
        for yy in range(ph):
            for xx in range(pw):
                pl.reshape(-1)[yy * rs + xx * ps] = \
                    (p * 64 + yy * 7 + xx * 3) & 0xFF


def _read(planes, pix_strides, row_strides, p, x, y):
    return int(planes[p].reshape(-1)[y * row_strides[p] + x * pix_strides[p]])


CASES = [("planar", "planar"), ("planar", "semi"),
         ("semi", "planar"), ("semi", "semi")]


@pytest.mark.parametrize("src_kind,dst_kind", CASES)
@pytest.mark.parametrize("sliding", [False, True])
def test_yuv_copy_with_pix_strides(src_kind, dst_kind, sliding):
    make = {"planar": _make_planar, "semi": _make_semiplanar}
    sp, srs, sps = make[src_kind]()
    dp, drs, dps = make[dst_kind](fill=0xEE)
    _pattern(sp, sps, srs)
    src_roi = (8, 4, 16, 12)
    dst_roi = (4, 8, 16, 12) if sliding else src_roi
    yuv_copy_with_pix_strides(sp, srs, sps, src_roi, dp, drs, dps, dst_roi)
    # every pixel inside the ROI landed; chroma ROI is halved
    rois = [(src_roi, dst_roi),
            (tuple(v // 2 for v in src_roi), tuple(v // 2 for v in dst_roi)),
            (tuple(v // 2 for v in src_roi), tuple(v // 2 for v in dst_roi))]
    for p, ((sx, sy, w, h), (dx, dy, _, _)) in enumerate(rois):
        for yy in range(h):
            for xx in range(w):
                want = _read(sp, sps, srs, p, sx + xx, sy + yy)
                got = _read(dp, dps, drs, p, dx + xx, dy + yy)
                assert got == want, (p, xx, yy, want, got)
    # outside the ROI the destination is untouched (spot check corners)
    for p in range(3):
        assert _read(dp, dps, drs, p, 0, 0) == 0xEE


def test_semiplanar_views_interleave_correctly():
    """U/V views of one NV12 buffer don't clobber each other."""
    dp, drs, dps = _make_semiplanar(fill=0)
    sp, srs, sps = _make_planar()
    sp[1][:] = 0x11
    sp[2][:] = 0x22
    roi = (0, 0, W, H)
    yuv_copy_with_pix_strides(sp, srs, sps, roi, dp, drs, dps, roi)
    uv = dp[1]                                 # the interleaved buffer
    assert set(uv.reshape(-1)[0:W:2].tolist()) == {0x11}
    assert set(uv.reshape(-1)[1:W:2].tolist()) == {0x22}
