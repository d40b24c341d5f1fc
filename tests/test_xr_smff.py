"""RTCP XR VoIP metrics / SDES round trips; SMFF container round trip."""
import numpy as np
import pytest

from mediastreamer2_tpu.net import rtcp
from mediastreamer2_tpu.io.smff import (SmffWriter, SmffReader, SmffTrack,
                                        KIND_AUDIO, KIND_VIDEO)


def test_sdes_roundtrip():
    s = rtcp.Sdes(ssrc=42, cname="leg0@ms2tpu", tool="mediastreamer2_tpu")
    msgs = rtcp.parse_compound(s.pack())
    assert len(msgs) == 1
    got = msgs[0]
    assert got.ssrc == 42
    assert got.cname == "leg0@ms2tpu"
    assert got.tool == "mediastreamer2_tpu"


def test_xr_voip_metrics_roundtrip():
    m = rtcp.XrVoipMetrics(ssrc=7, loss_rate=25, discard_rate=3,
                           burst_density=40, gap_density=2,
                           burst_duration_ms=120, gap_duration_ms=4000,
                           round_trip_delay_ms=180, end_system_delay_ms=60,
                           r_factor=80, mos_lq=38, mos_cq=36,
                           jb_nominal_ms=80, jb_max_ms=240)
    pkt = rtcp.pack_xr(99, [m.pack()])
    msgs = rtcp.parse_compound(pkt)
    assert len(msgs) == 1
    got = msgs[0]
    assert isinstance(got, rtcp.XrVoipMetrics)
    assert got.ssrc == 7 and got.loss_rate == 25
    assert got.round_trip_delay_ms == 180
    assert got.mos_lq == 38 and got.r_factor == 80
    assert got.jb_max_ms == 240


def test_xr_in_compound_with_sr():
    sr = rtcp.SenderReport(1, 2, 3, 4, 5, 6, []).pack()
    xr = rtcp.pack_xr(1, [rtcp.XrVoipMetrics(ssrc=1, mos_lq=41).pack()])
    msgs = rtcp.parse_compound(sr + xr)
    kinds = [type(m).__name__ for m in msgs]
    assert kinds == ["SenderReport", "XrVoipMetrics"]


def test_smff_roundtrip(tmp_path):
    path = str(tmp_path / "t.smff")
    w = SmffWriter(path, [SmffTrack(KIND_AUDIO, "opus", 48000, 1),
                          SmffTrack(KIND_VIDEO, "vp8", 320, 240)])
    frames = [(0, 0, b"a0", True), (1, 0, b"v0-key", True),
              (0, 10, b"a1", True), (1, 40, b"v1", False),
              (0, 1500, b"a-late", True)]
    for t, ts, d, k in frames:
        w.write_frame(t, ts, d, k)
    w.close()
    r = SmffReader(path)
    assert r.tracks[0].codec == "opus" and r.tracks[0].a == 48000
    assert r.tracks[1].kind == KIND_VIDEO and r.tracks[1].b == 240
    got = [(f.track, f.ts_ms, f.data, f.keyframe) for f in r.frames()]
    assert got == frames
    assert [f.ts_ms for f in r.frames(from_ms=100)] == [1500]
