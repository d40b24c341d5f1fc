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
    frames = [(0, 0, b"a0"), (1, 0, b"v0-key"),
              (0, 10, b"a1"), (1, 40, b"v1"),
              (0, 1500, b"a-late")]
    for t, ts, d in frames:
        w.write_frame(t, ts, d)
    w.close()
    r = SmffReader(path)
    assert r.tracks[0].codec == "opus" and r.tracks[0].a == 48000
    assert r.tracks[0].b == 1
    assert r.tracks[1].kind == KIND_VIDEO and r.tracks[1].codec == "vp8"
    got = [(f.track, f.ts_ms, f.data) for f in r.frames()]
    assert got == frames
    assert [f.ts_ms for f in r.frames(from_ms=100)] == [1500]
    assert r.duration_ms(0) == 1500


def test_smff_wire_format(tmp_path):
    """Byte-level check against the reference's structs (smff.cpp:33-52):
    root layout, zlib-compressed track section, descriptor/record packing,
    timestamps in track clock units, positions relative to the data part."""
    import struct
    import zlib
    path = str(tmp_path / "wire.smff")
    w = SmffWriter(path, [SmffTrack(KIND_AUDIO, "opus", 48000, 2)])
    w.write_frame(0, 20, b"frame-one")           # 20 ms @48k -> ts 960
    w.write_frame(0, 40, b"frame-twoo")          # 40 ms -> ts 1920
    w.close()
    raw = open(path, "rb").read()
    magic, version, track_pos, data_pos = struct.unpack("!4sIII", raw[:16])
    assert magic == b"SMFF" and version == 0
    assert data_pos == 16                        # sizeof(SMFFRoot)
    # data part: raw payloads back to back
    assert raw[16:16 + 9] == b"frame-one"
    assert raw[25:25 + 10] == b"frame-twoo"
    assert track_pos == 16 + 9 + 10
    # track section: ONE zlib stream of descriptor + records
    section = zlib.decompress(raw[track_pos:])
    codec, kind, ch, tid, pad, rate, nrec = struct.unpack_from(
        "!16sBBBBII", section, 0)
    assert codec.rstrip(b"\x00") == b"opus"
    assert (kind, ch, tid, rate, nrec) == (0, 2, 0, 48000, 2)
    ts0, pos0, sz0 = struct.unpack_from("!III", section, 28)
    ts1, pos1, sz1 = struct.unpack_from("!III", section, 40)
    assert (ts0, pos0, sz0) == (960, 0, 9)       # clock units, rel. position
    assert (ts1, pos1, sz1) == (1920, 9, 10)
    assert len(section) == 28 + 2 * 12


def test_xr_rrt_dlrr_statsummary_roundtrip():
    """RFC 3611 blocks 4/5/6: receiver reference time + DLRR (the RTT
    anchor pair for one-way flows) and the statistics summary block."""
    rrt = rtcp.XrReceiverReferenceTime(ntp=0x0123456789ABCDEF)
    dlrr = rtcp.XrDlrr(subblocks=[(0xAAA, 0x11111111, 6554),
                                  (0xBBB, 0x22222222, 0)])
    ss = rtcp.XrStatSummary(ssrc=9, begin_seq=100, end_seq=200, lost=3,
                            dup=1, min_jitter=2, max_jitter=40,
                            mean_jitter=11, dev_jitter=5)
    pkt = rtcp.pack_xr(1, [rrt.pack(), dlrr.pack(), ss.pack()])
    msgs = rtcp.parse_compound(pkt)
    kinds = [type(m).__name__ for m in msgs]
    assert kinds == ["XrReceiverReferenceTime", "XrDlrr", "XrStatSummary"]
    assert msgs[0].ntp == 0x0123456789ABCDEF
    assert msgs[1].subblocks == [(0xAAA, 0x11111111, 6554),
                                 (0xBBB, 0x22222222, 0)]
    got = msgs[2]
    assert (got.begin_seq, got.end_seq, got.lost, got.dup) == (100, 200, 3, 1)
    assert (got.min_jitter, got.max_jitter, got.mean_jitter,
            got.dev_jitter) == (2, 40, 11, 5)


def test_rtcp_compound_carries_sdes_cname():
    """RFC 3550 §6.1: SR compounds include SDES CNAME; configurable via
    set_rtcp_information (mediastream.c parity)."""
    from mediastreamer2_tpu.net.rtp import RtpSession, LoopbackPair
    pair = LoopbackPair()
    sess = RtpSession(pair.endpoint(0), payload_type=0)
    r = sess.attach_rtcp(interval_s=0.0)
    r.set_rtcp_information("alice@example.org", "ms2tpu-test")
    r._next_emit = 0.0
    pkt = r.maybe_emit(pair.endpoint(0))
    msgs = rtcp.parse_compound(pkt)
    kinds = [type(m).__name__ for m in msgs]
    assert kinds == ["SenderReport", "Sdes"]
    assert msgs[1].cname == "alice@example.org"
    assert msgs[1].tool == "ms2tpu-test"
