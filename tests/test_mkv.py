"""MKV container round trips — Opus audio + VP8 video record/playback
(parity: MSMKVRecorder/MSMKVPlayer, src/videofilters/mkv.cpp)."""
import numpy as np
import pytest

from mediastreamer2_tpu.io.mkv import (MkvWriter, MkvReader, MkvTrack,
                                       TRACK_TYPE_AUDIO, TRACK_TYPE_VIDEO)
from mediastreamer2_tpu.ops import host_codecs as hc
from mediastreamer2_tpu.ops import vp8
from mediastreamer2_tpu.utils.audiodiff import audio_diff
from conftest import make_speechlike


def test_mkv_structure_roundtrip(tmp_path):
    path = str(tmp_path / "t.mkv")
    w = MkvWriter(path, [
        MkvTrack(1, TRACK_TYPE_AUDIO, "A_OPUS", sampling_rate=48000,
                 channels=1, codec_private=b"OpusHead..."),
        MkvTrack(2, TRACK_TYPE_VIDEO, "V_VP8", width=64, height=48),
    ])
    frames = [(1, 0, b"audio0", True), (2, 0, b"video0", True),
              (1, 20, b"audio1", True), (1, 1500, b"audio2", True),
              (2, 1500, b"video1", False)]
    for t, ts, data, kf in frames:
        w.write_frame(t, ts, data, kf)
    w.close()

    r = MkvReader(path)
    assert r.tracks[1].codec_id == "A_OPUS"
    assert r.tracks[1].sampling_rate == 48000
    assert r.tracks[1].codec_private == b"OpusHead..."
    assert r.tracks[2].codec_id == "V_VP8"
    assert (r.tracks[2].width, r.tracks[2].height) == (64, 48)
    got = [(f.track, f.ts_ms, f.data, f.keyframe) for f in r.frames()]
    assert got == frames
    # seek without cues: frames from 1000 ms onward
    late = [(f.track, f.ts_ms) for f in r.frames(from_ms=1000)]
    assert late == [(1, 1500), (2, 1500)]


@pytest.mark.skipif(not hc.opus_available(), reason="libopus missing")
def test_mkv_opus_record_play(tmp_path):
    rate, frame = 48000, 480
    sig = make_speechlike(frame * 100, rate, seed=8)
    # complexity pinned: the container round trip asserts on similarity,
    # and the 1-core host default (complexity 0, reference msopus.c policy)
    # encodes just under this test's 0.8 bar
    enc = hc.OpusEncoder(rate=rate, bitrate=64000, complexity=9)
    path = str(tmp_path / "a.mkv")
    w = MkvWriter(path, [MkvTrack(1, TRACK_TYPE_AUDIO, "A_OPUS",
                                  sampling_rate=rate, channels=1)])
    for i in range(100):
        w.write_frame(1, i * 10, enc.encode(sig[i*frame:(i+1)*frame]))
    w.close()

    dec = hc.OpusDecoder(rate=rate)
    r = MkvReader(path)
    out = np.concatenate([dec.decode(f.data, frame) for f in r.frames()])
    sim, _ = audio_diff(sig, out)
    assert sim > 0.8, f"mkv opus round trip sim {sim}"


@pytest.mark.skipif(not vp8.vp8_available(), reason="libvpx missing")
def test_mkv_vp8_record_play(tmp_path):
    W, H = 64, 48
    enc = vp8.Vp8Encoder(W, H, bitrate_bps=300_000)
    path = str(tmp_path / "v.mkv")
    w = MkvWriter(path, [MkvTrack(1, TRACK_TYPE_VIDEO, "V_VP8",
                                  width=W, height=H)])
    ys = []
    for i in range(10):
        y = ((np.arange(H)[:, None] + np.arange(W)[None, :] + i * 5) % 200
             ).astype(np.uint8)
        u = np.full((H // 2, W // 2), 128, np.uint8)
        data, kf = enc.encode_planes(y, u, u)
        w.write_frame(1, i * 40, data, kf)
        ys.append(y)
    w.close()

    dec = vp8.Vp8Decoder()
    r = MkvReader(path)
    frames = list(r.frames())
    assert len(frames) == 10
    assert frames[0].keyframe and not frames[1].keyframe
    last = None
    for f in frames:
        out = dec.decode(f.data)
        assert out is not None
        last = out
    mse = float(((last[0].astype(float) - ys[-1].astype(float)) ** 2).mean())
    assert mse < 50.0
