"""MediaRecorder->MKV->MediaPlayer round trip (msmediaplayer/recorder mkv
parity)."""
import time

import numpy as np
import pytest

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.media_player import MediaPlayer, MediaRecorder
from mediastreamer2_tpu.ops import host_codecs as hc
from mediastreamer2_tpu.utils.audiodiff import audio_diff
from conftest import make_speechlike

pytestmark = pytest.mark.skipif(not hc.opus_available(),
                                reason="libopus missing")


def test_record_mkv_then_play(factory, tmp_path):
    rate = 48000
    S = tick_samples(rate)
    sig = make_speechlike(S * 60, rate, seed=12)
    rec = MediaRecorder(factory, rate=rate)
    rec.set_input(lambda t: sig[t * S:(t + 1) * S] if (t + 1) * S <= len(sig)
                  else np.zeros(S, np.float32))
    rec.ticker.realtime = False
    rec.run(60)
    path = rec.stop_and_save(str(tmp_path / "call.mkv"))

    mp = MediaPlayer(factory)
    out_chunks = []
    mp.set_output(out_chunks.append)
    mp.open(path)
    assert 550 <= mp.duration_ms <= 650
    mp.ticker.realtime = False
    mp.start()
    deadline = time.time() + 10
    while not out_chunks or (mp.get_position_ms() < mp.duration_ms
                             and time.time() < deadline):
        time.sleep(0.02)
    mp.close()
    out = np.concatenate(out_chunks)
    sim, _ = audio_diff(sig, out)
    assert sim > 0.75, f"mkv record/play sim {sim}"


def test_media_player_smff_audio(factory, tmp_path):
    """MSMediaPlayer parity for the SMFF container (smff/player.cpp):
    write pcm16 SMFF, open with MediaPlayer, play to the sink."""
    import numpy as np
    from mediastreamer2_tpu.io.smff import SmffWriter, SmffTrack
    from mediastreamer2_tpu.models.media_player import MediaPlayer
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    rate = 8000
    n = rate  # 1 s
    sig = (0.4 * np.sin(2 * np.pi * 440 * np.arange(n) / rate)
           ).astype(np.float32)
    path = str(tmp_path / "clip.smff")
    w = SmffWriter(path, [SmffTrack(kind=0, codec="pcm16", a=rate, b=1)])
    pcm = (sig * 32768).clip(-32768, 32767).astype("<i2")
    for k in range(0, n, 80):
        w.write_frame(0, k * 1000 // rate, pcm[k:k + 80].tobytes())
    w.close()

    player = MediaPlayer(factory)
    player.open(path)
    got = []
    player.set_output(lambda block: got.append(np.asarray(block)))
    player.ticker.realtime = False
    player.ticker.mutate(lambda tk: tk.params["play"].__setitem__(
        "playing", __import__("jax.numpy", fromlist=["ones"]).ones((1,), bool)))
    for _ in range(110):
        player.ticker.do_tick()
    out = np.concatenate(got)[:n]
    sim, _ = audio_diff(sig, out)
    assert sim > 0.99, sim


def test_media_player_av_video_branch(factory, tmp_path):
    """A/V playback: the player's video branch decodes the VP8 track and
    delivers frames paced by container timestamps (msmediaplayer.c's
    video chain; StreamRegulator pacing)."""
    import numpy as np
    import pytest
    from mediastreamer2_tpu.ops.vp8 import vp8_available, Vp8Encoder
    from mediastreamer2_tpu.io.mkv import (MkvWriter, MkvTrack,
                                           TRACK_TYPE_AUDIO, TRACK_TYPE_VIDEO)
    from mediastreamer2_tpu.models.media_player import MediaPlayer
    if not vp8_available():
        pytest.skip("libvpx unavailable")
    rate = 8000
    n = rate                                # 1 s
    sig = (0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / rate)
           ).astype(np.float32)
    pcm = (sig * 32768).clip(-32768, 32767).astype("<i2")
    path = str(tmp_path / "av.mkv")
    w = MkvWriter(path, [
        MkvTrack(1, TRACK_TYPE_AUDIO, "A_PCM/INT/LIT",
                 sampling_rate=rate, channels=1),
        MkvTrack(2, TRACK_TYPE_VIDEO, "V_VP8", width=64, height=48)])
    enc = Vp8Encoder(64, 48, fps=10)
    rng = np.random.default_rng(0)
    y0 = (rng.random((48, 64)) * 255).astype(np.uint8)
    u0 = v0 = np.full((24, 32), 128, np.uint8)
    for k in range(0, n, 160):              # 20 ms audio frames
        w.write_frame(1, k * 1000 // rate, pcm[k:k + 160].tobytes())
    for fk in range(10):                    # 10 fps video
        data, key = enc.encode_planes(np.roll(y0, fk * 4, axis=1), u0, v0,
                                      force_keyframe=(fk == 0))
        w.write_frame(2, fk * 100, data, keyframe=key)
    w.close()

    player = MediaPlayer(factory)
    player.open(path)
    frames = []
    player.on_video = lambda yuv: frames.append(yuv[0].shape)
    player.ticker.realtime = False
    import jax.numpy as jnp
    player.ticker.mutate(lambda tk: tk.params["play"].__setitem__(
        "playing", jnp.ones((1,), bool)))
    for _ in range(110):
        player.ticker.do_tick()
    assert player.video_frames_played >= 8, player.video_frames_played
    assert frames[0] == (48, 64)


def test_media_recorder_av_roundtrip(factory, tmp_path):
    """Record A/V (opus + VP8 mkv), reopen with MediaPlayer, get both the
    audio and the paced video back (msmediarecorder.c A/V parity)."""
    import numpy as np
    import pytest
    from mediastreamer2_tpu.ops.vp8 import vp8_available
    from mediastreamer2_tpu.models.media_player import (MediaRecorder,
                                                        MediaPlayer)
    if not vp8_available():
        pytest.skip("libvpx unavailable")
    rate = 16000
    rec = MediaRecorder(factory, rate=rate)
    rec.enable_video(64, 48)
    S = rate // 100
    sig = (0.3 * np.sin(2 * np.pi * 500 * np.arange(S * 100) / rate)
           ).astype(np.float32)
    rec.set_input(lambda t: sig[t * S:(t + 1) * S])
    rec.ticker.warm_up()
    rec.ticker.realtime = False
    rng = np.random.default_rng(1)
    block = rng.random((48 * 3 // 2, 64)).astype(np.float32)
    for t in range(100):
        rec.ticker.do_tick()
        if t % 10 == 0:                      # 10 fps
            rec.push_video_frame(np.roll(block, t, axis=1))
    path = str(tmp_path / "rec_av.mkv")
    rec.stop_and_save(path)

    player = MediaPlayer(factory)
    player.open(path)
    vids = []
    player.on_video = lambda yuv: vids.append(yuv[0].shape)
    player.ticker.realtime = False
    import jax.numpy as jnp
    player.ticker.mutate(lambda tk: tk.params["play"].__setitem__(
        "playing", jnp.ones((1,), bool)))
    for _ in range(110):
        player.ticker.do_tick()
    assert player.video_frames_played >= 8
    assert vids and vids[0] == (48, 64)


def test_media_player_smff_av(factory, tmp_path):
    """SMFF A/V playback (smff/player.cpp parity): pcm16 audio + vp8
    video tracks both delivered."""
    import numpy as np
    import pytest
    from mediastreamer2_tpu.ops.vp8 import vp8_available, Vp8Encoder
    from mediastreamer2_tpu.io.smff import SmffWriter, SmffTrack
    from mediastreamer2_tpu.models.media_player import MediaPlayer
    if not vp8_available():
        pytest.skip("libvpx unavailable")
    rate = 8000
    n = rate
    sig = (0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / rate)
           ).astype(np.float32)
    pcm = (sig * 32768).clip(-32768, 32767).astype("<i2")
    path = str(tmp_path / "clip_av.smff")
    w = SmffWriter(path, [SmffTrack(kind=0, codec="pcm16", a=rate, b=1),
                          SmffTrack(kind=1, codec="vp8", a=64, b=48)])
    enc = Vp8Encoder(64, 48, fps=10)
    rng = np.random.default_rng(2)
    y0 = (rng.random((48, 64)) * 255).astype(np.uint8)
    u0 = v0 = np.full((24, 32), 128, np.uint8)
    for k in range(0, n, 80):
        w.write_frame(0, k * 1000 // rate, pcm[k:k + 80].tobytes())
    for fk in range(10):
        data, key = enc.encode_planes(np.roll(y0, fk * 3, axis=1), u0, v0,
                                      force_keyframe=(fk == 0))
        w.write_frame(1, fk * 100, data, keyframe=key)
    w.close()

    player = MediaPlayer(factory)
    player.open(path)
    vids = []
    player.on_video = lambda yuv: vids.append(1)
    player.ticker.realtime = False
    import jax.numpy as jnp
    player.ticker.mutate(lambda tk: tk.params["play"].__setitem__(
        "playing", jnp.ones((1,), bool)))
    for _ in range(110):
        player.ticker.do_tick()
    assert player.video_frames_played >= 8


def test_third_party_mkv_sintel_av(factory):
    """Interop: the reference's sintel_trailer_opus_vp8.mkv (muxed by a
    third-party tool) demuxes and plays — opus audio decodes, VP8 video
    frames decode at full resolution (MkvReader + MediaPlayer against
    real-world EBML, not our own writer's output)."""
    import os
    import numpy as np
    import pytest
    from mediastreamer2_tpu.ops.vp8 import vp8_available
    from mediastreamer2_tpu.ops import host_codecs as hc
    from mediastreamer2_tpu.models.media_player import MediaPlayer
    path = "/root/reference/tester/sounds/sintel_trailer_opus_vp8.mkv"
    if not os.path.exists(path):
        pytest.skip("reference fixtures not mounted")
    if not (vp8_available() and hc.opus_available()):
        pytest.skip("codec libs missing")
    player = MediaPlayer(factory)
    player.open(path)
    assert player.rate == 48000
    got_audio = []
    vids = []
    player.set_output(lambda blk: got_audio.append(np.abs(blk).max()))
    player.on_video = lambda yuv: vids.append(yuv[0].shape)
    player.ticker.realtime = False
    import jax.numpy as jnp
    player.ticker.mutate(lambda tk: tk.params["play"].__setitem__(
        "playing", jnp.ones((1,), bool)))
    for _ in range(300):                    # 3 s of the trailer
        player.ticker.do_tick()
    assert max(got_audio) > 0.01            # real audio decoded
    assert player.video_frames_played >= 20
    assert vids[0] == (360, 848)            # full third-party resolution


def test_third_party_mkv_sintel_h264(factory):
    """H.264-in-MKV interop: avcC codec-private parsed, length-prefixed
    NALs converted to Annex B, frames decode at full resolution (the
    reference mkv player's codec-private handling, mkv.cpp)."""
    import os
    import pytest
    from mediastreamer2_tpu.ops.h264 import h264_available
    from mediastreamer2_tpu.models.media_player import MediaPlayer
    path = "/root/reference/tester/sounds/sintel_trailer_opus_h264.mkv"
    if not os.path.exists(path):
        pytest.skip("reference fixtures not mounted")
    if not h264_available():
        pytest.skip("avcodec missing")
    player = MediaPlayer(factory)
    player.open(path)
    vids = []
    player.on_video = lambda yuv: vids.append(yuv[0].shape)
    player.ticker.realtime = False
    import jax.numpy as jnp
    player.ticker.mutate(lambda tk: tk.params["play"].__setitem__(
        "playing", jnp.ones((1,), bool)))
    for _ in range(200):
        player.ticker.do_tick()
    assert player.video_frames_played >= 20
    assert vids[0] == (360, 848)


def test_third_party_mka_audio(factory):
    """hello_opus.mka (8 kHz opus) and hello_pcmu.mka (A_MS/ACM mu-law)
    both open and decode real speech — the reference's own recorded
    containers through our demuxer."""
    import os
    import numpy as np
    import pytest
    from mediastreamer2_tpu.ops import host_codecs as hc
    from mediastreamer2_tpu.models.media_player import _read_mkv_audio
    FIX = "/root/reference/tester/sounds"
    if not os.path.isdir(FIX):
        pytest.skip("reference fixtures not mounted")
    sig, rate = _read_mkv_audio(f"{FIX}/hello_pcmu.mka")
    assert rate == 8000 and len(sig) > 8000
    assert 0.01 < np.abs(sig).max() <= 1.0
    if hc.opus_available():
        sig2, rate2 = _read_mkv_audio(f"{FIX}/hello_opus.mka")
        assert rate2 == 8000 and len(sig2) > 4000
        assert np.abs(sig2).max() > 0.01


def test_media_recorder_smff_av_roundtrip(factory, tmp_path):
    """'Record .smff' recorder tester case: A/V into the wire-compatible
    SMFF, played back by MediaPlayer (audio similarity + video frames)."""
    import numpy as np
    import pytest
    from mediastreamer2_tpu.ops.vp8 import vp8_available
    from mediastreamer2_tpu.models.media_player import (MediaPlayer,
                                                        MediaRecorder)
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    if not vp8_available():
        pytest.skip("libvpx unavailable")
    rate, ticks = 8000, 100
    S = rate // 100
    sig = (0.4 * np.sin(2 * np.pi * 440 * np.arange(S * ticks) / rate)
           ).astype(np.float32)
    rec = MediaRecorder(factory, rate=rate)
    rec.set_input(lambda t: sig[t * S:(t + 1) * S] if t < ticks
                  else np.zeros(S, np.float32))
    rec.enable_video(64, 48)
    rng = np.random.default_rng(5)
    base = rng.random((48 * 3 // 2, 64)).astype(np.float32)
    rec.ticker.realtime = False
    rec.ticker.warm_up()
    for t in range(ticks):
        rec.ticker.do_tick()
        if t % 10 == 0:
            rec.push_video_frame(np.roll(base, t, axis=1))
    path = str(tmp_path / "clip.smff")
    rec.stop_and_save(path)

    player = MediaPlayer(factory)
    player.open(path)
    got = []
    player.set_output(lambda block: got.append(np.asarray(block)))
    player.ticker.realtime = False
    import jax.numpy as jnp
    player.ticker.mutate(lambda tk: tk.params["play"].__setitem__(
        "playing", jnp.ones((1,), bool)))
    for _ in range(ticks + 20):
        player.ticker.do_tick()
    out = np.concatenate([b.reshape(-1) for b in got])[: len(sig)]
    sim, _ = audio_diff(sig, out)
    assert sim > 0.95, f"smff audio sim {sim}"
    assert player.video_frames_played >= 6


def test_media_player_loop_and_replay(factory, tmp_path):
    """Player tester 'Loop test' + 'Playing twice': looping wraps past
    EOF; a second play after completion replays from the start."""
    import numpy as np
    from mediastreamer2_tpu.io.wav import write_wav
    from mediastreamer2_tpu.models.media_player import MediaPlayer
    rate, n = 8000, 1600                    # 0.2 s file
    sig = (0.4 * np.sin(2 * np.pi * 440 * np.arange(n) / rate)
           ).astype(np.float32)
    path = str(tmp_path / "short.wav")
    write_wav(path, sig, rate)
    player = MediaPlayer(factory)
    player.open(path)
    got = []
    player.set_output(lambda b: got.append(np.asarray(b).reshape(-1)))
    player.set_loop(True)
    player.ticker.realtime = False
    import jax.numpy as jnp
    player.ticker.mutate(lambda tk: tk.params["play"].__setitem__(
        "playing", jnp.ones((1,), bool)))
    for _ in range(60):                      # 0.6 s > 3 loops
        player.ticker.do_tick()
    out = np.concatenate(got)
    # energy continues past the file length (looping, not silence)
    assert np.abs(out[n: 2 * n]).max() > 0.2
    # a seek back to 0 replays ('Playing twice')
    got.clear()
    player.set_loop(False)
    player.seek_ms(0)
    for _ in range(25):
        player.ticker.do_tick()
    replay = np.concatenate(got)[:n]
    assert np.abs(replay).max() > 0.2


def test_player_playing_twice(factory, tmp_path):
    """player tester 'Playing twice': one MediaPlayer instance opens,
    plays, closes, then opens and plays ANOTHER file — state fully
    recycled between uses."""
    from mediastreamer2_tpu.io.wav import write_wav
    from mediastreamer2_tpu.models.media_player import MediaPlayer
    rate = 8000
    t = np.arange(rate) / rate
    f1 = str(tmp_path / "one.wav")
    f2 = str(tmp_path / "two.wav")
    write_wav(f1, (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), rate)
    write_wav(f2, (0.4 * np.sin(2 * np.pi * 880 * t)).astype(np.float32), rate)
    mp = MediaPlayer(factory)
    heard = []
    for path, freq in ((f1, 440), (f2, 880)):
        mp.open(path)
        chunks = []
        mp.set_output(lambda blk: chunks.append(blk))
        mp.start()
        mp.ticker.stop()                 # tick manually below (one driver)
        mp.ticker.realtime = False
        for _ in range(110):
            mp.ticker.do_tick()
        mp.close()
        audio = np.concatenate([np.asarray(c).reshape(-1) for c in chunks])
        spec = np.abs(np.fft.rfft(audio))
        heard.append(np.argmax(spec) * rate / len(audio))
    assert abs(heard[0] - 440) < 10, heard
    assert abs(heard[1] - 880) < 10, heard


def test_link_video_av_call_recording(factory, tmp_path):
    """audio_stream_link_video (audiostream.c:2616): an audio call's
    recording plus the linked video stream's received frames land in one
    A/V MKV that MediaPlayer plays back."""
    from mediastreamer2_tpu.ops.vp8 import vp8_available
    if not vp8_available():
        import pytest
        pytest.skip("libvpx missing")
    from mediastreamer2_tpu.core.block import tick_samples
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    from mediastreamer2_tpu.models.video_stream import VideoStreamBatch
    from mediastreamer2_tpu.core.block import Format
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    from conftest import make_speechlike

    ticks = 80
    S = tick_samples(8000)
    sig = make_speechlike(S * (ticks + 20), 8000, seed=17)
    atx = AudioStreamBatch(factory, 1, mic_signal=sig)
    arx = AudioStreamBatch(factory, 1, record_ticks=ticks + 30)
    apair = LoopbackPair()
    atx.set_transport(0, apair.endpoint(0))
    arx.set_transport(0, apair.endpoint(1))

    vfmt = Format(kind="yuv420", width=64, height=64, fps=25.0)
    vtx = VideoStreamBatch(factory, 1, fmt=vfmt, fps=25.0, codec="vp8")
    vrx = VideoStreamBatch(factory, 1, fmt=vfmt, fps=25.0, codec="vp8")
    vpair = LoopbackPair()
    vtx.set_transport(0, vpair.endpoint(0))
    vrx.set_transport(0, vpair.endpoint(1))
    vtx.bind_assemblers()
    vrx.bind_assemblers()

    arx.link_video(vrx)                        # the reference's ITC hookup
    for s in (atx, arx, vtx, vrx):
        s.ticker.realtime = False
        s.ticker.warm_up()
    for _ in range(ticks + 20):
        atx.ticker.do_tick(); vtx.ticker.do_tick()
        arx.ticker.do_tick(); vrx.ticker.do_tick()
    path = str(tmp_path / "call_av.mkv")
    arx.save_av_recording(path)
    arx.unlink_video()
    for s in (atx, arx, vtx, vrx):
        s.stop()

    # the file plays back with both tracks
    from mediastreamer2_tpu.models.media_player import MediaPlayer
    mp = MediaPlayer(factory)
    mp.open(path)
    frames = []
    mp.on_video = lambda fr: frames.append(fr)
    chunks = []
    mp.set_output(lambda blk: chunks.append(blk))
    mp.start()
    mp.ticker.stop()                     # tick manually below (one driver)
    mp.ticker.realtime = False
    for _ in range(ticks + 20):
        mp.ticker.do_tick()
    mp.close()
    audio = np.concatenate([np.asarray(c).reshape(-1) for c in chunks])
    assert float(np.abs(audio).max()) > 0.05   # call audio present
    assert frames                              # video frames present
