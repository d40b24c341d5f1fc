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
