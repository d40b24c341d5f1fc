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
