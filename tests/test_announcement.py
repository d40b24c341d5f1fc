"""Local player branch: inject an announcement into a live call's send
path (reference: audiostream.c local player / av_player branch)."""
import numpy as np

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                    AudioStreamFeatures)
from mediastreamer2_tpu.net.rtp import LoopbackPair
from mediastreamer2_tpu.utils.audiodiff import audio_diff

S = tick_samples(8000)


def test_announcement_into_live_call(factory):
    ticks = 150
    tone = (0.4 * np.sin(2 * np.pi * 700 * np.arange(S * 40) / 8000)
            ).astype(np.float32)
    tx = AudioStreamBatch(factory, 1,
                          features=AudioStreamFeatures(local_play=True))
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 20)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.ticker.warm_up()
    rx.ticker.warm_up()
    tx.ticker.realtime = rx.ticker.realtime = False
    for t in range(ticks):
        if t == 30:
            tx.play_announcement(tone)
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    rec = rx.get_recording()[0]
    # silence before the announcement, tone energy during it
    assert float((rec[: 20 * S] ** 2).mean()) < 1e-6
    mid = rec[40 * S: 60 * S]
    assert float((mid ** 2).mean()) > 1e-3
    sim, _ = audio_diff(tone, rec[25 * S: 80 * S])
    assert sim > 0.9, f"announcement sim {sim}"
