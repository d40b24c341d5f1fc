"""RTP-as-IO transcoding (audio_stream_start_from_io, audiostream.c:
1347-1384): ulaw 8k in -> g722 16k out through one device program, the
B2BUA/gateway shape."""
import numpy as np

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
from mediastreamer2_tpu.models.transcode import TranscodeBatch
from mediastreamer2_tpu.net.rtp import LoopbackPair
from mediastreamer2_tpu.utils.audiodiff import audio_diff
from conftest import make_speechlike


def test_transcode_ulaw_to_g722(factory):
    ticks = 100
    S8 = tick_samples(8000)
    sig = make_speechlike(S8 * ticks, 8000, seed=21)
    # A sends ulaw@8k -> transcoder -> B receives g722@16k
    a = AudioStreamBatch(factory, 1, codec="ulaw", rate=8000, mic_signal=sig)
    b = AudioStreamBatch(factory, 1, codec="g722", rate=16000,
                         record_ticks=ticks + 40)
    tc = TranscodeBatch(factory, 1, codec_in="ulaw", rate_in=8000,
                        codec_out="g722", rate_out=16000)
    pa = LoopbackPair()
    pb = LoopbackPair()
    a.set_transport(0, pa.endpoint(0))
    tc.set_transports(0, rx=pa.endpoint(1), tx=pb.endpoint(0))
    b.set_transport(0, pb.endpoint(1))
    a.ticker.warm_up(); tc.ticker.warm_up(); b.ticker.warm_up()
    a.ticker.realtime = tc.ticker.realtime = b.ticker.realtime = False
    for _ in range(ticks + 30):
        a.ticker.do_tick()
        tc.ticker.do_tick()
        b.ticker.do_tick()
    rec = b.get_recording()[0]            # 16 kHz
    # compare at 8k: average-pair decimation (crude anti-alias)
    rec8 = (rec[0::2] + rec[1::2]) / 2.0
    sim, _ = audio_diff(sig, rec8)
    assert sim > 0.85, sim
