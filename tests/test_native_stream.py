"""Composition: AudioStream call over real UDP drained by the native C++
epoll pump (the production receive path)."""
import numpy as np
import pytest

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
from mediastreamer2_tpu.native import native_available, NativeIoPump
from mediastreamer2_tpu.net.rtp import UdpTransport
from mediastreamer2_tpu.utils.audiodiff import audio_diff
from conftest import make_speechlike

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native pump unavailable")
S = tick_samples(8000)


def test_call_over_udp_with_native_pump(factory):
    ticks = 120
    sig = make_speechlike(S * ticks, 8000, seed=33)
    pump = NativeIoPump()
    t_tx = UdpTransport()
    t_rx = UdpTransport()
    t_tx.set_remote("127.0.0.1", t_rx.local_port)
    t_rx.set_remote("127.0.0.1", t_tx.local_port)
    t_rx.attach_pump(pump)

    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    tx.set_transport(0, t_tx)
    rx.set_transport(0, t_rx)
    tx.ticker.warm_up()
    rx.ticker.warm_up()
    rx.start(ticks + 40)
    tx.run(ticks + 10)
    tx.stop()
    rx.stop()
    rec = rx.get_recording()
    sim, _ = audio_diff(sig, rec[0])
    assert sim > 0.9, f"native-pump call sim {sim}"
    assert rx.sessions[0].stats.recv_packets > 100
    assert t_rx.last_recv_ns is not None
    pump.close()
