"""Native io pump, device managers, offer-answer negotiation."""
import socket
import time

import numpy as np
import pytest

from mediastreamer2_tpu.native import native_available, NativeIoPump
from mediastreamer2_tpu.net.rtp import UdpTransport, RtpSession, RtpPacket
from mediastreamer2_tpu.core.devices import (SndCardManager, FileSndCard,
                                             WebCamManager, CAP_CAPTURE,
                                             CAP_PLAYBACK, MireWebCam)
from mediastreamer2_tpu.core.block import Format
from mediastreamer2_tpu.models.offer_answer import (PayloadTypeDesc,
                                                    negotiate,
                                                    local_capabilities)


# ------------------------------------------------------------ native pump
def test_native_pump_builds():
    assert native_available(), "g++ build of io_pump.cpp failed"


def test_native_pump_datagram_flow():
    pump = NativeIoPump()
    a = UdpTransport()
    b = UdpTransport()
    a.set_remote("127.0.0.1", b.local_port)
    b.attach_pump(pump)
    for i in range(20):
        a.send(bytes([i]) * 100)
    time.sleep(0.15)
    got = b.recv_all()
    assert len(got) == 20
    assert got[0] == bytes([0]) * 100
    assert b.last_recv_ns is not None and b.last_recv_ns > 0
    a.close()
    b.close()
    pump.close()


def test_native_pump_rtp_session_integration():
    pump = NativeIoPump()
    t1, t2 = UdpTransport(), UdpTransport()
    t1.set_remote("127.0.0.1", t2.local_port)
    t2.attach_pump(pump)
    tx = RtpSession(t1, payload_type=0)
    rx = RtpSession(t2, payload_type=0)
    from mediastreamer2_tpu.net.jitter import JitterBuffer, JBParams
    rx.jitter_buffer = JitterBuffer(JBParams(nom_depth_ticks=1))
    for _ in range(10):
        tx.send_payload(b"\x00" * 80, ts_increment=80)
    time.sleep(0.1)
    rx.poll()
    assert rx.stats.recv_packets == 10
    t1.close(); t2.close(); pump.close()


# ------------------------------------------------------------ device mgrs
def test_sndcard_manager():
    mgr = SndCardManager()
    assert mgr.get_card("null") is not None
    fc = FileSndCard(signal=np.ones(800, np.float32) * 0.1, rate=8000)
    mgr.add_card(fc)
    assert mgr.get_card("file") is fc
    blk = fc.pull(0, batch=3)
    assert blk.shape == (3, 80)
    assert np.allclose(blk, 0.1)
    fc.push(0, blk)
    assert len(fc.played) == 1
    assert mgr.get_default(CAP_CAPTURE) is not None


def test_webcam_manager():
    mgr = WebCamManager()
    assert mgr.get_cam("mire") is not None
    assert mgr.get_cam("static_image") is not None
    cam = mgr.get_default()
    name, params = cam.graph_source()
    assert name == "mire"
    static = mgr.get_cam("static_image")
    frame = static.get_frame(batch=2)
    assert frame.shape == (2, 240 * 3 // 2, 320)


# ------------------------------------------------------------ offer/answer
def test_offer_answer_basic():
    offered = [PayloadTypeDesc("PCMA", 8000, 1, 8),
               PayloadTypeDesc("PCMU", 8000, 1, 0)]
    answer = negotiate(offered, local_capabilities())
    assert [a.mime for a in answer] == ["PCMA", "PCMU"]
    assert answer[0].number == 8


def test_offer_answer_opus_fmtp():
    offered = [PayloadTypeDesc("opus", 48000, 2, 111,
                               "useinbandfec=1;maxplaybackrate=16000")]
    answer = negotiate(offered, local_capabilities())
    assert len(answer) == 1
    assert answer[0].number == 111
    assert "useinbandfec=1" in answer[0].fmtp
    assert "maxplaybackrate=16000" in answer[0].fmtp


def test_offer_answer_no_match():
    offered = [PayloadTypeDesc("EVS", 16000, 1, 127)]
    assert negotiate(offered, local_capabilities()) == []


def test_sound_card_volume_gains():
    """MS_AUDIO_CAPTURE/PLAYBACK_SET_VOLUME_GAIN at the card boundary
    (sound_card tester's gain surface; applied uniformly by the base)."""
    import numpy as np
    from mediastreamer2_tpu.core.devices import FileSndCard
    sig = np.ones(800, np.float32) * 0.5
    card = FileSndCard(signal=sig, rate=8000)
    assert card.pull(0, 2).max() == np.float32(0.5)
    card.set_input_gain(0.2)
    assert abs(card.pull(0, 2).max() - 0.1) < 1e-6
    card.set_output_gain(2.0)
    card.push(0, np.ones((1, 80), np.float32) * 0.25)
    assert abs(card.played[-1].max() - 0.5) < 1e-6


def test_stream_sound_card_gain_surface(factory):
    """audio_stream_set_sound_card_input/output_gain parity."""
    import numpy as np
    from mediastreamer2_tpu.core.devices import FileSndCard
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    card = FileSndCard(signal=np.ones(8000, np.float32) * 0.5, rate=8000)
    st = AudioStreamBatch(factory, 1, snd_card=card)
    st.set_sound_card_input_gain(0.5)
    st.set_sound_card_output_gain(1.5)
    assert st.get_sound_card_input_gain() == 0.5
    assert st.get_sound_card_output_gain() == 1.5
