"""Encryption-mandatory mode (ms_media_stream_sessions_set_encryption_
mandatory, ms_srtp.cpp:1576 + drop sites :460,:755,:887) — the audio_stream
tester's "encryption mandatory" cases: no plaintext ever leaves a mandatory
leg, inbound plaintext is discarded, and key changes under mandatory mode
keep the stream alive."""
import numpy as np

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
from mediastreamer2_tpu.net.rtp import LoopbackPair
from mediastreamer2_tpu.utils.audiodiff import audio_diff
from conftest import make_speechlike

KEY = bytes(range(16))
SALT = bytes(range(16, 30))
KEY2 = bytes(range(100, 116))
SALT2 = bytes(range(50, 64))


def _lockstep(tx, rx, ticks):
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(ticks):
        tx.ticker.do_tick()
        rx.ticker.do_tick()


def test_mandatory_blocks_cleartext_send(factory):
    """Before SRTP keys exist, a mandatory leg sends NOTHING (drop at the
    would-be-plaintext point, ms_srtp.cpp:460)."""
    S = tick_samples(8000)
    sig = make_speechlike(S * 50, 8000, seed=1)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=60)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.set_encryption_mandatory(0)
    assert tx.get_encryption_mandatory(0)
    _lockstep(tx, rx, 50)
    assert rx.sessions[0].stats.recv_packets == 0      # wire stayed silent
    assert tx.sessions[0].mandatory_dropped >= 40
    assert tx.sessions[0].stats.sent_packets == 0


def test_mandatory_drops_inbound_plaintext(factory):
    """A plain sender cannot inject media into a mandatory receiver
    (ms_srtp.cpp:755: cannot decrypt but encryption is mandatory)."""
    S = tick_samples(8000)
    sig = make_speechlike(S * 50, 8000, seed=2)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=60)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    rx.set_encryption_mandatory(0)
    _lockstep(tx, rx, 50)
    assert tx.sessions[0].stats.sent_packets >= 40     # sender did send
    assert rx.sessions[0].stats.recv_packets == 0      # all discarded
    assert rx.sessions[0].mandatory_dropped >= 40
    rec = rx.get_recording()[0]
    sim, _ = audio_diff(sig, rec)
    assert sim < 0.5                                   # nothing got through


def test_mandatory_stream_with_srtp(factory):
    """'Encrypted audio stream, encryption mandatory': with keys in place
    the mandatory flag costs nothing — media flows encrypted."""
    rate = 8000
    S = tick_samples(rate)
    ticks = 100
    sig = make_speechlike(S * ticks, rate, seed=3)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.set_encryption_mandatory(0)
    rx.set_encryption_mandatory(0)
    tx.enable_srtp(0, KEY, SALT, KEY, SALT)
    rx.enable_srtp(0, KEY, SALT, KEY, SALT)
    _lockstep(tx, rx, ticks + 30)
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.9, f"mandatory srtp sim {sim}"
    assert tx.sessions[0].mandatory_dropped == 0


def test_mandatory_key_change(factory):
    """'Encrypted audio stream with key change + encryption mandatory':
    swapping SRTP keys mid-call under mandatory mode never leaks and the
    stream survives."""
    rate = 8000
    S = tick_samples(rate)
    ticks = 120
    sig = make_speechlike(S * ticks, rate, seed=4)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.set_encryption_mandatory(0)
    rx.set_encryption_mandatory(0)
    tx.enable_srtp(0, KEY, SALT, KEY, SALT)
    rx.enable_srtp(0, KEY, SALT, KEY, SALT)
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for t in range(ticks + 30):
        if t == 60:                                    # mid-call rekey
            tx.enable_srtp(0, KEY2, SALT2, KEY2, SALT2)
            rx.enable_srtp(0, KEY2, SALT2, KEY2, SALT2)
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.85, f"mandatory rekey sim {sim}"
    assert tx.sessions[0].mandatory_dropped == 0
    # both halves of the call actually played out (pre- and post-rekey)
    rec = rx.get_recording()[0]
    mid = len(rec) // 2
    assert float(np.abs(rec[:mid]).max()) > 0.01
    assert float(np.abs(rec[mid:]).max()) > 0.01
