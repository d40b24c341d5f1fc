"""RFC 4733 telephone-event DTMF at the RTP edge: send (marker, growing
duration, redundant end packets) and receive (digit fired exactly once per
event, robust under loss). Parity: src/otherfilters/msrtp.c DTMF insertion,
include/mediastreamer2/msrtp.h:46-113."""
import struct

import numpy as np

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch, \
    AudioStreamFeatures
from mediastreamer2_tpu.net.rtp import (RtpSession, RtpPacket, LoopbackPair,
                                        TELEPHONE_EVENT_PT)
from mediastreamer2_tpu.net.netsim import (NetworkSimulator,
                                            NetSimParams)
from conftest import make_speechlike

S = tick_samples(8000)


def test_wire_format_and_redundant_end():
    pair = LoopbackPair()
    tx = RtpSession(pair.endpoint(0), payload_type=0, clock_rate=8000)
    sink = pair.endpoint(1)
    tx.send_dtmf("5", duration_ms=50, volume=7)
    pkts = []
    for _ in range(10):
        if tx.dtmf_active():
            assert tx.dtmf_tick(S)
            tx.skip_payload(S)
        pkts.extend(RtpPacket.unpack(d) for d in sink.recv_all())
    # 50 ms at 10 ms ticks = 5 packets to reach full duration, end sent 3x
    assert len(pkts) == 7
    assert all(p.payload_type == TELEPHONE_EVENT_PT for p in pkts)
    assert pkts[0].marker and not pkts[1].marker
    # constant event timestamp, growing duration, E bit on the last three
    assert len({p.timestamp for p in pkts}) == 1
    evs = [struct.unpack("!BBH", p.payload) for p in pkts]
    assert [e[0] for e in evs] == [5] * 7          # event code for '5'
    durs = [e[2] for e in evs]
    assert durs[:5] == [80, 160, 240, 320, 400]
    assert durs[4:] == [400, 400, 400]
    ends = [bool(e[1] & 0x80) for e in evs]
    assert ends == [False] * 4 + [True] * 3
    assert all((e[1] & 0x3F) == 7 for e in evs)
    # seq advanced per packet, RTP clock advanced per tick
    assert (pkts[-1].seq - pkts[0].seq) & 0xFFFF == 6


def test_receive_fires_once_and_survives_loss():
    pair = LoopbackPair()
    tx = RtpSession(pair.endpoint(0), payload_type=0, clock_rate=8000)
    rx = RtpSession(pair.endpoint(1), payload_type=0, clock_rate=8000)
    got = []
    rx.on_dtmf = lambda d, v: got.append(d)
    for digit in "42#":
        tx.send_dtmf(digit, duration_ms=40)
    while tx.dtmf_active():
        tx.dtmf_tick(S)
        tx.skip_payload(S)
        rx.poll()
    assert got == ["4", "2", "#"]

    # loss: drop all but ONE packet of the event -> still exactly one fire
    pair2 = LoopbackPair()
    tx2 = RtpSession(pair2.endpoint(0), payload_type=0, clock_rate=8000)
    rx2 = RtpSession(pair2.endpoint(1), payload_type=0, clock_rate=8000)
    got2 = []
    rx2.on_dtmf = lambda d, v: got2.append(d)
    tx2.send_dtmf("9", duration_ms=60)
    n = 0
    while tx2.dtmf_active():
        tx2.dtmf_tick(S)
        n += 1
        data = pair2.endpoint(1).recv_all()
        # keep only the 3rd packet (a middle packet: no marker, no E bit)
        for k, d in enumerate(data):
            pass
        if n == 3:
            rx2._deliver(RtpPacket.unpack(data[0]))
    assert got2 == ["9"]


def test_dtmf_through_audio_stream_with_tone_regen(factory):
    """Two-endpoint call: digits sent mid-stream arrive as events and the
    receiver regenerates the dual tone into its speaker path."""
    ticks = 60
    sig = make_speechlike(S * ticks, 8000, seed=11) * 0.2
    ft = AudioStreamFeatures(dtmf=True)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig, features=ft)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 20, features=ft)
    pair = LoopbackPair(netsim=NetworkSimulator(
        NetSimParams(loss_rate=0.1, seed=4)))
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    rx.enable_dtmf_receive(0, play_tone=True)
    tx.ticker.warm_up(); rx.ticker.warm_up()
    rx.start(ticks + 20)
    tx.ticker.warm_up()
    # queue digits after a few ticks of audio
    tx.run(5)
    tx.send_dtmf(0, "7", duration_ms=60)
    tx.run(ticks - 5)
    tx.stop(); rx.stop()
    assert rx.dtmf_received == [(0, "7")]
    # the regenerated tone is present in the recorded speaker signal:
    # 852+1209 Hz (digit 7) energy in the recording
    rec = rx.get_recording()[0]
    spec = np.abs(np.fft.rfft(rec))
    freqs = np.fft.rfftfreq(len(rec), 1 / 8000)
    def band(f):
        return spec[(freqs > f - 25) & (freqs < f + 25)].max()
    noise_floor = np.median(spec) + 1e-9
    assert band(852) / noise_floor > 10
    assert band(1209) / noise_floor > 10
