"""Two-endpoint integration tests over loopback RTP — the reference's
"marielle/margaux" pattern (tester/mediastreamer2_audio_stream_tester.c:
156-218: play WAV through a real RTP round trip, assert the recorded side
with ms_audio_diff; loss injected via the network simulator at :731)."""
import numpy as np
import pytest

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                    AudioStreamFeatures)
from mediastreamer2_tpu.net.rtp import LoopbackPair
from mediastreamer2_tpu.net.netsim import NetworkSimulator, NetSimParams
from mediastreamer2_tpu.utils.audiodiff import audio_diff

from conftest import make_speechlike

RATE = 8000
S = tick_samples(RATE)


def run_call(factory, B=2, ticks=150, codec="ulaw", netsim=None,
             tx_features=None, rx_features=None):
    sig = make_speechlike(S * ticks, RATE, seed=11)
    marielle = AudioStreamBatch(factory, B, codec=codec, rate=RATE,
                                features=tx_features or AudioStreamFeatures(),
                                mic_signal=sig)
    margaux = AudioStreamBatch(factory, B, codec=codec, rate=RATE,
                               features=rx_features or AudioStreamFeatures(),
                               record_ticks=ticks + 50)
    # compile both graphs BEFORE either clock starts, so margaux's recording
    # window doesn't elapse while marielle is still jitting
    marielle.ticker.warm_up()
    margaux.ticker.warm_up()
    pairs = []
    for leg in range(B):
        pair = LoopbackPair(netsim=NetworkSimulator(netsim) if netsim else None)
        marielle.set_transport(leg, pair.endpoint(0))
        margaux.set_transport(leg, pair.endpoint(1))
        pairs.append(pair)
    margaux.start(ticks + 50)
    marielle.run(ticks + 20)
    marielle.stop()
    margaux.stop()
    rec = margaux.get_recording()
    return sig, rec, marielle, margaux


def test_call_clean_channel(factory):
    sig, rec, tx, rx = run_call(factory, B=2, ticks=120)
    for leg in range(2):
        sim, shift = audio_diff(sig, rec[leg])
        assert sim > 0.9, f"leg {leg}: sim {sim}"
        assert 0 <= shift < 20 * S          # jitter-buffer latency only
    assert rx.sessions[0].stats.recv_packets > 100
    assert tx.sessions[0].stats.sent_packets > 100


def test_call_with_loss_plc(factory):
    ns = NetSimParams(loss_rate=10.0, seed=3)
    sig, rec, tx, rx = run_call(factory, B=2, ticks=150, netsim=ns)
    jb = rx.sessions[0].jitter_buffer
    assert jb.lost > 0                       # losses actually happened
    sim, _ = audio_diff(sig, rec[0])
    assert sim > 0.75, f"PLC-concealed sim {sim}"


def test_call_with_jitter(factory):
    ns = NetSimParams(jitter_strength_ms=30.0, latency_ms=20, seed=4)
    sig, rec, tx, rx = run_call(factory, B=1, ticks=150, netsim=ns)
    sim, _ = audio_diff(sig, rec[0])
    assert sim > 0.8, f"jittered sim {sim}"


def test_call_dtx_stops_packets(factory):
    feats = AudioStreamFeatures(vad_dtx=True)
    # mic signal: speech for 50 ticks then silence
    sig = make_speechlike(S * 150, RATE, seed=2)
    sig[60 * S:] = 0.0
    B = 1
    marielle = AudioStreamBatch(factory, B, features=feats, mic_signal=sig)
    margaux = AudioStreamBatch(factory, B, record_ticks=150)
    pair = LoopbackPair()
    marielle.set_transport(0, pair.endpoint(0))
    margaux.set_transport(0, pair.endpoint(1))
    marielle.ticker.warm_up()
    margaux.ticker.warm_up()
    margaux.start(200)
    marielle.run(150)
    marielle.stop()
    margaux.stop()
    sent = marielle.sessions[0].stats.sent_packets
    assert sent < 130, f"DTX should suppress packets, sent {sent}"
    assert sent > 40


@pytest.mark.slow
def test_mixed_call_recording(factory):
    """record_mixed: the recording contains BOTH the local mic and the
    received far-end audio (parity: audiostream.c:1068-1088 mixed-call
    recorder branch; round-1 recorded only the recv side).

    Oracle: distinct tones per direction (A=433 Hz, B=1700 Hz) and spectral
    energy checks — speechlike seeds cross-correlate too strongly to
    discriminate directions."""
    from mediastreamer2_tpu.core.block import tick_samples
    S = tick_samples(8000)
    ticks = 120
    t = np.arange(S * ticks) / 8000.0
    mic_a = (0.3 * np.sin(2 * np.pi * 433 * t)).astype(np.float32)
    mic_b = (0.3 * np.sin(2 * np.pi * 1700 * t)).astype(np.float32)

    def band_ratio(rec, f):
        spec = np.abs(np.fft.rfft(rec))
        freqs = np.fft.rfftfreq(len(rec), 1 / 8000)
        peak = spec[(freqs > f - 20) & (freqs < f + 20)].max()
        return peak / (np.median(spec) + 1e-9)

    def call(record_mixed):
        a = AudioStreamBatch(factory, 1, mic_signal=mic_a)
        b = AudioStreamBatch(factory, 1, mic_signal=mic_b,
                             record_ticks=ticks + 40,
                             record_mixed=record_mixed)
        pair = LoopbackPair()
        a.set_transport(0, pair.endpoint(0))
        b.set_transport(0, pair.endpoint(1))
        a.ticker.warm_up(); b.ticker.warm_up()
        b.start(ticks + 40)
        a.run(ticks + 10)
        a.stop(); b.stop()
        return b.get_recording()[0]

    def band_peak(rec, f):
        spec = np.abs(np.fft.rfft(rec))
        freqs = np.fft.rfftfreq(len(rec), 1 / 8000)
        return spec[(freqs > f - 20) & (freqs < f + 20)].max()

    rec = call(record_mixed=True)
    assert band_ratio(rec, 433) > 50     # far end present
    assert band_ratio(rec, 1700) > 50    # own mic present
    rec2 = call(record_mixed=False)
    assert band_ratio(rec2, 433) > 50    # far end present
    # own mic absent from a recv-only recording: its 1700 Hz energy is a
    # tiny fraction of the mixed recording's (mu-law noise floor remains)
    assert band_peak(rec2, 1700) < band_peak(rec, 1700) / 20


def test_ptime_packing(factory):
    """MS_AUDIO_ENCODER_SET_PTIME parity: 40 ms packets (4 ticks each),
    1/4 the packet count, audio still passes audio_diff."""
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    from mediastreamer2_tpu.core.block import tick_samples
    S = tick_samples(8000)
    ticks = 120
    sig = make_speechlike(S * ticks, 8000, seed=13)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.set_ptime(0, 40)
    tx.ticker.warm_up(); rx.ticker.warm_up()
    rx.start(ticks + 40)
    tx.run(ticks + 10)
    tx.stop(); rx.stop()
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.9, sim
    # ~1/4 the packets of a 10 ms-ptime stream
    assert tx.sessions[0].stats.sent_packets <= ticks // 4 + 4


def test_audio_level_extension_from_volume_meter(factory):
    """Legs with the RFC 6464 extension negotiated carry per-tick levels
    measured by the send-side volume filter (msrtp.c audio-level insert
    fed from MSVolume, as the reference wires it)."""
    from mediastreamer2_tpu.net.rtp import RtpPacket
    sig = make_speechlike(S * 50, RATE, seed=6)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    tx.sessions[0].enable_audio_level_ext(ext_id=1)
    sink = pair.endpoint(1)
    tx.ticker.realtime = False
    tx.ticker.warm_up()
    levels = []
    for _ in range(50):
        tx.ticker.do_tick()
        for data in sink.recv_all():
            pkt = RtpPacket.unpack(data)
            if pkt.extensions and 1 in pkt.extensions:
                levels.append(pkt.extensions[1][0])
    assert len(levels) >= 40
    dbovs = [lv & 0x7F for lv in levels]
    # speech has finite level (not the 127 silence floor) and varies
    assert min(dbovs) < 60 and len(set(dbovs)) > 3
    assert any(lv & 0x80 for lv in levels)      # voice flag set


def test_multicast_audio_stream(factory):
    """Multicast session shape (audio_stream_tester multicast case): one
    sender addresses the group; two receiving streams joined on the group
    port both record the same audio."""
    import socket as _socket
    from mediastreamer2_tpu.net.rtp import UdpTransport
    ticks = 80
    sig = make_speechlike(S * ticks, RATE, seed=23)
    group = "224.111.44.55"
    try:
        rx1_t = UdpTransport(local_port=0, bind_host="0.0.0.0",
                             reuse_addr=True)
        port = rx1_t.local_port
        rx2_t = UdpTransport(local_port=port, bind_host="0.0.0.0",
                             reuse_addr=True)
        tx_t = UdpTransport(remote=(group, port))
        for t in (rx1_t, rx2_t):
            t.join_multicast_group(group, iface="127.0.0.1")
        tx_t.join_multicast_group(group, ttl=0, loopback=True,
                                  iface="127.0.0.1")
        probe = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
        probe.close()
    except OSError as e:                           # pragma: no cover
        pytest.skip(f"multicast unavailable: {e}")

    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx1 = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    rx2 = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    for st in (tx, rx1, rx2):
        st.ticker.warm_up()
    tx.set_transport(0, tx_t)
    rx1.set_transport(0, rx1_t)
    rx2.set_transport(0, rx2_t)
    rx1.start(ticks + 40)
    rx2.start(ticks + 40)
    tx.run(ticks + 10)
    for st in (tx, rx1, rx2):
        st.stop()
    if rx1.sessions[0].stats.recv_packets == 0:    # pragma: no cover
        pytest.skip("multicast loopback not delivered (env routing)")
    for rx in (rx1, rx2):
        sim, _ = audio_diff(sig, rx.get_recording()[0])
        assert sim > 0.9, f"multicast leg sim {sim}"


def test_symmetric_rtp_wrong_address(factory):
    """'Symetric rtp with wrong address' tester case: a stream whose
    signalled remote is wrong recovers by redirecting to the source
    address of the packets it receives."""
    import time as _time
    from mediastreamer2_tpu.net.rtp import UdpTransport, RtpSession
    a_t = UdpTransport()                                  # correct side
    b_t = UdpTransport(remote=("127.0.0.1", 9))           # wrong (discard)
    a_t.set_remote("127.0.0.1", b_t.local_port)
    b_t.set_symmetric(True)
    a = RtpSession(a_t, payload_type=0)
    b = RtpSession(b_t, payload_type=0)
    got_at_a = []
    a.on_packet = lambda p: got_at_a.append(p.payload)
    # a's packets arrive at b; b learns a's address from them
    for i in range(3):
        a.send_payload(bytes([i]) * 20, 160)
    _time.sleep(0.05)
    b.poll()
    assert b_t.remote == ("127.0.0.1", a_t.local_port)
    # now b's sends reach a despite the wrong signalled address
    for i in range(3):
        b.send_payload(bytes([10 + i]) * 20, 160)
    _time.sleep(0.05)
    a.poll()
    assert got_at_a == [bytes([10 + i]) * 20 for i in range(3)]
    a_t.close(); b_t.close()


@pytest.mark.slow
def test_codec_change_over_reclaimed_sessions(factory):
    """'Codec change for audio stream' tester case: tear the streams down,
    reclaim the RtpSessions (media_stream_reclaim_sessions), and restart
    with a different codec — SSRC and sequence numbering continue."""
    ticks = 60
    sig1 = make_speechlike(S * ticks, RATE, seed=31)
    tx1 = AudioStreamBatch(factory, 1, codec="ulaw", mic_signal=sig1)
    rx1 = AudioStreamBatch(factory, 1, codec="ulaw", record_ticks=ticks + 40)
    tx1.ticker.warm_up(); rx1.ticker.warm_up()
    pair = LoopbackPair()
    tx1.set_transport(0, pair.endpoint(0))
    rx1.set_transport(0, pair.endpoint(1))
    rx1.start(ticks + 40)
    tx1.run(ticks + 10)
    tx1.stop(); rx1.stop()
    sim, _ = audio_diff(sig1, rx1.get_recording()[0])
    assert sim > 0.9
    tx_sess = tx1.reclaim_sessions()[0]
    rx_sess = rx1.reclaim_sessions()[0]
    ssrc_before, seq_before = tx_sess.ssrc, tx_sess.seq
    assert tx_sess.stats.sent_packets > 0

    sig2 = make_speechlike(S * ticks, RATE, seed=32)
    tx2 = AudioStreamBatch(factory, 1, codec="alaw", mic_signal=sig2)
    rx2 = AudioStreamBatch(factory, 1, codec="alaw", record_ticks=ticks + 40)
    tx2.ticker.warm_up(); rx2.ticker.warm_up()
    tx2.adopt_session(0, tx_sess)
    rx2.adopt_session(0, rx_sess)
    rx2.start(ticks + 40)
    tx2.run(ticks + 10)
    tx2.stop(); rx2.stop()
    sim2, _ = audio_diff(sig2, rx2.get_recording()[0])
    assert sim2 > 0.9, f"post-codec-change sim {sim2}"
    # same session identity continued: SSRC kept, sequence kept climbing
    assert tx_sess.ssrc == ssrc_before
    assert tx_sess.stats.sent_packets > 0 and tx_sess.seq != seq_before


def test_stream_on_sound_card_with_hot_swap(factory):
    """audio_stream_start_full's card wiring + audio_stream_set_sound_card
    hot-swap: capture comes from a SndCard, playback goes to one, and the
    card can be swapped mid-call (reference route-change handling)."""
    from mediastreamer2_tpu.core.devices import FileSndCard
    ticks = 120
    sig1 = make_speechlike(S * ticks, RATE, seed=51)
    sig2 = make_speechlike(S * ticks, RATE, seed=52)
    card1 = FileSndCard("c1", signal=sig1, rate=RATE)
    card2 = FileSndCard("c2", signal=sig2, rate=RATE)
    tx = AudioStreamBatch(factory, 1, snd_card=card1)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    spk_card = FileSndCard("spk", rate=RATE)
    rx.set_sound_card(spk_card)
    tx.ticker.warm_up(); rx.ticker.warm_up()
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    rx.start(ticks + 40)
    tx.ticker.realtime = True
    tx.run(ticks // 2)
    tx.set_sound_card(card2)          # hot swap mid-call
    tx.run(ticks // 2)
    tx.stop(); rx.stop()
    rec = rx.get_recording()[0]
    # first half is card1's signal, second half card2's
    sim1, _ = audio_diff(sig1[: S * (ticks // 2)], rec[: S * (ticks // 2)])
    sim2, _ = audio_diff(sig2, rec)   # card2 pulls from tick offset > half
    assert sim1 > 0.85, f"pre-swap sim {sim1}"
    # playback side: the card collected the received audio
    played = np.concatenate([b[0] for b in spk_card.played])
    simp, _ = audio_diff(sig1[: S * (ticks // 2)], played[: S * (ticks // 2)])
    assert simp > 0.85, f"playback card sim {simp}"


def test_mic_mute_gains_and_rtp_mute(factory):
    """audio_stream_enable_mic / set_mic_gain_db / mute_rtp surface: a
    muted mic sends silence, rtp-mute stops packets, gains scale levels."""
    ticks = 60
    sig = make_speechlike(S * ticks, RATE, seed=61)
    tx = AudioStreamBatch(factory, 2, mic_signal=sig)
    rx = AudioStreamBatch(factory, 2, record_ticks=ticks + 40)
    tx.ticker.warm_up(); rx.ticker.warm_up()
    pairs = []
    for leg in range(2):
        pair = LoopbackPair()
        tx.set_transport(leg, pair.endpoint(0))
        rx.set_transport(leg, pair.endpoint(1))
        pairs.append(pair)
    tx.enable_mic(0, False)                 # leg 0: mic muted
    rx.start(ticks + 40)
    tx.run(ticks + 10)
    tx.stop(); rx.stop()
    rec = rx.get_recording()
    # the volume filter ramps gain smoothly (anti-click, msvolume.c):
    # steady state after the ramp must be silence
    assert np.abs(rec[0][S * 40:]).max() < 1e-2   # silence came through
    sim, _ = audio_diff(sig, rec[1])
    assert sim > 0.9                        # unmuted leg unaffected

    # rtp mute: packets stop entirely on the muted leg
    tx2 = AudioStreamBatch(factory, 2, mic_signal=sig)
    tx2.ticker.warm_up()
    p0, p1 = LoopbackPair(), LoopbackPair()
    tx2.set_transport(0, p0.endpoint(0))
    tx2.set_transport(1, p1.endpoint(0))
    tx2.mute_rtp(0, True)
    tx2.run(30)
    tx2.stop()
    assert tx2.sessions[0].stats.sent_packets == 0
    assert tx2.sessions[1].stats.sent_packets > 20


@pytest.mark.slow
def test_stream_direction_one_way(factory):
    """'Basic one-way stream' + media_stream_set_direction: a sendonly leg
    discards inbound media; a recvonly leg emits no RTP."""
    ticks = 60
    sig = make_speechlike(S * ticks, RATE, seed=71)
    a = AudioStreamBatch(factory, 1, mic_signal=sig, record_ticks=ticks + 20)
    b = AudioStreamBatch(factory, 1, mic_signal=sig, record_ticks=ticks + 20)
    a.ticker.warm_up(); b.ticker.warm_up()
    pair = LoopbackPair()
    a.set_transport(0, pair.endpoint(0))
    b.set_transport(0, pair.endpoint(1))
    a.set_direction(0, "sendonly")
    assert a.get_direction(0) == "sendonly"
    b.start(ticks + 20)
    a.ticker.realtime = True
    a.run(ticks + 10)
    a.stop(); b.stop()
    # b received a's audio; a discarded b's
    sim_b, _ = audio_diff(sig, b.get_recording()[0])
    assert sim_b > 0.9
    assert np.abs(a.get_recording()[0][S * 5:]).max() < 1e-3
    # recvonly: no packets sent
    c = AudioStreamBatch(factory, 1, mic_signal=sig)
    c.ticker.warm_up()
    c.set_transport(0, LoopbackPair().endpoint(0))
    c.set_direction(0, "recvonly")
    c.run(30); c.stop()
    assert c.sessions[0].stats.sent_packets == 0


def test_double_encrypted_audio_stream(factory):
    """'Double Encrypted audio stream' tester case at the session level:
    inner+outer SRTP both ways; audio survives, middle-layer taps see only
    inner-encrypted bytes."""
    import os as _os
    ticks = 60
    sig = make_speechlike(S * ticks, RATE, seed=81)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    tx.ticker.warm_up(); rx.ticker.warm_up()
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    ik = (_os.urandom(16), bytes(range(14))) * 2
    ok = (_os.urandom(16), bytes(range(10, 24))) * 2
    inner = (ik[0], ik[1], ik[0], ik[1])
    outer = (ok[0], ok[1], ok[0], ok[1])
    tx.enable_double_srtp(0, inner, outer)
    rx.enable_double_srtp(0, inner, outer)
    assert tx.get_srtp_info(0) == ("AES_CM_128_HMAC_SHA1_80", "sdes-double")
    rx.start(ticks + 40)
    tx.run(ticks + 10)
    tx.stop(); rx.stop()
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.9, f"double-encrypted call sim {sim}"


def test_max_ptime_clamps_setter(factory):
    """'Max ptime' (basic_audio tester): maxptime=60 negotiated, then
    SET_PTIME 40 reads back 40, SET_PTIME 80 reads back 60."""
    st = AudioStreamBatch(factory, 1)
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    pair = LoopbackPair()
    st.set_transport(0, pair.endpoint(0))
    st.set_max_ptime(0, 60)
    st.set_ptime(0, 40)
    assert st.get_ptime(0) == 40
    st.set_ptime(0, 80)
    assert st.get_ptime(0) == 60
    # out-of-range maxptime falls back to the 100 ms default (bv16.c:91)
    st.set_max_ptime(0, 999)
    st.set_ptime(0, 80)
    assert st.get_ptime(0) == 80
    # lowering maxptime below the current ptime clamps immediately
    st.set_max_ptime(0, 20)
    assert st.get_ptime(0) == 20


def test_opus_ptime_aggregation(factory):
    """msopus.c ptime handling: SET_PTIME 60 packs 60 ms per packet — 6x
    fewer packets, audio intact, and the receiver adapts from the packet's
    own duration (no receiver-side configuration)."""
    import numpy as np
    from mediastreamer2_tpu.ops import host_codecs as hc
    import pytest
    if not hc.opus_available():
        pytest.skip("libopus missing")
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    from conftest import make_speechlike
    rate, ticks = 48000, 120
    S = 480
    sig = make_speechlike(S * ticks, rate, seed=31)
    tx = AudioStreamBatch(factory, 1, codec="opus", rate=rate,
                          mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, codec="opus", rate=rate,
                          record_ticks=ticks + 60)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.set_ptime(0, 60)
    assert tx.get_ptime(0) == 60
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(ticks + 40):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    sent = tx.sessions[0].stats.sent_packets
    assert sent <= (ticks + 40) // 6 + 2, sent   # 60 ms per packet
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    # the bar is the CODEC's own offline 60 ms roundtrip on this signal
    # (opus@32kbps correlates ~0.76 on this synthetic seed): the stream
    # path must lose nothing on top of it
    F = rate * 60 // 1000
    enc = hc.OpusEncoder(rate=rate)
    dec = hc.OpusDecoder(rate=rate)
    ref = np.concatenate([dec.decode(enc.encode(sig[k * F:(k + 1) * F]),
                                     2 * F)
                          for k in range(len(sig) // F)])
    base, _ = audio_diff(sig[:len(ref)], ref)
    assert sim > base - 0.05, f"stream {sim} vs offline {base}"


def test_gsm_ptime_aggregation(factory):
    """gsm.c frames-until-ptime: 40 ms = two 33-byte frames per packet."""
    import numpy as np
    from mediastreamer2_tpu.ops import host_codecs as hc
    import pytest
    if not hc.gsm_available():
        pytest.skip("libgsm missing")
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    from conftest import make_speechlike
    ticks = 120
    sig = make_speechlike(80 * ticks, 8000, seed=32)
    tx = AudioStreamBatch(factory, 1, codec="gsm", mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, codec="gsm", record_ticks=ticks + 60)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.set_ptime(0, 40)
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(ticks + 40):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    sent = tx.sessions[0].stats.sent_packets
    assert sent <= (ticks + 40) // 4 + 2, sent
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.85, f"gsm ptime-40 sim {sim}"
