"""SRTP protect/unprotect, Opus/GSM host codecs, SFU router, and the
SRTP + Opus end-to-end call (parity targets: ms_srtp.cpp + msopus.c +
packet-router.cpp behaviors)."""
import numpy as np
import pytest

from mediastreamer2_tpu.net.rtp import RtpPacket, LoopbackPair, RtpSession
from mediastreamer2_tpu.net.srtp import (SrtpContext, SrtpTransport,
                                         AES_CM_128_HMAC_SHA1_80,
                                         AES_CM_128_HMAC_SHA1_32)
from mediastreamer2_tpu.net.router import AudioPacketRouter, VideoPacketRouter
from mediastreamer2_tpu.ops import host_codecs as hc
from mediastreamer2_tpu.utils.audiodiff import audio_diff, snr_db

from conftest import make_speechlike

KEY = bytes(range(16))
SALT = bytes(range(14))


# ------------------------------------------------------------------ SRTP
def test_srtp_roundtrip():
    tx = SrtpContext(KEY, SALT)
    rx = SrtpContext(KEY, SALT)
    for seq in range(5):
        pkt = RtpPacket(0, seq, seq * 160, 0xABCD, bytes(range(50))).pack()
        prot = tx.protect(pkt)
        assert prot != pkt and len(prot) == len(pkt) + 10
        assert rx.unprotect(prot) == pkt


def test_srtp_auth_failure_and_replay():
    tx = SrtpContext(KEY, SALT)
    rx = SrtpContext(KEY, SALT)
    pkt = RtpPacket(0, 1, 160, 7, b"payload").pack()
    prot = tx.protect(pkt)
    tampered = prot[:-1] + bytes([prot[-1] ^ 1])
    assert rx.unprotect(tampered) is None
    assert rx.unprotect(prot) == pkt
    assert rx.unprotect(prot) is None          # replay rejected


def test_srtp_wrong_key_rejected():
    tx = SrtpContext(KEY, SALT)
    rx = SrtpContext(bytes(16), SALT)
    prot = tx.protect(RtpPacket(0, 1, 1, 1, b"x").pack())
    assert rx.unprotect(prot) is None


def test_srtp_roc_rollover():
    tx = SrtpContext(KEY, SALT)
    rx = SrtpContext(KEY, SALT)
    # straddle the 16-bit seq wrap
    for seq in (65534, 65535, 0, 1):
        pkt = RtpPacket(0, seq, 0, 9, b"abc").pack()
        assert rx.unprotect(tx.protect(pkt)) == pkt
    assert tx.roc[9] == 1


def test_srtp_32_suite():
    tx = SrtpContext(KEY, SALT, AES_CM_128_HMAC_SHA1_32)
    rx = SrtpContext(KEY, SALT, AES_CM_128_HMAC_SHA1_32)
    pkt = RtpPacket(0, 5, 0, 3, b"hello").pack()
    prot = tx.protect(pkt)
    assert len(prot) == len(pkt) + 4
    assert rx.unprotect(prot) == pkt


def test_srtp_gcm_suites():
    """AEAD_AES_128/256_GCM (RFC 7714): roundtrip, tag size, tamper reject."""
    from mediastreamer2_tpu.net.srtp import (AEAD_AES_128_GCM,
                                             AEAD_AES_256_GCM, SrtcpContext)
    for suite, klen in ((AEAD_AES_128_GCM, 16), (AEAD_AES_256_GCM, 32)):
        key, salt = bytes(range(klen)), bytes(range(12))
        tx, rx = SrtpContext(key, salt, suite), SrtpContext(key, salt, suite)
        for seq in (1, 2, 65535, 0):       # include a seq wrap
            pkt = RtpPacket(0, seq, seq * 160, 0x42, b"gcm-payload").pack()
            prot = tx.protect(pkt)
            assert len(prot) == len(pkt) + 16      # GCM tag
            assert rx.unprotect(prot) == pkt
        bad = prot[:-1] + bytes([prot[-1] ^ 1])
        assert rx.unprotect(bad) is None
        # SRTCP side (RFC 7714 §9 layout: hdr || ct+tag || E+index)
        ctx_tx = SrtcpContext(key, salt, suite)
        ctx_rx = SrtcpContext(key, salt, suite)
        rtcp = bytes([0x80, 200, 0, 1]) + (0x42).to_bytes(4, "big") + b"sr" * 10
        wire = ctx_tx.protect(rtcp)
        assert wire != rtcp and len(wire) == len(rtcp) + 16 + 4
        assert ctx_rx.unprotect(wire) == rtcp
        assert ctx_rx.unprotect(wire) is None      # replay


def test_srtp_aes256_cm_suite():
    """AES_256_CM_HMAC_SHA1_80 (RFC 6188) roundtrip + wrong-key reject."""
    from mediastreamer2_tpu.net.srtp import AES_256_CM_HMAC_SHA1_80
    key = bytes(range(32))
    tx = SrtpContext(key, SALT, AES_256_CM_HMAC_SHA1_80)
    rx = SrtpContext(key, SALT, AES_256_CM_HMAC_SHA1_80)
    pkt = RtpPacket(0, 7, 1120, 0x99, b"aes256").pack()
    prot = tx.protect(pkt)
    assert len(prot) == len(pkt) + 10
    assert rx.unprotect(prot) == pkt
    rx2 = SrtpContext(bytes(32), SALT, AES_256_CM_HMAC_SHA1_80)
    assert rx2.unprotect(tx.protect(pkt)) is None


def test_sdes_new_suites_roundtrip():
    from mediastreamer2_tpu.net.srtp import (sdes_generate, sdes_parse,
                                             AEAD_AES_128_GCM,
                                             AES_256_CM_HMAC_SHA1_80)
    for suite in (AEAD_AES_128_GCM, AES_256_CM_HMAC_SHA1_80):
        line, key, salt = sdes_generate(suite)
        s2, k2, sl2 = sdes_parse("1 " + line)
        assert (s2, k2, sl2) == (suite, key, salt)


def test_srtp_gcm_header_extension_aad():
    """The X-bit extension stays clear (AAD), payload is AEAD-protected."""
    from mediastreamer2_tpu.net.srtp import AEAD_AES_128_GCM
    key, salt = bytes(range(16)), bytes(range(12))
    tx, rx = SrtpContext(key, salt, AEAD_AES_128_GCM), \
        SrtpContext(key, salt, AEAD_AES_128_GCM)
    import struct as _s
    hdr = bytes([0x90, 0, 0, 1]) + _s.pack("!II", 160, 0x77)
    ext = _s.pack("!HH", 0xBEDE, 1) + b"\x10\x20\x30\x40"
    pkt = hdr + ext + b"payload-bytes"
    prot = tx.protect(pkt)
    assert prot[:len(hdr) + len(ext)] == hdr + ext   # extension in clear
    assert rx.unprotect(prot) == pkt


def test_double_encryption():
    """inner+outer SRTP (cf. reference double_encryption tester)."""
    k2, s2 = bytes(range(16, 32)), bytes(range(16, 30))
    inner_tx, inner_rx = SrtpContext(KEY, SALT), SrtpContext(KEY, SALT)
    outer_tx, outer_rx = SrtpContext(k2, s2), SrtpContext(k2, s2)
    pkt = RtpPacket(0, 1, 0, 5, b"secret").pack()
    wire = outer_tx.protect(inner_tx.protect(pkt))
    once = outer_rx.unprotect(wire)
    assert once is not None and once != pkt        # still inner-encrypted
    assert inner_rx.unprotect(once) == pkt


# ------------------------------------------------------------ host codecs
@pytest.mark.skipif(not hc.opus_available(), reason="libopus missing")
def test_opus_roundtrip_quality():
    # pin complexity: the quality bar was calibrated at libopus' full
    # analysis; the CPU-count default is 0 on a 1-core host (reference
    # policy, msopus.c:130-136) which trades quality for CPU
    rate, frame = 48000, 480
    enc = hc.OpusEncoder(rate=rate, bitrate=64000, complexity=9)
    dec = hc.OpusDecoder(rate=rate)
    sig = make_speechlike(frame * 100, rate, seed=4)
    out = np.concatenate([
        dec.decode(enc.encode(sig[i * frame:(i + 1) * frame]), frame)
        for i in range(100)])
    sim, shift = audio_diff(sig, out)
    # 10 ms CELT frames on synthetic harmonics: ~0.84 typical (the codec's
    # 6.5 ms lookahead + pre-echo); reference testers use >=0.9 on real
    # speech WAVs with 20 ms frames
    assert sim > 0.8, f"opus sim {sim}"


@pytest.mark.skipif(not hc.opus_available(), reason="libopus missing")
def test_opus_plc():
    rate, frame = 48000, 480
    enc = hc.OpusEncoder(rate=rate)
    dec = hc.OpusDecoder(rate=rate)
    sig = make_speechlike(frame * 10, rate)
    for i in range(5):
        dec.decode(enc.encode(sig[i * frame:(i + 1) * frame]), frame)
    concealed = dec.decode(None, frame)      # packet lost
    assert len(concealed) == frame
    assert np.abs(concealed).max() > 0       # not silence


@pytest.mark.skipif(not hc.gsm_available(), reason="libgsm missing")
def test_gsm_roundtrip():
    codec = hc.GsmCodec()
    sig = make_speechlike(160 * 50, 8000, seed=5)
    out = np.concatenate([codec.decode(codec.encode(sig[i*160:(i+1)*160]))
                          for i in range(50)])
    sim, _ = audio_diff(sig, out)
    assert sim > 0.85, f"gsm sim {sim}"


# ---------------------------------------------------------------- router
def test_audio_router_top_n():
    r = AudioPacketRouter(top_n=2)
    outs = {i: [] for i in range(4)}
    for i in range(4):
        r.add_member(i, outs[i].append)
    r.update_volumes(np.array([0.5, 0.01, 0.3, 0.001]))
    pkt = RtpPacket(0, 1, 0, 1, b"x")
    r.route(0, pkt)           # loud speaker: forwarded to all others
    assert all(len(outs[i]) == 1 for i in (1, 2, 3))
    r.route(3, pkt)           # quiet member: not in top-2 -> dropped
    assert all(len(outs[i]) == 1 for i in (1, 2))


def test_video_router_keyframe_switching():
    reqs = []
    r = VideoPacketRouter(request_keyframe=reqs.append)
    outs = {i: [] for i in range(3)}
    for i in range(3):
        r.add_member(i, outs[i].append)
    # member 0 talks first; all outputs lock to it on its keyframe
    r.route(0, RtpPacket(96, 0, 0, 10, b"kf0"), is_keyframe_start=True)
    assert len(outs[1]) == 1 and len(outs[2]) == 1
    # focus switches to member 1: keyframe requested, no forward until KF
    r.set_focus(1)
    assert reqs == [1]
    r.route(1, RtpPacket(96, 0, 0, 11, b"p"), is_keyframe_start=False)
    assert len(outs[2]) == 1                # not yet switched
    r.route(1, RtpPacket(96, 1, 0, 11, b"kf1"), is_keyframe_start=True)
    assert len(outs[2]) == 2                # switched on keyframe
    r.route(0, RtpPacket(96, 1, 0, 10, b"p0"), is_keyframe_start=False)
    assert len(outs[2]) == 2                # old source no longer forwarded


# --------------------------------------------------- end-to-end SRTP call
def test_srtp_opus_call(factory, monkeypatch):
    if not hc.opus_available():
        pytest.skip("libopus missing")
    # quality bars below assume full encoder analysis (see
    # test_opus_roundtrip_quality's complexity note)
    monkeypatch.setenv("MS2TPU_OPUS_COMPLEXITY", "9")
    from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                        AudioStreamFeatures)
    from mediastreamer2_tpu.core.block import tick_samples
    rate = 48000
    S = tick_samples(rate)
    ticks = 100
    sig = make_speechlike(S * ticks, rate, seed=21)
    tx = AudioStreamBatch(factory, 1, codec="opus", rate=rate, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, codec="opus", rate=rate,
                          record_ticks=ticks + 50)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.enable_srtp(0, KEY, SALT, KEY, SALT)
    rx.enable_srtp(0, KEY, SALT, KEY, SALT)
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up()
    rx.ticker.warm_up()
    # lock-step ticks: deterministic under any host load
    for _ in range(ticks + 40):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    rec = rx.get_recording()
    sim, _ = audio_diff(sig, rec[0])
    assert sim > 0.85, f"srtp+opus call sim {sim}"
    # wire was actually encrypted: raw RTP unparseable as our payload type?
    assert tx.sessions[0].stats.sent_packets > 80


def test_stereo_opus_call(factory):
    """Stereo opus session (channels=2): interleaved stereo blocks through
    the whole stack; left/right stay separate (the reference negotiates
    opus stereo via fmtp)."""
    if not hc.opus_available():
        pytest.skip("libopus missing")
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    from mediastreamer2_tpu.core.block import tick_samples
    rate, ch = 48000, 2
    Sf = tick_samples(rate)
    ticks = 80
    t = np.arange(Sf * ticks) / rate
    left = 0.4 * np.sin(2 * np.pi * 440 * t)
    right = 0.4 * np.sin(2 * np.pi * 1320 * t)
    inter = np.stack([left, right], axis=1).reshape(-1).astype(np.float32)
    tx = AudioStreamBatch(factory, 1, codec="opus", rate=rate, channels=ch,
                          mic_signal=inter)
    rx = AudioStreamBatch(factory, 1, codec="opus", rate=rate, channels=ch,
                          record_ticks=ticks + 40)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(ticks + 30):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    rec = rx.get_recording()[0].reshape(-1, 2)

    def tone_energy(x, f):
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(len(x), 1 / rate)
        return spec[(freqs > f - 30) & (freqs < f + 30)].max()

    L, R = rec[:, 0], rec[:, 1]
    assert tone_energy(L, 440) > 10 * tone_energy(L, 1320)
    assert tone_energy(R, 1320) > 10 * tone_energy(R, 440)


def test_opus_inband_fec_beats_plc_under_loss(factory, monkeypatch):
    """Opus payload-picker parity: a lost frame recovers from the NEXT
    packet's in-band FEC (one-packet lookahead) — measurably better than
    PLC alone under the same loss pattern.

    Complexity pinned: at the 1-core default (0) libopus skips LBRR
    generation entirely, so there would be no FEC to pick."""
    monkeypatch.setenv("MS2TPU_OPUS_COMPLEXITY", "9")
    if not hc.opus_available():
        pytest.skip("libopus missing")
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    from mediastreamer2_tpu.core.block import tick_samples
    from mediastreamer2_tpu.net.netsim import NetworkSimulator, NetSimParams

    rate = 48000
    Sf = tick_samples(rate)
    ticks = 200

    def run(fec_enabled):
        sig = make_speechlike(Sf * ticks, rate, seed=33)
        tx = AudioStreamBatch(factory, 1, codec="opus", rate=rate,
                              mic_signal=sig)
        for enc in tx._host_enc:
            if fec_enabled:
                enc.set_packet_loss(15)  # QoS loop would set this from stats
            else:
                enc._ctl(4012, 0)        # OPUS_SET_INBAND_FEC off
        rx = AudioStreamBatch(factory, 1, codec="opus", rate=rate,
                              record_ticks=ticks + 40)
        pair = LoopbackPair(netsim=NetworkSimulator(
            NetSimParams(loss_rate=15.0, seed=12)))
        tx.set_transport(0, pair.endpoint(0))
        rx.set_transport(0, pair.endpoint(1))
        tx.ticker.realtime = rx.ticker.realtime = False
        tx.ticker.warm_up(); rx.ticker.warm_up()
        for _ in range(ticks + 30):
            tx.ticker.do_tick()
            rx.ticker.do_tick()
        sim, _ = audio_diff(sig, rx.get_recording()[0])
        return sim

    sim_fec = run(True)
    sim_plc = run(False)
    assert sim_fec > 0.7, sim_fec
    assert sim_fec > sim_plc + 0.01, (sim_fec, sim_plc)


def test_qos_loop_feeds_opus_loss_expectation(factory):
    """media_stream_iterate parity: RTCP receiver reports drive the opus
    encoder's expected-loss (FEC strength) knob."""
    if not hc.opus_available():
        pytest.skip("libopus missing")
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    from mediastreamer2_tpu.net.rtcp import ReportBlock
    tx = AudioStreamBatch(factory, 1, codec="opus", rate=48000)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    tx.enable_rtcp(interval_s=100.0)
    calls = []
    tx._host_enc[0].set_packet_loss = lambda p: calls.append(p)
    # fake a remote report with 12.5% loss
    tx.sessions[0].rtcp.remote_reports.append(
        ReportBlock(ssrc=1, fraction_lost=32, cumulative_lost=10,
                    highest_seq=0, jitter=0, lsr=0, dlsr=0))
    tx.iterate()
    assert calls == [12]


def test_srtp_ssrc_change_mid_stream():
    """'Encrypted audio stream with ssrc changes': per-SSRC crypto state —
    a sender that changes SSRC keeps decrypting (fresh ROC/replay per
    SSRC), cf. ms_srtp's per-stream contexts."""
    tx = SrtpContext(KEY, SALT)
    rx = SrtpContext(KEY, SALT)
    for ssrc in (0x1111, 0x2222):          # SSRC change mid-stream
        for seq in range(3):
            pkt = RtpPacket(0, seq, seq * 160, ssrc, b"x" * 40).pack()
            assert rx.unprotect(tx.protect(pkt)) == pkt
    assert set(rx.roc.keys()) == {0x1111, 0x2222}


def test_srtp_session_key_change(factory):
    """'Encrypted audio stream with key change': enable_srtp on an already
    encrypted leg swaps the keys (no double wrapping) and media continues
    once both sides switched."""
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    from mediastreamer2_tpu.net.srtp import SrtpTransport
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    import numpy as np
    from conftest import make_speechlike
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    from mediastreamer2_tpu.core.block import tick_samples
    S, RATE = tick_samples(8000), 8000
    ticks = 60
    sig = make_speechlike(S * ticks, RATE, seed=41)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    tx.ticker.warm_up(); rx.ticker.warm_up()
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    k1, s1 = bytes(range(16)), bytes(range(14))
    tx.enable_srtp(0, k1, s1, k1, s1)
    rx.enable_srtp(0, k1, s1, k1, s1)
    wrapped = tx.sessions[0].transport
    assert isinstance(wrapped, SrtpTransport)
    # key change BEFORE media flows on the new keys (both sides together)
    k2, s2 = bytes(range(16, 32)), bytes(range(16, 30))
    tx.enable_srtp(0, k2, s2, k2, s2)
    rx.enable_srtp(0, k2, s2, k2, s2)
    # still exactly one SRTP layer, same wrapper object
    assert tx.sessions[0].transport is wrapped
    assert not isinstance(wrapped.inner, SrtpTransport)
    rx.start(ticks + 40)
    tx.run(ticks + 10)
    tx.stop(); rx.stop()
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.9, f"post-rekey sim {sim}"
    assert wrapped.auth_failures == 0 or wrapped.auth_failures < 3


def test_ekt_relayed_double_encryption():
    """'Double Encrypted relayed audio stream using ekt' tester case: the
    receiver holds only the OUTER key and the EKT key; the sender's inner
    master key travels in RFC 8870 full tags (ms_srtp.cpp:395-460 layout),
    so the receiver bootstraps inner decryption from the first packet."""
    import os
    from mediastreamer2_tpu.net.srtp import (EktTransport, SrtcpContext,
                                             _ekt_full_tag, _ekt_parse_tag)
    ekt_key = bytes(range(16))
    inner_key, inner_salt = os.urandom(16), bytes(range(14))
    outer_key, outer_salt = os.urandom(16), bytes(range(10, 24))

    # wire-layout unit check first (tag layout per ms_srtp.cpp)
    tag = _ekt_full_tag(ekt_key, inner_key, 0xABCD, 3, spi=7)
    assert tag[-1] == 0x02
    size = int.from_bytes(tag[-3:-1], "big")
    assert size == len(tag)
    rest, info = _ekt_parse_tag(b"\x80\x00" + b"x" * 10 + tag, {7: ekt_key})
    assert info == (7, inner_key, 0xABCD, 3)

    pair = LoopbackPair()
    # sender: inner protect -> EKT tag -> outer protect
    tx_outer = SrtpTransport(pair.endpoint(0),
                             tx=SrtpContext(outer_key, outer_salt),
                             rx=SrtpContext(outer_key, outer_salt))
    tx_ekt = EktTransport(tx_outer, ekt_key=ekt_key, spi=7,
                          send_master_key=inner_key)
    tx = SrtpTransport(tx_ekt, tx=SrtpContext(inner_key, inner_salt),
                       rx=SrtpContext(inner_key, inner_salt))
    # receiver: does NOT know the inner key — learns it from the tag
    learned = {}
    rx_inner_holder = {}

    def on_key(ssrc, mkey, roc):
        learned[ssrc] = (mkey, roc)
        rx_inner_holder["ctx"] = SrtpContext(mkey, inner_salt)

    rx_outer = SrtpTransport(pair.endpoint(1),
                             tx=SrtpContext(outer_key, outer_salt),
                             rx=SrtpContext(outer_key, outer_salt))
    rx_ekt = EktTransport(rx_outer, recv_keys={7: ekt_key}, on_key=on_key)

    sent = []
    for i in range(8):
        pkt = RtpPacket(0, i, i * 160, 0x1234, bytes([i]) * 30).pack()
        sent.append(pkt)
        tx.send(pkt)
    got = []
    for wire in rx_ekt.recv_all():       # outer-stripped, tag-stripped
        plain = rx_inner_holder["ctx"].unprotect(wire)
        assert plain is not None
        got.append(plain)
    assert got == sent
    assert 0x1234 in learned and learned[0x1234][0] == inner_key
    # only the first packet carried the full tag; the rest short tags
    assert rx_ekt.learned[0x1234][0] == inner_key


def test_ekt_skip_initial_roc():
    """'Double Encrypted relayed data with ekt, skip initial ROC': a
    receiver joining after the sender's 16-bit seq wrapped must learn the
    non-zero ROC from the full tag — seeding its inner context with it —
    or every inner auth fails."""
    import os
    from mediastreamer2_tpu.net.srtp import EktTransport
    ekt_key = bytes(range(16))
    inner_key, inner_salt = os.urandom(16), bytes(range(14))

    pair = LoopbackPair()
    # ROC=5: far beyond the +-1 adjacent-ROC resync unprotect() already
    # performs, so ONLY the EKT tag can bootstrap the late joiner
    tx_ekt = EktTransport(pair.endpoint(0), ekt_key=ekt_key, spi=3,
                          send_master_key=inner_key, initial_roc=5)
    tx_ctx = SrtpContext(inner_key, inner_salt)
    ssrc = 0x5151
    tx_ctx.roc[ssrc] = 5                       # stream wrapped five times
    tx_ctx.last_seq[ssrc] = 5

    learned = {}
    rx_ekt = EktTransport(pair.endpoint(1), recv_keys={3: ekt_key},
                          on_key=lambda s, k, r: learned.update({s: (k, r)}))
    sent = []
    for i in range(6, 12):
        pkt = RtpPacket(0, i, i * 160, ssrc, bytes([i]) * 20).pack()
        sent.append(pkt)
        tx_ekt.send(tx_ctx.protect(pkt))
    wires = rx_ekt.recv_all()
    assert learned[ssrc][0] == inner_key
    assert learned[ssrc][1] == 5               # the advertised ROC
    # naive context (ROC 0) fails auth; seeding the learned ROC decrypts
    naive = SrtpContext(inner_key, inner_salt)
    assert naive.unprotect(wires[0]) is None
    seeded = SrtpContext(inner_key, inner_salt)
    seeded.roc[ssrc] = learned[ssrc][1]
    got = [seeded.unprotect(w) for w in wires]
    assert got == sent


def test_ekt_roc_rollover_announced_in_tag():
    """A seq wrap mid-stream forces an immediate full tag carrying the
    incremented ROC (receivers resync without waiting for full_period)."""
    import os
    from mediastreamer2_tpu.net.srtp import EktTransport, _ekt_parse_tag
    ekt_key = bytes(range(16))
    inner_key = os.urandom(16)
    wires = []

    class Cap:
        def send(self, d): wires.append(d)
        def recv_all(self): return []
        def close(self): pass

    tx = EktTransport(Cap(), ekt_key=ekt_key, spi=1,
                      send_master_key=inner_key, full_period=1000)
    ssrc = 0x42
    for seq in (0xFFFE, 0xFFFF, 0x0000, 0x0001):
        tx.send(RtpPacket(0, seq, 0, ssrc, b"x" * 20).pack())
    # packet at seq 0 (post-wrap) must carry a FULL tag with roc=1
    rest, info = _ekt_parse_tag(wires[2], {1: ekt_key})
    assert info is not None and info[3] == 1, info
    # pre-wrap packets advertised roc=0
    rest, info0 = _ekt_parse_tag(wires[0], {1: ekt_key})
    assert info0 is not None and info0[3] == 0


def test_ekt_survives_relay_discard():
    """'Double Encrypted relayed data with ekt, packets discarded by
    relay': the relay drops the first packets (including the full tag);
    the receiver recovers at the next full tag."""
    import os
    from mediastreamer2_tpu.net.srtp import EktTransport
    ekt_key = bytes(range(16))
    inner_key, inner_salt = os.urandom(16), bytes(range(14))
    pair = LoopbackPair()
    tx_ekt = EktTransport(pair.endpoint(0), ekt_key=ekt_key, spi=9,
                          send_master_key=inner_key, full_period=4)
    tx_ctx = SrtpContext(inner_key, inner_salt)
    learned = {}
    rx_ekt = EktTransport(pair.endpoint(1), recv_keys={9: ekt_key},
                          on_key=lambda s, k, r: learned.update({s: (k, r)}))
    ssrc = 0x7777
    dropped = 0
    for i in range(14):
        pkt = RtpPacket(0, i, i * 160, ssrc, bytes([i]) * 20).pack()
        tx_ekt.send(tx_ctx.protect(pkt))
        if i < 3:                              # relay discards the head
            pair.queues[1].clear()
            dropped += 1
    wires = rx_ekt.recv_all()
    assert dropped == 3 and learned[ssrc][0] == inner_key
    ctx = SrtpContext(inner_key, inner_salt)
    plains = [ctx.unprotect(w) for w in wires]
    assert all(p is not None for p in plains)
    assert len(plains) == 14 - dropped


def test_ekt_bundled_multi_ssrc_sources():
    """'Double Encrypted relayed data with bundled source and ekt': several
    senders share one (relayed/bundled) path; the receiver learns each
    SSRC's OWN inner key from that stream's full tag and decrypts both."""
    import os
    from mediastreamer2_tpu.net.srtp import EktTransport
    ekt_key = bytes(range(16))
    salt = bytes(range(14))
    keys = {0x1111: os.urandom(16), 0x2222: os.urandom(16)}
    pair = LoopbackPair()
    # two bundled senders multiplexed onto ONE wire
    txs = {ssrc: (EktTransport(pair.endpoint(0), ekt_key=ekt_key, spi=5,
                               send_master_key=k),
                  SrtpContext(k, salt))
           for ssrc, k in keys.items()}
    learned = {}
    ctxs = {}

    def on_key(ssrc, mkey, roc):
        learned[ssrc] = mkey
        ctxs[ssrc] = SrtpContext(mkey, salt)
    rx = EktTransport(pair.endpoint(1), recv_keys={5: ekt_key},
                      on_key=on_key)
    sent = {s: [] for s in keys}
    for i in range(5):
        for ssrc, (ekt_tx, ctx) in txs.items():
            pkt = RtpPacket(0, i, i * 160, ssrc, bytes([i]) * 24).pack()
            sent[ssrc].append(pkt)
            ekt_tx.send(ctx.protect(pkt))
    wires = rx.recv_all()
    assert learned == keys                     # both inner keys learned
    got = {s: [] for s in keys}
    for w in wires:
        import struct as _s
        ssrc = _s.unpack("!I", w[8:12])[0]
        plain = ctxs[ssrc].unprotect(w)
        assert plain is not None
        got[ssrc].append(plain)
    assert got == sent


def test_double_encryption_relay_reads_volumes():
    """'Double Encrypted relayed audio stream with participants volumes':
    the RFC 6464 audio-level extension lives in the RTP header, which is
    NOT part of the encrypted portion (RFC 3711 §3.1) — so a relay holding
    only the OUTER key can rank speakers while the payload stays
    inner-encrypted end to end."""
    import os
    inner_key, outer_key = os.urandom(16), os.urandom(16)
    salt_i, salt_o = bytes(range(14)), bytes(range(10, 24))
    inner_tx = SrtpContext(inner_key, salt_i)
    outer_tx = SrtpContext(outer_key, salt_o)
    # sender: payload inner-encrypted, then whole packet outer-encrypted
    pkt = RtpPacket(0, 7, 1120, 0xAAAA, b"\x42" * 40,
                    extensions={1: bytes([0x80 | 23])})   # -23 dBov, voice
    wire = outer_tx.protect(inner_tx.protect(pkt.pack()))

    # relay: outer key only
    relay_rx = SrtpContext(outer_key, salt_o)
    mid = relay_rx.unprotect(wire)
    assert mid is not None
    mid_pkt = RtpPacket.unpack(mid)
    assert mid_pkt.extensions and mid_pkt.extensions[1][0] & 0x7F == 23
    # ...but the payload is still ciphertext to the relay
    assert mid_pkt.payload[: 8] != b"\x42" * 8

    # receiver: both keys -> plaintext + extension intact
    inner_rx = SrtpContext(inner_key, salt_i)
    plain = inner_rx.unprotect(mid)
    assert plain is not None
    final = RtpPacket.unpack(plain)
    assert final.payload == b"\x42" * 40
    assert final.extensions[1][0] & 0x7F == 23
