"""Session-layer component tests: conference control, media player/recorder,
ring stream, RTCP codec, QoS controllers, RFC4103 text."""
import numpy as np
import jax.numpy as jnp
import pytest

from mediastreamer2_tpu.core.block import Format, tick_samples
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.core.ticker import Ticker
from mediastreamer2_tpu.models.conference import AudioConferenceControl
from mediastreamer2_tpu.models.flagship import build_flagship, example_inputs
from mediastreamer2_tpu.models.media_player import MediaPlayer, MediaRecorder
from mediastreamer2_tpu.models.ring_stream import RingStreamBatch
from mediastreamer2_tpu.models import qos
from mediastreamer2_tpu.net import rtcp
from mediastreamer2_tpu.net.rtt import TextStream, RttSource, RttSink, RED_PT
from mediastreamer2_tpu.net.rtp import LoopbackPair, RtpSession, RtpPacket
from mediastreamer2_tpu.net.netsim import NetworkSimulator, NetSimParams
from mediastreamer2_tpu.io.wav import write_wav
from mediastreamer2_tpu.utils.audiodiff import audio_diff

from conftest import make_speechlike


# ------------------------------------------------------------- conference
def test_conference_membership_and_mixing(factory):
    B = 8
    cg, params = build_flagship(factory, batch=B, conf_size=1)
    tk = Ticker(cg, realtime=False)
    tk.params = params
    ctl = AudioConferenceControl(tk, mixer_node="conf", levels_node=None)
    conf = ctl.new_conference()
    for leg in (0, 1, 2):
        ctl.add_member(leg, conf)
    assert ctl.member_count(conf) == 3
    gid = np.asarray(tk.params["conf"]["group_id"])
    assert gid[0] == gid[1] == gid[2]
    act = np.asarray(tk.params["conf"]["active"])
    assert act[:3].all() and not act[3:].any()
    ctl.mute_member(1)
    assert not np.asarray(tk.params["conf"]["active"])[1]
    ctl.remove_member(0)
    assert ctl.member_count(conf) == 2


def test_conference_active_talkers(factory):
    B = 4
    g = GraphBuilder(factory, batch=B)
    src = g.add("ext_source", "in", fmt=Format(rate=8000))
    lv = g.add("audio_levels", "levels")
    mx = g.add("conf_mixer", "conf")
    g.chain(src, lv, mx)
    g.link(mx, 0, g.add("ext_sink", "out"), 0)
    cg = g.build()
    tk = Ticker(cg, realtime=False)
    ctl = AudioConferenceControl(tk, "conf", "levels")
    c = ctl.new_conference()
    for leg in range(4):
        ctl.add_member(leg, c)
    x = np.zeros((B, 80), np.float32)
    x[2] = 0.3  # only leg 2 talks
    tk.set_io(pull=lambda t: {"in": x})
    tk.run(5)
    talkers = ctl.active_talkers()
    assert talkers == {c: [2]}


# ---------------------------------------------------------- media player
def test_media_player_play_pause_seek(factory, tmp_path):
    rate = 8000
    sig = make_speechlike(rate * 2, rate)  # 2 s
    path = str(tmp_path / "in.wav")
    write_wav(path, sig, rate)
    mp = MediaPlayer(factory)
    chunks = []
    mp.set_output(lambda x: chunks.append(x))
    mp.open(path)
    assert mp.duration_ms == 2000
    eof = []
    mp.on_eof = lambda: eof.append(1)
    mp.start()
    import time
    time.sleep(0.3)
    mp.pause()
    pos = mp.get_position_ms()
    assert 100 <= pos <= 1500
    mp.seek_ms(1900)
    mp.start()
    time.sleep(0.5)
    mp.ticker.event_queue.pump()
    mp.close()
    assert eof, "EOF event after seek near end"
    assert len(chunks) > 10


def test_media_recorder_roundtrip(factory, tmp_path):
    rate = 8000
    S = tick_samples(rate)
    sig = make_speechlike(S * 50, rate, seed=9)
    rec = MediaRecorder(factory, rate=rate)
    rec.set_input(lambda t: sig[t * S:(t + 1) * S] if (t + 1) * S <= len(sig)
                  else np.zeros(S, np.float32))
    rec.run(50)
    out = rec.stop_and_save(str(tmp_path / "out.wav"))
    from mediastreamer2_tpu.io.wav import read_wav
    back, r = read_wav(out)
    assert r == rate
    sim, _ = audio_diff(sig, back)
    assert sim > 0.99


def test_ring_stream(factory):
    rate = 8000
    sig = (0.4 * np.sin(2 * np.pi * 440 * np.arange(rate) / rate)).astype(np.float32)
    ring = RingStreamBatch(factory, batch=2, signal=sig, rate=rate,
                           out_rate=16000, loop=True)
    outs = []
    ring.ticker.set_io(push=lambda t, o: outs.append(np.asarray(o["spk"])))
    ring.ticker.warm_up()
    ring.ticker.realtime = False
    ring.ticker.run(120)          # longer than the 100-tick source => loops
    energy_late = (outs[-1] ** 2).mean()
    assert energy_late > 1e-3     # still ringing after loop point
    assert outs[0].shape == (2, 160)


# ------------------------------------------------------------------ RTCP
def test_rtcp_sr_roundtrip():
    rb = rtcp.ReportBlock(ssrc=42, fraction_lost=25, cumulative_lost=100,
                          highest_seq=5000, jitter=12, lsr=777, dlsr=88)
    sr = rtcp.SenderReport(ssrc=7, ntp_sec=1, ntp_frac=2, rtp_ts=3,
                           packet_count=4, octet_count=5, reports=[rb])
    msgs = rtcp.parse_compound(sr.pack())
    assert len(msgs) == 1
    got = msgs[0]
    assert got.ssrc == 7 and got.packet_count == 4
    assert got.reports[0].cumulative_lost == 100
    assert got.reports[0].fraction_lost == 25


@pytest.mark.parametrize("kind,value", [("tmmbr", 512000), ("remb", 1500000),
                                        ("pli", 0), ("fir", 3), ("nack", 444)])
def test_rtcp_feedback_roundtrip(kind, value):
    fb = rtcp.Feedback(kind, sender_ssrc=1, media_ssrc=2, value=value)
    msgs = rtcp.parse_compound(fb.pack())
    assert len(msgs) == 1
    got = msgs[0]
    assert got.kind == kind
    if kind in ("tmmbr", "remb"):
        assert abs(got.value - value) / value < 0.01   # mantissa rounding
    elif kind == "nack":
        assert got.value == value


# ------------------------------------------------------------------- QoS
def test_qos_analyzer_actions():
    a = qos.SimpleQosAnalyzer()
    assert a.analyze(qos.QosStats(loss_rate=0.2)) == qos.ACTION_DECREASE_BITRATE
    assert a.analyze(qos.QosStats(loss_rate=0.05)) == qos.ACTION_DECREASE_PACKET_RATE
    for _ in range(4):
        act = a.analyze(qos.QosStats(loss_rate=0.0))
    assert act == qos.ACTION_INCREASE_QUALITY


def test_bitrate_controller_drives_encoder():
    rates, ptimes = [], []
    drv = qos.AudioBitrateDriver(rates.append, ptimes.append, nominal_bps=64000)
    ctl = qos.BitrateController(qos.SimpleQosAnalyzer(), drv)
    ctl.update(qos.QosStats(loss_rate=0.15))
    assert rates and rates[-1] < 64000
    ctl.update(qos.QosStats(loss_rate=0.05))
    assert ptimes and ptimes[-1] == 40


def test_quality_indicator_mos():
    qi = qos.QualityIndicator()
    for _ in range(10):
        good = qi.update(qos.QosStats(loss_rate=0.0, rtt_ms=50))
    assert good > 4.5
    for _ in range(10):
        bad = qi.update(qos.QosStats(loss_rate=0.12, rtt_ms=900))
    assert bad < 2.0


def test_iframe_limiter_and_starter():
    lim = qos.IFrameRequestLimiter(min_interval_s=1.0)
    assert lim.request_allowed(now=0.0)
    assert not lim.request_allowed(now=0.5)
    assert lim.request_allowed(now=1.5)
    vs = qos.VideoStarter(timeout_s=2.0)
    vs.activate(now=0.0)
    assert not vs.need_iframe(now=1.0)
    assert vs.need_iframe(now=2.5)
    vs.on_frame_decoded()
    assert not vs.need_iframe(now=10.0)


# ------------------------------------------------------------------ text
def test_text_roundtrip_clean():
    pair = LoopbackPair()
    a = TextStream(RtpSession(pair.endpoint(0)))
    b = TextStream(RtpSession(pair.endpoint(1)))
    msg = "Hello, RTT! éàü 你好"
    for i, ch in enumerate(msg):
        a.put_char(ch)
        a.iterate(now_ms=i * 310)
        b.iterate(now_ms=i * 310)
    a.iterate(now_ms=(len(msg) + 1) * 310)
    b.iterate(now_ms=(len(msg) + 1) * 310)
    assert b.get_received_text() == msg


def test_text_red_recovers_single_loss():
    src = RttSource(use_red=True)
    sink = RttSink()
    seq = 0
    sent = []
    for i, ch in enumerate("abcdef"):
        src.put_char(ch)
        out = src.flush(now_ms=(i + 1) * 301)
        if out:
            sent.append((seq, *out))
            seq += 1
    # drop packet index 2, deliver rest
    for s, pt, payload in sent:
        if s == 2:
            continue
        sink.on_packet(s, pt, payload)
    assert sink.received == "abcdef"      # RED recovered the lost primary
    assert sink.lost_events == 0


def test_offer_answer_video_and_new_codecs():
    """Offer/answer providers for H.264 (packetization-mode/profile
    negotiation), VP8 (max-fr cap), and the new audio codecs appearing in
    local capabilities (offeranswer.c provider-registry parity)."""
    from mediastreamer2_tpu.models.offer_answer import (
        PayloadTypeDesc, negotiate, local_capabilities)
    caps = local_capabilities()
    mimes = {c.mime.lower() for c in caps}
    assert {"g722", "g726-32", "telephone-event"} <= mimes
    offered = [
        PayloadTypeDesc("H264", 90000, 1, 104,
                        "packetization-mode=1;profile-level-id=42e01f"),
        PayloadTypeDesc("VP8", 90000, 1, 105, "max-fr=60"),
        PayloadTypeDesc("G722", 8000, 1, 9),
    ]
    ans = negotiate(offered, caps)
    by_mime = {a.mime.lower(): a for a in ans}
    if "h264" in mimes:
        assert by_mime["h264"].fmtp == \
            "packetization-mode=1;profile-level-id=42e01f"
        assert by_mime["h264"].number == 104
    if "vp8" in mimes:
        assert by_mime["vp8"].fmtp == "max-fr=30"   # capped to our ability
    assert by_mime["g722"].number == 9
    # high-profile H.264 offer is declined
    hi = [PayloadTypeDesc("H264", 90000, 1, 104,
                          "packetization-mode=1;profile-level-id=640028")]
    assert negotiate(hi, caps) == []


def test_offer_answer_new_providers():
    """H.265/AV1/speex offer-answer providers (the reference registers one
    per codec family via ms_factory_register_offer_answer_provider)."""
    from mediastreamer2_tpu.models import offer_answer as oa
    local = [oa.PayloadTypeDesc("H265", 90000, 1, 104, "profile-id=1"),
             oa.PayloadTypeDesc("AV1", 90000, 1, 105, "profile=0"),
             oa.PayloadTypeDesc("speex", 16000, 1, 106)]
    offered = [oa.PayloadTypeDesc("H265", 90000, 1, 97, "profile-id=1"),
               oa.PayloadTypeDesc("AV1", 90000, 1, 98,
                                  "profile=0;level-idx=15"),
               oa.PayloadTypeDesc("speex", 16000, 1, 99, "vbr=on")]
    ans = oa.negotiate(offered, local)
    assert [a.mime for a in ans] == ["H265", "AV1", "speex"]
    assert ans[0].number == 97 and "profile-id=1" in ans[0].fmtp
    assert "level-idx=8" in ans[1].fmtp          # capped to our level
    assert ans[2].fmtp == "vbr=on"
    # declined: AV1 high profile, H265 non-main profile
    bad = [oa.PayloadTypeDesc("AV1", 90000, 1, 98, "profile=1"),
           oa.PayloadTypeDesc("H265", 90000, 1, 97, "profile-id=2")]
    assert oa.negotiate(bad, local) == []
    # speex clock-rate mismatch declined
    assert oa.negotiate([oa.PayloadTypeDesc("speex", 8000, 1, 99)],
                        local) == []


def test_text_stream_over_srtp_and_long_paste():
    """Text tester cases 'slow typing with SRTP' + 'copy paste text longer
    than buffer size': RFC 4103 rides an SRTP transport; long pastes
    deliver completely."""
    from mediastreamer2_tpu.net.srtp import SrtpContext, SrtpTransport
    key, salt = bytes(range(16)), bytes(range(14))
    pair = LoopbackPair()
    ta = SrtpTransport(pair.endpoint(0), tx=SrtpContext(key, salt),
                       rx=SrtpContext(key, salt))
    tb = SrtpTransport(pair.endpoint(1), tx=SrtpContext(key, salt),
                       rx=SrtpContext(key, salt))
    a = TextStream(RtpSession(ta, payload_type=98))
    b = TextStream(RtpSession(tb, payload_type=98))
    long_text = "".join(chr(0x41 + (i % 26)) for i in range(600))
    for ch in long_text:
        a.put_char(ch)
    now = 0
    for step in range(200):                  # buffered flush over time
        now += 310
        a.iterate(now_ms=now)
        b.iterate(now_ms=now)
        if b.get_received_text() == long_text:
            break
    assert b.get_received_text() == long_text
    assert ta.auth_failures == 0 and tb.auth_failures == 0
