"""pcap write/read/replay (jitterbuffer-tester pattern), RTP bundle demux,
stream-alive watchdog."""
import numpy as np

from mediastreamer2_tpu.io.pcap import (CapturedPacket, read_pcap, write_pcap,
                                        PcapRtpPlayer)
from mediastreamer2_tpu.net.rtp import (RtpPacket, RtpSession, RtpBundle,
                                        LoopbackPair)
from mediastreamer2_tpu.net.jitter import JitterBuffer, JBParams


def _make_scenario(tmp_path, n=200, late=None, lost=None):
    """Fabricate an RTP capture with late/lost pathologies (the role of
    tester/scenarios/rtp-534late-24loss-7000total.pcapng)."""
    late = late or {}
    lost = lost or set()
    pkts = []
    for seq in range(n):
        if seq in lost:
            continue
        t = seq * 0.010 + late.get(seq, 0.0)
        rtp = RtpPacket(0, seq, seq * 80, 0x1234, bytes([seq & 0xFF] * 80))
        pkts.append(CapturedPacket(ts=t, udp_payload=rtp.pack()))
    pkts.sort(key=lambda p: p.ts)
    path = str(tmp_path / "scenario.pcap")
    write_pcap(path, pkts)
    return path


def test_pcap_roundtrip(tmp_path):
    path = _make_scenario(tmp_path, n=50)
    back = read_pcap(path)
    assert len(back) == 50
    rtp = RtpPacket.unpack(back[0].udp_payload)
    assert rtp.ssrc == 0x1234 and rtp.seq == 0


def test_pcap_jitterbuffer_scenario(tmp_path):
    """Replay a 200-pkt capture with 10 losses and 5 late packets through
    the jitter buffer; assert loss/late counters (jitterbuffer tester
    oracle style)."""
    lost = {20, 21, 50, 77, 90, 120, 121, 122, 150, 180}
    late = {60: 0.25, 61: 0.25, 100: 0.4, 101: 0.4, 102: 0.4}
    path = _make_scenario(tmp_path, n=200, lost=lost, late=late)
    player = PcapRtpPlayer(path, payload_type=0)
    jb = JitterBuffer(JBParams(nom_depth_ticks=4))
    got, concealed = 0, 0
    now = 0.0
    for tick in range(260):
        for pkt in player.due(now):
            jb.put(pkt)
        payload = jb.get_tick()
        if payload is None:
            concealed += 1
        else:
            got += 1
        now += 0.010
    assert got >= 180
    assert jb.lost >= len(lost)              # gaps detected
    assert jb.late >= 3                       # 0.25-0.4 s late => unplayable
    assert player.finished


def test_rtp_bundle_demux():
    pair = LoopbackPair()
    tx_a = RtpSession(pair.endpoint(0), payload_type=0, ssrc=111)
    tx_b = RtpSession(pair.endpoint(0), payload_type=0, ssrc=222)
    bundle = RtpBundle(pair.endpoint(1))
    rx_a = RtpSession(pair.endpoint(1), payload_type=0,
                      jitter_buffer=JitterBuffer(JBParams(nom_depth_ticks=1)))
    rx_b = RtpSession(pair.endpoint(1), payload_type=0,
                      jitter_buffer=JitterBuffer(JBParams(nom_depth_ticks=1)))
    bundle.attach(rx_a, recv_ssrc=111)
    bundle.attach(rx_b, recv_ssrc=222)
    for _ in range(5):
        tx_a.send_payload(b"a" * 80, 80)
        tx_b.send_payload(b"b" * 80, 80)
    bundle.poll()
    assert rx_a.stats.recv_packets == 5
    assert rx_b.stats.recv_packets == 5
    assert rx_a.jitter_buffer.buf and rx_b.jitter_buffer.buf
    # unknown ssrc counted
    tx_c = RtpSession(pair.endpoint(0), payload_type=0, ssrc=333)
    tx_c.send_payload(b"c", 80)
    bundle.poll()
    assert bundle.unknown_dropped == 1


def test_bundle_auto_discovery():
    """cf. audiostream bundle auto-discovered recv branches (:1855-1879)."""
    pair = LoopbackPair()
    tx = RtpSession(pair.endpoint(0), payload_type=0, ssrc=999)
    bundle = RtpBundle(pair.endpoint(1))
    discovered = []

    def on_unknown(pkt):
        s = RtpSession(pair.endpoint(1), payload_type=0)
        bundle.attach(s, recv_ssrc=pkt.ssrc)
        discovered.append(pkt.ssrc)
    bundle.on_unknown_ssrc = on_unknown
    tx.send_payload(b"x", 80)
    bundle.poll()
    assert discovered == [999]


def test_stream_alive_watchdog():
    pair = LoopbackPair()
    tx = RtpSession(pair.endpoint(0), payload_type=0)
    rx = RtpSession(pair.endpoint(1), payload_type=0)
    assert rx.alive(timeout_s=5.0)          # grace period from creation
    assert not rx.alive(timeout_s=-1.0)     # expired grace
    tx.send_payload(b"x", 80)
    rx.poll()
    assert rx.alive(timeout_s=5.0)


def test_bundle_mid_extension_routing():
    """RFC 8843 MID demux (rtp_bundle_set_mid_extension_id parity, the
    double-encryption tester's 'shared MID in bundle' transport layer):
    a receiver with NO SSRC knowledge routes by the MID header extension
    and learns the SSRC binding from it."""
    from mediastreamer2_tpu.net.rtp import (LoopbackPair, RtpBundle,
                                            RtpSession)
    pair = LoopbackPair()
    # sender side: two sessions bundled with MIDs, no pre-shared SSRCs
    tx_bundle = RtpBundle(pair.endpoint(0))
    tx_bundle.set_mid_extension_id(10)
    tx_a = RtpSession(pair.endpoint(0), payload_type=0)
    tx_v = RtpSession(pair.endpoint(0), payload_type=96)
    tx_bundle.attach(tx_a, mid="a")
    tx_bundle.attach(tx_v, mid="v")

    rx_bundle = RtpBundle(pair.endpoint(1))
    rx_bundle.set_mid_extension_id(10)
    rx_a = RtpSession(pair.endpoint(1), payload_type=0)
    rx_v = RtpSession(pair.endpoint(1), payload_type=96)
    rx_a.jitter_buffer = None
    got_a, got_v = [], []
    rx_a.on_packet = got_a.append
    rx_v.on_packet = got_v.append
    rx_bundle.attach(rx_a, mid="a")      # MIDs only — SSRCs unknown
    rx_bundle.attach(rx_v, mid="v")

    for i in range(5):
        tx_a.send_payload(b"\x01" * 20, ts_increment=80)
        tx_v.send_payload(b"\x02" * 20, ts_increment=3000)
    rx_bundle.poll()
    assert len(got_a) == 5 and len(got_v) == 5
    assert all(p.payload == b"\x01" * 20 for p in got_a)
    assert all(p.payload == b"\x02" * 20 for p in got_v)
    # the SSRC binding was learned from the MID extension
    assert rx_bundle.by_ssrc[tx_a.ssrc] is rx_a
    assert rx_bundle.by_ssrc[tx_v.ssrc] is rx_v
    assert rx_bundle.unknown_dropped == 0
