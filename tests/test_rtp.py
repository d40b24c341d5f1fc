

def test_rfc6465_csrc_audio_levels():
    """RFC 6465 mixer-to-client levels: a mixed leg carries one level per
    CSRC; AudioStreamVolumes on the receiver maps ssrc -> dBov (parity:
    audiostreamvolumes.cpp)."""
    from mediastreamer2_tpu.net.rtp import (RtpSession, RtpPacket,
                                            LoopbackPair, AudioStreamVolumes)
    pair = LoopbackPair()
    tx = RtpSession(pair.endpoint(0), payload_type=0, clock_rate=8000,
                    ssrc=0xAAAA)
    tx.enable_audio_level_ext(ext_id=1)
    tx.enable_csrc_audio_level_ext(ext_id=3)
    tx.set_audio_level(12, voice=True)
    tx.set_csrc_audio_levels([(0x111, 30), (0x222, 127), (0x333, 5)])
    tx.send_payload(b"\xff" * 80, 80)
    vols = AudioStreamVolumes()
    data = pair.endpoint(1).recv_all()
    assert len(data) == 1
    pkt = RtpPacket.unpack(data[0])
    assert pkt.csrcs == (0x111, 0x222, 0x333)
    vols.update_from_packet(pkt)
    assert vols.get(0xAAAA) == -12          # RFC6464 own level
    assert vols.get(0x111) == -30 and vols.get(0x333) == -5
    assert vols.get(0x222) == -127
    assert vols.get(0xDEAD) == AudioStreamVolumes.NOT_FOUND
    # levels list caps at 15 CSRCs (header CC field width)
    tx.set_csrc_audio_levels([(i, i) for i in range(20)])
    tx.send_payload(b"\xff" * 80, 80)
    pkt2 = RtpPacket.unpack(pair.endpoint(1).recv_all()[0])
    assert len(pkt2.csrcs) == 15
