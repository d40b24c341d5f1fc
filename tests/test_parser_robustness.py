"""Hostile-input robustness: every host-side wire parser must reject or
survive arbitrary bytes without raising unexpected exceptions — these
surfaces face the open network (the reference gets this from years of
fuzzing; we assert it explicitly)."""
import io
import os
import random

import pytest


def _rand_blobs(seed, n=400, max_len=256):
    rng = random.Random(seed)
    blobs = [b"", b"\x00", b"\x80", b"\xff" * 4]
    for _ in range(n):
        blobs.append(bytes(rng.randrange(256)
                           for _ in range(rng.randrange(max_len))))
    return blobs


def test_rtp_rtcp_parsers_survive_garbage():
    from mediastreamer2_tpu.net.rtp import RtpPacket
    from mediastreamer2_tpu.net.rtcp import parse_compound
    for blob in _rand_blobs(1):
        try:
            RtpPacket.unpack(blob)
        except ValueError:
            pass
        parse_compound(blob)      # must never raise


def test_stun_turn_parsers_survive_garbage():
    from mediastreamer2_tpu.net import stun
    for blob in _rand_blobs(2):
        stun.is_stun(blob)
        try:
            stun.StunMessage.unpack(blob)
        except ValueError:
            pass


def test_h26x_av1_unpackers_survive_garbage():
    from mediastreamer2_tpu.net.h26x import (H264Unpacker, H265Unpacker,
                                             split_annexb)
    from mediastreamer2_tpu.net import av1_rtp
    u4, u5 = H264Unpacker(), H265Unpacker()
    d = av1_rtp.Depacketizer()
    for blob in _rand_blobs(3):
        u4.push(blob)
        u5.push(blob)
        d.push(blob)
        d.pop_tu()
        try:
            split_annexb(blob)
        except ValueError:
            pass


def test_srtp_unprotect_survives_garbage():
    from mediastreamer2_tpu.net.srtp import SrtpContext, SrtcpContext
    rx = SrtpContext(b"k" * 16, b"s" * 14)
    rc = SrtcpContext(b"k" * 16, b"s" * 14)
    for blob in _rand_blobs(4):
        assert rx.unprotect(blob) is None or isinstance(blob, bytes)
        rc.unprotect(blob)


def test_container_and_capture_readers_survive_garbage(tmp_path):
    from mediastreamer2_tpu.io.pcap import read_capture
    from mediastreamer2_tpu.io.mkv import MkvReader
    from mediastreamer2_tpu.io.smff import SmffReader
    for k, blob in enumerate(_rand_blobs(5, n=60, max_len=512)):
        p = tmp_path / f"junk{k}"
        p.write_bytes(blob)
        for reader in (read_capture,):
            try:
                reader(str(p))
            except (ValueError, *struct_error_types()):
                pass
        for cls in (MkvReader, SmffReader):
            try:
                cls(str(p))
            except Exception as e:
                assert isinstance(e, (ValueError, EOFError, OSError,
                                      KeyError, IndexError,
                                      UnicodeDecodeError, StopIteration,
                                      *struct_error_types())), \
                    f"{cls.__name__} raised {type(e).__name__}: {e}"


def struct_error_types():
    import struct
    return (struct.error,)


def test_dtmf_and_fec_survive_garbage():
    from mediastreamer2_tpu.net.rtp import RtpPacket, RtpSession, LoopbackPair
    from mediastreamer2_tpu.net.fec import FecDecoder
    pair = LoopbackPair()
    sess = RtpSession(pair.endpoint(0), payload_type=0)
    dec = FecDecoder()
    for blob in _rand_blobs(6, max_len=64):
        pkt = RtpPacket(101, 1, 2, 3, blob)
        sess._handle_telephone_event(pkt)
        if len(blob) >= 10:
            dec.push_repair(RtpPacket(115, 1, 0, 9, blob))


def test_zrtp_wire_parser_survives_garbage():
    """RFC 6189 packet/message parsers + full session.process on noise."""
    from mediastreamer2_tpu.net.zrtp import (unwrap_packet, parse_message,
                                             is_zrtp, ZrtpSession,
                                             wrap_packet, make_message)
    z = ZrtpSession(send=lambda b: None)
    z.start()
    for blob in _rand_blobs(7):
        is_zrtp(blob)
        m = unwrap_packet(blob)
        if m is not None:
            parse_message(m)
        z.process(blob)                   # must never raise
    # CRC-valid packets with garbage message bodies must not raise either
    import random as _r
    rng = _r.Random(8)
    for _ in range(200):
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(120)))
        z.process(wrap_packet(body, 1, 2))
        for t in (b"Hello   ", b"Commit  ", b"DHPart1 ", b"DHPart2 ",
                  b"Confirm1", b"GoClear "):
            z.process(wrap_packet(make_message(t, body), 1, 2))


def test_ekt_tag_parser_survives_garbage():
    from mediastreamer2_tpu.net.srtp import _ekt_parse_tag
    keys = {7: bytes(16)}
    for blob in _rand_blobs(9):
        _ekt_parse_tag(blob, keys)        # must never raise


def test_gcm_srtp_unprotect_survives_garbage():
    from mediastreamer2_tpu.net.srtp import (SrtpContext, SrtcpContext,
                                             AEAD_AES_128_GCM)
    rx = SrtpContext(bytes(16), bytes(12), AEAD_AES_128_GCM)
    rc = SrtcpContext(bytes(16), bytes(12), AEAD_AES_128_GCM)
    for blob in _rand_blobs(10):
        rx.unprotect(blob)
        rc.unprotect(blob)


def test_jpeg_rtp_parsers_survive_garbage():
    """RFC 2435 surfaces: the depacketizer eats arbitrary payloads; the
    packetizer rejects non-JPEG input with ValueError, never crashes."""
    from mediastreamer2_tpu.net.jpeg_rtp import (JpegDepacketizer,
                                                 jpeg_packetize)
    de = JpegDepacketizer()
    for i, blob in enumerate(_rand_blobs(101)):
        de.push(blob, marker=(i % 3 == 0))
        de.pop()
    for blob in _rand_blobs(102, n=100):
        try:
            jpeg_packetize(blob)
        except (ValueError, AssertionError, *struct_error_types()):
            pass


def test_h263_and_aac_assemblers_survive_garbage():
    from mediastreamer2_tpu.net.h26x import H263Depacketizer
    from mediastreamer2_tpu.ops.aac import AacRtpAssembler, rfc3640_unpack
    de = H263Depacketizer()
    asm = AacRtpAssembler()
    for i, blob in enumerate(_rand_blobs(103)):
        de.push(blob, marker=(i % 4 == 0))
        de.pop()
        asm.push(blob)
        rfc3640_unpack(blob)
