"""Native batched SRTP edge vs the KAT-pinned Python SrtpContext.

The C implementation (native/rtp_edge.cpp SrtpLeg) must interoperate
byte-exactly with net/srtp.py, whose KDF/CTR-IV/HMAC layout is pinned to
the RFC vectors by tests/test_srtp_kat.py — so agreement here certifies
the native edge against the RFCs transitively.  Parity target:
src/crypto/ms_srtp.cpp:475,672 (inline per-packet protection on the edge).
"""
import os
import socket
import time

import numpy as np
import pytest

from mediastreamer2_tpu.native import (rtp_edge_available, BatchRtpTx,
                                       BatchRtpRx)
from mediastreamer2_tpu.net.srtp import (
    AEAD_AES_128_GCM, AEAD_AES_256_GCM,
    AES_CM_128_HMAC_SHA1_32, AES_CM_128_HMAC_SHA1_80,
    AES_256_CM_HMAC_SHA1_80, SUITES, SrtpContext)

pytestmark = pytest.mark.skipif(not rtp_edge_available(),
                                reason="g++ build failed")

PSZ = 80


def _keys(suite, seed=7):
    rng = np.random.default_rng(seed)
    _, klen, slen, _ = SUITES[suite]
    return rng.bytes(klen), rng.bytes(slen)


def _mk_tx(n, port, suite, key, salt, seq0=100):
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    tx = BatchRtpTx(sock, n, PSZ)
    for i in range(n):
        tx.config(i, "127.0.0.1", port, ssrc=0x2000 + i, seq0=seq0, pt=0)
        tx.set_srtp(i, key, salt, suite)
    return tx, sock


@pytest.mark.parametrize("suite", [AES_CM_128_HMAC_SHA1_80,
                                   AES_CM_128_HMAC_SHA1_32,
                                   AES_256_CM_HMAC_SHA1_80,
                                   AEAD_AES_128_GCM,
                                   AEAD_AES_256_GCM])
def test_native_tx_python_unprotect(suite):
    """Packets protected by the C edge decrypt+authenticate in Python."""
    key, salt = _keys(suite)
    cap = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    cap.bind(("127.0.0.1", 0))
    cap.settimeout(2.0)
    n = 3
    tx, tx_sock = _mk_tx(n, cap.getsockname()[1], suite, key, salt)
    rx_ctx = {i: SrtpContext(key, salt, suite) for i in range(n)}
    pay = np.arange(n * PSZ, dtype=np.uint8).reshape(n, PSZ)
    for tick in range(4):
        assert tx.send(pay, ts_inc=PSZ) == n
        for _ in range(n):
            pkt = cap.recv(2048)
            assert len(pkt) == 12 + PSZ + SUITES[suite][3]
            ssrc = int.from_bytes(pkt[8:12], "big")
            leg = ssrc - 0x2000
            plain = rx_ctx[leg].unprotect(pkt)
            assert plain is not None, "auth failed: C/Python mismatch"
            np.testing.assert_array_equal(
                np.frombuffer(plain[12:], np.uint8), pay[leg])
    tx.close(); tx_sock.close(); cap.close()


def test_python_tx_native_unprotect():
    """Packets protected by Python land decrypted in the jitter ring."""
    suite = AES_CM_128_HMAC_SHA1_80
    key, salt = _keys(suite, seed=11)
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    rx_sock.setblocking(False)
    port = rx_sock.getsockname()[1]
    n = 4
    rx = BatchRtpRx(n, PSZ, ring_depth=64)
    rx.add_socket(rx_sock)
    tx_ctx = {}
    for i in range(n):
        rx.map_ssrc(0x3000 + i, i)
        rx.set_prefill(i, 0)
        rx.set_srtp(i, key, salt, suite)
        tx_ctx[i] = SrtpContext(key, salt, suite)
    out_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rng = np.random.default_rng(5)
    sent = []
    for tick in range(5):
        pay = rng.integers(0, 255, (n, PSZ), dtype=np.uint8)
        sent.append(pay)
        for i in range(n):
            hdr = bytes([0x80, 0]) + (200 + tick).to_bytes(2, "big") \
                + (tick * PSZ).to_bytes(4, "big") \
                + (0x3000 + i).to_bytes(4, "big")
            out_sock.sendto(tx_ctx[i].protect(hdr + pay[i].tobytes()),
                            ("127.0.0.1", port))
    time.sleep(0.02)
    rx.poll()
    for tick in range(5):
        out, flags = rx.read_tick()
        assert flags.all(), f"tick {tick}: missing packets"
        np.testing.assert_array_equal(out, sent[tick])
    assert all(rx.auth_failures(i) == 0 for i in range(n))
    rx.close(); rx_sock.close(); out_sock.close()


def test_native_rx_rejects_tampering_and_wrong_key():
    suite = AES_CM_128_HMAC_SHA1_80
    key, salt = _keys(suite, seed=13)
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    rx_sock.setblocking(False)
    port = rx_sock.getsockname()[1]
    rx = BatchRtpRx(1, PSZ, ring_depth=64)
    rx.add_socket(rx_sock)
    rx.map_ssrc(0x4000, 0)
    rx.set_prefill(0, 0)
    rx.set_srtp(0, key, salt, suite)
    ctx = SrtpContext(key, salt, suite)
    wrong = SrtpContext(os.urandom(16), os.urandom(14), suite)
    out_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    hdr = bytes([0x80, 0]) + (500).to_bytes(2, "big") + bytes(4) \
        + (0x4000).to_bytes(4, "big")
    good = ctx.protect(hdr + bytes(range(PSZ // 2)) * 2)
    tampered = bytearray(good)
    tampered[20] ^= 1
    out_sock.sendto(bytes(tampered), ("127.0.0.1", port))
    hdr2 = bytes([0x80, 0]) + (500).to_bytes(2, "big") + bytes(4) \
        + (0x4000).to_bytes(4, "big")
    out_sock.sendto(wrong.protect(hdr2 + bytes(PSZ)), ("127.0.0.1", port))
    time.sleep(0.02)
    rx.poll()
    _, flags = rx.read_tick()
    assert rx.auth_failures(0) == 2
    assert not flags.any()               # nothing authenticated -> nothing out
    rx.close(); rx_sock.close(); out_sock.close()


def test_roc_rollover_native_tx():
    """tx seq wraps 0xFFFF->0: the C edge must bump ROC or every packet
    after the wrap fails auth at a compliant receiver."""
    suite = AES_CM_128_HMAC_SHA1_80
    key, salt = _keys(suite, seed=17)
    cap = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    cap.bind(("127.0.0.1", 0))
    cap.settimeout(2.0)
    tx, tx_sock = _mk_tx(1, cap.getsockname()[1], suite, key, salt,
                         seq0=0xFFFE)
    rx_ctx = SrtpContext(key, salt, suite)
    pay = np.full((1, PSZ), 0x5A, np.uint8)
    for tick in range(6):                # crosses the 16-bit boundary
        tx.send(pay, ts_inc=PSZ)
        pkt = cap.recv(2048)
        plain = rx_ctx.unprotect(pkt)
        assert plain is not None, f"auth failed after rollover (tick {tick})"
    assert rx_ctx.roc[0x2000] == 1       # receiver tracked the wrap
    tx.close(); tx_sock.close(); cap.close()


def test_gso_srtp_path():
    """GSO batching with uniform tags: segments carry valid SRTP packets."""
    suite = AES_CM_128_HMAC_SHA1_80
    key, salt = _keys(suite, seed=19)
    cap = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    cap.bind(("127.0.0.1", 0))
    cap.settimeout(2.0)
    port = cap.getsockname()[1]
    n = 150                              # > kMaxSegs: multiple GSO flushes
    tx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx_sock.bind(("127.0.0.1", 0))
    tx = BatchRtpTx(tx_sock, n, PSZ)
    ctxs = {}
    for i in range(n):
        tx.config(i, "127.0.0.1", port, ssrc=0x5000 + i, seq0=1, pt=0)
        tx.set_srtp(i, key, salt, suite)
        ctxs[i] = SrtpContext(key, salt, suite)
    tx.enable_gso(("127.0.0.1", port))
    pay = np.random.default_rng(3).integers(0, 255, (n, PSZ), np.uint8)
    assert tx.send(pay, ts_inc=PSZ) == n
    seen = 0
    for _ in range(n):
        pkt = cap.recv(2048)
        ssrc = int.from_bytes(pkt[8:12], "big")
        leg = ssrc - 0x5000
        plain = ctxs[leg].unprotect(pkt)
        assert plain is not None
        np.testing.assert_array_equal(
            np.frombuffer(plain[12:], np.uint8), pay[leg])
        seen += 1
    assert seen == n
    tx.close(); tx_sock.close(); cap.close()


def test_python_tx_native_unprotect_gcm():
    """AEAD-GCM packets protected by Python land decrypted in the jitter
    ring; tampering is rejected by the AEAD tag (RFC 7714 via the same
    dlopen'd libcrypto the DTLS layer negotiates GCM-preferred for)."""
    suite = AEAD_AES_128_GCM
    key, salt = _keys(suite, seed=23)
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    rx_sock.setblocking(False)
    port = rx_sock.getsockname()[1]
    n = 3
    rx = BatchRtpRx(n, PSZ, ring_depth=64)
    rx.add_socket(rx_sock)
    tx_ctx = {}
    for i in range(n):
        rx.map_ssrc(0x8000 + i, i)
        rx.set_prefill(i, 0)
        rx.set_srtp(i, key, salt, suite)
        tx_ctx[i] = SrtpContext(key, salt, suite)
    out_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rng = np.random.default_rng(8)
    sent = []
    for tick in range(4):
        pay = rng.integers(0, 255, (n, PSZ), dtype=np.uint8)
        sent.append(pay)
        for i in range(n):
            hdr = bytes([0x80, 0]) + (300 + tick).to_bytes(2, "big") \
                + (tick * PSZ).to_bytes(4, "big") \
                + (0x8000 + i).to_bytes(4, "big")
            out_sock.sendto(tx_ctx[i].protect(hdr + pay[i].tobytes()),
                            ("127.0.0.1", port))
    # one tampered packet for leg 0
    hdr = bytes([0x80, 0]) + (304).to_bytes(2, "big") + bytes(4) \
        + (0x8000).to_bytes(4, "big")
    bad = bytearray(tx_ctx[0].protect(hdr + bytes(PSZ)))
    bad[30] ^= 1
    out_sock.sendto(bytes(bad), ("127.0.0.1", port))
    time.sleep(0.02)
    rx.poll()
    for tick in range(4):
        out, flags = rx.read_tick()
        assert flags.all(), f"tick {tick}: missing"
        np.testing.assert_array_equal(out, sent[tick])
    assert rx.auth_failures(0) == 1          # the tampered one
    rx.close(); rx_sock.close(); out_sock.close()


def test_gcm_roc_rollover_native_tx():
    suite = AEAD_AES_128_GCM
    key, salt = _keys(suite, seed=29)
    cap = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    cap.bind(("127.0.0.1", 0))
    cap.settimeout(2.0)
    tx, tx_sock = _mk_tx(1, cap.getsockname()[1], suite, key, salt,
                         seq0=0xFFFE)
    rx_ctx = SrtpContext(key, salt, suite)
    pay = np.full((1, PSZ), 0xA5, np.uint8)
    for tick in range(6):
        tx.send(pay, ts_inc=PSZ)
        pkt = cap.recv(2048)
        assert rx_ctx.unprotect(pkt) is not None, f"tick {tick}"
    assert rx_ctx.roc[0x2000] == 1
    tx.close(); tx_sock.close(); cap.close()


def test_mid_call_rekey_preserves_roc():
    """RFC 3711: the ROC continues across a mid-call REKEY of the same
    stream — a rekey after a seq wrap must not reset the packet index or
    every subsequent packet fails auth at a compliant receiver."""
    suite = AES_CM_128_HMAC_SHA1_80
    key1, salt1 = _keys(suite, seed=31)
    key2, salt2 = _keys(suite, seed=37)
    cap = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    cap.bind(("127.0.0.1", 0))
    cap.settimeout(2.0)
    tx, tx_sock = _mk_tx(1, cap.getsockname()[1], suite, key1, salt1,
                         seq0=0xFFFE)
    rx_ctx = SrtpContext(key1, salt1, suite)
    pay = np.full((1, PSZ), 0x11, np.uint8)
    for _ in range(4):                   # cross the 16-bit boundary (ROC=1)
        tx.send(pay, ts_inc=PSZ)
        assert rx_ctx.unprotect(cap.recv(2048)) is not None
    assert rx_ctx.roc[0x2000] == 1
    # REKEY mid-call: the Python receiver context keeps its ROC tracking;
    # the native sender must advertise index (ROC=1)<<16|seq with the NEW
    # keys or auth fails here
    tx.set_srtp(0, key2, salt2, suite)
    rx2 = SrtpContext(key2, salt2, suite)
    rx2.roc[0x2000] = 1                  # signalling carries the index
    rx2.last_seq[0x2000] = 2
    for _ in range(3):
        tx.send(pay, ts_inc=PSZ)
        assert rx2.unprotect(cap.recv(2048)) is not None, \
            "rekey reset the ROC"
    tx.close(); tx_sock.close(); cap.close()


def test_native_rx_survives_garbage_flood():
    """The C insert path parses attacker-controlled bytes: flood the rx
    socket with random garbage, truncated SRTP, wrong versions, tiny and
    huge datagrams — nothing crashes, nothing unauthenticated reaches the
    ring, counters stay coherent."""
    import os as _os
    suite = AES_CM_128_HMAC_SHA1_80
    key, salt = _keys(suite, seed=41)
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    rx_sock.setblocking(False)
    port = rx_sock.getsockname()[1]
    rx = BatchRtpRx(1, PSZ, ring_depth=64)
    rx.add_socket(rx_sock)
    rx.map_ssrc(0x9000, 0)
    rx.set_prefill(0, 0)
    rx.set_srtp(0, key, salt, suite)
    out_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rng = np.random.default_rng(4)
    ssrc_bytes = (0x9000).to_bytes(4, "big")
    for i in range(400):
        kind = i % 5
        if kind == 0:                        # pure noise, random length
            data = rng.bytes(int(rng.integers(0, 300)))
        elif kind == 1:                      # right SSRC, garbage rest
            data = bytes([0x80, 0]) + rng.bytes(6) + ssrc_bytes \
                + rng.bytes(PSZ + 10)
        elif kind == 2:                      # truncated (header only)
            data = bytes([0x80, 0]) + rng.bytes(6) + ssrc_bytes
        elif kind == 3:                      # wrong RTP version
            data = bytes([0x40]) + rng.bytes(12 + PSZ + 9)
        else:                                # oversized datagram
            data = bytes([0x80, 0]) + rng.bytes(6) + ssrc_bytes \
                + rng.bytes(1400)
        out_sock.sendto(data, ("127.0.0.1", port))
    time.sleep(0.05)
    rx.poll()
    _, flags = rx.read_tick()
    assert not flags.any()                   # nothing authenticated
    st = rx.stats(0)
    assert st["got"] == 0 and st["recv"] == 0
    assert rx.auth_failures(0) > 0           # right-shaped fakes were tried
    # a genuine packet still goes through after the flood
    ctx = SrtpContext(key, salt, suite)
    hdr = bytes([0x80, 0]) + (7).to_bytes(2, "big") + bytes(4) + ssrc_bytes
    out_sock.sendto(ctx.protect(hdr + bytes(PSZ)), ("127.0.0.1", port))
    time.sleep(0.02)
    rx.poll()
    out, flags = rx.read_tick()
    assert flags.all()
    rx.close(); rx_sock.close(); out_sock.close()


@pytest.mark.parametrize("suite", [AES_CM_128_HMAC_SHA1_80,
                                   AEAD_AES_128_GCM])
def test_native_rx_rejects_replay(suite):
    """RFC 3711 §3.3.2: a correctly-authenticated packet captured off the
    wire and replayed must NOT re-enter the jitter ring (the reference
    inherits this from libsrtp2's replay list in srtp_unprotect)."""
    key, salt = _keys(suite, seed=43)
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    rx_sock.setblocking(False)
    port = rx_sock.getsockname()[1]
    rx = BatchRtpRx(1, PSZ, ring_depth=64)
    rx.add_socket(rx_sock)
    rx.map_ssrc(0x5000, 0)
    rx.set_prefill(0, 0)
    rx.set_srtp(0, key, salt, suite)
    ctx = SrtpContext(key, salt, suite)
    out_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    wire = []
    rng = np.random.default_rng(6)
    pays = rng.integers(0, 255, (3, PSZ), dtype=np.uint8)
    for k in range(3):
        hdr = bytes([0x80, 0]) + (900 + k).to_bytes(2, "big") \
            + (k * PSZ).to_bytes(4, "big") + (0x5000).to_bytes(4, "big")
        pkt = ctx.protect(hdr + pays[k].tobytes())
        wire.append(pkt)
        out_sock.sendto(pkt, ("127.0.0.1", port))
    time.sleep(0.02)
    rx.poll()
    for k in range(3):
        out, flags = rx.read_tick()
        assert flags.all()
        np.testing.assert_array_equal(out[0], pays[k])
    # replay all three captured packets: authenticated, but dropped
    for pkt in wire:
        out_sock.sendto(pkt, ("127.0.0.1", port))
    time.sleep(0.02)
    rx.poll()
    _, flags = rx.read_tick()
    assert not flags.any(), "replayed packet reached the ring"
    assert rx.replay_drops(0) == 3
    assert rx.auth_failures(0) == 0      # replays are not auth failures
    # fresh traffic still flows after the replay burst (the empty
    # read_tick above advanced playout by one -> next expected seq is 904)
    hdr = bytes([0x80, 0]) + (904).to_bytes(2, "big") \
        + (4 * PSZ).to_bytes(4, "big") + (0x5000).to_bytes(4, "big")
    out_sock.sendto(ctx.protect(hdr + pays[0].tobytes()), ("127.0.0.1", port))
    time.sleep(0.02)
    rx.poll()
    out, flags = rx.read_tick()
    assert flags.all()
    np.testing.assert_array_equal(out[0], pays[0])
    rx.close(); rx_sock.close(); out_sock.close()


@pytest.mark.parametrize("suite", [AES_CM_128_HMAC_SHA1_80,
                                   AEAD_AES_128_GCM])
def test_threaded_edge_byte_exact(suite):
    """Thread-sharded edge (set_threads): N legs protected by 4 tx workers
    and unprotected by 4 rx workers must be byte-identical to the
    single-threaded path — per-leg seq/ROC/replay state is partitioned,
    never shared. Parity: the reference runs libsrtp inside every
    per-stream ticker thread (msticker.c:448 + ms_srtp.cpp:475)."""
    key, salt = _keys(suite, seed=17)
    n = 37                                   # odd: uneven partitions
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    rx_sock.setblocking(False)
    port = rx_sock.getsockname()[1]
    tx, tx_sock = _mk_tx(n, port, suite, key, salt, seq0=50)
    tx.set_threads(4)
    rx = BatchRtpRx(n, PSZ, ring_depth=64)
    rx.add_socket(rx_sock)
    rx.set_threads(4)
    for i in range(n):
        rx.map_ssrc(0x2000 + i, i)
        rx.set_prefill(i, 0)
        rx.set_srtp(i, key, salt, suite)
    rng = np.random.default_rng(23)
    for tick in range(12):
        pay = rng.integers(0, 255, (n, PSZ), dtype=np.uint8)
        assert tx.send(pay, ts_inc=PSZ) == n
        time.sleep(0.004)
        rx.poll()
        out, flags = rx.read_tick()
        assert flags.all(), f"tick {tick}: loss through threaded edge"
        np.testing.assert_array_equal(out, pay)
    assert all(rx.auth_failures(i) == 0 for i in range(n))
    assert all(rx.replay_drops(i) == 0 for i in range(n))
    # switching back to single-threaded mid-session keeps state coherent
    tx.set_threads(1)
    rx.set_threads(1)
    pay = rng.integers(0, 255, (n, PSZ), dtype=np.uint8)
    assert tx.send(pay, ts_inc=PSZ) == n
    time.sleep(0.004)
    rx.poll()
    out, flags = rx.read_tick()
    assert flags.all()
    np.testing.assert_array_equal(out, pay)
    tx.close(); tx_sock.close(); rx.close(); rx_sock.close()


def test_threaded_edge_gso_path():
    """GSO + threads: each worker stages its own UDP_SEGMENT super-packets
    on the shared connected socket."""
    suite = AES_CM_128_HMAC_SHA1_80
    key, salt = _keys(suite, seed=19)
    n = 96
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    rx_sock.setblocking(False)
    port = rx_sock.getsockname()[1]
    tx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx_sock.bind(("127.0.0.1", 0))
    tx = BatchRtpTx(tx_sock, n, PSZ)
    for i in range(n):
        tx.config(i, "127.0.0.1", port, ssrc=0x7000 + i, pt=0)
        tx.set_srtp(i, key, salt, suite)
    tx.enable_gso(("127.0.0.1", port))
    tx.set_threads(3)
    rx = BatchRtpRx(n, PSZ, ring_depth=64)
    rx.add_socket(rx_sock, gro=True)
    rx.set_threads(3)
    for i in range(n):
        rx.map_ssrc(0x7000 + i, i)
        rx.set_prefill(i, 0)
        rx.set_srtp(i, key, salt, suite)
    rng = np.random.default_rng(29)
    for tick in range(8):
        pay = rng.integers(0, 255, (n, PSZ), dtype=np.uint8)
        assert tx.send(pay, ts_inc=PSZ) == n
        time.sleep(0.004)
        rx.poll()
        out, flags = rx.read_tick()
        assert flags.all()
        np.testing.assert_array_equal(out, pay)
    tx.close(); tx_sock.close(); rx.close(); rx_sock.close()


def test_hw_crypto_path_active_when_cpu_supports_it():
    """The edge binary must carry the AES-NI/SHA-NI/PCLMUL per-packet
    path (native/aesni_crypto.h) whenever the build host's CPU has the
    instructions — falling back to libcrypto EVP silently would forfeit
    the measured ~3x per-packet crypto cut (tools/edge_profile.py).
    Every other test in this file then exercises THAT path byte-exactly
    against the KAT-pinned Python contexts."""
    from mediastreamer2_tpu.native import rtp_edge_hw_crypto
    flags = open("/proc/cpuinfo").read()
    cpu_has = all(f in flags for f in (" aes", "sha_ni", "pclmulqdq"))
    if not cpu_has:
        import pytest
        pytest.skip("CPU lacks AES-NI/SHA-NI/PCLMUL")
    assert rtp_edge_hw_crypto()
