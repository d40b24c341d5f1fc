"""DTLS-SRTP (RFC 5764) — handshake over the RTP path, SRTP key export.

Reference: src/crypto/dtls_srtp.cpp (882 LoC on mbedtls via bctoolbox):
DTLS multiplexed with RTP on the same socket via transport modifiers, SRTP
keys exported from the handshake (:76-89, 244-255, 362-386), role
auto-detection, packet buffering queues.

Implementation: OpenSSL (libssl.so.3) via ctypes with **memory BIOs** — the
framework owns the socket, so DTLS records are shuttled between OpenSSL and
the Transport by hand (exactly the transport-modifier layering of the
reference).  `use_srtp` negotiates SRTP_AES128_CM_SHA1_80 and
`SSL_export_keying_material("EXTRACTOR-dtls_srtp")` derives the SRTP
client/server key+salt pairs per RFC 5764 §4.2.
"""
from __future__ import annotations

import ctypes
import ctypes.util
import hashlib
from typing import List, Optional, Tuple

_ssl = None
_crypto = None
try:
    _p1 = ctypes.util.find_library("ssl")
    _p2 = ctypes.util.find_library("crypto")
    if _p1 and _p2:
        _crypto = ctypes.CDLL(_p2, mode=ctypes.RTLD_GLOBAL)
        _ssl = ctypes.CDLL(_p1)
        for name, res in [
            ("DTLS_method", ctypes.c_void_p),
            ("SSL_CTX_new", ctypes.c_void_p),
            ("SSL_new", ctypes.c_void_p),
            ("BIO_new", ctypes.c_void_p),
            ("BIO_s_mem", ctypes.c_void_p),
            ("SSL_get_peer_certificate", ctypes.c_void_p),
            ("SSL_get_certificate", ctypes.c_void_p),
            ("SSL_get1_peer_certificate", ctypes.c_void_p),
        ]:
            try:
                getattr(_ssl, name).restype = res
            except AttributeError:
                pass
        _crypto.EVP_PKEY_new.restype = ctypes.c_void_p
        _crypto.X509_new.restype = ctypes.c_void_p
        _crypto.EVP_PKEY_Q_keygen.restype = ctypes.c_void_p
        _crypto.X509_get_serialNumber.restype = ctypes.c_void_p
        _crypto.X509_getm_notBefore.restype = ctypes.c_void_p
        _crypto.X509_getm_notAfter.restype = ctypes.c_void_p
        _crypto.X509_get_subject_name.restype = ctypes.c_void_p
except OSError:                                    # pragma: no cover
    _ssl = None


def dtls_available() -> bool:
    return _ssl is not None


SSL_ERROR_WANT_READ = 2
#: default offer: AEAD-GCM preferred, classic CM as fallback
#: (mirrors ms_srtp.cpp supporting both suite families)
SRTP_PROFILE = b"SRTP_AEAD_AES_128_GCM:SRTP_AES128_CM_SHA1_80"
EXTRACTOR = b"EXTRACTOR-dtls_srtp"
SSL_VERIFY_PEER = 1
SSL_VERIFY_FAIL_IF_NO_PEER_CERT = 2

#: RFC 5764/7714 use_srtp profile name -> SDES suite name + key/salt bytes
PROFILE_SUITES = {
    "SRTP_AES128_CM_SHA1_80": ("AES_CM_128_HMAC_SHA1_80", 16, 14),
    "SRTP_AES128_CM_SHA1_32": ("AES_CM_128_HMAC_SHA1_32", 16, 14),
    "SRTP_AEAD_AES_128_GCM": ("AEAD_AES_128_GCM", 16, 12),
    "SRTP_AEAD_AES_256_GCM": ("AEAD_AES_256_GCM", 32, 12),
}


class _SRTP_PROTECTION_PROFILE(ctypes.Structure):
    _fields_ = [("name", ctypes.c_char_p), ("id", ctypes.c_ulong)]


def _make_self_signed():
    """Self-signed EC cert+key (the reference generates one per device)."""
    pkey = _crypto.EVP_PKEY_Q_keygen(None, None, b"EC", b"P-256")
    x509 = _crypto.X509_new()
    _crypto.X509_set_version(ctypes.c_void_p(x509), 2)
    serial = _crypto.X509_get_serialNumber(ctypes.c_void_p(x509))
    _crypto.ASN1_INTEGER_set(ctypes.c_void_p(serial), 1)
    _crypto.X509_gmtime_adj(ctypes.c_void_p(
        _crypto.X509_getm_notBefore(ctypes.c_void_p(x509))), 0)
    _crypto.X509_gmtime_adj(ctypes.c_void_p(
        _crypto.X509_getm_notAfter(ctypes.c_void_p(x509))), 365 * 24 * 3600)
    name = _crypto.X509_get_subject_name(ctypes.c_void_p(x509))
    _crypto.X509_NAME_add_entry_by_txt(ctypes.c_void_p(name), b"CN",
                                       0x1000 | 1,   # MBSTRING_UTF8
                                       b"mediastreamer2_tpu", -1, -1, 0)
    _crypto.X509_set_issuer_name(ctypes.c_void_p(x509), ctypes.c_void_p(name))
    _crypto.X509_set_pubkey(ctypes.c_void_p(x509), ctypes.c_void_p(pkey))
    _crypto.X509_sign(ctypes.c_void_p(x509), ctypes.c_void_p(pkey), None)
    return x509, pkey


class DtlsSrtpSession:
    """One endpoint of a DTLS-SRTP handshake over memory BIOs.

    Drive with: feed inbound DTLS records via `put_packet`, send the records
    `pop_packets` returns, call `handshake_step` until `is_established`;
    then `export_srtp_keys(is_client)` yields (tx_key, tx_salt, rx_key,
    rx_salt) for SrtpContext.
    """

    def __init__(self, is_server: bool):
        if _ssl is None:
            raise RuntimeError("libssl not available")
        self.is_server = is_server
        self.ctx = _ssl.SSL_CTX_new(ctypes.c_void_p(_ssl.DTLS_method()))
        x509, pkey = _make_self_signed()
        _ssl.SSL_CTX_use_certificate(ctypes.c_void_p(self.ctx),
                                     ctypes.c_void_p(x509))
        _ssl.SSL_CTX_use_PrivateKey(ctypes.c_void_p(self.ctx),
                                    ctypes.c_void_p(pkey))
        r = _ssl.SSL_CTX_set_tlsext_use_srtp(ctypes.c_void_p(self.ctx),
                                             SRTP_PROFILE)
        if r != 0:
            raise RuntimeError("use_srtp failed")
        # Accept any (self-signed) certificate at the TLS layer; the caller
        # (CallSetup) MUST verify peer_fingerprint() against the SDP
        # a=fingerprint after the handshake — that comparison, not X.509
        # chain validation, is the RFC 5763 trust model the reference uses
        # (dtls_srtp.cpp fingerprint check).
        self._verify_cb = ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p)(lambda ok, store: 1)
        _ssl.SSL_CTX_set_verify(ctypes.c_void_p(self.ctx), SSL_VERIFY_PEER,
                                self._verify_cb)
        self.ssl = _ssl.SSL_new(ctypes.c_void_p(self.ctx))
        self.rbio = _ssl.BIO_new(ctypes.c_void_p(_ssl.BIO_s_mem()))
        self.wbio = _ssl.BIO_new(ctypes.c_void_p(_ssl.BIO_s_mem()))
        _ssl.SSL_set_bio(ctypes.c_void_p(self.ssl), ctypes.c_void_p(self.rbio),
                         ctypes.c_void_p(self.wbio))
        if is_server:
            _ssl.SSL_set_accept_state(ctypes.c_void_p(self.ssl))
        else:
            _ssl.SSL_set_connect_state(ctypes.c_void_p(self.ssl))
        self.established = False

    # -- record shuttling --------------------------------------------------
    def put_packet(self, data: bytes):
        _ssl.BIO_write(ctypes.c_void_p(self.rbio), data, len(data))

    def pop_packets(self) -> List[bytes]:
        out = []
        buf = ctypes.create_string_buffer(4096)
        while True:
            n = _ssl.BIO_read(ctypes.c_void_p(self.wbio), buf, len(buf))
            if n <= 0:
                break
            out.append(buf.raw[:n])
        return out

    def handshake_step(self) -> bool:
        r = _ssl.SSL_do_handshake(ctypes.c_void_p(self.ssl))
        if r == 1:
            self.established = True
        return self.established

    @property
    def is_established(self) -> bool:
        return self.established

    # -- SRTP key export (RFC 5764 §4.2) -------------------------------------
    def selected_srtp_profile(self) -> str:
        """Name of the negotiated use_srtp protection profile."""
        fn = _ssl.SSL_get_selected_srtp_profile
        fn.restype = ctypes.POINTER(_SRTP_PROTECTION_PROFILE)
        p = fn(ctypes.c_void_p(self.ssl))
        if not p:
            raise RuntimeError("no srtp profile negotiated")
        return p.contents.name.decode()

    def srtp_suite(self) -> str:
        """SDES-style suite name for SrtpContext/SrtcpContext."""
        return PROFILE_SUITES[self.selected_srtp_profile()][0]

    def export_srtp_keys(self) -> Tuple[bytes, bytes, bytes, bytes]:
        """Returns (client_key, client_salt, server_key, server_salt),
        sized for the negotiated profile (RFC 5764 §4.2 layout)."""
        _suite, klen, slen = PROFILE_SUITES[self.selected_srtp_profile()]
        total = 2 * (klen + slen)
        buf = ctypes.create_string_buffer(total)
        r = _ssl.SSL_export_keying_material(
            ctypes.c_void_p(self.ssl), buf, total,
            EXTRACTOR, len(EXTRACTOR), None, 0, 0)
        if r != 1:
            raise RuntimeError("export_keying_material failed")
        km = buf.raw
        ck, sk = km[0:klen], km[klen:2 * klen]
        cs = km[2 * klen:2 * klen + slen]
        ss = km[2 * klen + slen:2 * klen + 2 * slen]
        return ck, cs, sk, ss

    def local_fingerprint(self) -> str:
        """SHA-256 fingerprint of our cert for the SDP a=fingerprint line."""
        cert = _ssl.SSL_get_certificate(ctypes.c_void_p(self.ssl))
        return _cert_fingerprint(cert)

    def peer_fingerprint(self) -> Optional[str]:
        getter = getattr(_ssl, "SSL_get1_peer_certificate",
                         None) or _ssl.SSL_get_peer_certificate
        cert = getter(ctypes.c_void_p(self.ssl))
        if not cert:
            return None
        return _cert_fingerprint(cert)


def _cert_fingerprint(cert) -> str:
    buf = ctypes.create_string_buffer(8192)
    pp = ctypes.c_char_p(ctypes.addressof(buf))
    n = _crypto.i2d_X509(ctypes.c_void_p(cert), ctypes.byref(pp))
    der = buf.raw[:n]
    h = hashlib.sha256(der).hexdigest().upper()
    return ":".join(h[i:i + 2] for i in range(0, len(h), 2))


def is_dtls(data: bytes) -> bool:
    """RFC 5764 §5.1.2 demux: DTLS record content types 20..63."""
    return len(data) >= 1 and 20 <= data[0] <= 63
