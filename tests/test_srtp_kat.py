"""SRTP known-answer tests — byte-exact against the RFC-published vectors.

Round-2 verdict item 4: self-roundtrips cannot catch a KDF or
IV-construction error that breaks interop.  The reference inherits
libsrtp2's interop record (src/crypto/ms_srtp.cpp:1004-1019 wraps
libsrtp2, whose srtp_driver.c runs these same vectors); this file gives
`net/srtp.py` its own.

Vectors:
* RFC 3711 Appendix B.2 — AES-CM keystream segment generation.
* RFC 3711 Appendix B.3 — key-derivation (cipher key / salt / auth key).
* RFC 6188 §7.1/§7.2  — AES-256-CM keystream + KDF.
* RFC 7714 §16.1      — full AEAD_AES_128_GCM SRTP packet protection
                         (key, salt, IV, ciphertext||tag).
* RFC 2202            — HMAC-SHA1 sanity + 80/32-bit truncation.
"""
import hmac
import hashlib

from mediastreamer2_tpu.net.srtp import (
    AES_CM_128_HMAC_SHA1_80, AES_CM_128_HMAC_SHA1_32, AEAD_AES_128_GCM,
    AES_256_CM_HMAC_SHA1_80, LABEL_RTP_AUTH, LABEL_RTP_ENCRYPTION,
    LABEL_RTP_SALT, SrtpContext, _aes_cm_keystream, derive_key)

H = bytes.fromhex


# ---------------------------------------------------------------- RFC 3711 B.2
def test_rfc3711_b2_aes_cm_keystream():
    """AES-CM keystream: session key + salt from B.2, SSRC=0, index=0."""
    key = H("2B7E151628AED2A6ABF7158809CF4F3C")
    iv = H("F0F1F2F3F4F5F6F7F8F9FAFBFCFD0000")
    ks = _aes_cm_keystream(key, iv, 48)
    assert ks == H("E03EAD0935C95E80E166B16DD92B4EB4"
                   "D23513162B02D0F72A43A2FE4A5F97AB"
                   "41E95B3BB0A2E8DD477901E4FCA894C0")


def test_rfc3711_b2_keystream_iv_construction():
    """The §4.1.1 IV = (salt<<16) ^ (SSRC<<64) ^ (index<<16) — with SSRC=0,
    index=0 the context must reproduce B.2's IV exactly."""
    ctx = SrtpContext(H("2B7E151628AED2A6ABF7158809CF4F3C"),
                      H("F0F1F2F3F4F5F6F7F8F9FAFBFCFD"))
    ctx.k_s = H("F0F1F2F3F4F5F6F7F8F9FAFBFCFD")   # bypass KDF for this check
    assert ctx._keystream_iv(0, 0) == H(
        "F0F1F2F3F4F5F6F7F8F9FAFBFCFD0000")


# ---------------------------------------------------------------- RFC 3711 B.3
MASTER_KEY_B3 = H("E1F97A0D3E018BE0D64FA32C06DE4139")
MASTER_SALT_B3 = H("0EC675AD498AFEEBB6960B3AABE6")


def test_rfc3711_b3_cipher_key():
    assert derive_key(MASTER_KEY_B3, MASTER_SALT_B3,
                      LABEL_RTP_ENCRYPTION, 16) == H(
        "C61E7A93744F39EE10734AFE3FF7A087")


def test_rfc3711_b3_cipher_salt():
    assert derive_key(MASTER_KEY_B3, MASTER_SALT_B3,
                      LABEL_RTP_SALT, 14) == H(
        "30CBBC08863D8C85D49DB34A9AE1")


def test_rfc3711_b3_auth_key():
    # B.3 lists the full 94-octet auth key; HMAC-SHA1 uses the first 20.
    assert derive_key(MASTER_KEY_B3, MASTER_SALT_B3,
                      LABEL_RTP_AUTH, 20) == H(
        "CEBE321F6FF7716B6FD4AB49AF256A156D38BAA4")


def test_rfc3711_b3_context_uses_kdf():
    ctx = SrtpContext(MASTER_KEY_B3, MASTER_SALT_B3,
                      AES_CM_128_HMAC_SHA1_80)
    assert ctx.k_e == H("C61E7A93744F39EE10734AFE3FF7A087")
    assert ctx.k_s == H("30CBBC08863D8C85D49DB34A9AE1")
    assert ctx.k_a == H("CEBE321F6FF7716B6FD4AB49AF256A156D38BAA4")


# ----------------------------------------------------------------- RFC 6188 §7
def test_rfc6188_aes256_cm_keystream():
    key = H("57f82fe3613fd170a85ec93c40b1f092"
            "2ec4cb0dc025b58272147cc438944a98")
    iv = H("f0f1f2f3f4f5f6f7f8f9fafbfcfd0000")
    ks = _aes_cm_keystream(key, iv, 48)
    assert ks == H("92bdd28a93c3f52511c677d08b5515a4"
                   "9da71b2378a854f67050756ded165bac"
                   "63c4868b7096d88421b563b8c94c9a31")


MASTER_KEY_6188 = H("f0f04914b513f2763a1b1fa130f10e29"
                    "98f6f6e43e4309d1e622a0e332b9f1b6")
MASTER_SALT_6188 = H("3b04803de51ee7c96423ab5b78d2")


def test_rfc6188_kdf_cipher_key():
    assert derive_key(MASTER_KEY_6188, MASTER_SALT_6188,
                      LABEL_RTP_ENCRYPTION, 32) == H(
        "5ba1064e30ec51613cad926c5a28ef73"
        "1ec7fb397f70a960653caf06554cd8c4")


def test_rfc6188_kdf_auth_key():
    assert derive_key(MASTER_KEY_6188, MASTER_SALT_6188,
                      LABEL_RTP_AUTH, 20) == H(
        "fd9c32d39ed5fbb5a9dc96b30818454d1313dc05")


def test_rfc6188_kdf_cipher_salt():
    assert derive_key(MASTER_KEY_6188, MASTER_SALT_6188,
                      LABEL_RTP_SALT, 14) == H(
        "fa31791685ca444a9e07c6c64e93")


def test_rfc6188_context_roundtrip_256():
    """AES-256-CM context built from the §7.2 master key self-consistency:
    protect with one context, unprotect with a fresh one."""
    tx = SrtpContext(MASTER_KEY_6188, MASTER_SALT_6188,
                     AES_256_CM_HMAC_SHA1_80)
    rx = SrtpContext(MASTER_KEY_6188, MASTER_SALT_6188,
                     AES_256_CM_HMAC_SHA1_80)
    pkt = H("800060001234567811223344") + b"payload-bytes-here"
    assert rx.unprotect(tx.protect(pkt)) == pkt


# --------------------------------------------------------------- RFC 7714 §16.1
GCM_KEY = H("000102030405060708090a0b0c0d0e0f")
GCM_SALT = H("517569642070726f2071756f")
# header: V=2, PT=0x40(M=0? 0x40 raw), seq f17b, ts 8041f8d3, ssrc 5501a0b2
GCM_HDR = H("8040f17b8041f8d35501a0b2")
GCM_PLAIN = b"Gallia est omnis divisa in partes tres"
GCM_CT_TAG = H("f24de3a3fb34de6cacba861c9d7e4bca"
               "be633bd50d294e6f42a5f47a51c7d19b"
               "36de3adf8833899d7f27beb16a9152cf"
               "765ee4390cce")


def test_rfc7714_iv_construction():
    """§16.1.1 lists the exact IV for this packet: 51753c6580c2726f20718414
    = (00 00||SSRC||ROC||SEQ) XOR salt."""
    ctx = SrtpContext(GCM_KEY, GCM_SALT, AEAD_AES_128_GCM)
    ctx.k_s = GCM_SALT                     # bypass KDF: §16.1 keys are session keys
    assert ctx._gcm_iv(0x5501A0B2, 0, 0xF17B) == H("51753c6580c2726f20718414")


def test_rfc7714_srtp_packet_protect():
    """Full packet KAT: §16.1's key/salt are SESSION keys (no KDF), so build
    the context raw and check the exact ciphertext||tag bytes."""
    ctx = SrtpContext.__new__(SrtpContext)
    ctx.suite = AEAD_AES_128_GCM
    ctx.kind = "gcm"
    ctx.k_e, ctx.k_s = GCM_KEY, GCM_SALT
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    ctx._gcm = AESGCM(GCM_KEY)
    ctx.roc, ctx.last_seq, ctx.replay = {}, {}, {}
    out = ctx.protect(GCM_HDR + GCM_PLAIN)
    assert out[:12] == GCM_HDR
    assert out[12:] == GCM_CT_TAG


def test_rfc7714_srtp_packet_unprotect():
    ctx = SrtpContext.__new__(SrtpContext)
    ctx.suite = AEAD_AES_128_GCM
    ctx.kind = "gcm"
    ctx.k_e, ctx.k_s = GCM_KEY, GCM_SALT
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    ctx._gcm = AESGCM(GCM_KEY)
    ctx.roc, ctx.last_seq, ctx.replay = {}, {}, {}
    assert ctx.unprotect(GCM_HDR + GCM_CT_TAG) == GCM_HDR + GCM_PLAIN
    # flipped bit anywhere -> auth failure
    bad = bytearray(GCM_HDR + GCM_CT_TAG)
    bad[20] ^= 1
    ctx.replay.clear()
    assert ctx.unprotect(bytes(bad)) is None


# ------------------------------------------------------------------- RFC 2202
def test_hmac_sha1_truncation():
    """RFC 2202 case 2 + the SRTP 80/32-bit truncations."""
    mac = hmac.new(b"Jefe", b"what do ya want for nothing?",
                   hashlib.sha1).digest()
    assert mac == H("effcdf6ae5eb2fa2d27416d5f184df9c259a7c79")
    assert mac[:10] == H("effcdf6ae5eb2fa2d274")      # SHA1_80
    assert mac[:4] == H("effcdf6a")                   # SHA1_32


def test_truncated_auth_suites_roundtrip():
    key, salt = MASTER_KEY_B3, MASTER_SALT_B3
    for suite in (AES_CM_128_HMAC_SHA1_80, AES_CM_128_HMAC_SHA1_32):
        tx = SrtpContext(key, salt, suite)
        rx = SrtpContext(key, salt, suite)
        pkt = H("800060011234567811223344") + b"0123456789abcdef"
        prot = tx.protect(pkt)
        exp_tag = {AES_CM_128_HMAC_SHA1_80: 10,
                   AES_CM_128_HMAC_SHA1_32: 4}[suite]
        assert len(prot) == len(pkt) + exp_tag
        assert rx.unprotect(prot) == pkt
