"""VP8 host codec via libvpx (ctypes) — the reference's main video codec.

Reference: MSVp8Enc/Dec (src/videofilters/vp8.c:1,273 — libvpx with AVPF
picture-id/RPSI/SLI logic) + RFC 7741 packetization (vp8rtpfmt.c).

Host-filter tier (like Opus/GSM): frames cross the RTP boundary as encoded
bytes; the device graph handles the pixel path.  libvpx ships no dev
headers in this image, so the ABI surface is bound by **runtime probing**:
`vpx_codec_enc_config_default` fills a buffer whose anchor defaults
(320/240, 1/30 timebase, rc 256/4/63/100/100, bufs 6000/4000/5000,
kf 128) pin the v1.12 struct offsets used below; `vpx_image_t` offsets are
probed the same way in the test-suite.  Encoder/decoder ABI version = 1 on
this build (verified by init return code).

Wire format note: this class produces raw VP8 frames; RFC 7741 payload
descriptors are added by Vp8RtpPacker (minimal X=0 form: S bit + PID).
"""
from __future__ import annotations

import ctypes
import ctypes.util
import struct
from typing import List, Optional, Tuple

import numpy as np

_vpx = None
try:
    _p = ctypes.util.find_library("vpx")
    if _p:
        _vpx = ctypes.CDLL(_p)
        for f in ("vpx_codec_vp8_cx", "vpx_codec_vp8_dx", "vpx_img_alloc",
                  "vpx_codec_get_cx_data", "vpx_codec_get_frame"):
            getattr(_vpx, f).restype = ctypes.c_void_p
        _vpx.vpx_codec_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_ulong, ctypes.c_longlong, ctypes.c_ulong]
except OSError:                                    # pragma: no cover
    _vpx = None

# probed vpx_codec_enc_cfg offsets (libvpx v1.12, x86-64)
_CFG_THREADS = 4               # vpx_codec_enc_cfg_t.g_threads
_CFG_W, _CFG_H = 12, 16
_CFG_TB_NUM, _CFG_TB_DEN = 28, 32
_CFG_END_USAGE = 72            # 1 = CBR
_CFG_TARGET_KBPS = 112
_CFG_KF_MODE, _CFG_KF_MIN, _CFG_KF_MAX = 160, 164, 168
# probed vpx_image_t offsets
_IMG_DW, _IMG_DH = 24, 28
_IMG_PLANES = (48, 56, 64)
_IMG_STRIDES = (80, 84, 88)
# probed vpx_codec_cx_pkt offsets (flags toggles with keyframes at +40;
# +24 is pts, +32 is duration)
_PKT_KIND, _PKT_BUF, _PKT_SZ, _PKT_FLAGS = 0, 8, 16, 40

VPX_IMG_FMT_I420 = 0x102
VPX_DL_REALTIME = 1
VPX_EFLAG_FORCE_KF = 1
VPX_FRAME_IS_KEY = 1
VPX_FRAME_IS_FRAGMENT = 8
VPX_CODEC_USE_OUTPUT_PARTITION = 0x20000
VP8E_SET_TOKEN_PARTITIONS = 18     # verified by partition-count probe
VP8E_SET_CPUUSED = 13              # vp8e_enc_control_id: speed/quality dial
_PKT_PARTITION_ID = 44
ABI = 1

_verified = None


def vp8_available() -> bool:
    """True only after anchor re-verification + a real encode/decode
    roundtrip on THIS libvpx build (a distro bump that moves struct
    offsets disables the codec instead of corrupting configs)."""
    global _verified
    if _verified is not None:
        return _verified
    _verified = False
    if _vpx is None:
        return False
    try:
        # anchor check: config_default must show the v1.12 defaults at the
        # pinned offsets (320/240, 1/30 timebase, 256 kbps, kf_max 128)
        iface = _vpx.vpx_codec_vp8_cx()
        cfg = (ctypes.c_uint8 * 2048)()
        if _vpx.vpx_codec_enc_config_default(ctypes.c_void_p(iface),
                                             cfg, 0) != 0:
            return False
        anchors = ((_CFG_W, 320), (_CFG_H, 240), (_CFG_TB_NUM, 1),
                   (_CFG_TB_DEN, 30), (_CFG_TARGET_KBPS, 256),
                   (_CFG_KF_MAX, 128))
        buf = bytes(cfg)
        for off, want in anchors:
            if int.from_bytes(buf[off:off + 4], "little") != want:
                return False
        enc = Vp8Encoder(64, 48, fps=25)
        dec = Vp8Decoder()
        rng = np.random.default_rng(0)
        y = (rng.random((48, 64)) * 255).astype(np.uint8)
        u = v = np.full((24, 32), 128, np.uint8)
        data, key = enc.encode_planes(y, u, v, force_keyframe=True)
        out = dec.decode(data)
        _verified = bool(key and out is not None and out[0].shape == (48, 64))
    except Exception:
        _verified = False
    return _verified


def _u(addr, off, n=4):
    return int.from_bytes(ctypes.string_at(addr + off, n), "little")




class _VpxCtx:
    """vpx_codec_ctx_t storage + guaranteed vpx_codec_destroy on GC —
    leaked contexts accumulate libvpx internal allocations across a long
    test run/process; destroy also invalidates use-after-close cleanly."""

    __slots__ = ("buf", "_open")

    def __init__(self):
        self.buf = (ctypes.c_uint8 * 1024)()     # sizeof(vpx_codec_ctx_t)<<1024
        self._open = False

    def mark_open(self):
        self._open = True

    def close(self):
        if self._open and _vpx is not None:
            self._open = False
            try:
                _vpx.vpx_codec_destroy(self.buf)
            except Exception:
                pass

    def __del__(self):
        self.close()

class Vp8Encoder:
    def __init__(self, width: int, height: int, bitrate_bps: int = 500_000,
                 fps: int = 25, kf_max_dist: int = 100,
                 token_partitions_log2: int = 0, threads: int = 0,
                 cpu_used: int = 10):
        """token_partitions_log2 > 0 enables RFC 7741 partition mode:
        the encoder emits each VP8 partition as a separate buffer
        (vp8rtpfmt.c partition handling) so RTP packets can start at
        partition boundaries with the PID descriptor field.

        threads/cpu_used are the realtime scaling dials the reference
        also sets (src/videofilters/vp8.c: g_threads from the factory
        CPU count, VP8E_SET_CPUUSED for the speed/quality trade):
        threads=0 -> min(4, host cores); cpu_used=10 is the realtime
        default (range 0..16, higher = faster encode, measured ~1.2-2x
        vs 0 on this host at 320x240)."""
        if _vpx is None:
            raise RuntimeError("libvpx not available")
        self.w, self.h = width, height
        self.partitioned = token_partitions_log2 > 0
        iface = _vpx.vpx_codec_vp8_cx()
        cfg = (ctypes.c_uint8 * 2048)()
        _vpx.vpx_codec_enc_config_default(ctypes.c_void_p(iface), cfg, 0)
        if threads <= 0:
            import os
            threads = min(4, os.cpu_count() or 1)
        for off, v in ((_CFG_THREADS, threads),
                       (_CFG_W, width), (_CFG_H, height),
                       (_CFG_TB_NUM, 1), (_CFG_TB_DEN, fps),
                       (_CFG_END_USAGE, 1),
                       (_CFG_TARGET_KBPS, max(bitrate_bps // 1000, 30)),
                       (_CFG_KF_MAX, kf_max_dist)):
            struct.pack_into("<I", cfg, off, v)
        self._cfg = cfg
        self._ctx = _VpxCtx()
        self.ctx = self._ctx.buf
        flags = VPX_CODEC_USE_OUTPUT_PARTITION if self.partitioned else 0
        r = _vpx.vpx_codec_enc_init_ver(self.ctx, ctypes.c_void_p(iface),
                                        cfg, flags, ABI)
        if r == 0:
            self._ctx.mark_open()
        if r != 0:
            raise RuntimeError(f"vp8 enc init: {r}")
        _vpx.vpx_codec_control_.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        if cpu_used:
            _vpx.vpx_codec_control_(self.ctx, VP8E_SET_CPUUSED, cpu_used)
        if self.partitioned:
            _vpx.vpx_codec_control_(self.ctx, VP8E_SET_TOKEN_PARTITIONS,
                                    token_partitions_log2)
        self.img = _vpx.vpx_img_alloc(None, VPX_IMG_FMT_I420,
                                      width, height, 16)
        self.pts = 0
        self.frames_encoded = 0

    def set_bitrate(self, bps: int):
        """cf. MS_VIDEO_ENCODER_SET_BITRATE: re-init config."""
        struct.pack_into("<I", self._cfg, _CFG_TARGET_KBPS,
                         max(bps // 1000, 30))
        _vpx.vpx_codec_enc_config_set(self.ctx, self._cfg)

    def encode_planes(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                      force_keyframe: bool = False) -> Tuple[bytes, bool]:
        planes = [_u(self.img, o, 8) for o in _IMG_PLANES]
        strides = [_u(self.img, o) for o in _IMG_STRIDES]
        for plane, stride, arr in zip(planes, strides, (y, u, v)):
            h, w = arr.shape
            data = np.ascontiguousarray(arr, np.uint8)
            for row in range(h):
                ctypes.memmove(plane + row * stride,
                               data[row].tobytes(), w)
        flags = VPX_EFLAG_FORCE_KF if force_keyframe else 0
        r = _vpx.vpx_codec_encode(self.ctx, self.img, self.pts, 1,
                                  flags, VPX_DL_REALTIME)
        if r != 0:
            raise RuntimeError(f"vp8 encode: {r}")
        self.pts += 1
        self.frames_encoded += 1
        it = ctypes.c_void_p(0)
        parts: List[bytes] = []
        is_key = False
        while True:
            pkt = _vpx.vpx_codec_get_cx_data(self.ctx, ctypes.byref(it))
            if not pkt:
                break
            if _u(pkt, _PKT_KIND) == 0:        # CX_FRAME_PKT
                buf = _u(pkt, _PKT_BUF, 8)
                sz = _u(pkt, _PKT_SZ, 8)
                parts.append(ctypes.string_at(buf, sz))
                is_key |= bool(_u(pkt, _PKT_FLAGS) & VPX_FRAME_IS_KEY)
        self._last_parts = parts
        return b"".join(parts), is_key

    def encode_partitions(self, y, u, v, force_keyframe: bool = False
                          ) -> Tuple[List[bytes], bool]:
        """Partition-mode encode: one bytes object per VP8 partition
        (requires token_partitions_log2 > 0 at init)."""
        _, is_key = self.encode_planes(y, u, v, force_keyframe)
        return self._last_parts, is_key


class Vp8Decoder:
    def __init__(self, threads: int = 0):
        if _vpx is None:
            raise RuntimeError("libvpx not available")
        self._ctx = _VpxCtx()
        self.ctx = self._ctx.buf
        if threads <= 0:
            import os
            threads = min(4, os.cpu_count() or 1)
        # vpx_codec_dec_cfg_t = {threads, w, h}; w/h 0 = from stream.
        # Kept alive on self: init stores the raw pointer in
        # ctx->config.dec (no copy), and later libvpx paths may re-read it.
        dec_cfg = self._dec_cfg = struct.pack("<III", threads, 0, 0)
        r = _vpx.vpx_codec_dec_init_ver(
            self.ctx, ctypes.c_void_p(_vpx.vpx_codec_vp8_dx()),
            dec_cfg, 0, ABI)
        if r != 0:
            raise RuntimeError(f"vp8 dec init: {r}")
        self._ctx.mark_open()

    def decode(self, data: bytes
               ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        r = _vpx.vpx_codec_decode(self.ctx, data, len(data), None, 0)
        if r != 0:
            return None                         # corrupt frame
        it = ctypes.c_void_p(0)
        fr = _vpx.vpx_codec_get_frame(self.ctx, ctypes.byref(it))
        if not fr:
            return None
        w, h = _u(fr, _IMG_DW), _u(fr, _IMG_DH)
        planes = [_u(fr, o, 8) for o in _IMG_PLANES]
        strides = [_u(fr, o) for o in _IMG_STRIDES]

        def read(plane, stride, ph, pw):
            buf = ctypes.string_at(plane, stride * ph)
            return np.frombuffer(buf, np.uint8).reshape(ph, stride)[:, :pw]
        y = read(planes[0], strides[0], h, w)
        u = read(planes[1], strides[1], h // 2, w // 2)
        v = read(planes[2], strides[2], h // 2, w // 2)
        return y.copy(), u.copy(), v.copy()


class Vp8FrameCodec:
    """FrameCodec adapter for VideoStreamBatch (one instance per leg).

    Frames cross as the framework's packed-I420 byte layout
    ([h*3/2, w]: Y rows then interleaved half-res U,V rows — see
    core/block.py block_shape)."""

    name = "vp8"

    def __init__(self, width: int, height: int, bitrate_bps: int = 500_000,
                 fps: int = 25, threads: int = 0, cpu_used: int = 10):
        self.w, self.h = width, height
        self.enc = Vp8Encoder(width, height, bitrate_bps, fps,
                              threads=threads, cpu_used=cpu_used)
        self.dec = Vp8Decoder(threads=threads)

    def _unpack(self, frame: bytes):
        a = np.frombuffer(frame, np.uint8).reshape(self.h * 3 // 2, self.w)
        y = a[: self.h]
        uv = a[self.h:].reshape(self.h // 2, 2, self.w // 2)
        return y, uv[:, 0, :], uv[:, 1, :]

    def _pack(self, y, u, v) -> bytes:
        uv = np.stack([u, v], axis=1).reshape(self.h // 2, self.w)
        return np.concatenate([y, uv], axis=0).tobytes()

    def encode(self, frame: bytes, keyframe: bool) -> bytes:
        y, u, v = self._unpack(frame)
        data, _ = self.enc.encode_planes(y, u, v, force_keyframe=keyframe)
        return data

    def decode(self, data: bytes) -> Optional[bytes]:
        out = self.dec.decode(data)
        if out is None:
            return None
        return self._pack(*out)


# --- RFC 7741 payload descriptor ----------------------------------------
def vp8_payload_pack(fragments: List[bytes],
                     picture_id: Optional[int] = None) -> List[bytes]:
    """Prepend the descriptor: S=1 on the first partition fragment; with
    picture_id, the X+I extension carries a 15-bit PictureID (the AVPF
    RPSI/SLI reference point, cf. vp8.c picture-id logic)."""
    out = []
    for i, f in enumerate(fragments):
        s_bit = 0x10 if i == 0 else 0x00
        if picture_id is None:
            out.append(bytes([s_bit]) + f)
        else:
            hdr = bytes([0x80 | s_bit, 0x80]) \
                + struct.pack("!H", 0x8000 | (picture_id & 0x7FFF))
            out.append(hdr + f)
    return out


def vp8_payload_unpack(payload: bytes
                       ) -> Tuple[bytes, bool, Optional[int]]:
    """Returns (vp8 data, is_partition_start, picture_id or None)."""
    if not payload:
        return b"", False, None
    b0 = payload[0]
    pid = None
    if b0 & 0x80:                               # X bit: extended header
        off = 2
        if payload[1] & 0x80:                   # I: PictureID
            if payload[off] & 0x80:             # M: 15-bit
                pid = struct.unpack_from("!H", payload, off)[0] & 0x7FFF
                off += 2
            else:
                pid = payload[off] & 0x7F
                off += 1
        if payload[1] & 0x40:                   # L: TL0PICIDX
            off += 1
        if payload[1] & 0x30:                   # T/K
            off += 1
        return payload[off:], bool(b0 & 0x10), pid
    return payload[1:], bool(b0 & 0x10), None


def vp8_packetize_partitions(partitions: List[bytes], mtu: int = 1400,
                             picture_id: Optional[int] = None) -> List[bytes]:
    """RFC 7741 partition mode (vp8rtpfmt.c partition handling): every
    partition starts a fresh packet with S=1 and its PID in the descriptor;
    oversized partitions fragment with S=0 and the same PID.  Receivers can
    then decode partition-aligned packets independently of later losses."""
    payloads = []
    for idx, part in enumerate(partitions):
        pid = min(idx, 7)
        chunk = mtu - 4
        for off in range(0, max(len(part), 1), chunk):
            frag = part[off:off + chunk]
            s_bit = 0x10 if off == 0 else 0x00
            if picture_id is None:
                payloads.append(bytes([s_bit | pid]) + frag)
            else:
                hdr = bytes([0x80 | s_bit | pid, 0x80]) \
                    + struct.pack("!H", 0x8000 | (picture_id & 0x7FFF))
                payloads.append(hdr + frag)
    return payloads


def vp8_partition_id(payload: bytes) -> int:
    """Descriptor PID field (partition index, RFC 7741 first octet)."""
    return payload[0] & 0x07 if payload else 0
