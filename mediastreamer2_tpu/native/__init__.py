"""Native runtime components (C++), loaded via ctypes.

Built on first import with g++ (cached as _ms2io.so next to the source).
Everything degrades gracefully to pure-Python paths when the toolchain is
unavailable.
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
from typing import List, Optional, Tuple

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_ms2io.so")
_SRC = os.path.join(_DIR, "io_pump.cpp")

_lib = None
_build_lock = threading.Lock()


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (os.path.getmtime(_SRC)
                                       > os.path.getmtime(_SO)):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-pthread",
                     _SRC, "-o", _SO + ".tmp"],
                    check=True, capture_output=True, timeout=120)
                os.replace(_SO + ".tmp", _SO)
            except (subprocess.SubprocessError, OSError):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.ms2_pump_create.restype = ctypes.c_void_p
        lib.ms2_pump_destroy.argtypes = [ctypes.c_void_p]
        lib.ms2_pump_add_socket.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ms2_pump_remove_socket.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ms2_pump_read.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_char_p, ctypes.c_int]
        lib.ms2_pump_dropped.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ms2_pump_dropped.restype = ctypes.c_uint64
        _lib = lib
        return _lib


def native_available() -> bool:
    return _ensure_built() is not None


class NativeIoPump:
    """Epoll-based datagram pump on a native thread (see io_pump.cpp).

    read(fd) returns [(t_ns, bytes), ...] drained since last call.
    """

    def __init__(self, read_buf_size: int = 1 << 20):
        lib = _ensure_built()
        if lib is None:
            raise RuntimeError("native io pump unavailable (g++ build failed)")
        self._lib = lib
        self._pump = lib.ms2_pump_create()
        self._buf = ctypes.create_string_buffer(read_buf_size)

    def add_socket(self, sock) -> None:
        self._lib.ms2_pump_add_socket(self._pump, sock.fileno())

    def remove_socket(self, sock) -> None:
        self._lib.ms2_pump_remove_socket(self._pump, sock.fileno())

    def read(self, sock) -> List[Tuple[int, bytes]]:
        n = self._lib.ms2_pump_read(self._pump, sock.fileno(),
                                    self._buf, len(self._buf))
        out = []
        off = 0
        raw = self._buf.raw
        while off < n:
            t_ns, = struct.unpack_from("<Q", raw, off)
            off += 8
            ln, = struct.unpack_from("<I", raw, off)
            off += 4
            out.append((t_ns, raw[off:off + ln]))
            off += ln
        return out

    def dropped(self, sock) -> int:
        return self._lib.ms2_pump_dropped(self._pump, sock.fileno())

    def close(self):
        if self._pump:
            self._lib.ms2_pump_destroy(self._pump)
            self._pump = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
