"""TURN over TCP/TLS — framed STUN/ChannelData stream transport.

Reference: src/voip/turn_tcp.cpp (748 LoC): a TCP (optionally TLS)
connection to the TURN server carrying STUN messages and ChannelData
frames, drained by a background worker; the path that survives
UDP-hostile NATs.  RFC 5766 §11.5: over stream transports ChannelData
frames are padded to 4-byte boundaries; STUN messages are self-framing
(length at header offset 2).

This module gives TurnClient (net/turn.py, transport-agnostic by design)
a stream transport: ``TurnTcpConnection`` frames outgoing data, reassembles
inbound STUN/ChannelData from the byte stream, and pumps them to the
client from a receiver thread (the reference uses an MSWorkerThread).
"""
from __future__ import annotations

import socket
import ssl
import struct
import threading
from typing import Callable, Optional


def _frame_len(buf: bytes) -> Optional[int]:
    """Length of the first complete frame in buf, or None if incomplete."""
    if len(buf) < 4:
        return None
    first = buf[0]
    if first < 4:                       # STUN message (RFC 5389 §6)
        if len(buf) < 20:
            return None
        mlen = struct.unpack("!H", buf[2:4])[0]
        total = 20 + mlen
        return total if len(buf) >= total else None
    if 0x40 <= first <= 0x7F:           # ChannelData (RFC 5766 §11)
        dlen = struct.unpack("!H", buf[2:4])[0]
        total = 4 + dlen
        total += (-total) % 4           # stream padding (§11.5)
        return total if len(buf) >= total else None
    return -1                           # protocol error


class TurnTcpConnection:
    """One framed TURN control/data connection over TCP or TLS.

    Use as the send_fn/feed pair for TurnClient:
        conn = TurnTcpConnection(host, port)
        client = TurnClient(conn.send, ...)
        conn.on_frame = client.handle
        conn.start()
    """

    def __init__(self, host: str, port: int, use_tls: bool = False,
                 tls_context: Optional[ssl.SSLContext] = None,
                 connect_timeout: float = 5.0):
        self.sock = socket.create_connection((host, port),
                                             timeout=connect_timeout)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        if use_tls:
            ctx = tls_context
            if ctx is None:
                # TURN servers commonly use certs outside the web PKI; the
                # reference verifies via its own trust config — callers pass
                # tls_context for real verification.
                ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
                ctx.check_hostname = False
                ctx.verify_mode = ssl.CERT_NONE
            self.sock = ctx.wrap_socket(self.sock, server_hostname=host)
        self.sock.settimeout(0.2)
        self.on_frame: Optional[Callable[[bytes], None]] = None
        self.on_error: Optional[Callable[[Exception], None]] = None
        self._buf = b""
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.frames_rx = 0
        self.protocol_errors = 0

    def send(self, data: bytes):
        """Send one STUN message or ChannelData frame (padded per §11.5)."""
        if data and 0x40 <= data[0] <= 0x7F:
            data += b"\x00" * ((-len(data)) % 4)
        with self._lock:
            try:
                self.sock.sendall(data)
            except OSError as e:
                if self.on_error:
                    self.on_error(e)

    def _feed(self, chunk: bytes):
        self._buf += chunk
        while True:
            n = _frame_len(self._buf)
            if n is None:
                return
            if n < 0:
                self.protocol_errors += 1
                self._buf = b""          # unrecoverable desync: drop buffer
                return
            frame, self._buf = self._buf[:n], self._buf[n:]
            self.frames_rx += 1
            if self.on_frame:
                self.on_frame(frame)

    def _rx_loop(self):
        while not self._stop.is_set():
            try:
                chunk = self.sock.recv(65536)
            except socket.timeout:
                continue
            except (OSError, ssl.SSLError) as e:
                if not self._stop.is_set() and self.on_error:
                    self.on_error(e)
                return
            if not chunk:                # server closed
                if not self._stop.is_set() and self.on_error:
                    self.on_error(ConnectionResetError("turn tcp closed"))
                return
            self._feed(chunk)

    def start(self):
        self._thread = threading.Thread(target=self._rx_loop,
                                        name="turn-tcp-rx", daemon=True)
        self._thread.start()

    def close(self):
        self._stop.set()
        try:
            self.sock.close()
        except OSError:
            pass
        if self._thread:
            self._thread.join(timeout=1.0)
            self._thread = None
