"""TURN over TCP/TLS: framed STUN/ChannelData stream against a real TCP
server in-process (parity: src/voip/turn_tcp.cpp — the UDP-hostile-NAT
path). Exercises allocate/permission/channel-bind/relay over the stream,
frame reassembly from a trickled byte stream, and the TLS variant."""
import socket
import ssl
import threading
import time

import pytest

from mediastreamer2_tpu.net.turn import TurnClient, MiniTurnServer
from mediastreamer2_tpu.net.turn_tcp import TurnTcpConnection, _frame_len


class TcpTurnServer:
    """MiniTurnServer behind a real TCP listener with stream framing."""

    def __init__(self, use_tls=False):
        self.inner = MiniTurnServer(require_auth=True, username="alice",
                                    password="pw")
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.bind(("127.0.0.1", 0))
        self.listener.listen(1)
        self.port = self.listener.getsockname()[1]
        self.ssl_ctx = None
        if use_tls:
            self.ssl_ctx = _self_signed_ctx()
        self.conn = None
        self._lock = threading.Lock()
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        conn, _ = self.listener.accept()
        if self.ssl_ctx is not None:
            conn = self.ssl_ctx.wrap_socket(conn, server_side=True)
        conn.settimeout(0.1)
        self.conn = conn
        buf = b""
        while True:
            try:
                chunk = conn.recv(65536)
            except socket.timeout:
                continue
            except OSError:
                return
            if not chunk:
                return
            buf += chunk
            while True:
                n = _frame_len(buf)
                if n is None or n < 0:
                    break
                frame, buf = buf[:n], buf[n:]
                self.inner.handle(frame, reply=self._reply)

    def _reply(self, data: bytes):
        if data and 0x40 <= data[0] <= 0x7F:
            data += b"\x00" * ((-len(data)) % 4)
        with self._lock:
            self.conn.sendall(data)

    def inject_from_peer(self, peer, data):
        self.inner.inject_from_peer(peer, data, reply=self._reply)

    def close(self):
        try:
            self.listener.close()
            if self.conn:
                self.conn.close()
        except OSError:
            pass


def _self_signed_ctx():
    """Server SSLContext with an in-memory self-signed cert."""
    import datetime
    import tempfile
    from cryptography import x509
    from cryptography.x509.oid import NameOID
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    key = ec.generate_private_key(ec.SECP256R1())
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "turn-test")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (x509.CertificateBuilder().subject_name(name).issuer_name(name)
            .public_key(key.public_key()).serial_number(1)
            .not_valid_before(now)
            .not_valid_after(now + datetime.timedelta(days=1))
            .sign(key, hashes.SHA256()))
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    with tempfile.NamedTemporaryFile(suffix=".pem") as cf, \
            tempfile.NamedTemporaryFile(suffix=".pem") as kf:
        cf.write(cert.public_bytes(serialization.Encoding.PEM)); cf.flush()
        kf.write(key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption())); kf.flush()
        ctx.load_cert_chain(cf.name, kf.name)
    return ctx


def _wait(cond, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.01)
    return False


def _run_turn_session(use_tls):
    srv = TcpTurnServer(use_tls=use_tls)
    conn = TurnTcpConnection("127.0.0.1", srv.port, use_tls=use_tls)
    client = TurnClient(send_fn=conn.send, username="alice", password="pw",
                        realm="ms2")
    conn.on_frame = client.handle
    conn.start()
    try:
        client.allocate()
        assert _wait(lambda: client.state == "allocated"), client.state
        assert client.relayed_addr == ("198.51.100.1", 50000)
        peer = ("203.0.113.9", 7000)
        ch = client.channel_bind(peer)
        assert _wait(lambda: srv.inner.channels.get(ch) == peer)
        client.send_to_peer(peer, b"odd-len")   # 7 bytes: needs TCP padding
        assert _wait(lambda: srv.inner.peer_rx
                     and srv.inner.peer_rx[-1] == (peer, b"odd-len"))
        got = []
        client.on_data = lambda d, p: got.append((d, p))
        srv.inject_from_peer(peer, b"from-peer")
        assert _wait(lambda: got == [(b"from-peer", peer)])
    finally:
        conn.close()
        srv.close()


def test_turn_over_tcp():
    _run_turn_session(use_tls=False)


def test_turn_over_tls():
    _run_turn_session(use_tls=True)


def test_stream_reassembly_from_trickle():
    """Frames split at arbitrary byte boundaries reassemble correctly."""
    frames = []
    conn = TurnTcpConnection.__new__(TurnTcpConnection)
    conn._buf = b""
    conn.on_frame = frames.append
    conn.frames_rx = 0
    conn.protocol_errors = 0
    # one STUN binding-ish message (20B header + 8B body) + one ChannelData
    stun_msg = b"\x00\x01\x00\x08" + b"\x21\x12\xa4\x42" + b"\x00" * 12 \
        + b"\x00\x09\x00\x04" + b"\x00\x00\x00\x00"
    chan = b"\x40\x00\x00\x05" + b"hello" + b"\x00\x00\x00"   # padded
    stream = stun_msg + chan
    for i in range(len(stream)):
        conn._feed(stream[i:i + 1])
    assert frames[0] == stun_msg
    assert frames[1] == chan
    assert conn.protocol_errors == 0
