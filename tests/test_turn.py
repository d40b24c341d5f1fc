"""TURN client against the in-process mini server: allocate (with 401
auth retry), permissions, send/data indications, channel binding, and the
relay candidate feeding ICE."""
from mediastreamer2_tpu.net.turn import TurnClient, MiniTurnServer
from mediastreamer2_tpu.net.ice import Candidate


def _wire(client_to_server, server):
    """Returns (client, deliver_pending) with an in-process loop."""
    to_server = []
    client = TurnClient(send_fn=to_server.append,
                        username="alice", password="pw", realm="ms2")
    def pump():
        while to_server:
            data = to_server.pop(0)
            server.handle(data, reply=client.handle)
    return client, pump


def test_allocate_with_auth_retry():
    srv = MiniTurnServer(require_auth=True, username="alice", password="pw")
    client, pump = _wire(None, srv)
    allocated = []
    client.on_allocated = allocated.append
    client.allocate()
    pump()          # 401 -> retry with credentials
    pump()
    assert client.state == "allocated"
    assert client.relayed_addr == ("198.51.100.1", 50000)
    assert client.mapped_addr == ("192.0.2.1", 40000)
    assert allocated == [("198.51.100.1", 50000)]
    assert client.lifetime == 600


def test_permission_and_send_indication():
    srv = MiniTurnServer()
    client, pump = _wire(None, srv)
    client.allocate(); pump()
    peer = ("203.0.113.9", 7000)
    client.create_permission(peer); pump()
    assert peer in srv.permissions
    client.send_to_peer(peer, b"hello relay"); pump()
    assert srv.peer_rx[-1] == (peer, b"hello relay")


def test_channel_binding_roundtrip():
    srv = MiniTurnServer()
    client, pump = _wire(None, srv)
    client.allocate(); pump()
    peer = ("203.0.113.9", 7000)
    ch = client.channel_bind(peer); pump()
    assert srv.channels[ch] == peer
    client.send_to_peer(peer, b"chan-data"); pump()
    assert srv.peer_rx[-1] == (peer, b"chan-data")
    # inbound via channel framing
    got = []
    client.on_data = lambda d, p: got.append((d, p))
    srv.inject_from_peer(peer, b"from-peer", reply=client.handle)
    assert got == [(b"from-peer", peer)]


def test_data_indication_inbound():
    srv = MiniTurnServer()
    client, pump = _wire(None, srv)
    client.allocate(); pump()
    got = []
    client.on_data = lambda d, p: got.append((d, p))
    srv.inject_from_peer(("203.0.113.5", 9000), b"unsolicited",
                         reply=client.handle)
    assert got == [(b"unsolicited", ("203.0.113.5", 9000))]


def test_relay_candidate_for_ice():
    srv = MiniTurnServer()
    client, pump = _wire(None, srv)
    cands = []
    client.on_allocated = lambda addr: cands.append(
        Candidate.make(addr[0], addr[1], "relay"))
    client.allocate(); pump()
    assert cands and cands[0].typ == "relay"
    assert cands[0].priority >> 24 == 0     # relay = lowest type preference
