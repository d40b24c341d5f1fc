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


def test_ice_through_turn_relay():
    """Composition: a TURN relay candidate feeds the ICE check list and
    connectivity checks run THROUGH the relay (send via Send indications,
    receive via Data indications) until nomination — the reference's
    ICE+TURN integration (ice.c relay candidate paths).

    Topology: agent A is UDP-blocked except to its TURN server; agent B is
    directly reachable. A gathers a relay candidate, B's checks arrive via
    the relay, and the nominated pair uses the relayed address."""
    from mediastreamer2_tpu.net.ice import IceSession, Candidate, IS_COMPLETED

    srv = MiniTurnServer()
    # wire: client <-> server in-process; the relay's peer side delivers
    # to agent B's handler, and B sends back into the relay
    a_sess = IceSession(controlling=True)
    b_sess = IceSession(controlling=False)
    a_sess.set_remote_credentials(b_sess.local_ufrag, b_sess.local_pwd)
    b_sess.set_remote_credentials(a_sess.local_ufrag, a_sess.local_pwd)

    b_addr = ("203.0.113.9", 7000)

    # A's outbound path: everything goes through the TURN relay
    def a_send(addr, data):
        turn.send_to_peer(addr, data)
        pump()

    # B's outbound path: direct UDP to A would be blocked; B sends to the
    # RELAY address, which the server forwards into A's TURN client
    def b_send(addr, data):
        srv.inject_from_peer(b_addr, data, reply=turn.handle)

    a_cl = a_sess.add_check_list(a_send, ("10.0.0.1", 4444))
    b_cl = b_sess.add_check_list(b_send, b_addr)

    to_server = []
    turn = TurnClient(send_fn=to_server.append, username="alice",
                      password="pw", realm="ms2")

    def pump():
        while to_server:
            srv.handle(to_server.pop(0), reply=turn.handle)

    relayed = []
    turn.on_allocated = lambda addr: relayed.append(addr)
    turn.allocate(); pump()
    assert relayed
    relay_addr = relayed[0]
    # inbound relayed data -> A's ICE stun handler
    turn.on_data = lambda data, peer: a_cl.handle_stun(data, peer)
    turn.create_permission(b_addr); pump()

    # candidates: A offers its relay candidate; B offers its host candidate
    a_cl.local_candidates = [Candidate.make(*relay_addr, "relay")]
    a_cl.add_remote_candidate(Candidate.make(*b_addr))
    b_cl.add_remote_candidate(Candidate.make(*relay_addr, "relay"))

    now = [100.0]
    for _ in range(200):
        now[0] += 0.06
        a_cl.process(now=now[0])
        b_cl.process(now=now[0])
        # the relay forwards A's Send indications out to peer B
        while srv.peer_rx:
            peer, data = srv.peer_rx.pop(0)
            if peer == b_addr:
                b_cl.handle_stun(data, relay_addr)
        if a_cl.state == IS_COMPLETED and b_cl.state == IS_COMPLETED:
            break
    assert a_cl.state == IS_COMPLETED, (a_cl.state,
                                        [p.state for p in a_cl.pairs])
    assert b_cl.state == IS_COMPLETED
    # the nominated path really is the relay
    assert (a_cl.selected.local.host, a_cl.selected.local.port) == relay_addr
    assert b_cl.selected.remote.typ in ("relay", "prflx")


def test_permission_and_allocation_refresh_lifecycle():
    """RFC 5766 §7/§9 keepalive under churn: maintain() re-REFRESHes the
    allocation at 80% of its lifetime and re-sends CreatePermission at 80%
    of the 5-min permission lifetime; dropped peers stop refreshing
    (ice.c's TURN refresh timers)."""
    srv = MiniTurnServer()
    client, pump = _wire(None, srv)
    client.allocate(); pump()
    t0 = client._allocated_at
    peer_a, peer_b = ("203.0.113.9", 7000), ("203.0.113.10", 7001)
    client.create_permission(peer_a); pump()
    client.create_permission(peer_b); pump()
    sent = []
    real_send = client.send_fn
    client.send_fn = lambda d: (sent.append(d), real_send(d))
    # inside the window: nothing to do
    client.maintain(now=t0 + 10.0)
    assert sent == []
    # past 80% of the permission lifetime: both peers re-permissioned
    client.maintain(now=t0 + 0.85 * client.PERMISSION_LIFETIME_S)
    assert len(sent) == 2
    pump()
    # a churned-away leg stops being refreshed
    client.drop_peer(peer_b)
    sent.clear()
    client.maintain(now=t0 + 2 * 0.85 * client.PERMISSION_LIFETIME_S)
    perms = [d for d in sent if d[:2] == b"\x00\x08"]   # CreatePermission
    assert len(perms) == 1                # peer_a only (b dropped)
    pump()
    # allocation refresh: due again well past 80% of lifetime AND past the
    # resend throttle (the t0+510 maintain already sent one refresh)
    sent.clear()
    client.maintain(now=t0 + 1020.0)
    refreshes = [d for d in sent if d[:2] == b"\x00\x04"]   # REFRESH
    assert len(refreshes) == 1
    pump()
    assert client.state == "allocated"
    # lost-request recovery: a refresh whose response never arrives leaves
    # the anchor untouched, so the next maintain past the throttle resends
    sent.clear()
    client.maintain(now=t0 + 1030.0)
    assert [d for d in sent if d[:2] == b"\x00\x04"]
