"""STUN codec + ICE connectivity tests (parity targets: stun.c / ice.c —
two agents over an in-process 'network' complete nomination)."""
import numpy as np
import pytest

from mediastreamer2_tpu.net import stun
from mediastreamer2_tpu.net.ice import (Candidate, IceSession, IS_COMPLETED,
                                        IS_RUNNING)


def test_stun_binding_roundtrip():
    req = stun.make_binding_request(username="a:b", priority=123,
                                    controlling=True, tiebreaker=42)
    data = req.pack(password="secret")
    assert stun.is_stun(data)
    got = stun.StunMessage.unpack(data)
    assert got.msg_type == stun.BINDING_REQUEST
    assert got.attrs[stun.ATTR_USERNAME] == b"a:b"
    assert got.check_integrity("secret")
    assert not got.check_integrity("wrong")


def test_stun_xor_mapped_address():
    resp = stun.StunMessage(stun.BINDING_RESPONSE)
    resp.set_xor_mapped_address("192.168.1.77", 54321)
    got = stun.StunMessage.unpack(resp.pack())
    assert got.get_xor_mapped_address() == ("192.168.1.77", 54321)


def test_stun_rtp_demux():
    from mediastreamer2_tpu.net.rtp import RtpPacket
    rtp = RtpPacket(0, 1, 2, 3, b"xx").pack()
    assert not stun.is_stun(rtp)
    assert stun.is_stun(stun.make_binding_request().pack())


class FakeNet:
    """Deliver datagrams between two ICE agents with optional loss."""
    def __init__(self, loss_seq=()):
        self.inboxes = {0: [], 1: []}
        self.loss_seq = set(loss_seq)
        self.count = 0

    def sender(self, idx):
        def send(addr, data):
            self.count += 1
            if self.count in self.loss_seq:
                return
            self.inboxes[1 - idx].append((addr, data))
        return send

    def deliver(self, cl0, cl1, addr0, addr1):
        for idx, cl, my_addr in ((0, cl0, addr0), (1, cl1, addr1)):
            inbox, self.inboxes[idx] = self.inboxes[idx], []
            for addr, data in inbox:
                peer_addr = addr1 if idx == 0 else addr0
                cl.handle_stun(data, peer_addr)


def run_ice(loss_seq=()):
    net = FakeNet(loss_seq)
    a = IceSession(controlling=True)
    b = IceSession(controlling=False)
    a.set_remote_credentials(b.local_ufrag, b.local_pwd)
    b.set_remote_credentials(a.local_ufrag, a.local_pwd)
    addr_a, addr_b = ("10.0.0.1", 7000), ("10.0.0.2", 7002)
    cla = a.add_check_list(net.sender(0), addr_a)
    clb = b.add_check_list(net.sender(1), addr_b)
    cla.add_remote_candidate(Candidate.make(*addr_b))
    clb.add_remote_candidate(Candidate.make(*addr_a))
    t = 0.0
    for _ in range(30):
        t += 0.6
        cla.process(now=t)
        clb.process(now=t)
        net.deliver(cla, clb, addr_a, addr_b)
        net.deliver(cla, clb, addr_a, addr_b)  # responses to triggered checks
        if a.state == IS_COMPLETED and b.state == IS_COMPLETED:
            break
    return a, b, cla, clb


def test_ice_completes_clean():
    a, b, cla, clb = run_ice()
    assert a.state == IS_COMPLETED
    assert b.state == IS_COMPLETED
    assert cla.selected is not None
    assert cla.selected.remote.port == 7002
    assert clb.selected is not None


def test_ice_completes_with_loss():
    a, b, cla, clb = run_ice(loss_seq={1, 2})   # first checks lost -> retransmit
    assert a.state == IS_COMPLETED
    assert b.state == IS_COMPLETED


def test_ice_restart():
    a, b, cla, clb = run_ice()
    old_ufrag = a.local_ufrag
    a.restart()
    assert a.local_ufrag != old_ufrag
    assert a.state == IS_RUNNING


def test_candidate_sdp_format():
    c = Candidate.make("1.2.3.4", 5678, "host")
    s = c.sdp()
    assert "1.2.3.4 5678 typ host" in s
    assert c.priority >> 24 == 126


def test_ta_pacing_limits_new_checks():
    """RFC 8445 6.1.4.2: at most one NEW check per Ta across the session."""
    from mediastreamer2_tpu.net.ice import IceSession, Candidate, TA_MS
    sent = []
    s = IceSession(controlling=True)
    s.set_remote_credentials("u", "p")
    cl = s.add_check_list(lambda addr, data: sent.append(addr),
                          ("10.0.0.1", 1000))
    for k in range(6):
        # distinct hosts => distinct foundations, all initially waiting
        cl.add_remote_candidate(Candidate.make(f"10.0.1.{k + 2}", 2000))
    now = 100.0
    cl.process(now=now)
    n1 = len(sent)
    cl.process(now=now + 0.001)          # within Ta: no new check
    assert len(sent) == n1
    cl.process(now=now + TA_MS / 1e3 + 0.001)
    assert len(sent) == n1 + 1


def test_foundation_unfreezing_across_check_lists():
    """A success on foundation F unfreezes F's pairs in every check list
    (cross-list coordination, RFC 8445 7.2.5.3.3)."""
    from mediastreamer2_tpu.net.ice import IceSession, Candidate
    s = IceSession(controlling=True)
    s.set_remote_credentials("u", "p")
    cl1 = s.add_check_list(lambda a, d: None, ("10.0.0.1", 1000))
    cl2 = s.add_check_list(lambda a, d: None, ("10.0.0.1", 1002))
    for cl in (cl1, cl2):
        cl.add_remote_candidate(Candidate.make("10.0.0.2", 2000))
        cl.add_remote_candidate(Candidate.make("10.0.0.9", 2000, "srflx"))
    f = cl1._pair_foundation(cl1.pairs[0])
    # same-foundation pair in list 2 starts waiting only in list order;
    # force-freeze it to prove the unfreeze path
    for p in cl2.pairs:
        p.state = "frozen"
    s.note_success(f)
    assert any(p.state == "waiting" and cl2._pair_foundation(p) == f
               for p in cl2.pairs)
    # unrelated foundations stay frozen
    assert any(p.state == "frozen" for p in cl2.pairs)


def test_multi_component_completion():
    """RTP (component 1) and RTCP (component 2) must BOTH nominate before
    the check list completes; selected_pairs maps per component."""
    from mediastreamer2_tpu.net.ice import (IceSession, Candidate,
                                            IS_COMPLETED, IS_RUNNING)
    s = IceSession(controlling=True)
    s.set_remote_credentials("u", "p")
    cl = s.add_check_list(lambda a, d: None, ("10.0.0.1", 1000))
    cl.add_local_candidate(Candidate.make("10.0.0.1", 1001, component=2))
    cl.add_remote_candidate(Candidate.make("10.0.0.2", 2000, component=1))
    cl.add_remote_candidate(Candidate.make("10.0.0.2", 2001, component=2))
    p1 = next(p for p in cl.pairs if p.local.component == 1)
    p2 = next(p for p in cl.pairs if p.local.component == 2)
    p1.state = "succeeded"; p1.nominated = True
    cl._update_state()
    assert cl.state == IS_RUNNING          # RTCP component still pending
    p2.state = "succeeded"; p2.nominated = True
    cl._update_state()
    assert cl.state == IS_COMPLETED
    assert cl.selected_pairs[1] is p1 and cl.selected_pairs[2] is p2
    assert cl.selected is p1


# ---------------------------------------------------------------- trickle ICE
def test_trickle_candidates_arrive_mid_checks():
    """RFC 8838: checks start with ONE (wrong) remote candidate; the right
    one trickles in later and the session still completes. An exhausted
    list must NOT fail before end-of-candidates."""
    net = FakeNet()
    a = IceSession(controlling=True)
    b = IceSession(controlling=False)
    a.set_remote_credentials(b.local_ufrag, b.local_pwd)
    b.set_remote_credentials(a.local_ufrag, a.local_pwd)
    addr_a, addr_b = ("10.0.0.1", 7000), ("10.0.0.2", 7002)
    cla = a.add_check_list(net.sender(0), addr_a)
    clb = b.add_check_list(net.sender(1), addr_b)
    # phase 1: A knows only a dead candidate; B stays silent (no remote
    # candidates yet, as in real trickling) and the network black-holes
    cla.add_remote_candidate(Candidate.make("10.9.9.9", 9999))
    t = 0.0
    for _ in range(40):                    # burn through retransmits
        t += 0.6
        cla.process(now=t)
        net.inboxes[0].clear()
        net.inboxes[1].clear()
    assert all(p.state == "failed" for p in cla.pairs)
    assert cla.state == IS_RUNNING        # trickle: not failed yet
    # phase 2: the real candidates trickle in on both sides
    cla.add_remote_candidate(Candidate.make(*addr_b))
    clb.add_remote_candidate(Candidate.make(*addr_a))
    for _ in range(30):
        t += 0.6
        cla.process(now=t)
        clb.process(now=t)
        net.deliver(cla, clb, addr_a, addr_b)
        net.deliver(cla, clb, addr_a, addr_b)
        if a.state == IS_COMPLETED and b.state == IS_COMPLETED:
            break
    assert a.state == IS_COMPLETED and b.state == IS_COMPLETED


def test_end_of_candidates_makes_exhaustion_final():
    from mediastreamer2_tpu.net.ice import IS_FAILED
    net = FakeNet()
    a = IceSession(controlling=True)
    a.set_remote_credentials("u", "p")
    cla = a.add_check_list(net.sender(0), ("10.0.0.1", 7000))
    cla.add_remote_candidate(Candidate.make("10.9.9.9", 9999))
    t = 0.0
    for _ in range(40):
        t += 0.6
        cla.process(now=t)
        net.inboxes[1] = []
    assert cla.state == IS_RUNNING
    cla.set_end_of_candidates()
    assert cla.state == IS_FAILED


def test_pair_pruning_srflx_base():
    """RFC 8445 §6.1.2.4: an srflx local candidate checks from its base,
    so its pairs are redundant with the host candidate's pairs."""
    net = FakeNet()
    a = IceSession(controlling=True)
    a.set_remote_credentials("u", "p")
    cla = a.add_check_list(net.sender(0), ("10.0.0.1", 7000))
    cla.add_remote_candidate(Candidate.make("10.0.0.2", 2000))
    n_before = len(cla.pairs)
    cla.add_local_candidate(Candidate.make("198.51.100.7", 31000, "srflx",
                                           base=("10.0.0.1", 7000)))
    assert len(cla.pairs) == n_before      # pruned: same base, same remote
    # a DIFFERENT base (second interface) is not redundant
    cla.add_local_candidate(Candidate.make("10.0.1.1", 7100))
    assert len(cla.pairs) == n_before + 1


def test_pair_list_capped():
    cla = IceSession(controlling=True).add_check_list(
        lambda a, d: None, ("10.0.0.1", 7000))
    for i in range(30):
        cla.add_local_candidate(Candidate.make(f"10.0.{i}.1", 7000 + i))
    for i in range(10):
        cla.add_remote_candidate(Candidate.make(f"10.1.{i}.1", 9000 + i))
    assert len(cla.pairs) <= cla.MAX_PAIRS


def test_simultaneous_ice_restart():
    """RFC 8445 §9 corner: BOTH agents restart at once (new credentials,
    cleared lists) — e.g. both sides changed networks. The session must
    re-nominate from scratch without stale-credential deadlock."""
    net = FakeNet()
    a, b, cla, clb = run_ice()
    assert a.state == IS_COMPLETED
    a.restart()
    b.restart()
    a.set_remote_credentials(b.local_ufrag, b.local_pwd)
    b.set_remote_credentials(a.local_ufrag, a.local_pwd)
    addr_a, addr_b = ("10.0.0.1", 7000), ("10.0.0.2", 7002)
    cla.add_remote_candidate(Candidate.make(*addr_b))
    clb.add_remote_candidate(Candidate.make(*addr_a))
    net2 = FakeNet()
    cla.send_fn = net2.sender(0)
    clb.send_fn = net2.sender(1)
    t = 100.0
    for _ in range(30):
        t += 0.6
        cla.process(now=t)
        clb.process(now=t)
        net2.deliver(cla, clb, addr_a, addr_b)
        net2.deliver(cla, clb, addr_a, addr_b)
        if a.state == IS_COMPLETED and b.state == IS_COMPLETED:
            break
    assert a.state == IS_COMPLETED and b.state == IS_COMPLETED
    assert cla.selected is not None and clb.selected is not None


def test_pruned_pairs_not_reformed_on_trickle():
    """A pruned (redundant or over-cap) pair must stay pruned: later
    trickled candidates must not re-create it as a fresh frozen pair
    (O(n^2) churn) nor let the list creep past MAX_PAIRS via re-created
    duplicates getting unfrozen."""
    cla = IceSession(controlling=True).add_check_list(
        lambda a, d: None, ("10.0.0.1", 7000))
    cla.add_remote_candidate(Candidate.make("10.0.0.2", 2000))
    cla.add_local_candidate(Candidate.make("10.0.0.1", 7000))
    # redundant srflx pair (same base) is pruned on arrival
    srflx = Candidate.make("198.51.100.7", 31000, "srflx",
                           base=("10.0.0.1", 7000))
    cla.add_local_candidate(srflx)
    assert all(p.local is not srflx for p in cla.pairs)
    # trickle more remotes: the pruned srflx pair must NOT reappear for
    # the original remote, and the list stays capped
    for i in range(40):
        cla.add_remote_candidate(Candidate.make(f"10.1.{i}.1", 9000 + i))
    first_remote = cla.remote_candidates[0]
    assert not any(p.local is srflx and p.remote is first_remote
                   for p in cla.pairs)
    assert len(cla.pairs) <= cla.MAX_PAIRS
    # identity check: pair objects for surviving combos are stable across
    # trickle arrivals (no delete-and-recreate churn)
    before = {(p.local, p.remote): id(p) for p in cla.pairs}
    cla.add_remote_candidate(Candidate.make("10.2.0.1", 9500))
    for p in cla.pairs:
        key = (p.local, p.remote)
        if key in before:
            assert id(p) == before[key], "pair was re-created"
