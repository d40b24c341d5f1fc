"""Conference-server integration: three clients through a mixing server —
the reference's ms_audio_conference semantics (audioconference.c), incl.
mix-minus: a talker must NOT hear themselves."""
import numpy as np
import jax.numpy as jnp

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
from mediastreamer2_tpu.models.conference import AudioConferenceControl
from mediastreamer2_tpu.net.rtp import LoopbackPair
from mediastreamer2_tpu.utils.audiodiff import audio_diff
from conftest import make_speechlike

S = tick_samples(8000)


def test_three_way_conference_mix_minus(factory):
    ticks = 150
    sig = make_speechlike(S * (ticks + 40), 8000, seed=42)
    # clients: one batch of 3 legs; only leg 0 talks (through the whole run)
    mic = np.zeros((3, S * (ticks + 40)), np.float32)
    mic[0] = sig
    clients = AudioStreamBatch(factory, 3, mic_signal=mic,
                               record_ticks=ticks + 50)
    server = AudioStreamBatch(factory, 3, conference=True)
    ctl = AudioConferenceControl(server.ticker, "conf", "levels")
    conf = ctl.new_conference()
    for leg in range(3):
        clients.set_transport(leg, (pair := LoopbackPair()).endpoint(0))
        server.set_transport(leg, pair.endpoint(1))
        ctl.add_member(leg, conf)
    clients.ticker.warm_up()
    server.ticker.warm_up()
    server.start(ticks + 60)
    clients.run(ticks + 30)
    # sample active-talker detection while leg 0 is still speaking
    talkers_live = ctl.active_talkers()
    clients.stop()
    server.stop()
    rec = clients.get_recording()
    sig = sig[: S * ticks]
    # listeners (legs 1,2) hear the talker
    for leg in (1, 2):
        sim, _ = audio_diff(sig, rec[leg])
        assert sim > 0.85, f"listener {leg} sim {sim}"
    # mix-minus: the talker does NOT hear themselves
    talker_energy = float((rec[0] ** 2).mean())
    listener_energy = float((rec[1] ** 2).mean())
    assert talker_energy < listener_energy * 0.05, \
        f"talker hears self: {talker_energy} vs {listener_energy}"
    # active talker detection on the server (reference -30 dB rule)
    assert talkers_live.get(conf) == [0]


def test_conference_server_on_batch_edge(factory):
    """Conference server shape on the native batched edge: decoded legs
    feed the deployment-wide mix-minus and re-encode back out, all legs on
    one real socket pair — the scaled production topology."""
    import socket
    import time as _time
    import numpy as np
    from mediastreamer2_tpu.native import rtp_edge_available, BatchRtpTx, \
        BatchRtpRx
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    if not rtp_edge_available():
        import pytest
        pytest.skip("g++ build failed")
    B, ticks = 4, 80
    from mediastreamer2_tpu.core.block import tick_samples
    from conftest import make_speechlike
    S = tick_samples(8000)

    srv_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv_sock.bind(("127.0.0.1", 0)); srv_sock.setblocking(False)
    cli_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    cli_sock.bind(("127.0.0.1", 0)); cli_sock.setblocking(False)

    # clients: 4 legs sending speech, recording what comes back
    sig = make_speechlike(S * ticks, 8000, seed=41)
    clients = AudioStreamBatch(factory, B, mic_signal=sig,
                               record_ticks=ticks + 40)
    clients.enable_batch_edge(rx_sock=cli_sock, tx_sock=cli_sock,
                              remote=srv_sock.getsockname(),
                              ssrc_base=0x6000)
    server = AudioStreamBatch(factory, B, conference=True)
    server.enable_batch_edge(rx_sock=srv_sock, tx_sock=srv_sock,
                             remote=cli_sock.getsockname(),
                             ssrc_base=0x6000)
    import jax.numpy as jnp
    # all four legs in ONE conference (mix-minus needs >1 member)
    server.ticker.params["conf"]["group_id"] = jnp.zeros((B,), jnp.int32)
    clients.ticker.realtime = server.ticker.realtime = False
    clients.ticker.warm_up(); server.ticker.warm_up()
    for _ in range(ticks + 20):
        clients.ticker.do_tick()
        _time.sleep(0.0005)
        server.ticker.do_tick()
        _time.sleep(0.0005)
    # every client hears the mix-minus (others' speech, not silence)
    rec = clients.get_recording()
    assert np.abs(rec).max() > 0.01
    assert server._edge_rx.stats(0)["recv"] >= ticks // 2
    srv_sock.close(); cli_sock.close()


def test_audio_router_ranks_by_level_extension(factory):
    """The audio SFU ranks speakers from the RFC 6464 header extension
    carried in the packets themselves — no device volume round-trip
    (packet-router volume-ranked selection)."""
    from mediastreamer2_tpu.net.router import AudioPacketRouter
    from mediastreamer2_tpu.net.rtp import RtpPacket
    r = AudioPacketRouter(top_n=1)
    sent = {i: [] for i in range(3)}
    for i in range(3):
        r.add_member(i, send=sent[i].append)

    def pkt(level_dbov):
        return RtpPacket(0, 1, 0, 0x10, b"x" * 20,
                         extensions={1: bytes([level_dbov])})

    # member 0 loud (10 dBov), member 1 quiet (90 dBov)
    r.route(0, pkt(10))
    r.route(1, pkt(90))
    # member 0 is the top speaker: its packets forward, member 1's don't
    n0 = r.route(0, pkt(10))
    n1 = r.route(1, pkt(90))
    assert n0 == 2 and n1 == 0


def test_csrc_levels_for_mixed_leg(factory):
    """RFC 6465 feed: the server ranks a listener's fellow members
    loudest-first as (ssrc, dBov) pairs for the mixed output leg
    (parity: audiostreamvolumes.cpp fill from the mixer side)."""
    ticks = 60
    sig = make_speechlike(S * (ticks + 40), 8000, seed=5)
    mic = np.zeros((3, S * (ticks + 40)), np.float32)
    mic[0] = sig                      # loud talker
    mic[1] = 0.01 * sig               # quiet talker
    clients = AudioStreamBatch(factory, 3, mic_signal=mic)
    server = AudioStreamBatch(factory, 3, conference=True)
    ctl = AudioConferenceControl(server.ticker, "conf", "levels")
    conf = ctl.new_conference()
    for leg in range(3):
        clients.set_transport(leg, (pair := LoopbackPair()).endpoint(0))
        server.set_transport(leg, pair.endpoint(1))
        ctl.add_member(leg, conf)
    clients.ticker.warm_up(); server.ticker.warm_up()
    clients.ticker.realtime = server.ticker.realtime = False
    for _ in range(ticks):
        clients.ticker.do_tick()
        server.ticker.do_tick()
    ssrc_map = {0: 0xA0, 1: 0xA1, 2: 0xA2}
    lv = ctl.csrc_levels_for(2, ssrc_map)
    assert [s for s, _ in lv] == [0xA0, 0xA1]      # loudest first, no self
    assert lv[0][1] < lv[1][1]                      # louder => lower dBov
    assert all(0 <= db <= 127 for _, db in lv)
    assert ctl.csrc_levels_for(2) == [(0, lv[0][1]), (1, lv[1][1])]


def test_conference_membership_churn_without_recompile(factory):
    """Mid-call join and leave — the reference's add/remove member graph
    surgery (audioconference.c:119-178 cut_audio_stream_graph) is a pure
    params update here: the SAME compiled program serves every membership
    state. A leaver's audio vanishes from the others' mixes, a joiner's
    appears, and the graph object never changes."""
    ticks = 240
    n = 4
    sig = make_speechlike(S * (ticks + 40), 8000, seed=9)
    mic = np.zeros((n, S * (ticks + 40)), np.float32)
    mic[0] = sig                               # leg 0 talks throughout
    clients = AudioStreamBatch(factory, n, mic_signal=mic,
                               record_ticks=ticks + 50)
    server = AudioStreamBatch(factory, n, conference=True)
    ctl = AudioConferenceControl(server.ticker, "conf", "levels")
    conf = ctl.new_conference()
    for leg in range(n):
        clients.set_transport(leg, (pair := LoopbackPair()).endpoint(0))
        server.set_transport(leg, pair.endpoint(1))
    # phase 1: legs 0,1,2 in the conference; leg 3 outside
    for leg in (0, 1, 2):
        ctl.add_member(leg, conf)
    graph_before = server.ticker.graph
    clients.ticker.realtime = server.ticker.realtime = False
    clients.ticker.warm_up(); server.ticker.warm_up()
    third = ticks // 3
    for t in range(ticks + 30):
        if t == third:                         # leg 2 leaves, leg 3 joins
            ctl.remove_member(2)
            ctl.add_member(3, conf)
        clients.ticker.do_tick()
        server.ticker.do_tick()
    clients.stop(); server.stop()
    assert server.ticker.graph is graph_before     # no recompile/surgery
    rec = clients.get_recording()
    seg1 = slice(S * 10, S * (third - 5))
    seg2 = slice(S * (third + 20), S * ticks)
    # leg 1 (member throughout) hears the talker in both phases
    for seg in (seg1, seg2):
        assert float((rec[1][seg] ** 2).mean()) > 1e-4
    # leg 2 heard phase 1 but silence after leaving
    assert float((rec[2][seg1] ** 2).mean()) > 1e-4
    assert float((rec[2][seg2] ** 2).mean()) < 1e-6
    # leg 3 heard nothing before joining, the talker after
    assert float((rec[3][seg1] ** 2).mean()) < 1e-6
    assert float((rec[3][seg2] ** 2).mean()) > 1e-4
    # membership bookkeeping
    assert ctl.member_count(conf) == 3


def test_conference_server_batch_edge_srtp(factory):
    """The same scaled conference topology with per-leg AES-CM SRTP inline
    in the native edge both sides (ms_srtp.cpp role at batch scale): media
    flows, zero auth failures; a wrong-key leg's packets are rejected at
    the server edge and never reach the mix."""
    import socket
    import time as _time
    import numpy as np
    from mediastreamer2_tpu.native import rtp_edge_available
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    if not rtp_edge_available():
        import pytest
        pytest.skip("g++ build failed")
    B, ticks = 4, 60
    from mediastreamer2_tpu.core.block import tick_samples
    from conftest import make_speechlike
    S = tick_samples(8000)
    rng = np.random.default_rng(9)
    keys = [(rng.bytes(16), rng.bytes(14)) for _ in range(B)]
    bad_keys = list(keys)
    bad_keys[3] = (rng.bytes(16), rng.bytes(14))      # leg 3 has wrong keys

    srv_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv_sock.bind(("127.0.0.1", 0)); srv_sock.setblocking(False)
    cli_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    cli_sock.bind(("127.0.0.1", 0)); cli_sock.setblocking(False)

    sig = make_speechlike(S * ticks, 8000, seed=42)
    clients = AudioStreamBatch(factory, B, mic_signal=sig,
                               record_ticks=ticks + 40)
    clients.enable_batch_edge(rx_sock=cli_sock, tx_sock=cli_sock,
                              remote=srv_sock.getsockname(),
                              ssrc_base=0x7000, srtp_keys=bad_keys)
    server = AudioStreamBatch(factory, B, conference=True)
    server.enable_batch_edge(rx_sock=srv_sock, tx_sock=srv_sock,
                             remote=cli_sock.getsockname(),
                             ssrc_base=0x7000, srtp_keys=keys)
    import jax.numpy as jnp
    server.ticker.params["conf"]["group_id"] = jnp.zeros((B,), jnp.int32)
    clients.ticker.realtime = server.ticker.realtime = False
    clients.ticker.warm_up(); server.ticker.warm_up()
    for _ in range(ticks + 20):
        clients.ticker.do_tick()
        _time.sleep(0.0005)
        server.ticker.do_tick()
        _time.sleep(0.0005)
    rec = clients.get_recording()
    assert np.abs(rec[:3]).max() > 0.01          # encrypted media flowed
    for i in range(3):
        assert server._edge_rx.auth_failures(i) == 0
    # the wrong-key leg is rejected at the server's unprotect
    assert server._edge_rx.auth_failures(3) > ticks // 2
    assert server._edge_rx.stats(3)["recv"] == 0
    srv_sock.close(); cli_sock.close()
