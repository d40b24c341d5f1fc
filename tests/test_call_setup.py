"""Full call composition over real localhost UDP: ICE nomination, then
DTLS-SRTP (and ZRTP) key agreement, then encrypted media through
AudioStreamBatch — the reference's media_stream_iterate composition."""
import time

import numpy as np
import pytest

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.call_setup import CallSetup
from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
from mediastreamer2_tpu.net import dtls
from mediastreamer2_tpu.utils.audiodiff import audio_diff
from conftest import make_speechlike

S = tick_samples(8000)


def _connect(a: CallSetup, b: CallSetup, timeout_s=5.0):
    a.set_remote(*b.local_credentials(),
                 [("127.0.0.1", b.sock.local_port)])
    b.set_remote(*a.local_credentials(),
                 [("127.0.0.1", a.sock.local_port)])
    deadline = time.time() + timeout_s
    while time.time() < deadline and not (a.ready and b.ready):
        a.iterate()
        b.iterate()
        time.sleep(0.02)
    return a.ready and b.ready


def test_ice_then_media(factory):
    a = CallSetup(controlling=True)
    b = CallSetup(controlling=False)
    assert _connect(a, b)
    assert a.check_list.selected is not None

    ticks = 100
    sig = make_speechlike(S * ticks, 8000, seed=17)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    tx.set_transport(0, a.media_transport())
    rx.set_transport(0, b.media_transport())
    tx.ticker.warm_up(); rx.ticker.warm_up()
    rx.start(ticks + 40)
    tx.run(ticks + 10)
    tx.stop(); rx.stop()
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.9, f"media over nominated pair sim {sim}"
    a.close(); b.close()


@pytest.mark.skipif(not dtls.dtls_available(), reason="libssl missing")
def test_ice_dtls_srtp_media(factory):
    a = CallSetup(controlling=True, key_agreement="dtls")
    b = CallSetup(controlling=False, key_agreement="dtls")
    assert _connect(a, b, timeout_s=8.0)
    assert a.srtp_keys is not None and b.srtp_keys is not None

    ticks = 80
    sig = make_speechlike(S * ticks, 8000, seed=19)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    tx.set_transport(0, a.media_transport())
    rx.set_transport(0, b.media_transport())
    tx.ticker.warm_up(); rx.ticker.warm_up()
    rx.start(ticks + 40)
    tx.run(ticks + 10)
    tx.stop(); rx.stop()
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.9, f"dtls-srtp call sim {sim}"
    a.close(); b.close()


def test_ice_zrtp_media_sas(factory):
    a = CallSetup(controlling=True, key_agreement="zrtp")
    b = CallSetup(controlling=False, key_agreement="zrtp")
    assert _connect(a, b, timeout_s=8.0)
    assert a.sas is not None and a.sas == b.sas     # users would compare SAS

    ticks = 60
    sig = make_speechlike(S * ticks, 8000, seed=23)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    tx.set_transport(0, a.media_transport())
    rx.set_transport(0, b.media_transport())
    tx.ticker.warm_up(); rx.ticker.warm_up()
    rx.start(ticks + 40)
    tx.run(ticks + 10)
    tx.stop(); rx.stop()
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.9, f"zrtp call sim {sim}"
    a.close(); b.close()


@pytest.mark.skipif(not dtls.dtls_available(), reason="libssl missing")
def test_dtls_fingerprint_verified():
    """Matching SDP fingerprints -> ready; a wrong one -> security_failed.

    Mirrors the reference's dtls_srtp.cpp fingerprint check: the DTLS
    handshake may complete, but keys are only derived when the peer cert
    hashes to the SDP a=fingerprint value."""
    a = CallSetup(controlling=True, key_agreement="dtls")
    b = CallSetup(controlling=False, key_agreement="dtls")
    a.set_remote_fingerprint(b.local_fingerprint())
    b.set_remote_fingerprint(a.local_fingerprint())
    assert _connect(a, b, timeout_s=8.0)
    assert a.srtp_keys is not None and not a.security_failed
    a.close(); b.close()

    # now a MitM scenario: expected fingerprint doesn't match the peer cert
    a = CallSetup(controlling=True, key_agreement="dtls")
    b = CallSetup(controlling=False, key_agreement="dtls")
    a.set_remote_fingerprint("sha-256 " + ":".join(["00"] * 32))
    b.set_remote_fingerprint(a.local_fingerprint())
    assert not _connect(a, b, timeout_s=3.0)
    assert a.security_failed and a.srtp_keys is None
    with pytest.raises(AssertionError):
        a.media_transport()
    a.close(); b.close()


def test_trickle_ice_call_setup():
    """RFC 8838 at the CallSetup surface: the answer arrives with ZERO
    candidates (trickle mode), checks idle without failing, then the real
    candidate trickles in via add_candidate() and the call completes;
    end_of_candidates() makes later exhaustion final."""
    a = CallSetup(controlling=True)
    b = CallSetup(controlling=False)
    a.set_remote(*b.local_credentials(), [], trickle=True)
    b.set_remote(*a.local_credentials(), [], trickle=True)
    for _ in range(20):                    # nothing to check yet: stays open
        a.iterate(); b.iterate()
        time.sleep(0.005)
    from mediastreamer2_tpu.net.ice import IS_FAILED
    assert a.ice.state != IS_FAILED and b.ice.state != IS_FAILED
    # candidates trickle in
    a.add_candidate("127.0.0.1", b.sock.local_port)
    b.add_candidate("127.0.0.1", a.sock.local_port)
    a.end_of_candidates(); b.end_of_candidates()
    deadline = time.time() + 5.0
    while time.time() < deadline and not (a.ready and b.ready):
        a.iterate(); b.iterate()
        time.sleep(0.02)
    assert a.ready and b.ready
    assert a.check_list.selected is not None
    a.close(); b.close()
