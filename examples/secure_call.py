"""Runnable example: a fully secured call between two in-process
endpoints — ICE nomination over real localhost UDP, DTLS-SRTP key
agreement negotiating an AEAD-GCM suite, SDP-style fingerprint
verification, then two-way encrypted audio with an audio_diff check.

    python examples/secure_call.py [--zrtp] [--seconds 3]

The same composition as the reference's mediastream.c + CallSetup:
ICE check list -> DTLS handshake on the nominated pair (or ZRTP with
--zrtp) -> SRTP-wrapped media transport -> AudioStreamBatch both ways.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=3)
    ap.add_argument("--zrtp", action="store_true",
                    help="use ZRTP (RFC 6189) instead of DTLS-SRTP")
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from mediastreamer2_tpu.core.factory import Factory
    from mediastreamer2_tpu.core.block import tick_samples
    from mediastreamer2_tpu.models.call_setup import CallSetup
    from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch
    from mediastreamer2_tpu.utils.audiodiff import audio_diff

    key_agreement = "zrtp" if args.zrtp else "dtls"
    a = CallSetup(controlling=True, key_agreement=key_agreement)
    b = CallSetup(controlling=False, key_agreement=key_agreement)
    if not args.zrtp:
        # SDP a=fingerprint exchange (signalling plane)
        a.set_remote_fingerprint(b.local_fingerprint())
        b.set_remote_fingerprint(a.local_fingerprint())
    a.set_remote(*b.local_credentials(), [("127.0.0.1", b.sock.local_port)])
    b.set_remote(*a.local_credentials(), [("127.0.0.1", a.sock.local_port)])
    t0 = time.time()
    while time.time() - t0 < 10 and not (a.ready and b.ready):
        a.iterate(); b.iterate(); time.sleep(0.01)
    if not (a.ready and b.ready):
        print("call setup failed"); return 1
    print(f"secured in {time.time() - t0:.2f}s "
          f"(suite: {a.srtp_suite})"
          + (f" SAS: {a.zrtp.sas}" if args.zrtp else ""))

    factory = Factory()
    S = tick_samples(8000)
    ticks = args.seconds * 100
    rng = np.random.default_rng(1)
    sig = (0.3 * np.sin(2 * np.pi * 350 * np.arange(S * ticks) / 8000)
           + 0.05 * rng.standard_normal(S * ticks)).astype(np.float32)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40)
    tx.ticker.warm_up(); rx.ticker.warm_up()
    tx.set_transport(0, a.media_transport())
    rx.set_transport(0, b.media_transport())
    rx.start(ticks + 40)
    tx.run(ticks + 10)
    tx.stop(); rx.stop()
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    st = tx.get_stats(0)
    print(f"sent={st.sent_packets} similarity={sim:.3f} "
          f"up_bw={tx.sessions[0].up_bw.bps() / 1000:.0f} kbps")
    a.close(); b.close()
    return 0 if sim > 0.9 else 1


if __name__ == "__main__":
    sys.exit(main())
