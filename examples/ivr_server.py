"""Runnable example: a batched IVR (interactive voice response) server —
announcements into the send path + RFC 4733 DTMF menu navigation, the
building blocks every reference user combines for voice menus
(audiostream.c local player branch + msrtp.c telephone-event receive).

    python examples/ivr_server.py --legs 16 --seconds 12

The example runs self-contained over loopback: every "caller" leg hears a
welcome prompt, presses a digit (sent as RFC 4733 telephone-events), and
the IVR answers with a per-digit confirmation tone sequence.  With
--port/--client it serves real UDP endpoints instead.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prompt_tone(rate: int, freqs, dur_s: float = 0.6):
    """A simple multi-tone 'prompt' (stand-in for a recorded file)."""
    import numpy as np
    t = np.arange(int(rate * dur_s)) / rate
    sig = sum(0.25 * np.sin(2 * np.pi * f * t) for f in freqs)
    env = np.minimum(1.0, np.minimum(t / 0.02, (dur_s - t) / 0.02) * 50)
    return (sig * env).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", type=int, default=16)
    ap.add_argument("--seconds", type=int, default=12)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from mediastreamer2_tpu.core.factory import Factory
    from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                        AudioStreamFeatures)
    from mediastreamer2_tpu.net.rtp import LoopbackPair

    rate, B = 8000, args.legs
    factory = Factory()

    # IVR side: announcement mixer + DTMF regeneration into the answer path
    ivr = AudioStreamBatch(
        factory, B, rate=rate,
        features=AudioStreamFeatures(local_play=True, dtmf=True),
        mic_signal=np.zeros(80 * args.seconds * 100, np.float32))
    # caller side: records what it hears, sends digits
    callers = AudioStreamBatch(factory, B, rate=rate,
                               record_ticks=args.seconds * 100)

    pairs = [LoopbackPair() for _ in range(B)]
    menu_choice = {}
    for leg in range(B):
        ivr.set_transport(leg, pairs[leg].endpoint(0))
        callers.set_transport(leg, pairs[leg].endpoint(1))
        ivr.enable_dtmf_receive(leg, play_tone=True, tone_ms=200)

    ivr.ticker.realtime = callers.ticker.realtime = False
    ivr.ticker.warm_up(); callers.ticker.warm_up()

    # step 1: welcome prompt to every caller
    ivr.play_announcement(prompt_tone(rate, (440, 660)))
    print(f"IVR up: {B} legs, welcome prompt playing")

    digits = "123456789*0#"
    ticks = args.seconds * 100
    for t in range(ticks):
        if t == 150:                       # callers choose a menu entry
            for leg in range(B):
                d = digits[leg % len(digits)]
                menu_choice[leg] = d
                callers.send_dtmf(leg, d, duration_ms=120)
        ivr.ticker.do_tick()
        callers.ticker.do_tick()

    got = getattr(ivr, "dtmf_received", [])
    ok = sum(1 for leg, d in got if menu_choice.get(leg) == d)
    print(f"menu selections received: {len(got)}/{B} "
          f"(correct digit: {ok}/{B})")
    rec = callers.get_recording()
    heard = float(np.abs(rec).max()) if rec is not None else 0.0
    print(f"callers heard audio (peak {heard:.2f}): "
          f"{'yes' if heard > 0.05 else 'NO'}")
    ivr.stop(); callers.stop()
    return 0 if ok == B and heard > 0.05 else 1


if __name__ == "__main__":
    sys.exit(main())
