"""Echo-cancellation inside a full AudioStream call: the far-end speech
leaking from speaker to mic is cancelled before encoding (the reference's
EC wiring in audio_stream_start_full, audiostream.c EC.0/EC.1 pins)."""
import numpy as np
import jax.numpy as jnp

from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                    AudioStreamFeatures)
from mediastreamer2_tpu.net.rtp import LoopbackPair
from conftest import make_speechlike

RATE = 8000
S = tick_samples(RATE)


def test_stream_echo_cancellation(factory):
    """Alice sends speech; Bob's 'mic' picks up Bob's speaker (simulated via
    ext mic injection of the EC far reference = echo); Bob's EC must
    prevent Alice's speech from being sent back to her."""
    ticks = 250
    sig = make_speechlike(S * (ticks + 50), RATE, seed=31)
    alice = AudioStreamBatch(factory, 1, mic_signal=sig,
                             record_ticks=ticks + 40)
    bob = AudioStreamBatch(factory, 1,
                           features=AudioStreamFeatures(echo_canceller=True,
                                                        plc=True))
    pair = LoopbackPair()
    alice.set_transport(0, pair.endpoint(0))
    bob.set_transport(0, pair.endpoint(1))

    # Bob's mic hears an attenuated copy of his speaker output (echo).
    echo_state = {"spk": np.zeros((1, S), np.float32)}
    orig_pull = bob._pull

    def bob_pull(tick):
        ext = orig_pull(tick)
        ext["mic"] = 0.6 * echo_state["spk"]
        return ext

    orig_push = bob._push

    def bob_push(tick, ext_out):
        echo_state["spk"] = np.asarray(ext_out["spk"])
        orig_push(tick, ext_out)
    bob.ticker.set_io(pull=bob_pull, push=bob_push)

    alice.ticker.warm_up()
    bob.ticker.warm_up()
    bob.ticker.realtime = alice.ticker.realtime = False
    for _ in range(ticks):
        alice.ticker.do_tick()
        bob.ticker.do_tick()
    rec = alice.get_recording()[0]
    # What Alice hears back should NOT contain her own speech at echo level:
    # without EC it would be 0.6x her signal; assert strong attenuation.
    sent_e = float((sig[: ticks * S] ** 2).mean())
    back_tail = rec[150 * S: ticks * S]
    back_e = float((back_tail ** 2).mean())
    erle_like = 10 * np.log10((0.36 * sent_e) / (back_e + 1e-12))
    assert erle_like > 10, f"echo return only attenuated {erle_like:.1f} dB"
