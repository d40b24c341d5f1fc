"""G.722 codec: bit-exact against vectors generated from the reference's
bundled ITU implementation (src/utils/g722_encode.c / g722_decode.c),
plus a 16 kHz two-endpoint stream test with the RFC 3551 PT-9 clock quirk."""
import os

import numpy as np
import jax.numpy as jnp

from mediastreamer2_tpu.ops.g722 import g722_state, g722_encode, g722_decode
from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import AudioStreamBatch, PAYLOAD_TYPES
from mediastreamer2_tpu.net.rtp import LoopbackPair
from mediastreamer2_tpu.utils.audiodiff import audio_diff
from conftest import make_speechlike

_VEC = np.load(os.path.join(os.path.dirname(__file__), "data",
                            "g722_vectors.npz"))


def test_encode_bit_exact():
    pcm = _VEC["pcm"].astype(np.int32)[None, :]
    codes, _ = g722_encode(jnp.asarray(pcm), g722_state(1))
    np.testing.assert_array_equal(np.asarray(codes)[0],
                                  _VEC["code"].astype(np.int32))


def test_decode_bit_exact():
    codes = _VEC["code"].astype(np.int32)[None, :]
    dec, _ = g722_decode(jnp.asarray(codes), g722_state(1))
    np.testing.assert_array_equal(np.asarray(dec)[0],
                                  _VEC["dec"].astype(np.int32))


def test_batch_independence():
    """Each leg's codec state advances independently under vectorization."""
    pcm = _VEC["pcm"].astype(np.int32)
    batch = np.stack([pcm, np.roll(pcm, 160), pcm // 2])
    codes, _ = g722_encode(jnp.asarray(batch), g722_state(3))
    np.testing.assert_array_equal(np.asarray(codes)[0],
                                  _VEC["code"].astype(np.int32))
    # leg 2 differs from leg 0
    assert (np.asarray(codes)[2] != np.asarray(codes)[0]).any()


def test_streaming_state_continuity():
    """Tick-by-tick encode (10 ms blocks) == one-shot encode."""
    pcm = _VEC["pcm"].astype(np.int32)[None, :]
    S = 160
    st = g722_state(1)
    outs = []
    for k in range(pcm.shape[1] // S):
        c, st = g722_encode(jnp.asarray(pcm[:, k * S:(k + 1) * S]), st)
        outs.append(np.asarray(c))
    np.testing.assert_array_equal(np.concatenate(outs, axis=1)[0],
                                  _VEC["code"].astype(np.int32))


def test_g722_stream_over_rtp(factory):
    """16 kHz audio over PT 9 with the 8 kHz RTP clock (RFC 3551 §4.5.2)."""
    assert PAYLOAD_TYPES["g722"] == 9
    ticks = 80
    S = tick_samples(16000)
    sig = make_speechlike(S * ticks, 16000, seed=5)
    tx = AudioStreamBatch(factory, 1, codec="g722", rate=16000,
                          mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, codec="g722", rate=16000,
                          record_ticks=ticks + 40)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    assert tx.sessions[0].clock_rate == 8000          # the quirk
    tx.ticker.warm_up(); rx.ticker.warm_up()
    rx.start(ticks + 40)
    tx.run(ticks + 10)
    tx.stop(); rx.stop()
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.9, f"g722 stream sim {sim}"
