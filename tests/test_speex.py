"""Speex host codec (parity: MSSpeexEnc/Dec, src/audiofilters/msspeex.c)."""
import numpy as np
import pytest

from mediastreamer2_tpu.ops import host_codecs as hc
from mediastreamer2_tpu.utils.audiodiff import audio_diff
from conftest import make_speechlike

pytestmark = pytest.mark.skipif(not hc.speex_available(),
                                reason="libspeex missing")


def _envelope(x, win=80):
    e = np.abs(x)
    k = np.ones(win) / win
    return np.convolve(e, k, mode="same")


@pytest.mark.parametrize("rate", [8000, 16000])
def test_speex_roundtrip(rate):
    c = hc.SpeexCodec(rate)
    F = c.frame_samples
    sig = make_speechlike(F * 60, rate, seed=5)
    out = np.concatenate([c.decode(c.encode(sig[i*F:(i+1)*F]))
                          for i in range(60)])
    # speex is a CELP (not waveform) codec: correlate energy envelopes
    sim, _ = audio_diff(_envelope(sig), _envelope(out))
    assert sim > 0.85, f"speex@{rate} envelope sim {sim}"
    raw_sim, _ = audio_diff(sig, out)
    assert raw_sim > 0.4


def test_speex_plc():
    c = hc.SpeexCodec(8000)
    for i in range(5):
        c.decode(c.encode(make_speechlike(160, 8000, seed=i)))
    out = c.decode(None)
    assert out.shape == (160,)


# ------------------------------------------------------------------ g729
def test_g729_gated_like_reference():
    """G.729 wraps libbcg729 exactly like the reference (g729.c); when the
    library is absent the codec is unavailable, matching a reference build
    without ENABLE_G729."""
    from mediastreamer2_tpu.ops import host_codecs as hc
    if not hc.g729_available():
        import pytest
        with pytest.raises(RuntimeError):
            hc.G729Codec()
        pytest.skip("libbcg729 not in image (codec gated, like the "
                    "reference without ENABLE_G729)")
    import numpy as np
    from conftest import make_speechlike
    from mediastreamer2_tpu.utils.audiodiff import snr_db
    c = hc.G729Codec()
    sig = make_speechlike(160 * 50, 8000, seed=3)
    out = np.concatenate([c.decode(c.encode(sig[i * 160:(i + 1) * 160]))
                          for i in range(50)])
    assert snr_db(sig[160:], out[160:]) > 6     # ACELP: waveform-ish


def test_speex_stream_over_rtp(factory):
    """Speex session legs (msspeex.c wired like the adaptive tester's
    'Upload bitrate [speex]' streams): NB call over RTP, then ptime 60
    packs three 20 ms frames into one RFC 5574 bits stream."""
    import numpy as np
    from mediastreamer2_tpu.core.block import tick_samples
    from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                        PAYLOAD_TYPES)
    from mediastreamer2_tpu.net.rtp import LoopbackPair
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    from conftest import make_speechlike
    assert PAYLOAD_TYPES["speex"] == 110
    ticks = 120
    S = tick_samples(8000)
    sig = make_speechlike(S * (ticks + 40), 8000, seed=6)
    tx = AudioStreamBatch(factory, 1, codec="speex", mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, codec="speex",
                          record_ticks=ticks + 50)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.set_ptime(0, 60)
    assert tx.get_ptime(0) == 60
    tx.ticker.realtime = rx.ticker.realtime = False
    tx.ticker.warm_up(); rx.ticker.warm_up()
    for _ in range(ticks + 40):
        tx.ticker.do_tick()
        rx.ticker.do_tick()
    sent = tx.sessions[0].stats.sent_packets
    assert sent <= (ticks + 40) // 6 + 2, sent
    rec = rx.get_recording()[0]
    # speex NB on synthetic speech correlates ~0.55 offline; the stream
    # must match the codec's own roundtrip, not lose more
    from mediastreamer2_tpu.ops import host_codecs as hc
    c = hc.SpeexCodec(rate=8000)
    F = c.frame_samples * 3
    ref = np.concatenate([c.decode(c.encode(sig[k*F:(k+1)*F]))
                          for k in range(len(sig)//F)])
    base, _ = audio_diff(sig[:len(ref)], ref)
    sim, _ = audio_diff(sig, rec)
    assert sim > base - 0.07, (sim, base)
