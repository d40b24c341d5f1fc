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
