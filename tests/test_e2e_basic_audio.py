"""End-to-end slice: file_player -> ulaw_enc -> ulaw_dec -> file_recorder,
N legs batched — the reference basic_audio tester graph
(tester/mediastreamer2_basic_audio_tester.c) with the ms_audio_diff oracle.
"""
import numpy as np

from mediastreamer2_tpu.core.block import Format, tick_samples
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.ops.fileio import recorder_get_audio
from mediastreamer2_tpu.utils.audiodiff import audio_diff, snr_db

from conftest import make_speechlike

FMT8K = Format(kind="pcm", rate=8000, channels=1)


def _build(factory, B, sig, codec, n_ticks):
    g = GraphBuilder(factory, batch=B)
    p = g.add("file_player", "play", fmt=FMT8K, signal=sig)
    enc = g.add(f"{codec}_enc", "enc")
    dec = g.add(f"{codec}_dec", "dec")
    rec = g.add("file_recorder", "rec", max_ticks=n_ticks)
    g.chain(p, enc, dec, rec)
    return g.build()


def test_play_ulaw_record_similarity(factory):
    B, dur_ticks = 4, 100
    S = tick_samples(8000)
    sig = make_speechlike(S * dur_ticks, 8000)
    cg = _build(factory, B, sig, "ulaw", dur_ticks)
    st, params = cg.init_state(), cg.init_params()
    st, outs, evs = cg.run_scan(st, params, None, length=dur_ticks)
    rec = recorder_get_audio(st["rec"], dur_ticks, S)
    for leg in range(B):
        sim, shift = audio_diff(sig, rec[leg])
        assert sim > 0.98, f"leg {leg}: similarity {sim}"
        assert shift == 0
    assert snr_db(sig, rec[0]) > 30


def test_play_alaw_record_similarity(factory):
    B, dur_ticks = 2, 50
    S = tick_samples(8000)
    sig = make_speechlike(S * dur_ticks, 8000, seed=3)
    cg = _build(factory, B, sig, "alaw", dur_ticks)
    st, outs, evs = cg.run_scan(cg.init_state(), cg.init_params(), None,
                                length=dur_ticks)
    rec = recorder_get_audio(st["rec"], dur_ticks, S)
    sim, _ = audio_diff(sig, rec[0])
    assert sim > 0.98


def test_reference_hello_through_every_device_codec(factory):
    """basic_audio tester parity with REAL fixtures: hello8000/16000.wav
    through each device codec's enc->dec chain, audio_diff vs the
    original (the reference's golden-WAV comparisons)."""
    import os
    import pytest
    import numpy as np
    from mediastreamer2_tpu import GraphBuilder, Format, tick_samples
    from mediastreamer2_tpu.core.ticker import Ticker
    from mediastreamer2_tpu.io.wav import read_wav
    from mediastreamer2_tpu.ops.fileio import recorder_get_audio
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    FIX = "/root/reference/tester/sounds"
    if not os.path.isdir(FIX):
        pytest.skip("reference fixtures not mounted")

    cases = [("ulaw", "hello8000.wav", 0.95),
             ("alaw", "hello8000.wav", 0.95),
             ("dvi4", "hello8000.wav", 0.90),
             ("g726_32", "hello8000.wav", 0.90),
             ("g722", "hello16000.wav", 0.90),
             ("l16", "hello8000.wav", 0.999)]
    for codec, fname, thr in cases:
        sig, rate = read_wav(f"{FIX}/{fname}")
        S = tick_samples(rate)
        ticks = min(len(sig) // S, 300)
        sig = sig[: ticks * S]
        g = GraphBuilder(factory, batch=1)
        p = g.add("file_player", "play", fmt=Format(rate=rate), signal=sig)
        g.chain(p, g.add(f"{codec}_enc"), g.add(f"{codec}_dec"),
                g.add("file_recorder", "rec", max_ticks=ticks))
        tk = Ticker(g.build(), realtime=False)
        tk.warm_up()
        tk.run(ticks)
        out = recorder_get_audio(tk.state["rec"], ticks, S)[0]
        sim, _ = audio_diff(sig, out)
        assert sim > thr, f"{codec} on {fname}: sim {sim:.3f}"


def test_stereo_fixture_and_channel_adapter(factory):
    """Stereo handling: read_wav downmixes correctly (no double-speed
    interleave bug); a channels=2 graph carries interleaved stereo blocks
    and the chan_adapter downmixes on-device (chanadapt.c parity) —
    validated with the reference's real stereo piano recording."""
    import os
    import pytest
    import numpy as np
    from mediastreamer2_tpu.io.wav import read_wav, read_wav_multi
    from mediastreamer2_tpu import GraphBuilder, Format, tick_samples
    from mediastreamer2_tpu.core.ticker import Ticker
    from mediastreamer2_tpu.ops.fileio import recorder_get_audio
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    FIX = "/root/reference/tester/sounds"
    if not os.path.isdir(FIX):
        pytest.skip("reference fixtures not mounted")
    multi, rate, ch = read_wav_multi(f"{FIX}/piano_8000_stereo.wav")
    assert ch == 2 and multi.ndim == 2
    mono, rate2 = read_wav(f"{FIX}/piano_8000_stereo.wav")
    assert rate2 == rate and len(mono) == multi.shape[0]
    np.testing.assert_allclose(mono, multi.mean(axis=1), atol=1e-6)

    # stereo through a device graph: interleaved [n*2] -> chan_adapter -> mono
    S = tick_samples(rate)
    ticks = min(multi.shape[0] // S, 200)
    inter = multi[: ticks * S].reshape(-1)          # interleaved stream
    g = GraphBuilder(factory, batch=1)
    p = g.add("file_player", "play",
              fmt=Format(rate=rate, channels=2), signal=inter)
    ca = g.add("channel_adapter", "ca", out_channels=1)
    g.chain(p, ca, g.add("file_recorder", "rec", max_ticks=ticks))
    tk = Ticker(g.build(), realtime=False)
    tk.warm_up()
    tk.run(ticks)
    out = recorder_get_audio(tk.state["rec"], ticks, S)[0]
    sim, _ = audio_diff(mono[: ticks * S], out)
    assert sim > 0.99, sim


def test_mix_two_mono_files_into_stereo(factory, tmp_path):
    """basic_audio tester: 'Mix two mono files into one stereo file' —
    two mono sources become the L/R channels of one stereo WAV."""
    import numpy as np
    from mediastreamer2_tpu.io.wav import write_wav, read_wav_multi
    rate, n = 8000, 8000
    t = np.arange(n) / rate
    left = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    right = (0.4 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    stereo = np.stack([left, right], axis=1).reshape(-1)
    path = str(tmp_path / "stereo.wav")
    write_wav(path, stereo, rate, channels=2)
    multi, r2, ch = read_wav_multi(path)
    assert (r2, ch) == (rate, 2)
    # channel isolation: L carries 440 Hz, R carries 880 Hz
    for cidx, freq in ((0, 440), (1, 880)):
        spec = np.abs(np.fft.rfft(multi[:, cidx]))
        peak_hz = np.argmax(spec) * rate / len(multi)
        assert abs(peak_hz - freq) < 5, (cidx, peak_hz)
