"""DSP filter library tests — resampler quality, volume/AGC, mixer
mix-minus exactness, DTMF gen->detect round trip (parity targets:
reference basic_audio tester + per-filter behavior)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mediastreamer2_tpu.core.block import Format, tick_samples
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.ops.fileio import recorder_get_audio
from mediastreamer2_tpu.ops.tones import dtmf_freqs, classify_dtmf
from mediastreamer2_tpu.utils.audiodiff import audio_diff, snr_db

from conftest import make_speechlike


def run_chain(factory, B, ticks, in_rate, filters, sig, rec_rate=None):
    """Build player -> [filters...] -> recorder and run `ticks`."""
    g = GraphBuilder(factory, batch=B)
    p = g.add("file_player", "play", fmt=Format(rate=in_rate), signal=sig)
    nodes = [p]
    for i, (fname, kw) in enumerate(filters):
        nodes.append(g.add(fname, f"f{i}", **kw))
    rec = g.add("file_recorder", "rec", max_ticks=ticks)
    nodes.append(rec)
    g.chain(*nodes)
    cg = g.build()
    st, outs, evs = cg.run_scan(cg.init_state(), cg.init_params(), None, length=ticks)
    S_out = tick_samples(rec_rate or in_rate)
    return cg, st, recorder_get_audio(st["rec"], ticks, S_out), evs


# ---------------------------------------------------------------- resampler
@pytest.mark.parametrize("r_in,r_out", [(8000, 16000), (16000, 8000),
                                        (48000, 16000), (16000, 48000),
                                        (44100, 48000)])
def test_resampler_sine_quality(factory, r_in, r_out):
    B, ticks = 2, 40
    f0 = 1000.0
    n = tick_samples(r_in) * ticks
    t = np.arange(n) / r_in
    sig = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    _, st, rec, _ = run_chain(factory, B, ticks, r_in,
                              [("resample", {"out_rate": r_out})], sig, r_out)
    # compare against ideal resampled sine (skip converge/latency edges)
    t_out = np.arange(tick_samples(r_out) * ticks) / r_out
    ideal = 0.5 * np.sin(2 * np.pi * f0 * t_out)
    cut = tick_samples(r_out) * 2
    s = snr_db(ideal[cut:-cut], rec[0][cut:-cut])
    assert s > 40, f"{r_in}->{r_out}: SNR {s:.1f} dB"


def test_resampler_speech_similarity(factory):
    B, ticks = 2, 60
    sig = make_speechlike(tick_samples(48000) * ticks, 48000)
    _, st, rec, _ = run_chain(factory, B, ticks, 48000,
                              [("resample", {"out_rate": 16000})], sig, 16000)
    ideal = sig.reshape(-1, 3).mean(axis=1)  # crude downsample for correlation
    sim, _ = audio_diff(ideal, rec[0])
    assert sim > 0.95


def test_channel_adapter(factory):
    B, ticks, rate = 1, 10, 8000
    S = tick_samples(rate)
    mono = make_speechlike(S * ticks, rate)
    _, st, rec, _ = run_chain(factory, B, ticks, rate,
                              [("channel_adapter", {"out_channels": 2})], mono)
    # output is stereo interleaved: both channels equal the mono input
    out = recorder_get_audio(st["rec"])[:, :S * ticks * 2]
    st_out = out[0].reshape(-1, 2)
    np.testing.assert_allclose(st_out[:, 0], st_out[:, 1], atol=1e-6)
    sim, _ = audio_diff(mono, st_out[:, 0])
    assert sim > 0.99


# ---------------------------------------------------------------- volume/AGC
def test_volume_static_gain(factory):
    B, ticks, rate = 2, 20, 8000
    sig = make_speechlike(tick_samples(rate) * ticks, rate)
    g = GraphBuilder(factory, batch=B)
    p = g.add("file_player", "play", fmt=Format(rate=rate), signal=sig)
    v = g.add("volume", "vol")
    rec = g.add("file_recorder", "rec", max_ticks=ticks)
    g.chain(p, v, rec)
    cg = g.build()
    params = cg.init_params()
    params["vol"]["static_gain"] = jnp.array([0.5, 2.0])
    st, _, _ = cg.run_scan(cg.init_state(), params, None, length=ticks)
    rec_a = recorder_get_audio(st["rec"], ticks, tick_samples(rate))
    # after gain settles (slow ramp up), steady-state ratio approx holds
    tail = slice(-800, None)
    r0 = np.abs(rec_a[0][tail]).mean() / np.abs(sig[tail]).mean()
    assert 0.4 < r0 < 0.6


def test_agc_converges_to_target(factory):
    B, ticks, rate = 1, 300, 8000
    rng = np.random.default_rng(0)
    sig = (0.02 * rng.standard_normal(tick_samples(rate) * ticks)).astype(np.float32)
    g = GraphBuilder(factory, batch=B)
    p = g.add("file_player", "play", fmt=Format(rate=rate), signal=sig)
    v = g.add("volume", "vol")
    rec = g.add("file_recorder", "rec", max_ticks=ticks)
    g.chain(p, v, rec)
    cg = g.build()
    params = cg.init_params()
    params["vol"]["agc_enabled"] = jnp.array([True])
    params["vol"]["agc_target"] = jnp.array([0.1], jnp.float32)
    st, _, _ = cg.run_scan(cg.init_state(), params, None, length=ticks)
    out = recorder_get_audio(st["rec"], ticks, tick_samples(rate))[0]
    rms_end = np.sqrt((out[-4000:] ** 2).mean())
    assert 0.07 < rms_end < 0.14, f"AGC steady-state rms {rms_end}"


def test_noise_gate(factory):
    B, ticks, rate = 1, 50, 8000
    n = tick_samples(rate) * ticks
    sig = (1e-4 * np.random.default_rng(1).standard_normal(n)).astype(np.float32)
    g = GraphBuilder(factory, batch=B)
    p = g.add("file_player", "play", fmt=Format(rate=rate), signal=sig)
    v = g.add("volume", "vol")
    rec = g.add("file_recorder", "rec", max_ticks=ticks)
    g.chain(p, v, rec)
    cg = g.build()
    params = cg.init_params()
    params["vol"]["ng_enabled"] = jnp.array([True])
    st, _, _ = cg.run_scan(cg.init_state(), params, None, length=ticks)
    out = recorder_get_audio(st["rec"], ticks, tick_samples(rate))[0]
    assert np.abs(out[-2000:]).max() < np.abs(sig[-2000:]).max() * 0.2


# ---------------------------------------------------------------- mixer
def test_conf_mixer_mix_minus_exact(factory):
    B, rate = 6, 8000
    S = tick_samples(rate)
    g = GraphBuilder(factory, batch=B)
    src = g.add("ext_source", "in", fmt=Format(rate=rate))
    m = g.add("conf_mixer", "mix")
    sink = g.add("ext_sink", "out")
    g.chain(src, m, sink)
    cg = g.build()
    params = cg.init_params()
    # two conferences: legs {0,1,2} and {3,4}; leg 5 inactive in conf 1
    params["mix"]["group_id"] = jnp.array([0, 0, 0, 1, 1, 1], jnp.int32)
    params["mix"]["active"] = jnp.array([1, 1, 1, 1, 1, 0], jnp.bool_)
    x = np.random.default_rng(0).uniform(-0.1, 0.1, (B, S)).astype(np.float32)
    st, out, _ = cg.step(cg.init_state(), params, {"in": x})
    out = np.asarray(out["out"])
    np.testing.assert_allclose(out[0], x[1] + x[2], atol=1e-6)
    np.testing.assert_allclose(out[1], x[0] + x[2], atol=1e-6)
    np.testing.assert_allclose(out[3], x[4], atol=1e-6)
    np.testing.assert_allclose(out[5], x[3] + x[4], atol=1e-6)  # listener-only


def test_conf_mixer_saturation(factory):
    B, rate = 2, 8000
    S = tick_samples(rate)
    g = GraphBuilder(factory, batch=B)
    src = g.add("ext_source", "in", fmt=Format(rate=rate))
    m = g.add("conf_mixer", "mix")
    g.link(src, 0, m, 0)
    g.link(m, 0, g.add("ext_sink", "out"), 0)
    cg = g.build()
    params = cg.init_params()
    params["mix"]["group_id"] = jnp.array([0, 0], jnp.int32)
    params["mix"]["mix_minus"] = jnp.array([False, False])
    x = np.full((B, S), 0.8, np.float32)
    _, out, _ = cg.step(cg.init_state(), params, {"in": x})
    assert np.asarray(out["out"]).max() <= 1.0  # saturates like audiomixer.c:40-44


# ---------------------------------------------------------------- tones
def test_dtmf_generate_and_detect(factory):
    B, ticks, rate = 2, 30, 8000
    S = tick_samples(rate)
    g = GraphBuilder(factory, batch=B)
    src = g.add("void_source", "vs", fmt=Format(rate=rate))
    gen = g.add("dtmf_gen", "gen")
    det = g.add("tone_detector", "det")
    sink = g.add("ext_sink", "out")
    g.chain(src, gen, det, sink)
    cg = g.build()
    params = cg.init_params()
    f1, f2 = dtmf_freqs("5")
    params["gen"]["f1"] = jnp.array([f1, f1], jnp.float32)
    params["gen"]["f2"] = jnp.array([f2, f2], jnp.float32)
    params["gen"]["remaining"] = jnp.array([S * 10, 0], jnp.int32)  # leg 1 silent
    st = cg.init_state()
    any_hit = np.zeros((B, 8), bool)
    peak_power = np.zeros((B, 8), np.float32)
    for i in range(ticks):
        st, out, ev = cg.step(st, params, {})
        params["gen"]["remaining"] = jnp.maximum(
            params["gen"]["remaining"] - S, 0)
        any_hit |= np.asarray(ev["det.tone_event"])
        peak_power = np.maximum(peak_power, np.asarray(st["det"]["power"]))
    assert any_hit[0].any()
    assert classify_dtmf(peak_power[0]) == "5"
    assert not any_hit[1].any()


# ---------------------------------------------------------------- PLC
def test_plc_conceals_loss(factory):
    B, ticks, rate = 1, 60, 8000
    S = tick_samples(rate)
    sig = make_speechlike(S * ticks, rate, seed=5)
    g = GraphBuilder(factory, batch=B)
    p = g.add("file_player", "play", fmt=Format(rate=rate), signal=sig)
    plc = g.add("generic_plc", "plc")
    rec = g.add("file_recorder", "rec", max_ticks=ticks)
    g.chain(p, plc, rec)
    cg = g.build()
    st, params = cg.init_state(), cg.init_params()
    lost_ticks = {20, 21, 35}
    for i in range(ticks):
        params["plc"]["lost"] = jnp.array([i in lost_ticks])
        st, _, _ = cg.step(st, params, {})
    out = recorder_get_audio(st["rec"], ticks, S)[0]
    sim, _ = audio_diff(sig, out)
    assert sim > 0.9                      # mostly intact despite loss
    # concealed region is not silent right at loss start
    assert np.abs(out[20 * S:20 * S + S]).max() > 1e-3


# ---------------------------------------------------------------- VAD
def test_vad_transitions(factory):
    B, rate = 1, 8000
    S = tick_samples(rate)
    g = GraphBuilder(factory, batch=B)
    src = g.add("ext_source", "in", fmt=Format(rate=rate))
    v = g.add("vad_dtx", "vad")
    sink = g.add("ext_sink", "out")
    g.chain(src, v, sink)
    cg = g.build()
    st, params = cg.init_state(), cg.init_params()
    rng = np.random.default_rng(0)
    silence_events, voice_events = 0, 0
    for i in range(120):
        if 40 <= i < 80:
            x = 1e-4 * rng.standard_normal((B, S)).astype(np.float32)
        else:
            x = (0.3 * np.sin(2 * np.pi * 300 * (np.arange(S) + i * S) / rate)
                 )[None, :].astype(np.float32)
        st, _, ev = cg.step(st, params, {"in": x})
        silence_events += int(np.asarray(ev["vad.silence_start"])[0])
        voice_events += int(np.asarray(ev["vad.voice_start"])[0])
    assert silence_events >= 1
    assert voice_events >= 1


# ---------------------------------------------------------------- flowcontrol
def test_flow_control_drops_latency(factory):
    B, rate = 1, 8000
    S = tick_samples(rate)
    g = GraphBuilder(factory, batch=B)
    src = g.add("ext_source", "in", fmt=Format(rate=rate))
    fc = g.add("flow_control", "fc")
    sink = g.add("ext_sink", "out")
    g.chain(src, fc, sink)
    cg = g.build()
    st, params = cg.init_state(), cg.init_params()
    # steady ramp input so continuity is checkable
    total, outs = 40, []
    for i in range(total):
        x = (np.arange(i * S, (i + 1) * S, dtype=np.float32) / (total * S))[None, :]
        if i == 10:
            params["fc"]["drop_samples"] = jnp.array([S // 4], jnp.int32)
        else:
            params["fc"]["drop_samples"] = jnp.array([0], jnp.int32)
        st, out, ev = cg.step(st, params, {"in": x})
        outs.append(np.asarray(out["out"])[0])
    assert int(np.asarray(st["fc"]["fill"])[0]) == S - S // 4
    y = np.concatenate(outs)
    # output continuous: during compression the ramp step grows by at most
    # ~1.25x the nominal step (S+S/4 samples squeezed into S outputs)
    assert np.abs(np.diff(y[S:])).max() < 2.0 / (total * S)


# ---------------------------------------------------------------- equalizer
def test_equalizer_band_cut(factory):
    B, ticks, rate = 1, 60, 8000
    S = tick_samples(rate)
    n = S * ticks
    t = np.arange(n) / rate
    low = 0.3 * np.sin(2 * np.pi * 300 * t)
    high = 0.3 * np.sin(2 * np.pi * 2000 * t)
    sig = (low + high).astype(np.float32)
    g = GraphBuilder(factory, batch=B)
    p = g.add("file_player", "play", fmt=Format(rate=rate), signal=sig)
    e = g.add("equalizer", "eq", gains=[(2000.0, 0.02, 600.0)])
    rec = g.add("file_recorder", "rec", max_ticks=ticks)
    g.chain(p, e, rec)
    cg = g.build()
    st, _, _ = cg.run_scan(cg.init_state(), cg.init_params(), None, length=ticks)
    out = recorder_get_audio(st["rec"], ticks, S)[0][S * 2:]
    spec = np.abs(np.fft.rfft(out))
    freqs = np.fft.rfftfreq(len(out), 1 / rate)
    e300 = spec[np.argmin(np.abs(freqs - 300))]
    e2000 = spec[np.argmin(np.abs(freqs - 2000))]
    assert e2000 < e300 * 0.1, f"2 kHz not attenuated: {e2000} vs {e300}"


def test_stereo_resample_preserves_channel_identity(factory):
    """msresample parity: rate conversion of interleaved stereo keeps the
    channels independent — feed the reference's real 48 kHz stereo
    recording in the LEFT channel only; the resampled RIGHT channel must
    stay silent and the left must carry the audio."""
    import os
    import pytest
    from mediastreamer2_tpu.io.wav import read_wav_multi
    from mediastreamer2_tpu.core.ticker import Ticker
    FIX = "/root/reference/tester/sounds"
    if not os.path.isdir(FIX):
        pytest.skip("reference fixtures not mounted")
    multi, rate, ch = read_wav_multi(f"{FIX}/chimes_48000_stereo.wav")
    assert ch == 2 and rate == 48000
    S = tick_samples(rate)
    ticks = min(multi.shape[0] // S, 100)
    left_only = multi[: ticks * S].copy()
    left_only[:, 1] = 0.0
    inter = left_only.reshape(-1)
    g = GraphBuilder(factory, batch=1)
    p = g.add("file_player", "play",
              fmt=Format(rate=rate, channels=2), signal=inter)
    rs = g.add("resample", "rs", out_rate=16000)
    g.chain(p, rs, g.add("file_recorder", "rec", max_ticks=ticks))
    tk = Ticker(g.build(), realtime=False)
    tk.warm_up()
    tk.run(ticks)
    S16 = tick_samples(16000) * 2                 # stereo out block
    out = recorder_get_audio(tk.state["rec"], ticks, S16)[0].reshape(-1, 2)
    e_left = float((out[:, 0] ** 2).mean())
    e_right = float((out[:, 1] ** 2).mean())
    assert e_left > 1e-4                          # audio came through
    assert e_right < e_left * 1e-4                # no channel bleed
