"""Device quirk DB + ALSA backend gating (parity: devices.c:58 applied at
audiostream.c:1642-1680; alsa.c MSAlsaRead/Write)."""
import numpy as np

from mediastreamer2_tpu.core.quirks import (DeviceQuirks, register_quirks,
                                            lookup_quirks, apply_quirks,
                                            HAS_BUILTIN_AEC)
from mediastreamer2_tpu.core.alsa import alsa_available, detect_alsa_cards
from mediastreamer2_tpu.core.devices import SndCardManager
from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                    AudioStreamFeatures)
from mediastreamer2_tpu.net.rtp import LoopbackPair
from conftest import make_speechlike


def test_quirk_lookup_and_apply():
    q = lookup_quirks("Jabra", "SPEAK 510")
    assert q is not None and q.flags & HAS_BUILTIN_AEC
    ft = AudioStreamFeatures(echo_canceller=True, agc=True)
    apply_quirks(ft, q)
    assert ft.echo_canceller is False        # device cancels echo itself
    assert ft.agc is True

    q2 = lookup_quirks("generic", "usb headset")
    ft2 = apply_quirks(AudioStreamFeatures(), q2)
    assert ft2.mic_eq_gains and ft2.ec_delay_ms == 120
    assert lookup_quirks("unknown", "device") is None


def test_quirk_eq_built_into_stream(factory):
    """A stream built with quirk EQ gains carries mic_eq/spk_eq nodes and
    still passes audio end-to-end."""
    from mediastreamer2_tpu.utils.audiodiff import audio_diff
    from mediastreamer2_tpu.core.block import tick_samples
    ft = apply_quirks(AudioStreamFeatures(),
                      lookup_quirks("generic", "usb headset"))
    ft.spk_eq_gains = [(1000.0, 0.9, 400.0)]
    S = tick_samples(8000)
    ticks = 80
    sig = make_speechlike(S * ticks, 8000, seed=3)
    tx = AudioStreamBatch(factory, 1, mic_signal=sig, features=ft)
    rx = AudioStreamBatch(factory, 1, record_ticks=ticks + 40, features=ft)
    assert "mic_eq" in tx.ticker.state and "spk_eq" in rx.ticker.state
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.ticker.warm_up(); rx.ticker.warm_up()
    rx.start(ticks + 40)
    tx.run(ticks + 10)
    tx.stop(); rx.stop()
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.85, sim


def test_alsa_gated_detection():
    """No libasound on this image: detection is a no-op, the manager still
    works; with libasound present the card would register as alsa:default."""
    mgr = SndCardManager()
    names = [c.name for c in getattr(mgr, "cards", [])] or []
    if alsa_available():
        detect_alsa_cards(mgr)
        assert mgr.get_card("alsa:default") is not None
    else:
        detect_alsa_cards(mgr)             # must not raise
        assert mgr.get_card("alsa:default") is None


def test_screenshare_gated_and_pixel_path():
    """Headless: availability gate is False without X11/DISPLAY, and the
    BGRA->I420 pixel path (the part that doesn't need a display) is
    correct (parity: msscreensharing_x11.cpp capture conversion)."""
    from mediastreamer2_tpu.ops.screenshare import (screenshare_available,
                                                    bgra_to_i420_block,
                                                    ScreenShareSource)
    if not screenshare_available():
        import pytest
        with pytest.raises(RuntimeError):
            ScreenShareSource(64, 48)
    # pure-red BGRA -> Y/U/V of red (BT.601)
    bgra = np.zeros((48, 64, 4), np.uint8)
    bgra[..., 2] = 255
    block = bgra_to_i420_block(bgra)
    assert block.shape == (72, 64)
    y, uv = block[:48], block[48:].reshape(24, 2, 32)
    assert abs(y.mean() - (0.257 * 255 + 16) / 255) < 0.01
    assert abs(uv[:, 0].mean() - (-0.148 * 255 + 128) / 255) < 0.01  # U
    assert abs(uv[:, 1].mean() - (0.439 * 255 + 128) / 255) < 0.01   # V


def test_v4l2_gated_and_yuyv_conversion():
    """Headless: no /dev/video* -> gated; the YUYV->I420 pixel path is
    exact (parity: msv4l2.c capture conversion)."""
    from mediastreamer2_tpu.core.v4l2 import (v4l2_available, list_devices,
                                              yuyv_to_i420_block)
    if not list_devices():
        assert v4l2_available() is False
    w, h = 8, 4
    yuyv = np.zeros((h, w * 2), np.uint8)
    yuyv[:, 0::4] = 200      # Y0
    yuyv[:, 2::4] = 100      # Y1
    yuyv[:, 1::4] = 60       # U
    yuyv[:, 3::4] = 180      # V
    block = yuyv_to_i420_block(yuyv, w, h)
    assert block.shape == (h * 3 // 2, w)
    y = block[:h] * 255
    np.testing.assert_allclose(y[:, 0::2], 200, atol=0.5)
    np.testing.assert_allclose(y[:, 1::2], 100, atol=0.5)
    uv = (block[h:] * 255).reshape(h // 2, 2, w // 2)
    np.testing.assert_allclose(uv[:, 0], 60, atol=0.5)
    np.testing.assert_allclose(uv[:, 1], 180, atol=0.5)


def test_delay_line_and_ec_delay_wiring(factory):
    """delay_line shifts per-leg by whole ticks; a stream built with an
    ec_delay_ms quirk carries the delay node with the right setting."""
    import jax.numpy as jnp
    from mediastreamer2_tpu import GraphBuilder, Format, tick_samples
    from mediastreamer2_tpu.core.ticker import Ticker
    S = tick_samples(8000)
    g = GraphBuilder(factory, batch=2)
    src = g.add("ext_source", "in", fmt=Format(rate=8000))
    dl = g.add("delay_line", "dl", max_delay_ms=100)
    g.chain(src, dl, g.add("ext_sink", "out"))
    tk = Ticker(g.build(), realtime=False)
    tk.params["dl"]["delay_ticks"] = jnp.asarray([0, 3])
    outs = []
    tk.set_io(pull=lambda t: {"in": np.full((2, S), float(t + 1), np.float32)},
              push=lambda t, o: outs.append(np.asarray(o["out"])))
    tk.warm_up()
    for _ in range(6):
        tk.do_tick()
    assert outs[5][0, 0] == 6.0          # leg 0: passthrough
    assert outs[5][1, 0] == 3.0          # leg 1: 3 ticks behind

    ft = apply_quirks(AudioStreamFeatures(echo_canceller=True),
                      lookup_quirks("generic", "usb headset"))
    st = AudioStreamBatch(factory, 1, features=ft)
    assert "ec_delay" in st.ticker.state
    st.ticker.params["ec_delay"]["delay_ticks"] = \
        np.full((1,), ft.ec_delay_ms // 10)


def test_pulse_card_gated():
    """PulseAudio card mirrors the ALSA gating: detector registers nothing
    without libpulse-simple (like a reference build without
    ENABLE_PULSEAUDIO), and never raises."""
    from mediastreamer2_tpu.core.pulse import (pulse_available,
                                               detect_pulse_cards,
                                               PulseSndCard)
    from mediastreamer2_tpu.core.devices import SndCardManager
    mgr = SndCardManager()
    if not pulse_available():
        import pytest
        with pytest.raises(RuntimeError):
            PulseSndCard()
        detect_pulse_cards(mgr)            # must not raise
        assert all(c.driver != "pulse" for c in mgr.cards)
        pytest.skip("libpulse-simple not in image (card gated)")
    # with a live daemon the duplex card must pull/push a tick block
    card = next((c for c in mgr.cards if c.driver == "pulse"), None)
    if card is None:
        import pytest
        pytest.skip("libpulse present but no PulseAudio daemon")
    import numpy as np
    blk = card.pull(0, 2)
    assert blk.shape == (2, card.samples_per_tick)
    card.push(0, np.zeros((2, card.samples_per_tick), np.float32))
    card.close()
