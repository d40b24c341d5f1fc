"""AAC codec + RFC 3640 payload format (cf. src/audiofilters/aac-eld.c:
the reference's AAC filter family; ours wraps libavcodec's native AAC-LC
the same way the reference wraps AudioToolbox/MediaCodec).  BV16 gating is
also checked here (bv16.c parity: absent lib => absent codec)."""
import numpy as np
import pytest

from mediastreamer2_tpu.ops import aac
from mediastreamer2_tpu.ops import host_codecs as hc
from mediastreamer2_tpu.core.block import tick_samples
from mediastreamer2_tpu.models.audio_stream import (AudioStreamBatch,
                                                    PAYLOAD_TYPES)
from mediastreamer2_tpu.net.rtp import LoopbackPair
from mediastreamer2_tpu.utils.audiodiff import audio_diff
from conftest import make_speechlike

needs_aac = pytest.mark.skipif(not aac.aac_available(),
                               reason="libavcodec aac missing")


@needs_aac
def test_codec_roundtrip_quality():
    """Encode->decode a speech-like signal; correlation must survive."""
    rate = 16000
    sig = make_speechlike(1024 * 20, rate, seed=3)
    enc = aac.AacEncoder(rate, 1)
    dec = aac.AacDecoder(rate, 1)
    outs = []
    for i in range(20):
        for au in enc.encode(sig[i * 1024:(i + 1) * 1024]):
            out = dec.decode(au)
            if out.size:
                outs.append(out[:, 0])
    y = np.concatenate(outs)
    sim, _ = audio_diff(sig, y)
    assert sim > 0.8, f"aac roundtrip sim {sim}"


@needs_aac
def test_rfc3640_aggregation_and_fragmentation():
    rate = 16000
    enc = aac.AacEncoder(rate, 1)
    rng = np.random.default_rng(0)
    aus = []
    for i in range(12):
        aus += enc.encode(rng.standard_normal(1024).astype(np.float32) * 0.3)
    assert aus
    for mtu in (48, 120, 1400):
        asm = aac.AacRtpAssembler()
        rec = []
        for p in aac.rfc3640_pack(aus, mtu=mtu):
            assert len(p) <= mtu + 4        # header overhead bound
            rec += asm.push(p)
        assert rec == aus, f"mtu={mtu}"


@needs_aac
def test_fragment_au_size_is_complete_au():
    """RFC 3640 §3.2.3.1: fragments carry the COMPLETE AU size."""
    au = bytes(range(256)) * 2              # 512 B
    payloads = aac.rfc3640_pack([au], mtu=100)
    assert len(payloads) > 1
    for p in payloads:
        size = int.from_bytes(p[2:4], "big") >> 3
        assert size == len(au)


def test_audio_specific_config():
    for rate, ch in ((8000, 1), (16000, 1), (32000, 2), (48000, 2)):
        cfg = aac.make_audio_specific_config(rate, ch)
        assert aac.parse_audio_specific_config(cfg) == (rate, ch)


@needs_aac
def test_aac_stream_over_rtp(factory):
    """Two-endpoint AAC call: 1024-sample AUs spanning 6.4 ticks each,
    sample-granular FIFOs on both sides (aac-eld.c bufferizer role)."""
    assert PAYLOAD_TYPES["aac"] == 98
    rate, ticks = 16000, 120
    S = tick_samples(rate)
    sig = make_speechlike(S * ticks, rate, seed=11)
    tx = AudioStreamBatch(factory, 1, codec="aac", rate=rate,
                          mic_signal=sig)
    rx = AudioStreamBatch(factory, 1, codec="aac", rate=rate,
                          record_ticks=ticks + 60)
    pair = LoopbackPair()
    tx.set_transport(0, pair.endpoint(0))
    rx.set_transport(0, pair.endpoint(1))
    tx.ticker.warm_up(); rx.ticker.warm_up()
    rx.start(ticks + 60)
    tx.run(ticks + 20)
    tx.stop(); rx.stop()
    sim, _ = audio_diff(sig, rx.get_recording()[0])
    assert sim > 0.8, f"aac stream sim {sim}"


@needs_aac
def test_offer_answer_mpeg4_generic():
    from mediastreamer2_tpu.models.offer_answer import (
        PayloadTypeDesc, negotiate, local_capabilities)
    caps = local_capabilities()
    mine = [c for c in caps if c.mime == "mpeg4-generic"]
    assert mine, "aac capability missing"
    offer = PayloadTypeDesc(
        "mpeg4-generic", 16000, 1, 97,
        "mode=AAC-hbr;config=1408;sizeLength=13;indexLength=3;"
        "indexDeltaLength=3")
    ans = negotiate([offer], caps)
    assert ans and ans[0].number == 97
    assert "mode=AAC-hbr" in ans[0].fmtp
    # non-hbr modes are declined
    bad = PayloadTypeDesc("mpeg4-generic", 16000, 1, 97, "mode=generic")
    assert negotiate([bad], caps) == []


def test_bv16_gated_like_reference():
    """Without libbv16 on the system the codec is absent, exactly like a
    reference build without ENABLE_BV16 (bv16.c is conditionally compiled).
    When present, the self-check must pass before it is exposed."""
    if not hc.bv16_available():
        with pytest.raises(RuntimeError):
            hc.Bv16Codec()
    else:                                   # pragma: no cover (lib absent)
        c = hc.Bv16Codec()
        sig = make_speechlike(800, 8000, seed=1)
        y = c.decode(c.encode(sig), frame_samples=800)
        sim, _ = audio_diff(sig, y)
        assert sim > 0.7
