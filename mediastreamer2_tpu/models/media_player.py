"""MSMediaPlayer / MSMediaRecorder equivalents — standalone A/V file
play/record sessions on a private ticker.

Reference: src/voip/msmediaplayer.c:69-91 (open/sniff -> decoders -> sinks
graph, seek/pause via player methods, EOF notify) and msmediarecorder.c.
Containers: the reference handles wav/mkv/smff; here WAV is native and the
frame API leaves room for more containers (host-side demux feeding device
graphs, like the reference's mkv reader does).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from mediastreamer2_tpu.core.block import Format, tick_samples
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.core.ticker import Ticker
from mediastreamer2_tpu.io.wav import read_wav, write_wav


class MediaPlayer:
    """Single-leg convenience wrapper (batch=1) with the reference's
    play/pause/seek/EOF surface."""

    STATE_CLOSED, STATE_PAUSED, STATE_PLAYING = "closed", "paused", "playing"

    def __init__(self, factory, out_rate: Optional[int] = None):
        self.factory = factory
        self.out_rate = out_rate
        self.state = self.STATE_CLOSED
        self.ticker: Optional[Ticker] = None
        self.rate = 0
        self.on_eof: Optional[Callable[[], None]] = None
        self._spk_cb: Optional[Callable[[np.ndarray], None]] = None
        # video branch (A/V files): on_video(yuv_tuple) paced by timestamps
        self.on_video: Optional[Callable[[tuple], None]] = None
        self._video_reg = None
        self._video_dec = None
        self.video_frames_played = 0

    def open(self, path: str):
        """Sniffs the container: .wav native, .mkv/.webm demuxed host-side
        (cf. msmediaplayer.c open/sniff wav/mkv)."""
        if path.lower().endswith((".mkv", ".webm", ".mka")):
            sig, rate = _read_mkv_audio(path)
            self._open_mkv_video(path)
        elif path.lower().endswith(".smff"):
            sig, rate = _read_smff_audio(path)
            self._open_smff_video(path)
        else:
            sig, rate = read_wav(path)
        self.rate = rate
        g = GraphBuilder(self.factory, batch=1)
        p = g.add("file_player", "play", fmt=Format(rate=rate), signal=sig)
        last = p
        if self.out_rate and self.out_rate != rate:
            rs = g.add("resample", "rs", out_rate=self.out_rate)
            g.link(last, 0, rs, 0)
            last = rs
        g.link(last, 0, g.add("ext_sink", "spk"), 0)
        graph = g.build()
        self.ticker = Ticker(graph, name="mediaplayer")
        self.ticker.params["play"]["playing"] = jnp.zeros((1,), bool)
        self.ticker.event_queue.set_handler(
            "play.eof", lambda ev: self.on_eof and self.on_eof())
        self.ticker.set_io(push=self._push)
        self.ticker.warm_up()
        self.state = self.STATE_PAUSED
        self.duration_ms = len(sig) * 1000 // rate

    def _open_mkv_video(self, path: str):
        """Video branch (msmediaplayer.c's player->decoder->display chain):
        VP8 or H.264 track frames queue into a StreamRegulator and decode
        on release, delivered via on_video((y, u, v))."""
        from mediastreamer2_tpu.io.mkv import MkvReader, TRACK_TYPE_VIDEO
        from mediastreamer2_tpu.core.worker import StreamRegulator
        r = MkvReader(path)
        track = next(((n, t) for n, t in r.tracks.items()
                      if t.type == TRACK_TYPE_VIDEO
                      and t.codec_id in ("V_VP8", "V_MPEG4/ISO/AVC")), None)
        if track is None:
            return
        vnum, t = track
        if t.codec_id == "V_VP8":
            from mediastreamer2_tpu.ops.vp8 import vp8_available, Vp8Decoder
            if not vp8_available():
                return
            dec = Vp8Decoder()
            convert = lambda data: data            # noqa: E731
        else:
            from mediastreamer2_tpu.ops.h264 import (h264_available,
                                                     H264Decoder)
            if not h264_available():
                return
            avcc = _parse_avcc(t.codec_private)
            if avcc is None:
                return
            nal_len_size, param_sets = avcc
            h264 = H264Decoder()
            header = b"".join(b"\x00\x00\x00\x01" + n for n in param_sets)
            first = [True]

            class _H264AsYuv:
                def decode(self, data):
                    # MKV AVC frames are length-prefixed NALs -> Annex B
                    out = bytearray()
                    if first[0]:
                        out += header
                        first[0] = False
                    off = 0
                    while off + nal_len_size <= len(data):
                        ln = int.from_bytes(data[off:off + nal_len_size],
                                            "big")
                        off += nal_len_size
                        out += b"\x00\x00\x00\x01" + data[off:off + ln]
                        off += ln
                    frames = h264.decode(bytes(out))
                    if not frames:
                        return None
                    # present as (y, u, v) planes like Vp8Decoder
                    w, h = h264.width, h264.height
                    buf = np.frombuffer(frames[-1], np.uint8)
                    y = buf[: w * h].reshape(h, w)
                    u = buf[w * h: w * h + w * h // 4].reshape(h // 2, w // 2)
                    v = buf[w * h + w * h // 4:].reshape(h // 2, w // 2)
                    return y, u, v
            dec = _H264AsYuv()
            convert = lambda data: data            # noqa: E731
        reg = StreamRegulator(clock_rate=1000)        # mkv timecodes in ms
        for fr in r.frames():
            if fr.track == vnum:
                reg.push(fr.ts_ms, convert(fr.data))
        self._video_reg = reg
        self._video_dec = dec

    def _open_smff_video(self, path: str):
        """SMFF video track (vp8) -> same regulator-paced branch."""
        from mediastreamer2_tpu.io.smff import SmffReader
        from mediastreamer2_tpu.ops.vp8 import vp8_available, Vp8Decoder
        from mediastreamer2_tpu.core.worker import StreamRegulator
        r = SmffReader(path)
        vidx = next((i for i, t in enumerate(r.tracks)
                     if t.kind == 1 and t.codec == "vp8"), None)
        if vidx is None or not vp8_available():
            return
        reg = StreamRegulator(clock_rate=1000)
        for fr in r.frames():
            if fr.track == vidx:
                reg.push(fr.ts_ms, fr.data)
        self._video_reg = reg
        self._video_dec = Vp8Decoder()

    def _push(self, tick, ext_out):
        if self._spk_cb:
            self._spk_cb(np.asarray(ext_out["spk"])[0])
        if self._video_reg is not None:
            # release frames whose timestamp the stream clock has reached
            for data in self._video_reg.pop_due(self.get_position_ms() / 1e3
                                                if self.rate else tick * 0.01):
                out = self._video_dec.decode(data)
                if out is not None:
                    self.video_frames_played += 1
                    if self.on_video:
                        self.on_video(out)

    def set_output(self, cb: Callable[[np.ndarray], None]):
        self._spk_cb = cb

    def start(self):
        if self.state == self.STATE_CLOSED:
            raise RuntimeError("open() first")
        self.ticker.mutate(lambda tk: tk.params["play"].__setitem__(
            "playing", jnp.ones((1,), bool)))
        if not self.ticker._run_thread:
            self.ticker.start()
        self.state = self.STATE_PLAYING

    def pause(self):
        self.ticker.mutate(lambda tk: tk.params["play"].__setitem__(
            "playing", jnp.zeros((1,), bool)))
        self.state = self.STATE_PAUSED

    def set_loop(self, enabled: bool = True):
        """MS_PLAYER_SET_LOOP (player tester 'Loop test'): wrap to the
        start at EOF instead of stopping."""
        self.ticker.mutate(lambda tk: tk.params["play"].__setitem__(
            "loop", jnp.full((1,), enabled, bool)))

    def seek_ms(self, ms: int):
        pos = int(ms * self.rate / 1000)

        def do_seek(tk):
            st = dict(tk.state["play"])
            st["pos"] = jnp.full((1,), pos, jnp.int32)
            tk.state = {**tk.state, "play": st}
        self.ticker.mutate(do_seek)

    def get_position_ms(self) -> int:
        return int(np.asarray(self.ticker.state["play"]["pos"])[0]
                   * 1000 // self.rate)

    def close(self):
        if self.ticker:
            self.ticker.stop()
        self.state = self.STATE_CLOSED


def _parse_avcc(priv: bytes):
    """AVCDecoderConfigurationRecord -> (nal_length_size, [sps..., pps...])
    (the codec-private handling of the reference's mkv player,
    mkv.cpp codec-private paths)."""
    if len(priv) < 7 or priv[0] != 1:
        return None
    nal_len_size = (priv[4] & 0x03) + 1
    sets = []
    off = 5
    n_sps = priv[off] & 0x1F
    off += 1
    for _ in range(n_sps):
        ln = int.from_bytes(priv[off:off + 2], "big")
        off += 2
        sets.append(priv[off:off + ln])
        off += ln
    if off < len(priv):
        n_pps = priv[off]
        off += 1
        for _ in range(n_pps):
            ln = int.from_bytes(priv[off:off + 2], "big")
            off += 2
            sets.append(priv[off:off + ln])
            off += ln
    return nal_len_size, sets


def _read_smff_audio(path: str):
    """Demux the SMFF container's audio track (cf. smff/player.cpp):
    opus or pcm16 payloads -> one decoded signal."""
    import numpy as np
    from mediastreamer2_tpu.io.smff import SmffReader
    r = SmffReader(path)
    audio_idx = next((i for i, t in enumerate(r.tracks) if t.kind == 0), None)
    if audio_idx is None:
        raise ValueError("no audio track in smff")
    track = r.tracks[audio_idx]
    rate = track.a or 48000
    chunks = []
    if track.codec == "opus":
        from mediastreamer2_tpu.ops.host_codecs import OpusDecoder
        dec = OpusDecoder(rate=rate)
        for fr in r.frames():
            if fr.track == audio_idx:
                chunks.append(dec.decode(fr.data, rate // 50))
    elif track.codec in ("pcm16", "l16"):
        for fr in r.frames():
            if fr.track == audio_idx:
                chunks.append(np.frombuffer(fr.data, "<i2"
                                            ).astype(np.float32) / 32768.0)
    else:
        raise ValueError(f"unsupported smff audio codec {track.codec}")
    sig = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    return sig, rate


def _read_mkv_audio(path: str):
    """Decode the first audio track of an MKV to PCM (Opus or PCM codecs)."""
    import numpy as np
    from mediastreamer2_tpu.io.mkv import MkvReader, TRACK_TYPE_AUDIO
    r = MkvReader(path)
    track = next((t for t in r.tracks.values() if t.type == TRACK_TYPE_AUDIO),
                 None)
    if track is None:
        raise ValueError("no audio track")
    rate = int(track.sampling_rate) or 48000
    if track.codec_id == "A_OPUS":
        from mediastreamer2_tpu.ops.host_codecs import OpusDecoder
        dec = OpusDecoder(rate=rate, channels=max(track.channels, 1))
        frame = rate // 100                      # our recorder writes 10 ms
        chunks = [dec.decode(f.data, frame * 6)  # decode up to 60 ms frames
                  for f in r.frames() if f.track == track.number]
        sig = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    elif track.codec_id.startswith("A_PCM"):
        data = b"".join(f.data for f in r.frames()
                        if f.track == track.number)
        sig = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif track.codec_id == "A_MS/ACM":
        # WAVEFORMATEX in codec-private: format tag 7 = mu-law, 6 = a-law,
        # 1 = pcm16 (the reference's mkv ACM handling)
        import struct as _struct
        tag = _struct.unpack_from("<H", track.codec_private, 0)[0] \
            if len(track.codec_private) >= 2 else 1
        data = b"".join(f.data for f in r.frames()
                        if f.track == track.number)
        if tag == 7:
            import jax.numpy as jnp
            from mediastreamer2_tpu.ops.g711 import ulaw_decode
            codes = np.frombuffer(data, np.uint8).astype(np.int32)
            sig = np.asarray(ulaw_decode(jnp.asarray(codes))
                             ).astype(np.float32) / 32768.0
        elif tag == 6:
            import jax.numpy as jnp
            from mediastreamer2_tpu.ops.g711 import alaw_decode
            codes = np.frombuffer(data, np.uint8).astype(np.int32)
            sig = np.asarray(alaw_decode(jnp.asarray(codes))
                             ).astype(np.float32) / 32768.0
        else:
            sig = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    else:
        raise ValueError(f"unsupported mkv audio codec {track.codec_id}")
    return sig, rate


class MediaRecorder:
    """WAV recorder fed by an external source callback (mic or graph)."""

    def __init__(self, factory, rate: int = 8000, max_seconds: int = 600):
        self.factory = factory
        self.rate = rate
        self.S = tick_samples(rate)
        max_ticks = max_seconds * 100
        g = GraphBuilder(factory, batch=1)
        src = g.add("ext_source", "mic", fmt=Format(rate=rate))
        g.link(src, 0, g.add("file_recorder", "rec", max_ticks=max_ticks), 0)
        self.graph = g.build()
        self.ticker = Ticker(self.graph, name="mediarecorder")
        self._pull_cb: Optional[Callable[[int], np.ndarray]] = None
        self.ticker.set_io(pull=self._pull)

        # optional video track: app pushes packed-I420 blocks; encoded VP8
        # at save time (msmediarecorder.c's A/V recording)
        self._video_frames: list = []       # [(ts_ms, block)]
        self._video_wh = None

    def set_input(self, cb: Callable[[int], np.ndarray]):
        self._pull_cb = cb

    def enable_video(self, width: int, height: int):
        from mediastreamer2_tpu.ops.vp8 import vp8_available
        if not vp8_available():
            raise RuntimeError("libvpx unavailable")
        self._video_wh = (width, height)

    def push_video_frame(self, block: np.ndarray):
        """Append one packed-I420 float block [h*3/2, w] at the current
        stream position."""
        assert self._video_wh is not None, "enable_video first"
        ts_ms = self.ticker.stats.ticks * 10
        self._video_frames.append((ts_ms, np.asarray(block)))

    def _pull(self, tick):
        if self._pull_cb is None:
            return {"mic": np.zeros((1, self.S), np.float32)}
        return {"mic": self._pull_cb(tick).reshape(1, self.S)}

    def start(self, n_ticks: int = 10 ** 9):
        self.ticker.warm_up()
        self.ticker.start(n_ticks)

    def run(self, n_ticks: int):
        self.ticker.warm_up()
        self.ticker.run(n_ticks)

    def stop_and_save(self, path: str):
        """Saves .wav (PCM16) or .mkv/.webm (Opus) by extension
        (cf. msmediarecorder.c wav/mkv)."""
        self.ticker.stop()
        n = int(np.asarray(self.ticker.state["rec"]["tick"]))
        from mediastreamer2_tpu.ops.fileio import recorder_get_audio
        audio = recorder_get_audio(self.ticker.state["rec"], n, self.S)[0]
        if path.lower().endswith((".mkv", ".webm")):
            write_av_mkv(path, audio, self.rate, self._video_frames,
                         self._video_wh)
        elif path.lower().endswith(".smff"):
            # the reference's 'Record .smff' case, in the wire-compatible
            # container (io/smff.py): pcm16 audio + optional VP8 video
            from mediastreamer2_tpu.io.smff import (SmffWriter, SmffTrack,
                                                    KIND_AUDIO, KIND_VIDEO)
            tracks = [SmffTrack(KIND_AUDIO, "pcm16", self.rate, 1)]
            if self._video_wh and self._video_frames:
                tracks.append(SmffTrack(KIND_VIDEO, "vp8",
                                        *self._video_wh))
            w = SmffWriter(path, tracks)
            F = self.rate // 100
            pcm = np.clip(audio * 32768.0, -32768, 32767).astype("<i2")
            for i in range(len(pcm) // F):
                w.write_frame(0, i * 10, pcm[i * F:(i + 1) * F].tobytes())
            if self._video_wh and self._video_frames:
                from mediastreamer2_tpu.ops.vp8 import Vp8Encoder
                vw, vh = self._video_wh
                venc = Vp8Encoder(vw, vh, fps=max(
                    1, len(self._video_frames) * 1000
                    // max(self._video_frames[-1][0] + 10, 10)))
                for k, (ts_ms, block) in enumerate(self._video_frames):
                    arr = (np.clip(block, 0, 1) * 255).astype(np.uint8)
                    y = arr[:vh]
                    uv = arr[vh:].reshape(vh // 2, 2, vw // 2)
                    data, key = venc.encode_planes(y, uv[:, 0], uv[:, 1],
                                                   force_keyframe=(k == 0))
                    if data:
                        w.write_frame(1, ts_ms, data, keyframe=key)
            w.close()
        else:
            write_wav(path, audio, self.rate)
        return path


def write_av_mkv(path: str, audio: np.ndarray, rate: int,
                 frames, wh: Optional[tuple]):
    """Shared A/V MKV writer: opus audio + optional VP8 video track from
    (ts_ms, packed-I420 float block) frames. Used by MediaRecorder and by
    the linked-video call recording (audio_stream_link_video role)."""
    from mediastreamer2_tpu.io.mkv import (MkvWriter, MkvTrack,
                                           TRACK_TYPE_AUDIO,
                                           TRACK_TYPE_VIDEO)
    from mediastreamer2_tpu.ops.host_codecs import OpusEncoder
    if rate not in (8000, 12000, 16000, 24000, 48000):
        raise ValueError("opus mkv needs an opus-compatible rate")
    enc = OpusEncoder(rate=rate)
    tracks = [MkvTrack(1, TRACK_TYPE_AUDIO, "A_OPUS",
                       sampling_rate=rate, channels=1)]
    if wh and frames:
        tracks.append(MkvTrack(2, TRACK_TYPE_VIDEO, "V_VP8",
                               width=wh[0], height=wh[1]))
    w = MkvWriter(path, tracks)
    F = rate // 100
    for i in range(len(audio) // F):
        w.write_frame(1, i * 10, enc.encode(audio[i * F:(i + 1) * F]))
    if wh and frames:
        from mediastreamer2_tpu.ops.vp8 import Vp8Encoder
        vw, vh = wh
        venc = Vp8Encoder(vw, vh, fps=max(
            1, len(frames) * 1000 // max(frames[-1][0] + 10, 10)))
        for k, (ts_ms, block) in enumerate(frames):
            arr = (np.clip(block, 0, 1) * 255).astype(np.uint8)
            y = arr[:vh]
            uv = arr[vh:].reshape(vh // 2, 2, vw // 2)
            data, key = venc.encode_planes(y, uv[:, 0], uv[:, 1],
                                           force_keyframe=(k == 0))
            if data:
                w.write_frame(2, ts_ms, data, keyframe=key)
    w.close()
