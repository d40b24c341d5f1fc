"""VideoStreamBatch — session-level video call builder.

Reference: src/voip/videostream.c (send: source->pixconv->tee->sizeconv->
encoder->rtpsend :1559-1577; recv: rtprecv->decoder->tee2->display
:1766-1804; preview/snapshot branches, camera hot-swap :2046-2060).

TPU-native split:
* device graph: camera source (mire / static image / ext frames) ->
  pix/size conversion -> ext boundary (and the mirror on receive:
  ext frames -> size/pix conversion -> display sink / analyse).
* host: frame codec (passthrough "dummy" codec like the reference's
  MSDummyEnc for server paths, or a host library codec when present) +
  RTP fragmentation/reassembly (MTU-sized chunks, marker bit = end of
  frame — the RFC-payload role of vp8rtpfmt/h26x packers).

One frame per tick per leg (100 fps ceiling at the 10 ms tick); the host
feeds/repeats frames at camera cadence like MSVideoSource does.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from mediastreamer2_tpu.core.block import Format
from mediastreamer2_tpu.core.graph import GraphBuilder
from mediastreamer2_tpu.core.ticker import Ticker
from mediastreamer2_tpu.net.rtp import RtpSession, Transport
from mediastreamer2_tpu.models.qos import IFrameRequestLimiter, VideoStarter

VIDEO_PT = 97


class FrameCodec:
    """Host frame codec interface (cf. MSFilterVideoEncoder/Decoder
    interface).  encode(frame_bytes)->bytes; decode inverse.  The default
    passthrough matches the reference's MSDummyEnc/Dec (dummy_codec.c)."""

    name = "dummy"
    def encode(self, frame: bytes, keyframe: bool) -> bytes:
        return frame

    def decode(self, data: bytes) -> Optional[bytes]:
        return data


def fragment_frame(data: bytes, mtu: int) -> List[bytes]:
    """Split an encoded frame into MTU payloads; last gets the marker."""
    chunk = mtu - 16
    return [data[i:i + chunk] for i in range(0, max(len(data), 1), chunk)]


class FrameAssembler:
    """Reassemble fragments by timestamp; marker bit closes the frame
    (the generic half of vp8rtpfmt/h26x unpacker behavior)."""

    def __init__(self):
        self.parts: Dict[int, list] = {}
        self.completed: List[bytes] = []
        self.dropped_incomplete = 0

    def push(self, pkt):
        self.parts.setdefault(pkt.timestamp, []).append((pkt.seq, pkt.payload))
        if pkt.marker:
            parts = self.parts.pop(pkt.timestamp)
            parts.sort(key=lambda t: t[0])
            seqs = [s for s, _ in parts]
            if seqs == list(range(seqs[0], seqs[0] + len(seqs))):
                self.completed.append(b"".join(p for _, p in parts))
            else:
                self.dropped_incomplete += 1
        if len(self.parts) > 8:          # stale partial frames
            for ts in sorted(self.parts)[:-4]:
                del self.parts[ts]
                self.dropped_incomplete += 1

    def pop(self) -> Optional[bytes]:
        return self.completed.pop(0) if self.completed else None


@dataclasses.dataclass
class VideoStreamStats:
    frames_sent: int = 0
    frames_received: int = 0
    fir_sent: int = 0
    camera_fallbacks: int = 0


class VideoStreamBatch:
    """N video legs, one device program for the pixel path."""

    def __init__(self, factory, batch: int, fmt: Format = None,
                 out_fmt: Format = None, camera: str = "mire",
                 codec: Optional[FrameCodec] = None, mtu: int = 1400,
                 fps: float = 25.0, codec_factory=None):
        """codec_factory: callable() -> FrameCodec, one per leg (stateful
        codecs like VP8 need per-leg encoder/decoder instances)."""
        self.batch = batch
        self.fmt = fmt or Format(kind="yuv420", width=320, height=240, fps=fps)
        self.out_fmt = out_fmt or self.fmt
        if codec_factory is not None:
            self.codecs = [codec_factory() for _ in range(batch)]
        else:
            self.codecs = [codec or FrameCodec()] * batch
        self.codec = self.codecs[0]
        self.mtu = mtu
        self.fps = fps
        self.stats = [VideoStreamStats() for _ in range(batch)]
        self.fir_limiters = [IFrameRequestLimiter() for _ in range(batch)]
        self.starters = [VideoStarter() for _ in range(batch)]

        g = GraphBuilder(factory, batch=batch)
        # ---- send pixel path: camera -> sizeconv -> tx frames -------------
        if camera == "mire":
            cam = g.add("mire", "cam", fmt=self.fmt)
        else:
            cam = g.add("ext_source", "cam", fmt=self.fmt)
        sc = g.add("size_conv", "sizeconv",
                   out_w=self.out_fmt.width, out_h=self.out_fmt.height)
        g.link(cam, 0, sc, 0)
        tee = g.add("tee", "tx_tee")
        g.link(sc, 0, tee, 0)
        g.link(tee, 0, g.add("ext_sink", "tx_frames"), 0)
        g.link(tee, 1, g.add("void_sink", "preview"), 0)  # preview tap parity
        # ---- recv pixel path: rx frames -> display/analyse -----------------
        rx = g.add("ext_source", "rx_frames", fmt=self.out_fmt)
        ana = g.add("analyse_display", "display")
        g.link(rx, 0, ana, 0)
        self.graph = g.build()
        self.ticker = Ticker(self.graph, name=f"video[{batch}]")
        self.ticker.set_io(pull=self._pull, push=self._push)

        self.sessions: List[Optional[RtpSession]] = [None] * batch
        self.assemblers = [FrameAssembler() for _ in range(batch)]
        self._frame_shape = (self.out_fmt.height * 3 // 2, self.out_fmt.width)
        self._last_rx = np.zeros((batch,) + self._frame_shape, np.float32)
        self._tick_per_frame = max(1, int(round(100.0 / fps)))
        self._ts = 0
        # first frame of every leg is a keyframe; FIR sets this too
        self._force_kf = [True] * batch
        # dead-camera watchdog (ext-camera mode)
        self._cam_frames = [None] * batch
        self._cam_last_tick = [0] * batch
        self._cam_dead = [False] * batch
        self._static_fallback = None

    CAMERA_DEAD_TICKS = 100      # 1 s without frames => camera presumed dead

    def request_keyframe(self, leg: int):
        """cf. MS_VIDEO_ENCODER_REQ_VFU / FIR handling."""
        self._force_kf[leg] = True

    def snapshot(self, leg: int, path: str, which: str = "recv"):
        """Save the last received (or sent) frame as JPEG
        (cf. MSJpegWriter snapshot branch, videostream.c local_jpegwriter)."""
        from PIL import Image
        from mediastreamer2_tpu.ops.video import yuv420_to_rgb
        frame = self._last_rx[leg:leg + 1]
        rgb = np.asarray(yuv420_to_rgb(frame, self.out_fmt.width,
                                       self.out_fmt.height))[0]
        Image.fromarray((rgb * 255).astype(np.uint8)).save(path, "JPEG")
        return path

    def set_transport(self, leg: int, transport: Transport):
        self.sessions[leg] = RtpSession(transport, payload_type=VIDEO_PT,
                                        clock_rate=90000)
        self.sessions[leg].jitter_buffer = None
        self.starters[leg].activate()

    # -- host frame <-> bytes --------------------------------------------
    def _frame_to_bytes(self, frame: np.ndarray) -> bytes:
        return (np.clip(frame, 0, 1) * 255).astype(np.uint8).tobytes()

    def _bytes_to_frame(self, data: bytes) -> Optional[np.ndarray]:
        n = self._frame_shape[0] * self._frame_shape[1]
        if len(data) != n:
            return None
        return (np.frombuffer(data, np.uint8).astype(np.float32) / 255.0
                ).reshape(self._frame_shape)

    def feed_camera_frame(self, leg: int, frame: np.ndarray):
        """External camera push (ext-camera mode). Resets the dead-camera
        watchdog for the leg."""
        self._cam_frames[leg] = frame
        self._cam_last_tick[leg] = self.ticker.stats.ticks

    def _camera_block(self, tick: int) -> np.ndarray:
        """Dead-camera detection + static-image fallback (reference:
        videostream.c dead_camera_check -> nowebcam substitution)."""
        shape = self.graph.ext_inputs["cam"][0][1:]
        out = np.zeros((self.batch,) + shape, np.float32)
        for i in range(self.batch):
            if tick - self._cam_last_tick[i] > self.CAMERA_DEAD_TICKS:
                if not self._cam_dead[i]:
                    self._cam_dead[i] = True
                    self.stats[i].camera_fallbacks += 1
                out[i] = self._fallback_frame(shape)
            elif self._cam_frames[i] is not None:
                self._cam_dead[i] = False
                out[i] = self._cam_frames[i]
        return out

    def _fallback_frame(self, shape):
        if self._static_fallback is None:
            # mid-grey "no webcam" card (nowebcam.c role)
            f = np.full(shape, 0.5, np.float32)
            f[: shape[0] * 2 // 3: 8] = 0.8          # stripes so it's visible
            self._static_fallback = f
        return self._static_fallback

    def _pull(self, tick: int) -> Dict[str, np.ndarray]:
        for i, sess in enumerate(self.sessions):
            if sess is None:
                continue
            sess.poll()
        ext = {"rx_frames": self._last_rx}
        if "cam" in self.graph.ext_inputs:
            ext["cam"] = self._camera_block(tick)
        return ext

    def _push(self, tick: int, ext_out: Dict):
        send_now = (tick % self._tick_per_frame) == 0
        frames = np.asarray(ext_out["tx_frames"])
        if send_now:
            self._ts += 90000 // int(self.fps)
            for i, sess in enumerate(self.sessions):
                if sess is None:
                    continue
                data = self.codecs[i].encode(self._frame_to_bytes(frames[i]),
                                             keyframe=self._force_kf[i])
                self._force_kf[i] = False
                chunks = fragment_frame(data, self.mtu)
                for k, c in enumerate(chunks):
                    sess.ts = self._ts
                    pkt_marker = (k == len(chunks) - 1)
                    sess.send_payload(c, ts_increment=0, marker=pkt_marker)
                self.stats[i].frames_sent += 1
        # reassembly (poll already drained into on_packet? we use manual)
        for i, sess in enumerate(self.sessions):
            if sess is None:
                continue
            frame = self.assemblers[i].pop()
            if frame is not None:
                decoded = self.codecs[i].decode(frame)
                f = self._bytes_to_frame(decoded) if decoded else None
                if f is not None:
                    self._last_rx[i] = f
                    self.stats[i].frames_received += 1
                    self.starters[i].on_frame_decoded()
            # freeze-on-error + FIR policy (cf. videostream decoder error cb)
            if self.starters[i].need_iframe() and self.fir_limiters[i].request_allowed():
                self.stats[i].fir_sent += 1      # RTCP FIR emission point

    def bind_assemblers(self):
        """Wire RTP on_packet to the frame assemblers (call after
        set_transport for all legs)."""
        for i, sess in enumerate(self.sessions):
            if sess is not None:
                sess.on_packet = self.assemblers[i].push

    def start(self, n_ticks: int = 10 ** 9):
        self.ticker.warm_up()
        self.ticker.start(n_ticks)

    def run(self, n_ticks: int):
        self.ticker.warm_up()
        self.ticker.run(n_ticks)

    def stop(self):
        self.ticker.stop()
