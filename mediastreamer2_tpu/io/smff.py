"""SMFF — simple media file format (role parity with the reference's
in-house container, src/videofilters/smff/: opus/AV1/H26x/VP8 record &
playback with minimal overhead).

Format (little-endian, framework-defined):
  magic 'SMF1' | u16 n_tracks | per track: u8 kind(0=audio,1=video),
  u8 codec_len, codec bytes, u32 rate_or_width, u32 ch_or_height
  then frame records: u16 track | u8 flags(bit0 keyframe) | u32 ts_ms |
  u32 size | payload
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Iterator, List

MAGIC = b"SMF1"
KIND_AUDIO, KIND_VIDEO = 0, 1


@dataclasses.dataclass
class SmffTrack:
    kind: int
    codec: str
    a: int = 0          # rate (audio) / width (video)
    b: int = 0          # channels (audio) / height (video)


@dataclasses.dataclass
class SmffFrame:
    track: int
    ts_ms: int
    data: bytes
    keyframe: bool = True


class SmffWriter:
    def __init__(self, path: str, tracks: List[SmffTrack]):
        self.f = open(path, "wb")
        self.f.write(MAGIC + struct.pack("<H", len(tracks)))
        for t in tracks:
            c = t.codec.encode()
            self.f.write(struct.pack("<BB", t.kind, len(c)) + c
                         + struct.pack("<II", t.a, t.b))

    def write_frame(self, track: int, ts_ms: int, data: bytes,
                    keyframe: bool = True):
        self.f.write(struct.pack("<HBII", track, 1 if keyframe else 0,
                                 ts_ms, len(data)))
        self.f.write(data)

    def close(self):
        self.f.close()


class SmffReader:
    def __init__(self, path: str):
        self.f = open(path, "rb")
        if self.f.read(4) != MAGIC:
            raise ValueError("not an SMFF file")
        n = struct.unpack("<H", self.f.read(2))[0]
        self.tracks: List[SmffTrack] = []
        for _ in range(n):
            kind, cl = struct.unpack("<BB", self.f.read(2))
            codec = self.f.read(cl).decode()
            a, b = struct.unpack("<II", self.f.read(8))
            self.tracks.append(SmffTrack(kind, codec, a, b))
        self._start = self.f.tell()

    def frames(self, from_ms: int = 0) -> Iterator[SmffFrame]:
        self.f.seek(self._start)
        while True:
            hdr = self.f.read(11)
            if len(hdr) < 11:
                return
            track, flags, ts, size = struct.unpack("<HBII", hdr)
            data = self.f.read(size)
            if ts >= from_ms:
                yield SmffFrame(track, ts, data, bool(flags & 1))
