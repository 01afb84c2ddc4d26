"""Y4M (YUV4MPEG2) reader/writer — the raw ingest path of the framework.

The reference delegated all decode to ffmpeg; this framework ingests raw
Y4M/YUV natively (and optionally arbitrary containers through the linked
libavformat harness, hevc_tpu.validate.avref).
"""
from __future__ import annotations

from fractions import Fraction
from pathlib import Path

import numpy as np


class Y4MReader:
    def __init__(self, path):
        self.path = Path(path)
        self._f = open(self.path, "rb")
        header = self._f.readline().decode("ascii", "replace").strip()
        if not header.startswith("YUV4MPEG2"):
            raise ValueError("not a Y4M file")
        self.width = self.height = 0
        self.fps = Fraction(30, 1)
        self.interlace = "p"
        self.colorspace = "420"
        self.aspect = (0, 0)
        for tok in header.split()[1:]:
            k, v = tok[0], tok[1:]
            if k == "W":
                self.width = int(v)
            elif k == "H":
                self.height = int(v)
            elif k == "F":
                num, den = v.split(":")
                self.fps = Fraction(int(num), int(den))
            elif k == "I":
                self.interlace = v
            elif k == "C":
                self.colorspace = v
            elif k == "A":
                a = v.split(":")
                self.aspect = (int(a[0]), int(a[1]))
        if not self.colorspace.startswith("420"):
            raise NotImplementedError(f"Y4M colorspace {self.colorspace}")
        # bit depth from the colorspace tag: C420p10 / C420p12 (little-endian
        # 16-bit samples); plain C420/C420mpeg2/C420jpeg are 8-bit
        self.bit_depth = 8
        if "p10" in self.colorspace:
            self.bit_depth = 10
        elif "p12" in self.colorspace:
            self.bit_depth = 12
        bpp = 1 if self.bit_depth == 8 else 2
        self._bpp = bpp
        self._fsz = self.width * self.height * 3 // 2 * bpp

    def __iter__(self):
        return self

    def __next__(self):
        line = self._f.readline()
        if not line:
            raise StopIteration
        if not line.startswith(b"FRAME"):
            raise ValueError("bad Y4M frame header")
        data = self._f.read(self._fsz)
        if len(data) < self._fsz:
            raise StopIteration
        w, h = self.width, self.height
        dt = np.uint8 if self._bpp == 1 else np.dtype("<u2")
        buf = np.frombuffer(data, dtype=dt)
        y = buf[:w * h].reshape(h, w)
        cb = buf[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
        cr = buf[w * h + w * h // 4:].reshape(h // 2, w // 2)
        return y, cb, cr

    def read_all(self, max_frames: int = 1 << 30):
        out = []
        for i, f in enumerate(self):
            if i >= max_frames:
                break
            out.append(f)
        return out

    def count_frames(self) -> int:
        import os
        pos = self._f.tell()
        self._f.seek(0, os.SEEK_END)
        end = self._f.tell()
        self._f.seek(pos)
        # frame payload + b"FRAME\n" per frame after the header line
        per = self._fsz + 6
        with open(self.path, "rb") as f:
            hdr = len(f.readline())
        return max(0, (end - hdr) // per)

    def close(self):
        self._f.close()


def write_y4m(path, frames, fps=Fraction(30, 1), bit_depth: int = 8) -> None:
    h, w = frames[0][0].shape
    cs = {8: "C420mpeg2", 10: "C420p10", 12: "C420p12"}[bit_depth]
    dt = np.uint8 if bit_depth == 8 else np.dtype("<u2")
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F{fps.numerator}:{fps.denominator} "
                f"Ip A1:1 {cs}\n".encode())
        for (y, cb, cr) in frames:
            f.write(b"FRAME\n")
            f.write(np.asarray(y, dtype=dt).tobytes())
            f.write(np.asarray(cb, dtype=dt).tobytes())
            f.write(np.asarray(cr, dtype=dt).tobytes())
