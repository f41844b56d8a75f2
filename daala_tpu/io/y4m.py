"""YUV4MPEG2 reader/writer (the codec's frame IO format).

Functional parity with the y4m handling in the reference's example apps
(examples/encoder_example.c, examples/dump_video.c): 8-bit 4:2:0 / 4:2:2
/ 4:4:4 / mono, streaming frame access.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

__all__ = ["Y4MReader", "Y4MWriter", "read_y4m", "write_y4m"]

_SUBSAMPLING = {
    "420": ((0, 1, 1), (0, 1, 1)),
    "420jpeg": ((0, 1, 1), (0, 1, 1)),
    "420mpeg2": ((0, 1, 1), (0, 1, 1)),
    "422": ((0, 1, 1), (0, 0, 0)),
    "444": ((0, 0, 0), (0, 0, 0)),
    "mono": ((0,), (0,)),
}


@dataclass
class Y4MHeader:
    width: int
    height: int
    fps_num: int = 30
    fps_den: int = 1
    aspect_num: int = 0
    aspect_den: int = 0
    interlace: str = "p"
    colorspace: str = "420"
    bitdepth: int = 8

    @property
    def xdec(self):
        return _SUBSAMPLING[self.colorspace][0]

    @property
    def ydec(self):
        return _SUBSAMPLING[self.colorspace][1]

    @property
    def nplanes(self):
        return len(self.xdec)


class Y4MReader:
    def __init__(self, f):
        self.f = f
        line = b""
        while not line.endswith(b"\n"):
            ch = f.read(1)
            if not ch:
                raise ValueError("truncated y4m header")
            line += ch
        if not line.startswith(b"YUV4MPEG2"):
            raise ValueError("not a y4m stream")
        hdr = Y4MHeader(0, 0)
        for tok in line.decode().split()[1:]:
            k, v = tok[0], tok[1:]
            if k == "W":
                hdr.width = int(v)
            elif k == "H":
                hdr.height = int(v)
            elif k == "F":
                n, d = v.split(":")
                hdr.fps_num, hdr.fps_den = int(n), int(d)
            elif k == "A":
                n, d = v.split(":")
                hdr.aspect_num, hdr.aspect_den = int(n), int(d)
            elif k == "I":
                hdr.interlace = v
            elif k == "C":
                # High-depth tags: C420p10 / C444p12 etc.
                if "p10" in v:
                    hdr.bitdepth = 10
                elif "p12" in v:
                    hdr.bitdepth = 12
                hdr.colorspace = v.split("p")[0] if v[0].isdigit() else v
                if v.startswith("mono"):
                    hdr.colorspace = "mono"
                elif v[:3] in ("420", "422", "444"):
                    hdr.colorspace = v[:3] if v[:3] != "420" else (
                        v if v in _SUBSAMPLING else "420")
        self.header = hdr

    def frames(self) -> Iterator[List[np.ndarray]]:
        hdr = self.header
        while True:
            line = b""
            while not line.endswith(b"\n"):
                ch = self.f.read(1)
                if not ch:
                    return
                line += ch
            if not line.startswith(b"FRAME"):
                raise ValueError("bad frame marker")
            planes = []
            nb = 2 if hdr.bitdepth > 8 else 1
            dt = np.dtype("<u2") if nb == 2 else np.uint8
            for pli in range(hdr.nplanes):
                w = hdr.width >> hdr.xdec[pli]
                h = hdr.height >> hdr.ydec[pli]
                data = self.f.read(w * h * nb)
                if len(data) != w * h * nb:
                    raise ValueError("truncated frame")
                planes.append(
                    np.frombuffer(data, dtype=dt).reshape(h, w))
            yield planes


class Y4MWriter:
    def __init__(self, f, header: Y4MHeader):
        self.f = f
        self.header = header
        cs = header.colorspace
        tag = {"420": "420jpeg", "422": "422", "444": "444",
               "mono": "mono"}.get(cs, cs)
        if header.bitdepth > 8:
            base = {"420": "420", "422": "422", "444": "444",
                    "mono": "mono"}.get(cs, cs)
            tag = f"{base}p{header.bitdepth}"
        line = f"YUV4MPEG2 W{header.width} H{header.height} " \
               f"F{header.fps_num}:{header.fps_den} I{header.interlace} " \
               f"A{header.aspect_num}:{header.aspect_den} C{tag}\n"
        f.write(line.encode())

    def write_frame(self, planes: List[np.ndarray]) -> None:
        self.f.write(b"FRAME\n")
        dt = np.dtype("<u2") if self.header.bitdepth > 8 else np.uint8
        for p in planes:
            self.f.write(np.ascontiguousarray(p, dtype=dt).tobytes())


def read_y4m(path: str) -> Tuple[Y4MHeader, List[List[np.ndarray]]]:
    with open(path, "rb") as f:
        r = Y4MReader(f)
        return r.header, list(r.frames())


def write_y4m(path: str, header: Y4MHeader, frames) -> None:
    with open(path, "wb") as f:
        w = Y4MWriter(f, header)
        for fr in frames:
            w.write_frame(fr)
