"""Stream container: info header + length-prefixed frame packets.

The reference emits three Ogg-style header packets (info/comment/setup,
infoenc.c:32-118) and leaves muxing to the app.  We provide the same
three logical headers in a simple self-contained container (".dtp"):

  magic "\\x80dtpu" | version | info fields | comment | setup(reserved)
  then per frame: u8 flags | u32 length | packet bytes

Frame flags: bit0 keyframe, bit1 use_haar(lossless), bits 2-3 bs_luma,
bit6 dres (integer-synthesis residual), bit7 gray_ref (predict from the
synthesized gray frame: a signaled random-access point),
bits 4-5 ftype, bit6 dres (device-residual integer-synthesis mode).
Packet classification helpers mirror daala_packet_isheader/iskeyframe
(src/info.c:24-60).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from ..core.state import FrameInfo

__all__ = ["write_stream", "read_stream", "FramePacket",
           "packet_is_keyframe"]

_MAGIC = b"\x80dtpu"
_VERSION = 1


@dataclass
class FramePacket:
    data: bytes
    keyframe: bool = True
    use_haar: bool = False
    bs_luma: int = 1
    # Frame type: 0 = I, 1 = P, 2 = B, 3 = golden P.
    ftype: int = 0
    # Display-order index (packets are stored in coding order; B-frames
    # come after their forward anchor, the granulepos analogue).
    display_order: int = 0
    # Device-residual integer-synthesis inter mode (pipeline dres flag).
    dres: bool = False
    # Predict from the synthesized gray reference instead of the
    # decoded one (od_dec_init_dummy_frame semantics, decode.c:239,
    # promoted to a signaled random-access point: a gray-ref P frame
    # starts a GOP with no intra machinery — the all-device encode's
    # keyframe substitute).
    gray_ref: bool = False


def packet_is_keyframe(flags: int) -> bool:
    return bool(flags & 1)


def _pack_info(info: FrameInfo) -> bytes:
    return struct.pack(
        "<IIBBBBIIIIH",
        info.pic_width, info.pic_height, info.nplanes,
        _pack_dec(info.xdec), _pack_dec(info.ydec), info.bitdepth,
        info.timebase_num, info.timebase_den,
        info.pixel_aspect_num, info.pixel_aspect_den,
        info.keyframe_rate,
    )


def _pack_dec(dec) -> int:
    v = 0
    for i, d in enumerate(dec):
        v |= (d & 3) << (2 * i)
    return v


def _unpack_dec(v: int, n: int):
    return tuple((v >> (2 * i)) & 3 for i in range(n))


def _unpack_info(buf: bytes) -> FrameInfo:
    (w, h, npl, xdec, ydec, depth, tn, td, an, ad, kr) = struct.unpack(
        "<IIBBBBIIIIH", buf)
    # Validate before anything downstream trusts these (the header
    # codec's infodec.c:99-188 rejects malformed headers the same way).
    if depth not in (8, 10, 12):
        raise ValueError(f"invalid bitdepth {depth}")
    if npl not in (1, 3):
        raise ValueError(f"invalid plane count {npl}")
    if not (0 < w <= 65536 and 0 < h <= 65536):
        raise ValueError("invalid frame dimensions")
    return FrameInfo(
        pic_width=w, pic_height=h, nplanes=npl,
        xdec=_unpack_dec(xdec, npl), ydec=_unpack_dec(ydec, npl),
        bitdepth=depth, timebase_num=tn, timebase_den=td,
        pixel_aspect_num=an, pixel_aspect_den=ad, keyframe_rate=kr,
    )


def write_stream(path: str, info: FrameInfo, packets: List[FramePacket],
                 comment: str = "daala_tpu") -> None:
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<B", _VERSION))
        ib = _pack_info(info)
        f.write(struct.pack("<H", len(ib)))
        f.write(ib)
        cb = comment.encode()
        f.write(struct.pack("<H", len(cb)))
        f.write(cb)
        # Setup header: stream-level coding config (the third logical
        # header, infoenc.c:32-118).  v1 payload: u8 qm select.  An
        # empty setup header (older streams) means qm=1 (HVS).
        if getattr(info, "qm", 1) != 1:
            sb = struct.pack("<B", info.qm & 0xff)
            f.write(struct.pack("<H", len(sb)))
            f.write(sb)
        else:
            f.write(struct.pack("<H", 0))
        for p in packets:
            flags = (1 if p.keyframe else 0) | ((1 if p.use_haar else 0) << 1) \
                | ((p.bs_luma & 3) << 2) | ((p.ftype & 3) << 4) \
                | ((1 if p.dres else 0) << 6) \
                | ((1 if p.gray_ref else 0) << 7)
            f.write(struct.pack("<BII", flags, p.display_order,
                                len(p.data)))
            f.write(p.data)


def read_stream(path: str) -> Tuple[FrameInfo, str, List[FramePacket]]:
    with open(path, "rb") as f:
        if f.read(5) != _MAGIC:
            raise ValueError("not a daala_tpu stream")
        (ver,) = struct.unpack("<B", f.read(1))
        if ver != _VERSION:
            raise ValueError(f"unsupported version {ver}")
        (ilen,) = struct.unpack("<H", f.read(2))
        info = _unpack_info(f.read(ilen))
        (clen,) = struct.unpack("<H", f.read(2))
        comment = f.read(clen).decode()
        (slen,) = struct.unpack("<H", f.read(2))
        setup = f.read(slen)
        if len(setup) >= 1:
            qm = setup[0]
            if qm not in (0, 1):
                raise ValueError(f"invalid qm select {qm}")
            info.qm = qm
        packets = []
        while True:
            hdr = f.read(9)
            if len(hdr) < 9:
                break
            flags, disp, plen = struct.unpack("<BII", hdr)
            packets.append(FramePacket(
                data=f.read(plen),
                keyframe=bool(flags & 1),
                use_haar=bool(flags & 2),
                bs_luma=(flags >> 2) & 3,
                ftype=(flags >> 4) & 3,
                display_order=disp,
                dres=bool(flags & 0x40),
                gray_ref=bool(flags & 0x80),
            ))
        return info, comment, packets
