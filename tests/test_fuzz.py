"""Structured stream-mutation corpus: every stream mode's decode path
must survive arbitrary corruption without raising (entdec error-flag
semantics, decode.c resilience: clamps + dummy refs), and the container
reader must fail only in controlled ways."""

import numpy as np
import pytest

from daala_tpu.core.state import FrameInfo


def _planes(h, w, seed=0, depth=8):
    rng = np.random.default_rng(seed)
    hi = (1 << depth) - 1
    y = (rng.integers(0, hi + 1, (h, w))).astype(
        np.uint8 if depth <= 8 else np.uint16)
    u = y[::2, ::2] // 2
    v = hi - u
    return [y, u, v]


def _mutate(data: bytearray, rng, trial):
    mode = trial % 5
    if len(data) < 4:
        return data
    if mode == 0:      # sparse bit flips
        for _ in range(1 + trial % 7):
            data[int(rng.integers(0, len(data)))] ^= int(
                rng.integers(1, 256))
    elif mode == 1:    # truncate
        data = data[:int(rng.integers(0, len(data)))]
    elif mode == 2:    # header / tile-table burst
        for i in range(min(12, len(data))):
            if rng.random() < 0.6:
                data[i] = int(rng.integers(0, 256))
    elif mode == 3:    # splice a chunk from elsewhere in the packet
        a = int(rng.integers(0, len(data)))
        b = int(rng.integers(0, len(data)))
        n = int(rng.integers(1, 16))
        data[a:a + n] = data[b:b + n]
    else:              # extend with noise
        data += bytes(rng.integers(0, 256, 16).astype(np.uint8))
    return data


def _fuzz_stream(info, outs, trials=40, **dec_kw):
    from daala_tpu.pipeline.inter import DecoderSession

    rng = np.random.default_rng(7)
    for trial in range(trials):
        dec = DecoderSession(info, **dec_kw)
        for o in outs:
            data = _mutate(bytearray(o["data"]), rng, trial)
            dec.decode_frame(bytes(data), o["ftype"] == 0,
                             use_haar=o.get("use_haar", False),
                             ftype=o["ftype"],
                             dres=bool(o.get("dres")))  # must not raise


def _encode(info, frames, **kw):
    from daala_tpu.pipeline.inter import EncoderSession

    sess = EncoderSession(info, kw.pop("quality", 28), **kw)
    outs = []
    for f in frames:
        outs += sess.push_frame(f)
    outs += sess.flush()
    return outs


def test_fuzz_inter_stream():
    info = FrameInfo(pic_width=64, pic_height=64)
    outs = _encode(info, [_planes(64, 64, s) for s in range(3)])
    _fuzz_stream(info, outs)


def test_fuzz_dres_stream():
    info = FrameInfo(pic_width=64, pic_height=64)
    outs = _encode(info, [_planes(64, 64, s) for s in range(3)],
                   dres=True)
    _fuzz_stream(info, outs)


def test_fuzz_bframes_tiles():
    info = FrameInfo(pic_width=64, pic_height=128)
    outs = _encode(info, [_planes(128, 64, s) for s in range(5)],
                   b_frames=2, tiles=2)
    _fuzz_stream(info, outs, trials=30)


def test_fuzz_lossless():
    info = FrameInfo(pic_width=64, pic_height=64)
    outs = _encode(info, [_planes(64, 64, 1)], quality=0)
    _fuzz_stream(info, outs, trials=25)


def test_fuzz_highdepth():
    info = FrameInfo(pic_width=64, pic_height=64, bitdepth=10)
    outs = _encode(info, [_planes(64, 64, 2, depth=10)])
    _fuzz_stream(info, outs, trials=25)


def test_fuzz_container():
    """Mutated .dtp files: read_stream either parses or raises a
    controlled error type; whatever parses must decode without
    crashing."""
    import io as _io
    import os
    import tempfile

    from daala_tpu.io.container import FramePacket, read_stream, \
        write_stream
    from daala_tpu.pipeline.inter import DecoderSession

    info = FrameInfo(pic_width=64, pic_height=64)
    outs = _encode(info, [_planes(64, 64, s) for s in range(2)])
    pkts = [FramePacket(data=o["data"], keyframe=o["ftype"] == 0,
                        ftype=o["ftype"],
                        display_order=o["display_order"]) for o in outs]
    fd, path = tempfile.mkstemp(suffix=".dtp")
    os.close(fd)
    try:
        write_stream(path, info, pkts)
        blob = open(path, "rb").read()
        rng = np.random.default_rng(11)
        for trial in range(60):
            data = _mutate(bytearray(blob), rng, trial)
            with open(path, "wb") as f:
                f.write(bytes(data))
            try:
                rinfo, _, rpkts = read_stream(path)
            except (ValueError, EOFError, OSError, _io.UnsupportedOperation):
                continue    # controlled parse failure
            if (rinfo.pic_width * rinfo.pic_height > 1 << 22
                    or rinfo.nplanes not in (1, 3)):
                continue    # absurd dims: the CLI would refuse
            dec = DecoderSession(rinfo)
            for p in rpkts[:4]:
                dec.decode_frame(p.data, p.keyframe,
                                 use_haar=p.use_haar, ftype=p.ftype,
                                 dres=p.dres)
    finally:
        os.unlink(path)
