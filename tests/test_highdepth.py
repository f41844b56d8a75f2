"""High bit depth (10/12-bit) support.

The reference supports OD_BITDEPTH_MODE_8/10/12 (codec.h:192-201,
encode.c:257: output_bits = 8 + (mode-8)*2).  Our coeff domain
normalizes scale across depths (to_coeff shifts by 4 - (bitdepth-8)),
so quantizers/thresholds are depth-independent; MC and IO carry the
extra precision.
"""

import io

import numpy as np
import pytest

from daala_tpu.core.state import FrameInfo
from daala_tpu.io.y4m import Y4MHeader, Y4MReader, Y4MWriter
from daala_tpu.pipeline.inter import DecoderSession, EncoderSession


def _frames(w, h, bd, n=3, seed=9):
    rng = np.random.default_rng(seed)
    maxv = (1 << bd) - 1
    c = 1 << (bd - 1)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for t in range(n):
        y = (c + (c - c // 4) * np.sin(xx / 17 + t * 0.3)
             * np.cos(yy / 13)
             + rng.normal(0, maxv / 120, (h, w))).clip(0, maxv)
        y = y.astype(np.uint16 if bd > 8 else np.uint8)
        u = (y[::2, ::2] // 2 + c // 2).clip(0, maxv).astype(y.dtype)
        v = (maxv - y[::2, ::2] // 2).clip(0, maxv).astype(y.dtype)
        out.append([y, u, v])
    return out


@pytest.mark.parametrize("bd", [10, 12])
def test_highdepth_lossy_encoder_check(bd):
    frames = _frames(96, 64, bd)
    info = FrameInfo(96, 64, 3, (0, 1, 1), (0, 1, 1), bitdepth=bd)
    enc = EncoderSession(info, quality=22, b_frames=1, bs_luma=-1)
    dec = DecoderSession(info, bs_luma=-1)
    pkts = []
    for f in frames:
        pkts += enc.push_frame(f)
    pkts += enc.flush()
    maxv = (1 << bd) - 1
    for p in pkts:
        r = dec.decode_frame(p["data"], p["ftype"] == 0,
                             p.get("use_haar", False), p["ftype"])
        for a, b in zip(p["recon"], r):
            assert np.array_equal(a, b)
            assert b.dtype == np.uint16
        # Quality tracks the source at the full depth.
        src = frames[p["display_order"]][0]
        mse = ((src.astype(np.int64) - r[0]) ** 2).mean()
        assert 10 * np.log10(maxv ** 2 / max(mse, 1e-12)) > 34


def test_highdepth_lossless_exact():
    bd = 10
    frames = _frames(96, 64, bd, n=2)
    info = FrameInfo(96, 64, 3, (0, 1, 1), (0, 1, 1), bitdepth=bd)
    enc = EncoderSession(info, quality=0)
    dec = DecoderSession(info)
    for f in frames:
        for p in enc.push_frame([a.copy() for a in f]):
            r = dec.decode_frame(p["data"], True,
                                 p.get("use_haar", False))
            for a, b in zip(f, r):
                assert np.array_equal(a, b)


def test_y4m_p10_roundtrip():
    frames = _frames(32, 32, 10, n=2)
    hdr = Y4MHeader(width=32, height=32, colorspace="420", bitdepth=10)
    buf = io.BytesIO()
    w = Y4MWriter(buf, hdr)
    for f in frames:
        w.write_frame(f)
    buf.seek(0)
    r = Y4MReader(buf)
    assert r.header.bitdepth == 10
    assert r.header.colorspace == "420"
    got = list(r.frames())
    for fa, fb in zip(frames, got):
        for a, b in zip(fa, fb):
            assert b.dtype == np.dtype("<u2")
            assert np.array_equal(a, b)
