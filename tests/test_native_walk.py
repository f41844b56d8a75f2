"""Native inter symbol walk vs the Python band path.

The C++ tile walk (native/ec.cpp dtpu_inter_walk + dtpu_pvq_synth_batch,
bound in pvq/native_walk.py) must produce byte-identical packets and
pixel-identical reconstructions to the per-block Python path in
pipeline/inter.py / pvq/coding.py, and the encoder reconstruction must
equal the decoder output (the reference's --enable-encoder-check
invariant, encode.c:3204-3243).
"""

import os

import numpy as np
import pytest

from daala_tpu.core.state import FrameInfo
from daala_tpu.pipeline.inter import DecoderSession, EncoderSession
from daala_tpu.pvq import native_walk


def _clip(seed, w, h, n):
    rng = np.random.default_rng(seed)

    def smooth(a, it=2):
        a = a.astype(np.float32)
        for _ in range(it):
            a = (a + np.roll(a, 1, 0) + np.roll(a, -1, 0)
                 + np.roll(a, 1, 1) + np.roll(a, -1, 1)) / 5
        return a

    base = [
        np.clip(smooth(rng.integers(0, 256, (h, w))), 0, 255)
        .astype(np.uint8),
        np.clip(smooth(rng.integers(0, 256, (h // 2, w // 2))), 0, 255)
        .astype(np.uint8),
        np.clip(smooth(rng.integers(0, 256, (h // 2, w // 2))), 0, 255)
        .astype(np.uint8),
    ]
    return [
        [np.roll(p, 2 * i >> (0 if j == 0 else 1), axis=1)
         for j, p in enumerate(base)]
        for i in range(n)
    ]


def _session(frames, w, h, quality, b_frames=0, tiles=1):
    info = FrameInfo(pic_width=w, pic_height=h)
    sess = EncoderSession(info, quality, bs_luma=-1, b_frames=b_frames,
                          tiles=tiles)
    out = []
    for fr in frames:
        out += sess.push_frame(fr)
    out += sess.flush()
    dec = DecoderSession(info, bs_luma=-1)
    drecs = [
        dec.decode_frame(p["data"], p["ftype"] == 0,
                         p.get("use_haar", False), ftype=p["ftype"])
        for p in out
    ]
    return out, drecs


@pytest.mark.skipif(not native_walk.available(),
                    reason="native walk not built")
@pytest.mark.parametrize("quality,b_frames,tiles",
                         [(22, 0, 1), (30, 2, 1), (14, 0, 2)])
def test_native_walk_matches_python(quality, b_frames, tiles):
    w, h = 128, 96
    frames = _clip(quality, w, h, 5)
    out1, dec1 = _session(frames, w, h, quality, b_frames, tiles)
    os.environ["DTPU_PY_WALK"] = "1"
    try:
        out2, dec2 = _session(frames, w, h, quality, b_frames, tiles)
    finally:
        os.environ.pop("DTPU_PY_WALK")
    assert len(out1) == len(out2)
    for a, b in zip(out1, out2):
        assert a["data"] == b["data"]
        for x, y in zip(a["recon"], b["recon"]):
            assert np.array_equal(x, y)
    # encoder-check invariant on the native path
    for p, r in zip(out1, dec1):
        for x, y in zip(p["recon"], r):
            assert np.array_equal(x, y)
