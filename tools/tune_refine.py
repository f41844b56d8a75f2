"""Tune the rate-aware mesh-refinement lambda on the warp clip.

Encodes /tmp/cmp.y4m (RDCOMP.md protocol: low-delay, single keyframe,
no masking, dering on) at the low-rate tail quantizers for a sweep of
DTPU_REFINE_LAM values and prints bytes + PSNR-Y, to be compared with
the reference ladder (tools/refbench/rdref) and RDCOMP.md's recorded
round-1 points.

    JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
        python tools/tune_refine.py --lams 0.5,1.0,2.0 --qs 40,44,48
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def psnr(a, b):
    e = (a.astype(np.float64) - b.astype(np.float64)) ** 2
    m = e.mean()
    return 10 * np.log10(255 ** 2 / m)


def run_point(frames, q, bs):
    from daala_tpu.core.state import FrameInfo
    from daala_tpu.pipeline.inter import DecoderSession, EncoderSession

    H, W = frames[0][0].shape
    info = FrameInfo(pic_width=W, pic_height=H, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1), keyframe_rate=256)
    enc = EncoderSession(info, q, bs_luma=bs, keyframe_rate=256)
    dec = DecoderSession(info, bs_luma=bs)
    nbytes = 0
    outs = {}
    for planes in frames:
        for p in enc.push_frame(planes):
            nbytes += len(p["data"])
            outs[p["display_order"]] = dec.decode_frame(
                p["data"], p["ftype"] == 0,
                p.get("use_haar", False), p["ftype"])
    for p in enc.flush():
        nbytes += len(p["data"])
        outs[p["display_order"]] = dec.decode_frame(
            p["data"], p["ftype"] == 0,
            p.get("use_haar", False), p["ftype"])
    ys = np.stack([f[0] for f in frames])
    ry = np.stack([outs[i][0] for i in range(len(frames))])
    return nbytes, psnr(ys, ry)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qs", default="40,44,48")
    ap.add_argument("--lams", default="1.0")
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--clip", default="/tmp/cmp.y4m")
    args = ap.parse_args()

    from daala_tpu.io.y4m import Y4MReader

    with open(args.clip, "rb") as f:
        frames = list(Y4MReader(f).frames())
    for lam in args.lams.split(","):
        os.environ["DTPU_REFINE_LAM"] = lam
        for q in args.qs.split(","):
            b, p = run_point(frames, int(q), args.bs)
            print(f"lam {lam:>5s} q {q:>3s}: {b:7d} B  {p:6.2f} dB",
                  flush=True)


if __name__ == "__main__":
    main()
