"""Texture-intra isolator re-measure (RDCOMP third clip): 1/f-texture
keyframe, ours vs the built reference, matched rate — the clip that
carried the small-K codeword-efficiency gap now traced to the k-rule
C-integer-division misread (tools/search_compare.py).

    JAX_PLATFORMS=cpu python tools/texture_iso.py [-q 30 26 22]
"""

import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def texture_clip(n=2, W=352, H=288, seed=7, pan=2):
    rng = np.random.default_rng(seed)
    fy = np.fft.fftfreq(H * 2)[:, None]
    fx = np.fft.fftfreq(W * 2)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1
    spec = (rng.normal(size=(H * 2, W * 2))
            + 1j * rng.normal(size=(H * 2, W * 2))) / f
    tex = np.real(np.fft.ifft2(spec))
    tex = ((tex - tex.min()) / (tex.max() - tex.min()) * 255)
    frames = []
    for t in range(n):
        y = tex[:H, t * pan:t * pan + W].astype(np.uint8)
        u = (y[::2, ::2] // 2 + 64).astype(np.uint8)
        v = (200 - y[::2, ::2] // 2).astype(np.uint8)
        frames.append([y, u, v])
    return frames


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255.0 ** 2 / max((d * d).mean(), 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-q", type=int, nargs="+", default=[30, 26, 22])
    ap.add_argument("--refq", type=int, nargs="+",
                    default=[18, 25, 35])
    args = ap.parse_args()
    frames = texture_clip(1)
    H, W = frames[0][0].shape

    # Reference intra-only (keyframe rate 1, 1 frame).
    yuv = b"".join(np.ascontiguousarray(p).tobytes()
                   for p in frames[0])
    open("/tmp/texiso.yuv", "wb").write(yuv)
    for rq in args.refq:
        out = subprocess.run(
            ["/tmp/refbuild/rdref", "/tmp/texiso.yuv", str(W), str(H),
             "1", str(rq), "0", "1"],
            capture_output=True, text=True)
        print("ref  q%-3d %s" % (rq, out.stdout.strip().splitlines()[-1]
                                 if out.stdout.strip() else out.stderr))

    from daala_tpu.core.state import FrameInfo
    from daala_tpu.pipeline.intra import decode_keyframe, encode_keyframe

    info = FrameInfo(pic_width=W, pic_height=H, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1), bitdepth=8,
                     keyframe_rate=1)
    for q in args.q:
        pkt = encode_keyframe(frames[0], info, q, use_masking=False,
                              bs_luma=-1, use_dering=True)
        rec = decode_keyframe(pkt, info)
        print("ours q%-3d %6d B  %.2f dB"
              % (q, len(pkt), psnr(frames[0][0], rec[0])))


if __name__ == "__main__":
    main()
