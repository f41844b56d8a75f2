"""END-TO-END device-encoder session throughput at 1080p.

Times DeviceEncoderSession.encode_clip on the real chip: device
compute + symbol fetch over the (tunneled) link + host entropy pack,
pipelined as in production (device runs chunk N+1 while the host packs
chunk N).  Complements bench.py (device self-time): this is the number
a user of the session actually sees, and the round-4 on-device symbol
compaction (int8 pulse tensors with an exact-escape counter) attacks
its transfer term directly.

    python -m tools.e2e_bench [--frames 17] [--q 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--q", type=int, default=30)
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--w", type=int, default=1920)
    args = ap.parse_args()

    from daala_tpu.core.state import FrameInfo
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession

    h, w, t = args.h, args.w, args.frames
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h + 2 * t + 8, w + 4 * t + 8),
                        dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 2 * t + 8, 0:w + 4 * t + 8]
    base = ((base // 4) + (yy + 2 * xx) % 180).astype(np.uint8)
    frames = []
    for i in range(t):
        y = base[2 * i:2 * i + h, 4 * i:4 * i + w]
        u = y[::2, ::2] // 2 + 60
        frames.append([y, u, 220 - u])

    info = FrameInfo(pic_width=w, pic_height=h, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1),
                     keyframe_rate=256)
    sess = DeviceEncoderSession(info, quality=args.q, chunk=8)
    # warm-up pass over the SAME clip so every chunk length the timed
    # pass uses is already compiled (a shorter warm-up leaves the
    # final partial-chunk scan to compile inside the timing).
    sess.encode_clip(frames)
    t0 = time.perf_counter()
    pkts = sess.encode_clip(frames)
    dt = time.perf_counter() - t0
    nbytes = sum(len(p["data"]) for p in pkts)
    print(f"e2e: {t} frames in {dt:.2f}s = {t / dt:.2f} fps "
          f"({nbytes} bytes packed)")


if __name__ == "__main__":
    main()
