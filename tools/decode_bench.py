"""Decode-side throughput measurement (VERDICT round-4 missing #5).

Encodes a 1080p-class clip with the device session (or host fallback),
then times the stock host decoder (DecoderSession: python walk driver
over the C++ entropy spine) over the packets.  Prints one JSON line:

    {"metric": "inter_1080p_host_decode_fps", ...}

Usage: python -m tools.decode_bench [--height 1088 --width 1920]
       [--frames 16] [--quality 30] [--host-encode] [--tile-jobs N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def clip(h, w, t, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 2 * t + 32, w + 4 * t + 32),
                        dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 2 * t + 32, 0:w + 4 * t + 32]
    base = ((base // 4) + (yy + 2 * xx) % 180).astype(np.uint8)
    frames = []
    for i in range(t):
        y = base[2 * i:2 * i + h, 4 * i:4 * i + w]
        u = y[::2, ::2] // 2 + 60
        v = 220 - u
        frames.append([y, u, v])
    return frames


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--quality", type=int, default=30)
    ap.add_argument("--host-encode", action="store_true",
                    help="encode with the host EncoderSession instead "
                         "of the device session")
    ap.add_argument("--tile-jobs", type=int, default=1,
                    help="parallel tile decode workers")
    args = ap.parse_args(argv)

    import os
    import sys as _s

    _s.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from daala_tpu.core.state import FrameInfo
    from daala_tpu.pipeline.inter import DecoderSession

    h, w, t = args.height, args.width, args.frames
    frames = clip(h, w, t)
    info = FrameInfo(pic_width=w, pic_height=h, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1), bitdepth=8,
                     keyframe_rate=t)
    if args.host_encode:
        from daala_tpu.pipeline.inter import EncoderSession

        enc = EncoderSession(info, args.quality, dres=True)
        pkts = []
        for f in frames:
            pkts += enc.push_frame(f)
        pkts += enc.flush()
    else:
        from daala_tpu.pipeline.device_encode import \
            DeviceEncoderSession

        enc = DeviceEncoderSession(info, quality=args.quality)
        pkts = enc.encode_clip(frames)
    nbytes = sum(len(p["data"]) for p in pkts)

    dec = DecoderSession(info, tile_workers=args.tile_jobs)
    t0 = time.perf_counter()
    for p in pkts:
        dec.decode_frame(p["data"], p["ftype"] == 0,
                         ftype=p["ftype"], dres=p.get("dres", False),
                         gray_ref=bool(p.get("gray_ref")))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "inter_%dp_host_decode_fps" % h,
        "value": round(t / dt, 3),
        "unit": "frames/s",
        "frames": t,
        "stream_bytes": nbytes,
        "decode_s_per_frame": round(dt / t, 3),
        "tile_jobs": args.tile_jobs,
    }))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
