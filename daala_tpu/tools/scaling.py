"""Scaling-efficiency harness: GOP-parallel encode across worker
processes (the multi-host data-parallel axis, SURVEY.md section 2.11)
and tile-parallel decode, with bit-identity checks against serial.

Each worker process is one "host" of the deployment: GOPs are
coding-independent (keyframes reset all adaptation), so a real
multi-host run differs only in transporting packets over DCN instead
of a process pipe.  Prints one JSON line per configuration:

    python -m daala_tpu.tools.scaling clip.y4m -q 30 -w 1,2,4 \
        --gop 12 [--tiles 4]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import time


def main(argv=None):
    import numpy as np

    from ..core.state import FrameInfo
    from ..dist.gop import encode_gops_parallel
    from ..io.y4m import read_y4m

    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("-q", "--quality", type=int, default=30)
    ap.add_argument("-w", "--workers", default="1,2,4")
    ap.add_argument("--gop", type=int, default=12)
    ap.add_argument("--tiles", type=int, default=1)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--bs", type=int, default=1)
    args = ap.parse_args(argv)

    hdr, frames = read_y4m(args.input)
    if args.limit:
        frames = frames[:args.limit]
    frames = [list(f) for f in frames]
    info = FrameInfo(
        pic_width=hdr.width, pic_height=hdr.height,
        nplanes=hdr.nplanes, xdec=hdr.xdec, ydec=hdr.ydec,
        bitdepth=hdr.bitdepth, keyframe_rate=args.gop,
        timebase_num=hdr.fps_num, timebase_den=hdr.fps_den)

    def run(workers):
        t0 = time.perf_counter()
        pkts = encode_gops_parallel(
            frames, info, args.quality, gop_len=args.gop,
            workers=workers, bs_luma=args.bs, tiles=args.tiles)
        dt = time.perf_counter() - t0
        md5 = hashlib.md5(
            b"".join(bytes(p.data) for p in pkts)).hexdigest()
        return dt, md5, sum(len(p.data) for p in pkts)

    base_dt = None
    base_md5 = None
    for w in [int(x) for x in args.workers.split(",")]:
        dt, md5, nbytes = run(w)
        if base_dt is None:
            base_dt, base_md5 = dt, md5
        print(json.dumps({
            "workers": w,
            "fps": round(len(frames) / dt, 3),
            "speedup": round(base_dt / dt, 3),
            "efficiency": round(base_dt / dt / w, 3),
            "bytes": nbytes,
            "bit_identical": md5 == base_md5,
        }), flush=True)
        assert md5 == base_md5, "parallel encode diverged from serial"
    del np


if __name__ == "__main__":
    main()
