"""Stream analyzer: decode with bit accounting and report where the
bits go (the examples/analyzer.cc equivalent as a CLI report).

  python -m daala_tpu.tools.analyze stream.dtp [--heatmap out.pgm]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from ..entropy.accounting import Accounting
from ..io.container import read_stream
from ..pipeline.intra import decode_keyframe


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--heatmap", default=None,
                    help="write a per-4x4 bits heatmap as PGM")
    args = ap.parse_args(argv)
    info, comment, packets = read_stream(args.input)
    p = packets[args.frame]
    if not p.keyframe or p.use_haar:
        print("accounting currently reports keyframe PVQ packets",
              file=sys.stderr)
    acct = Accounting()
    decode_keyframe(p.data, info, acct=acct)
    total = sum(fb for *_, fb in acct.records) / 8.0
    report = {
        "frame": args.frame,
        "packet_bytes": len(p.data),
        "accounted_bits": round(total, 1),
        "by_technique": {k: round(v, 1)
                         for k, v in acct.by_technique().items()},
        "by_plane": {str(k): round(v, 1)
                     for k, v in acct.by_plane().items()},
        "symbols": len(acct.records),
    }
    print(json.dumps(report, indent=1))
    if args.heatmap:
        hm = acct.heatmap(info.frame_width // 4, info.frame_height // 4)
        mx = max(hm.max(), 1e-9)
        img = np.clip(hm / mx * 255, 0, 255).astype(np.uint8)
        with open(args.heatmap, "wb") as f:
            f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
            f.write(img.tobytes())
        print(f"heatmap written to {args.heatmap}", file=sys.stderr)


if __name__ == "__main__":
    main()
