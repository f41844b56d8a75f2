"""RD sweep harness: encode a clip over a quantizer ladder, report
rate/metric points and optional BD-rate vs another run.

The rd_collect.sh / bd_rate.sh / rd_average.sh equivalent
(tools/rd_collect.sh:1-40), as a CLI:

  python -m daala_tpu.tools.rd_collect clip.y4m -q 10,20,30,40 -o rd.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from ..core.state import FrameInfo
from ..io.y4m import Y4MReader
from ..pipeline.inter import DecoderSession, EncoderSession
from .metrics import bd_rate, frame_metrics


def sweep(path: str, qs, limit: int = 0, bs: int = 1,
          keyframe_rate: int = 256):
    points = []
    for q in qs:
        with open(path, "rb") as f:
            rd = Y4MReader(f)
            hdr = rd.header
            info = FrameInfo(pic_width=hdr.width, pic_height=hdr.height,
                             nplanes=hdr.nplanes, xdec=hdr.xdec,
                             ydec=hdr.ydec)
            enc = EncoderSession(info, q, bs_luma=bs,
                                 keyframe_rate=keyframe_rate)
            dec = DecoderSession(info, bs_luma=bs)
            nbytes = 0
            src = []
            out = []
            t0 = time.time()
            outs = {}
            for i, planes in enumerate(rd.frames()):
                if limit and i >= limit:
                    break
                src.append(planes)
                # Full packet metadata (ftype drives the decoder's
                # golden/B reference rotation — dropping it desyncs
                # refs after the first golden frame).
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
            out = [outs[i] for i in range(len(src))]
            dt = time.time() - t0
        m = frame_metrics(src, out)
        npx = info.pic_width * info.pic_height * len(src)
        points.append({
            "q": q,
            "bytes": nbytes,
            "bpp": 8.0 * nbytes / npx,
            "fps": len(src) / dt,
            **m,
        })
        print(json.dumps(points[-1]), file=sys.stderr)
    return points


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("-q", "--quantizers", default="8,16,24,32,40")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--bs", type=int, default=-1)
    ap.add_argument("--baseline", default=None,
                    help="previous rd.json to compute BD-rate against")
    args = ap.parse_args(argv)
    qs = [int(x) for x in args.quantizers.split(",")]
    points = sweep(args.input, qs, args.limit, args.bs)
    result = {"points": points}
    if args.baseline:
        with open(args.baseline) as f:
            base = json.load(f)["points"]
        result["bd_rate_psnr_vs_baseline"] = bd_rate(
            [p["bpp"] for p in base], [p["psnr_y"] for p in base],
            [p["bpp"] for p in points], [p["psnr_y"] for p in points])
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
