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


def _write_pgm(path, img):
    img = np.asarray(img)
    mx = max(int(img.max()), 1)
    out = (img.astype(np.float64) / mx * 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (out.shape[1], out.shape[0]))
        f.write(out.tobytes())


def dump_overlays(path, frame_idx, prefix):
    """Decode up to frame_idx with introspection on and dump the
    per-block structure: bsize grid, dering flags, and (inter) the MV
    mesh + subdivision levels + ref ids."""
    from ..pipeline.inter import DecoderSession

    info, comment, packets = read_stream(path)
    sess = DecoderSession(info, bs_luma=-1, introspect=True)
    for i, p in enumerate(packets):
        sess.decode_frame(p.data, p.keyframe, p.use_haar, ftype=p.ftype,
                          dres=p.dres, gray_ref=p.gray_ref)
        if i == frame_idx:
            break
    oi = sess.last_info or {}
    dumped = []
    if "bsize" in oi:
        _write_pgm(prefix + "_bsize.pgm", oi["bsize"])
        dumped.append("bsize")
    if "dering" in oi:
        _write_pgm(prefix + "_dering.pgm", oi["dering"])
        dumped.append("dering")
    np.savez(prefix + "_overlays.npz",
             **{k: v for k, v in oi.items() if hasattr(v, "shape")})
    return {"dumped": dumped + ["npz"],
            "keys": sorted(k for k in oi)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--heatmap", default=None,
                    help="write a per-4x4 bits heatmap as PGM")
    ap.add_argument("--overlays", default=None,
                    help="prefix: dump bsize/<mv>/dering overlays for "
                         "--frame (the analyzer.cc block views, as "
                         "PGM + NPZ via the decoder introspection "
                         "buffers — OD_DECCTL_SET_*_BUFFER parity)")
    args = ap.parse_args(argv)
    info, comment, packets = read_stream(args.input)
    p = packets[args.frame]
    if p.use_haar:
        print("accounting covers PVQ packets (not haar-lossless)",
              file=sys.stderr)
    from ..pipeline.inter import DecoderSession

    acct = Accounting()
    sess = DecoderSession(info, bs_luma=-1)
    for i, pk in enumerate(packets):
        sess.decode_frame(pk.data, pk.keyframe, pk.use_haar,
                          ftype=pk.ftype, dres=pk.dres,
                          gray_ref=pk.gray_ref,
                          acct=acct if i == args.frame else None)
        if i == args.frame:
            break
    total = sum(fb for *_, fb in acct.records) / 8.0
    # EC overhead meter (OD_MEASURE_EC_OVERHEAD, entenc.h:31): the gap
    # between the packet's real size and the accounted fractional bits
    # is the range coder's finite-precision + termination overhead.
    packet_bits = 8 * len(p.data)
    report = {
        "frame": args.frame,
        "packet_bytes": len(p.data),
        "accounted_bits": round(total, 1),
        "ec_overhead_bits": round(packet_bits - total, 1),
        "ec_overhead_pct": round(100.0 * (packet_bits - total)
                                 / max(total, 1e-9), 3),
        "by_technique": {k: round(v, 1)
                         for k, v in acct.by_technique().items()},
        "by_plane": {str(k): round(v, 1)
                     for k, v in acct.by_plane().items()},
        "symbols": len(acct.records),
    }
    if args.overlays:
        report["overlays"] = dump_overlays(args.input, args.frame,
                                           args.overlays)
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
