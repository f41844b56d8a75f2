"""Decoder CLI: .dtp stream -> y4m out (the dump_video equivalent,
examples/dump_video.c).

  python -m daala_tpu.cli.decode -o out.y4m in.dtp
"""

from __future__ import annotations

import argparse
import os

if (os.environ.get("DTPU_JAX_DERING") == "1"
        and not os.environ.get("JAX_PLATFORMS")):
    # Opt-in fused-jax dering on the host: the TPU plugin only honors
    # platform selection at interpreter start, so re-exec with the CPU
    # platform pinned (same pattern as tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import sys as _sys

    os.execv(_sys.executable,
             [_sys.executable, "-m", "daala_tpu.cli.decode"] + _sys.argv[1:])
import sys
import time

from ..io.container import read_stream
from ..io.y4m import Y4MHeader, Y4MWriter


def main(argv=None):
    ap = argparse.ArgumentParser(description="daala_tpu decoder")
    ap.add_argument("input", help="input .dtp stream")
    ap.add_argument("-o", "--output", required=True, help="output .y4m")
    ap.add_argument("-j", "--tile-jobs", type=int, default=1,
                    help="decode entropy tiles in this many forked "
                         "workers (streams encoded with --tiles)")
    args = ap.parse_args(argv)

    info, comment, packets = read_stream(args.input)
    cs = {1: "mono", 3: "420" if info.xdec[1] else "444"}[info.nplanes]
    hdr = Y4MHeader(width=info.pic_width, height=info.pic_height,
                    fps_num=info.timebase_num, fps_den=info.timebase_den,
                    colorspace=cs, bitdepth=info.bitdepth)
    from ..pipeline.inter import DecoderSession

    t0 = time.time()
    with open(args.output, "wb") as f:
        wr = Y4MWriter(f, hdr)
        sess = None
        decoded = []  # (display_order, planes)
        for i, p in enumerate(packets):
            if sess is None:
                sess = DecoderSession(info, bs_luma=p.bs_luma if
                                      not p.use_haar else 1,
                                      tile_workers=args.tile_jobs)
            planes = sess.decode_frame(p.data, p.keyframe, p.use_haar,
                                       ftype=p.ftype, dres=p.dres,
                                       gray_ref=p.gray_ref)
            decoded.append((p.display_order, planes))
            sys.stderr.write(f"\rframe {i}")
        # Reorder coding order -> display order (B-frame reordering).
        for _, planes in sorted(decoded, key=lambda t: t[0]):
            wr.write_frame(planes)
    dt = time.time() - t0
    sys.stderr.write(f"\n{len(packets)} frames in {dt:.2f}s\n")


if __name__ == "__main__":
    main()
