"""Player: decode a .dtp stream and play it.

The examples/player_example.c equivalent for a headless environment:
with no SDL in this image, "playback" pipes decoded y4m to stdout for
any player (`mpv -`, `ffplay -`), renders ASCII preview frames in the
terminal, or just paces decode at the stream's frame rate and reports
realtime statistics.

  python -m daala_tpu.cli.play stream.dtp            # stats + pacing
  python -m daala_tpu.cli.play stream.dtp --pipe | mpv -
  python -m daala_tpu.cli.play stream.dtp --ascii
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..io.container import read_stream
from ..io.y4m import Y4MHeader, Y4MWriter

_RAMP = " .:-=+*#%@"


def _ascii_frame(y, cols=72):
    h, w = y.shape
    rows = max(1, int(cols * h / w / 2.1))
    ys = y[:: max(1, h // rows), :: max(1, w // cols)]
    peak = max(int(ys.max()), 1)
    idx = (ys.astype(np.int32) * (len(_RAMP) - 1) // peak)
    return "\n".join("".join(_RAMP[v] for v in row) for row in idx)


def main(argv=None):
    ap = argparse.ArgumentParser(description="daala_tpu player")
    ap.add_argument("input", help=".dtp stream")
    ap.add_argument("--pipe", action="store_true",
                    help="write decoded y4m to stdout (pipe to mpv/ffplay)")
    ap.add_argument("--ascii", action="store_true",
                    help="render luma as ASCII in the terminal")
    ap.add_argument("--loop", type=int, default=1)
    args = ap.parse_args(argv)

    info, comment, packets = read_stream(args.input)
    from ..pipeline.inter import DecoderSession

    fps = info.timebase_num / max(1, info.timebase_den)
    wr = None
    if args.pipe:
        cs = {1: "mono", 3: "420" if info.xdec[1] else "444"}[info.nplanes]
        hdr = Y4MHeader(width=info.pic_width, height=info.pic_height,
                        fps_num=info.timebase_num,
                        fps_den=info.timebase_den, colorspace=cs,
                        bitdepth=info.bitdepth)
        wr = Y4MWriter(sys.stdout.buffer, hdr)
    shown = 0
    late = 0
    t0 = time.time()
    for _ in range(max(1, args.loop)):
        sess = DecoderSession(info, bs_luma=-1)
        buf = []
        for p in packets:
            planes = sess.decode_frame(p.data, p.keyframe, p.use_haar,
                                       ftype=p.ftype, dres=p.dres,
                                       gray_ref=p.gray_ref)
            buf.append((p.display_order, planes))
        for _, planes in sorted(buf, key=lambda t: t[0]):
            due = t0 + (shown + 1) / fps
            now = time.time()
            if now > due:
                late += 1
            elif not args.pipe:
                time.sleep(due - now)
            if wr is not None:
                wr.write_frame(planes)
            elif args.ascii:
                sys.stdout.write("\x1b[H\x1b[2J"
                                 + _ascii_frame(planes[0]) + "\n")
                sys.stdout.flush()
            shown += 1
    dt = time.time() - t0
    sys.stderr.write(
        f"{shown} frames in {dt:.2f}s ({shown / max(dt, 1e-9):.2f} fps, "
        f"target {fps:.2f}; {late} late)\n")


if __name__ == "__main__":
    main()
