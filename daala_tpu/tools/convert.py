"""Image/video format conversion (the tools/png2y4m, y4m2png,
yuv2yuv4mpeg family, using the dependency-free PNM formats in this
environment).

  python -m daala_tpu.tools.convert ppm2y4m out.y4m in1.ppm in2.ppm ...
  python -m daala_tpu.tools.convert y4m2ppm prefix in.y4m
  python -m daala_tpu.tools.convert yuv2y4m out.y4m raw.yuv WxH [fps]
  python -m daala_tpu.tools.convert mono out.y4m in.y4m
"""

from __future__ import annotations

import argparse

import numpy as np

from ..io.y4m import Y4MHeader, Y4MWriter, read_y4m


def _read_pnm(path):
    with open(path, "rb") as f:
        magic = f.read(2)
        if magic not in (b"P5", b"P6"):
            raise ValueError(f"{path}: not a binary PGM/PPM")
        vals = []
        while len(vals) < 3:
            line = f.readline()
            if line.startswith(b"#"):
                continue
            vals += [int(t) for t in line.split()]
        w, h, maxv = vals[:3]
        ch = 3 if magic == b"P6" else 1
        nb = 2 if maxv > 255 else 1
        dt = np.dtype(">u2") if nb == 2 else np.uint8
        data = np.frombuffer(f.read(w * h * ch * nb), dtype=dt)
        return data.reshape(h, w, ch) if ch == 3 else data.reshape(h, w)


def _write_pnm(path, img):
    img = np.asarray(img)
    color = img.ndim == 3
    with open(path, "wb") as f:
        f.write(b"P6\n" if color else b"P5\n")
        f.write(b"%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.astype(np.uint8).tobytes())


def _rgb_to_yuv420(rgb):
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    v = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.clip(u[::2, ::2], 0, 255).astype(np.uint8)
    v = np.clip(v[::2, ::2], 0, 255).astype(np.uint8)
    return [y, u, v]


def _yuv420_to_rgb(planes):
    y = planes[0].astype(np.float64)
    u = np.repeat(np.repeat(planes[1], 2, 0), 2, 1)[:y.shape[0],
                                                    :y.shape[1]]
    v = np.repeat(np.repeat(planes[2], 2, 0), 2, 1)[:y.shape[0],
                                                    :y.shape[1]]
    u = u.astype(np.float64) - 128
    v = v.astype(np.float64) - 128
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser(description="daala_tpu convert")
    ap.add_argument("mode",
                    choices=["ppm2y4m", "y4m2ppm", "yuv2y4m", "mono"])
    ap.add_argument("output")
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--fps", type=int, default=30)
    args = ap.parse_args(argv)

    if args.mode == "ppm2y4m":
        imgs = [_read_pnm(p) for p in args.inputs]
        h, w = imgs[0].shape[:2]
        h -= h % 2
        w -= w % 2
        with open(args.output, "wb") as f:
            wr = Y4MWriter(f, Y4MHeader(width=w, height=h,
                                        fps_num=args.fps,
                                        colorspace="420"))
            for im in imgs:
                if im.ndim == 2:
                    im = np.stack([im] * 3, -1)
                wr.write_frame(_rgb_to_yuv420(im[:h, :w]))
        print(f"{len(imgs)} frames -> {args.output}")
    elif args.mode == "y4m2ppm":
        hdr, frames = read_y4m(args.inputs[0])
        for i, fr in enumerate(frames):
            if hdr.nplanes == 1:
                _write_pnm(f"{args.output}{i:04d}.pgm", fr[0])
            else:
                _write_pnm(f"{args.output}{i:04d}.ppm",
                           _yuv420_to_rgb(fr))
        print(f"{len(frames)} frames -> {args.output}NNNN.p*m")
    elif args.mode == "yuv2y4m":
        w, h = (int(t) for t in args.inputs[1].split("x"))
        raw = np.fromfile(args.inputs[0], dtype=np.uint8)
        fsz = w * h * 3 // 2
        n = len(raw) // fsz
        with open(args.output, "wb") as f:
            wr = Y4MWriter(f, Y4MHeader(width=w, height=h,
                                        fps_num=args.fps,
                                        colorspace="420"))
            for i in range(n):
                fr = raw[i * fsz:(i + 1) * fsz]
                y = fr[:w * h].reshape(h, w)
                u = fr[w * h:w * h * 5 // 4].reshape(h // 2, w // 2)
                v = fr[w * h * 5 // 4:].reshape(h // 2, w // 2)
                wr.write_frame([y, u, v])
        print(f"{n} frames -> {args.output}")
    elif args.mode == "mono":
        hdr, frames = read_y4m(args.inputs[0])
        out_hdr = Y4MHeader(width=hdr.width, height=hdr.height,
                            fps_num=hdr.fps_num, fps_den=hdr.fps_den,
                            colorspace="mono", bitdepth=hdr.bitdepth)
        with open(args.output, "wb") as f:
            wr = Y4MWriter(f, out_hdr)
            for fr in frames:
                wr.write_frame([fr[0]])
        print(f"{len(frames)} frames -> {args.output} (mono)")


if __name__ == "__main__":
    main()
