"""Encoder CLI: y4m in -> .dtp stream out.

The encoder_example equivalent (examples/encoder_example.c): quality,
keyframe rate, block size, masking knobs.

  python -m daala_tpu.cli.encode -v 25 -o out.dtp in.y4m
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
             [_sys.executable, "-m", "daala_tpu.cli.encode"] + _sys.argv[1:])
import sys
import time

from ..core.state import FrameInfo
from ..io.container import FramePacket, write_stream
from ..io.y4m import Y4MReader


def main(argv=None):
    ap = argparse.ArgumentParser(description="daala_tpu encoder")
    ap.add_argument("input", help="input .y4m file")
    ap.add_argument("-o", "--output", required=True, help="output .dtp")
    ap.add_argument("-v", "--quality", type=int, default=25,
                    help="coded quantizer 0..63 (0 = lossless)")
    ap.add_argument("-k", "--keyframe-rate", type=int, default=256)
    ap.add_argument("--bs", default="auto",
                    help="block size: auto (open-loop splitter) or "
                         "0..3 (fixed 4x4..32x32)")
    ap.add_argument("--masking", action="store_true",
                    help="enable activity masking")
    ap.add_argument("-z", "--complexity", type=int, default=7,
                    help="speed/quality trade 0..10 "
                         "(OD_SET_COMPLEXITY; higher = slower/better)")
    ap.add_argument("--satd", type=int, default=-1, choices=(-1, 0, 1),
                    help="SATD subpel metric stage: -1 by complexity "
                         "(>=8), 0 off, 1 on (OD_SET_MC_SATD)")
    ap.add_argument("--qm", type=int, default=1, choices=(0, 1),
                    help="quant-matrix select: 0 flat, 1 HVS "
                         "(OD_SET_QM)")
    ap.add_argument("--no-dering", action="store_true",
                    help="disable the directional dering filter "
                         "(OD_SET_DERING 0)")
    ap.add_argument("--mv-res-min", type=int, default=0,
                    choices=(0, 1, 2),
                    help="coarsest-allowed MV precision: 0=1/8 1=1/4 "
                         "2=1/2 pel (OD_SET_MV_RES_MIN)")
    ap.add_argument("--mv-level-min", type=int, default=0,
                    help="min mesh subdivision level 0..3 "
                         "(OD_SET_MV_LEVEL_MIN)")
    ap.add_argument("--mv-level-max", type=int, default=3,
                    help="max mesh subdivision level 0..3 "
                         "(OD_SET_MV_LEVEL_MAX)")
    ap.add_argument("-b", "--b-frames", type=int, default=0,
                    help="number of B-frames between anchors (0-4)")
    ap.add_argument("--limit", type=int, default=0,
                    help="max frames to encode (0 = all)")
    ap.add_argument("-j", "--jobs", type=int, default=1,
                    help="GOP-parallel encoder processes (keyframe "
                         "cadence becomes the GOP length)")
    ap.add_argument("--tiles", type=int, default=1,
                    help="independent entropy tiles per frame "
                         "(groups of superblock rows; 1-255)")
    ap.add_argument("--tile-jobs", type=int, default=1,
                    help="encode tiles in this many forked workers "
                         "(bit-identical to serial)")
    ap.add_argument("-V", "--bitrate", type=int, default=0,
                    help="rate target in kbit/s (0 = constant quality; "
                         "-v becomes the starting quality)")
    ap.add_argument("--dres", action="store_true",
                    help="device-residual inter mode: noref integer-"
                         "synthesis residual bands (the TPU device "
                         "encode pipeline's stream mode)")
    ap.add_argument("--device", action="store_true",
                    help="device-side encode: the accelerator computes "
                         "every encoder decision per GOP chunk and the "
                         "host packs the symbol tensors (dres streams; "
                         "8-bit 4:2:0)")
    ap.add_argument("--chunk", type=int, default=8,
                    help="--device: frames per device dispatch")
    ap.add_argument("--gray-gop", action="store_true",
                    help="--device: open every GOP with a gray-"
                         "reference P frame instead of a host keyframe "
                         "(the entire encode runs on the device)")
    args = ap.parse_args(argv)

    with open(args.input, "rb") as f:
        rd = Y4MReader(f)
        hdr = rd.header
        info = FrameInfo(
            pic_width=hdr.width, pic_height=hdr.height,
            nplanes=hdr.nplanes, xdec=hdr.xdec, ydec=hdr.ydec,
            bitdepth=hdr.bitdepth,
            keyframe_rate=args.keyframe_rate,
            timebase_num=hdr.fps_num, timebase_den=hdr.fps_den,
        )
        from ..pipeline.inter import FT_INTRA, EncoderSession

        bs = -1 if args.bs == "auto" else int(args.bs)
        if args.device:
            from ..core.config import EncoderConfig
            from ..pipeline.device_encode import DeviceEncoderSession

            frames = []
            for i, planes in enumerate(rd.frames()):
                if args.limit and i >= args.limit:
                    break
                frames.append(planes)
            dcfg = EncoderConfig.from_env(
                quality=args.quality, complexity=args.complexity,
                qm=args.qm, use_dering=not args.no_dering,
                keyframe_rate=args.keyframe_rate, chunk=args.chunk,
                gray_gop=args.gray_gop, device=True, bs_luma=bs)
            sess = DeviceEncoderSession(info, config=dcfg)
            t0 = time.time()
            outs = sess.encode_clip(frames)
            dt = time.time() - t0
            packets = [FramePacket(
                o["data"], keyframe=o["ftype"] == FT_INTRA,
                ftype=o["ftype"], display_order=o["display_order"],
                dres=bool(o.get("dres")),
                gray_ref=bool(o.get("gray_ref"))) for o in outs]
            sys.stderr.write(
                f"{len(packets)} frames in {dt:.2f}s "
                f"({len(packets) / max(dt, 1e-9):.2f} fps, device)\n")
            write_stream(args.output, info, packets)
            return
        if args.jobs > 1:
            from ..dist.gop import encode_gops_parallel

            frames = []
            for i, planes in enumerate(rd.frames()):
                if args.limit and i >= args.limit:
                    break
                frames.append(planes)
            from ..core.config import EncoderConfig

            jcfg = EncoderConfig.from_env(
                quality=args.quality, complexity=args.complexity,
                mc_use_satd=args.satd, qm=args.qm,
                use_dering=not args.no_dering,
                mv_res_min=args.mv_res_min,
                mv_level_min=args.mv_level_min,
                mv_level_max=args.mv_level_max,
                use_masking=args.masking, bs_luma=bs,
                b_frames=args.b_frames, tiles=args.tiles)
            info.qm = args.qm
            t0 = time.time()
            packets = encode_gops_parallel(
                frames, info, args.quality,
                gop_len=min(args.keyframe_rate, 16),
                workers=args.jobs, config=jcfg)
            dt = time.time() - t0
            sys.stderr.write(
                f"{len(packets)} frames in {dt:.2f}s "
                f"({len(packets) / max(dt, 1e-9):.2f} fps, "
                f"{args.jobs} workers)\n")
            write_stream(args.output, info, packets)
            return
        from ..core.config import EncoderConfig

        cfg = EncoderConfig.from_env(
            quality=args.quality, complexity=args.complexity,
            mc_use_satd=args.satd, qm=args.qm,
            use_dering=not args.no_dering,
            mv_res_min=args.mv_res_min,
            mv_level_min=args.mv_level_min,
            mv_level_max=args.mv_level_max,
            use_masking=args.masking, bs_luma=bs,
            keyframe_rate=args.keyframe_rate,
            b_frames=args.b_frames, tiles=args.tiles,
            tile_workers=args.tile_jobs,
            bitrate=args.bitrate * 1000, dres=args.dres)
        sess = EncoderSession(info, config=cfg)
        packets = []
        t0 = time.time()

        def emit(outs):
            for o in outs:
                packets.append(FramePacket(
                    o["data"], keyframe=o["ftype"] == FT_INTRA,
                    use_haar=o.get("use_haar", False),
                    bs_luma=3 if o.get("use_haar") else max(bs, 0),
                    ftype=o["ftype"], display_order=o["display_order"],
                    dres=bool(o.get("dres")) and o["ftype"] != FT_INTRA))
                sys.stderr.write(
                    f"\rframe {o['display_order']} "
                    f"({len(o['data'])} bytes)")

        for i, planes in enumerate(rd.frames()):
            if args.limit and i >= args.limit:
                break
            emit(sess.push_frame(planes))
        emit(sess.flush())
        dt = time.time() - t0
        sys.stderr.write(
            f"\n{len(packets)} frames in {dt:.2f}s "
            f"({len(packets) / max(dt, 1e-9):.2f} fps)\n")
    write_stream(args.output, info, packets)


if __name__ == "__main__":
    main()
