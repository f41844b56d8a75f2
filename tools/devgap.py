"""Device-vs-host RD gap measurement on the standard warp clip.

Re-runs the RDCOMP.md device-gap decomposition: the host dres-mode
encoder (the stream mode the device emits) vs the full
DeviceEncoderSession at the same quality indices, decoding both and
reporting bytes / PSNR-Y plus per-category P-frame bytes from the
decoder accounting.  The protocol matches RDCOMP.md (352x288x16 warp
clip, single keyframe, masking off, dering on, host bs auto).

Usage:
    python -m tools.devgap [-q 30 38] [--frames 16] [--no-acct]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def warp_clip(n=16, W=352, H=288, seed=3):
    """The RDCOMP.md warp clip, regenerated deterministically."""
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    frames = []
    for t in range(n):
        y = (128 + 60 * np.sin(xx / 37 + t * 0.22) * np.cos(yy / 29)
             + 20 * np.sin((xx + yy) / 11))
        y = y + 45 * np.exp(-((xx - 100 - 7 * t) ** 2
                              + (yy - 80 - 4 * t) ** 2) / 900)
        y = y + 38 * np.exp(-((xx - 250 + 5 * t) ** 2
                              + (yy - 200 - 2 * t) ** 2) / 500)
        y = (y + rng.normal(0, 2.0, (H, W))).clip(0, 255) \
            .astype(np.uint8)
        u = (y[::2, ::2] // 2 + 64).astype(np.uint8)
        v = (200 - y[::2, ::2] // 2).astype(np.uint8)
        frames.append([y, u, v])
    return frames


def _psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0 * 255.0 / mse)


def _decode_all(info, pkts, want_acct=False):
    from daala_tpu.entropy.accounting import Accounting
    from daala_tpu.pipeline.inter import DecoderSession

    acct_totals = {}
    dec = DecoderSession(info)
    recons = {}
    for p in pkts:
        acct = Accounting() if (want_acct and p["ftype"] != 0) else None
        rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                               ftype=p["ftype"], dres=p.get("dres",
                                                            False),
                               gray_ref=p.get("gray_ref", False),
                               acct=acct)
        recons[p["display_order"]] = rec
        if acct is not None:
            for label, b in acct.by_technique().items():
                cat = label.split(":")[0]
                acct_totals[cat] = acct_totals.get(cat, 0) + b
    return recons, acct_totals


def run_point(frames, quality, want_acct=True, device=True,
              adaptive_bs=False):
    from daala_tpu.core.state import FrameInfo
    from daala_tpu.pipeline.inter import EncoderSession

    H, W = frames[0][0].shape
    info = FrameInfo(pic_width=W, pic_height=H, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1), bitdepth=8,
                     keyframe_rate=len(frames))
    out = {}

    def measure(name, pkts):
        recons, acct = _decode_all(info, pkts, want_acct)
        tot = sum(len(p["data"]) for p in pkts)
        ps = float(np.mean([_psnr(frames[i][0], recons[i][0])
                            for i in range(len(frames))]))
        out[name] = {"bytes": tot, "psnr_y": round(ps, 2),
                     "acct": {k: round(v, 1)
                              for k, v in sorted(acct.items())}}

    enc = EncoderSession(info, quality=quality, use_masking=False,
                         dres=True, bs_luma=-1)
    pkts = []
    for f in frames:
        pkts += enc.push_frame(f)
    pkts += enc.flush()
    measure("host_dres", pkts)

    if device:
        from daala_tpu.pipeline.device_encode import DeviceEncoderSession

        ds = DeviceEncoderSession(info, quality=quality,
                                  adaptive_bs=adaptive_bs)
        measure("device" + ("_abs" if ds.adaptive_bs else ""),
                ds.encode_clip(frames))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-q", "--qualities", type=int, nargs="+",
                    default=[30, 38])
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--no-acct", action="store_true")
    ap.add_argument("--no-device", action="store_true")
    ap.add_argument("--adaptive-bs", action="store_true",
                    help="device session with the per-SB 2-size grid")
    args = ap.parse_args(argv)
    frames = warp_clip(args.frames)
    for q in args.qualities:
        res = run_point(frames, q, want_acct=not args.no_acct,
                        device=not args.no_device,
                        adaptive_bs=args.adaptive_bs)
        for name, r in res.items():
            print(f"q{q} {name}: {r['bytes']} B / {r['psnr_y']} dB  "
                  f"{r['acct']}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
