"""Quality metrics: PSNR, PSNR-HVS-M, SSIM, FastSSIM, CIEDE2000.

Functional parity with the reference's metric dumpers
(tools/dump_psnr.c, dump_psnrhvs.c, dump_ssim.c, dump_fastssim.c,
dump_ciede2000.py), implemented as vectorized numpy.
"""

from __future__ import annotations

import numpy as np

__all__ = ["psnr", "psnr_hvs", "ssim", "fast_ssim", "ciede2000",
           "frame_metrics"]


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(peak * peak / max(mse, 1e-12))


# CSF weights for 8x8 DCT coefficients (the psnrhvs weighting used by
# dump_psnrhvs.c, from Ponomarenko's PSNR-HVS-M).
_CSF = np.array([
    [1.6084, 2.3396, 2.5735, 1.6084, 1.0723, 0.6434, 0.5046, 0.4219],
    [2.1446, 2.1446, 2.2389, 1.6784, 1.1383, 0.7180, 0.5833, 0.4579],
    [1.8382, 1.9996, 1.6891, 1.3193, 0.9875, 0.6723, 0.5237, 0.4348],
    [1.6084, 1.5625, 1.3193, 1.1486, 0.8828, 0.6550, 0.5572, 0.4155],
    [1.0723, 1.1483, 0.9875, 0.8828, 0.7600, 0.5992, 0.4856, 0.3866],
    [0.6434, 0.6582, 0.6723, 0.6550, 0.5992, 0.5090, 0.4398, 0.3717],
    [0.5046, 0.5257, 0.5237, 0.5572, 0.4856, 0.4398, 0.4564, 0.3971],
    [0.4219, 0.4312, 0.4348, 0.4155, 0.3866, 0.3717, 0.3971, 0.3759],
])


def _dct8_mat():
    k = np.arange(8)[:, None]
    j = np.arange(8)[None, :]
    m = np.cos(np.pi * k * (2 * j + 1) / 16) * 0.5
    m[0] *= np.sqrt(0.5)
    return m


def psnr_hvs(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR-HVS-M style: CSF-weighted 8x8 DCT-domain MSE over a dense
    grid of blocks (dump_psnrhvs.c behavior)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    h, w = a.shape
    t = _dct8_mat()
    total = 0.0
    count = 0
    step = 7  # overlapping blocks as in the reference tool
    ys = np.arange(0, h - 7, step)
    xs = np.arange(0, w - 7, step)
    wcsf = (_CSF * _CSF)
    for y0 in ys:
        ablk = np.stack([a[y0:y0 + 8, x0:x0 + 8] for x0 in xs])
        bblk = np.stack([b[y0:y0 + 8, x0:x0 + 8] for x0 in xs])
        da = t @ ablk @ t.T
        db = t @ bblk @ t.T
        total += (((da - db) ** 2) * wcsf).sum()
        count += len(xs) * 64
    mse = total / max(count, 1)
    return 10 * np.log10(255 * 255 / max(mse, 1e-12))


def _win_means(x, k=8):
    from numpy.lib.stride_tricks import sliding_window_view
    return sliding_window_view(x, (k, k)).mean(axis=(-1, -2))


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Global SSIM with 8x8 moving windows (dump_ssim.c flavor)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    mu_a = _win_means(a)
    mu_b = _win_means(b)
    var_a = _win_means(a * a) - mu_a ** 2
    var_b = _win_means(b * b) - mu_b ** 2
    cov = _win_means(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return float(s.mean())


def fast_ssim(a: np.ndarray, b: np.ndarray, levels: int = 4) -> float:
    """Multi-scale fast SSIM: plain SSIM over a dyadic pyramid
    (dump_fastssim.c flavor)."""
    vals = []
    for _ in range(levels):
        vals.append(ssim(a, b))
        if min(a.shape) < 32:
            break
        a = a[:a.shape[0] & ~1, :a.shape[1] & ~1].astype(np.float64)
        b = b[:b.shape[0] & ~1, :b.shape[1] & ~1].astype(np.float64)
        a = (a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2]
             + a[1::2, 1::2]) / 4
        b = (b[0::2, 0::2] + b[0::2, 1::2] + b[1::2, 0::2]
             + b[1::2, 1::2]) / 4
    return float(np.mean(vals))


def _yuv_to_lab(y, u, v):
    """BT.601 YUV -> sRGB -> CIELAB (for ciede2000)."""
    y = y.astype(np.float64)
    cb = u.astype(np.float64) - 128
    cr = v.astype(np.float64) - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], -1) / 255.0, 0, 1)
    rgb = np.where(rgb <= 0.04045, rgb / 12.92,
                   ((rgb + 0.055) / 1.055) ** 2.4)
    m = np.array([[0.4124, 0.3576, 0.1805],
                  [0.2126, 0.7152, 0.0722],
                  [0.0193, 0.1192, 0.9505]])
    xyz = rgb @ m.T
    wp = np.array([0.95047, 1.0, 1.08883])
    t = xyz / wp
    f = np.where(t > (6 / 29) ** 3, np.cbrt(t),
                 t / (3 * (6 / 29) ** 2) + 4 / 29)
    lab = np.stack([116 * f[..., 1] - 16,
                    500 * (f[..., 0] - f[..., 1]),
                    200 * (f[..., 1] - f[..., 2])], -1)
    return lab


def ciede2000(ya, ua, va, yb, ub, vb) -> float:
    """Mean CIEDE2000 color difference (dump_ciede2000.py flavor).
    Chroma planes are upsampled by pixel replication if subsampled."""
    def up(p, shape):
        if p.shape == shape:
            return p
        return np.repeat(np.repeat(p, 2, 0), 2, 1)[:shape[0], :shape[1]]

    lab1 = _yuv_to_lab(ya, up(ua, ya.shape), up(va, ya.shape))
    lab2 = _yuv_to_lab(yb, up(ub, yb.shape), up(vb, yb.shape))
    L1, a1, b1 = lab1[..., 0], lab1[..., 1], lab1[..., 2]
    L2, a2, b2 = lab2[..., 0], lab2[..., 1], lab2[..., 2]
    c1 = np.hypot(a1, b1)
    c2 = np.hypot(a2, b2)
    cbar = (c1 + c2) / 2
    g = 0.5 * (1 - np.sqrt(cbar ** 7 / (cbar ** 7 + 25.0 ** 7)))
    ap1 = (1 + g) * a1
    ap2 = (1 + g) * a2
    cp1 = np.hypot(ap1, b1)
    cp2 = np.hypot(ap2, b2)
    hp1 = np.degrees(np.arctan2(b1, ap1)) % 360
    hp2 = np.degrees(np.arctan2(b2, ap2)) % 360
    dL = L2 - L1
    dC = cp2 - cp1
    dh = hp2 - hp1
    dh = np.where(dh > 180, dh - 360, np.where(dh < -180, dh + 360, dh))
    dH = 2 * np.sqrt(cp1 * cp2) * np.sin(np.radians(dh) / 2)
    Lbar = (L1 + L2) / 2
    Cbar = (cp1 + cp2) / 2
    hsum = hp1 + hp2
    hbar = np.where(np.abs(hp1 - hp2) > 180, (hsum + 360) / 2, hsum / 2)
    T = (1 - 0.17 * np.cos(np.radians(hbar - 30))
         + 0.24 * np.cos(np.radians(2 * hbar))
         + 0.32 * np.cos(np.radians(3 * hbar + 6))
         - 0.20 * np.cos(np.radians(4 * hbar - 63)))
    SL = 1 + 0.015 * (Lbar - 50) ** 2 / np.sqrt(20 + (Lbar - 50) ** 2)
    SC = 1 + 0.045 * Cbar
    SH = 1 + 0.015 * Cbar * T
    dtheta = 30 * np.exp(-(((hbar - 275) / 25) ** 2))
    RC = 2 * np.sqrt(Cbar ** 7 / (Cbar ** 7 + 25.0 ** 7))
    RT = -RC * np.sin(np.radians(2 * dtheta))
    de = np.sqrt((dL / SL) ** 2 + (dC / SC) ** 2 + (dH / SH) ** 2
                 + RT * (dC / SC) * (dH / SH))
    return float(de.mean())


def frame_metrics(frames_a, frames_b) -> dict:
    """Aggregate metrics over frame lists of [y, u, v] planes."""
    out = {"psnr_y": [], "psnr_hvs": [], "ssim": [], "fastssim": [],
           "ciede2000": []}
    for fa, fb in zip(frames_a, frames_b):
        out["psnr_y"].append(psnr(fa[0], fb[0]))
        out["psnr_hvs"].append(psnr_hvs(fa[0], fb[0]))
        out["ssim"].append(ssim(fa[0], fb[0]))
        out["fastssim"].append(fast_ssim(fa[0], fb[0]))
        if len(fa) >= 3:
            out["ciede2000"].append(
                ciede2000(fa[0], fa[1], fa[2], fb[0], fb[1], fb[2]))
    return {k: float(np.mean(v)) for k, v in out.items() if v}


def bd_rate(rate1, dist1, rate2, dist2) -> float:
    """Bjontegaard delta-rate between two RD curves
    (tools/bjontegaard.c): average % rate difference at equal quality."""
    lr1 = np.log(np.asarray(rate1, dtype=np.float64))
    lr2 = np.log(np.asarray(rate2, dtype=np.float64))
    d1 = np.asarray(dist1, dtype=np.float64)
    d2 = np.asarray(dist2, dtype=np.float64)
    p1 = np.polyfit(d1, lr1, 3)
    p2 = np.polyfit(d2, lr2, 3)
    lo = max(d1.min(), d2.min())
    hi = min(d1.max(), d2.max())
    xs = np.linspace(lo, hi, 64)
    v1 = np.polyval(p1, xs).mean()
    v2 = np.polyval(p2, xs).mean()
    return float((np.exp(v2 - v1) - 1) * 100)


def _main(argv=None):
    """CLI: metrics between two y4m files (the dump_psnr / dump_psnrhvs /
    dump_ssim / dump_fastssim / dump_ciede2000 equivalents in one)."""
    import argparse
    import json

    from ..io.y4m import read_y4m

    ap = argparse.ArgumentParser(description="daala_tpu quality metrics")
    ap.add_argument("ref", help="reference .y4m")
    ap.add_argument("test", help="test .y4m")
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)
    _, fa = read_y4m(args.ref)
    _, fb = read_y4m(args.test)
    n = min(len(fa), len(fb))
    if args.limit:
        n = min(n, args.limit)
    m = frame_metrics(fa[:n], fb[:n])
    print(json.dumps({k: float(np.mean(v)) for k, v in m.items()}
                     | {"frames": n}))


if __name__ == "__main__":
    _main()
