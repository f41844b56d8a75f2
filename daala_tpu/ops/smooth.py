"""Bilinear intra smoothing for large flat blocks at low rates.

Per 32x32 keyframe leaf block: fit a bilinear surface from the four
corners, compute the distortion-adaptive Wiener weight
strength * q^2/12 / dist (squared for caution), and pull the block
toward the surface (od_bilinear_smooth, filter.c spec).  Deterministic
from the quantizer — no signaling; encoder and decoder both apply it.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bilinear_smooth", "smooth_frame"]

OD_COEFF_SHIFT = 4
BILINEAR_STRENGTH = (5, 20, 20, 5)  # per plane (filter.c:154)


def bilinear_smooth(x: np.ndarray, q: int, pli: int) -> np.ndarray:
    """Smooth one (n, n) int32 block in place-semantics (returns new)."""
    n = x.shape[-1]
    ln = int(n).bit_length() - 1
    x = x.astype(np.int64)
    x00 = x[0, 0]
    x01 = x[0, n - 1]
    x10 = x[n - 1, 0]
    x11 = x[n - 1, n - 1]
    a00 = x00
    a01 = x01 - x00
    a10 = x10 - x00
    a11 = x11 + x00 - x10 - x01
    a01 += (a01 + n // 2) >> ln
    a10 += (a10 + n // 2) >> ln
    a11 += (2 * a10 + n // 2) >> ln
    shift = max(0, 2 * OD_COEFF_SHIFT + 2 * ln - 16)
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    y = a00 + ((j * a01 + i * a10 + ((j * i * a11) >> ln) + n // 2) >> ln)
    partial = ((y - x) ** 2).sum(axis=1) >> shift
    dist = int(partial.sum())
    dist += n // 2
    dist >>= 2 * ln - shift
    w = min(1024, BILINEAR_STRENGTH[pli] * q * q // (1 + 12 * dist))
    w = (w * w) >> 12
    return (x - ((w * (x - y) + 128) >> 8)).astype(np.int32)


def smooth_frame(plane: np.ndarray, q: int, pli: int,
                 n: int = 32, leaf_mask: np.ndarray = None) -> np.ndarray:
    """Apply smoothing to every n x n block that is a single 32x32-leaf
    (min_bs == 32, od_smooth_recursive; n = 32 >> xdec for chroma).
    leaf_mask: (nvsb, nhsb) bool; None = all."""
    h, w = plane.shape
    out = plane.copy()
    for sy in range(h // n):
        for sx in range(w // n):
            if leaf_mask is not None and not leaf_mask[sy, sx]:
                continue
            blk = out[sy * n:(sy + 1) * n, sx * n:(sx + 1) * n]
            out[sy * n:(sy + 1) * n, sx * n:(sx + 1) * n] = \
                bilinear_smooth(blk, q, pli)
    return out
