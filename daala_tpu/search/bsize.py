"""Open-loop block-size decision.

A vectorized homogeneity splitter in the spirit of the reference's
psycho-visual open-loop mode (od_split_superblock,
block_size_enc.c:331: overlapped 2x2/4x4/8x8 variance statistics with
noise floors): regions whose fine-grained activity is uniform keep
large transforms (better coding gain); regions with spatially uneven
activity split so edges and texture get small transforms.

The decision is encoder-side only — the grid is signaled through the
per-node split symbols (skip = 4), so any rule yields a decodable
stream; this one is chosen to be fully batched.

Grid representation: bsize[i4, j4] in {0..3} per 4x4 luma cell, a valid
aligned quadtree within each 32x32 superblock.
"""

from __future__ import annotations

import numpy as np

__all__ = ["split_superblocks", "uniform_grid", "rdo_split_superblocks"]


def uniform_grid(h: int, w: int, bs: int) -> np.ndarray:
    return np.full((h // 4, w // 4), bs, dtype=np.int8)


def _pool(v, f):
    """Group (N, 2k, 2k) stats into (N, k, k) quads."""
    return f(
        np.stack([v[..., 0::2, 0::2], v[..., 0::2, 1::2],
                  v[..., 1::2, 0::2], v[..., 1::2, 1::2]]), axis=0)


def split_superblocks(plane: np.ndarray, quantizer: int,
                      residual: np.ndarray = None) -> np.ndarray:
    """Compute the bsize grid for one luma plane.

    plane: (h, w) uint8 input (intra) — or pass `residual` (int) to
    split on prediction error (inter).  Returns (h/4, w/4) int8."""
    src = (residual if residual is not None
           else plane.astype(np.int32))
    h, w = src.shape
    x = src.astype(np.int64)
    # Per-4x4 variance.
    s = x.reshape(h // 4, 4, w // 4, 4).transpose(0, 2, 1, 3)
    s = s.reshape(h // 4, w // 4, 16)
    v4 = (s * s).mean(axis=-1) - s.mean(axis=-1) ** 2
    # Noise floor scales with the quantizer: activity below it is
    # "flat enough" at this rate and should merge.
    floor = max(16.0, (quantizer / 16.0) ** 2 * 0.75)
    a4 = np.maximum(v4, floor)
    grid = np.zeros((h // 4, w // 4), dtype=np.int8)
    # Bottom-up merge: promote quads whose child activities agree.
    act = a4
    for level in range(1, 4):           # try 8x8, 16x16, 32x32
        q = np.stack([act[0::2, 0::2], act[0::2, 1::2],
                      act[1::2, 0::2], act[1::2, 1::2]])
        mx = q.max(axis=0)
        mn = q.min(axis=0)
        # Children must themselves have merged to level-1 everywhere.
        cells = 1 << (level - 1)
        gsub = grid.reshape(grid.shape[0] // cells, cells,
                            grid.shape[1] // cells, cells)
        child_ok = (gsub.min(axis=(1, 3)) >= level - 1)
        co = np.stack([child_ok[0::2, 0::2], child_ok[0::2, 1::2],
                       child_ok[1::2, 0::2], child_ok[1::2, 1::2]])
        # Homogeneity: ratio test with a mild absolute allowance.
        merge = (mx <= mn * 2.0 + floor) & co.all(axis=0)
        # Write the merged level back over the covered cells.
        up = np.repeat(np.repeat(merge, 2 * cells, 0), 2 * cells, 1)
        grid = np.where(up[:grid.shape[0], :grid.shape[1]],
                        np.int8(level), grid)
        act = np.where(merge, q.mean(axis=0), mx * 4.0)
    return grid


def rdo_split_superblocks(coeffs: np.ndarray, quantizer: int,
                          qm, qm_inv, pred: np.ndarray = None) -> np.ndarray:
    """Rate-distortion block-size decision, fully vectorized.

    The TPU-native reformulation of the reference's trial-encode RDO
    splitter (od_encode_recursive rdo_only, encode.c:1554-1673): instead
    of serial trial encodes with EC rollback, transform + quantize the
    whole plane at ALL four block sizes (4 batched passes), score each
    block with real distortion + the analytic PVQ rate, and run the
    bottom-up quadtree DP  cost(node) = min(leaf, sum children + split
    overhead)  with lambda = 0.55 q^2 (od_bs_rdo_lambda, encode.c:1061).

    coeffs: (h, w) int32 lapped coeff-domain luma (pred subtracted for
    inter).  Returns the (h/4, w/4) int8 grid."""
    from ..ops.dct import fdct2d
    from ..pvq.scan import BAND_OFFSETS, _FLAT

    h, w = coeffs.shape
    if pred is not None:
        coeffs = coeffs - pred
    q = max(1, quantizer)
    # Below the reference's od_bs_rdo_lambda (0.55 q^2): the trial
    # quantization here is deadzone, which understates PVQ's distortion
    # on small blocks for textured content — a lighter lambda corrects
    # the split bias (RD-swept on texture + warp clips, RDCOMP.md).
    lam = 0.35 * q * q
    costs = {}
    for bs in range(4):
        n = 4 << bs
        blocks = (coeffs.reshape(h // n, n, w // n, n)
                  .transpose(0, 2, 1, 3).reshape(-1, n, n))
        d = fdct2d(blocks, n).reshape(-1, n * n)
        vec = d[:, _FLAT[n]].astype(np.int64)
        qmv = qm[bs].astype(np.int64)
        qmiv = qm_inv[bs].astype(np.int64)
        scaled = (vec * qmv) >> 15
        quant = np.sign(scaled) * ((np.abs(scaled) + (q >> 1)) // q)
        deq = (quant * q * qmiv) >> 12
        # Distortion: SSE of the coded subset + full energy of the
        # never-coded coefficients (the 32x32 high half).
        full = d.astype(np.int64)
        rec = np.zeros_like(full)
        rec[:, _FLAT[n]] = deq
        mask = np.zeros(n * n, dtype=bool)
        mask[_FLAT[n]] = True
        dist = ((full - rec) ** 2 * mask).sum(axis=1) \
            + (full ** 2 * ~mask).sum(axis=1)
        # Rate: analytic PVQ codeword model per band + DC magnitude.
        offs = BAND_OFFSETS[bs]
        rate = np.zeros(len(d))
        for b in range(offs[0]):
            lo, hi = offs[1 + b], offs[2 + b]
            nb = hi - lo
            k = np.abs(quant[:, lo:hi]).sum(axis=1)
            rate += np.where(
                k > 0, nb * np.log2(1 + np.log(nb * 2) * k / nb) + 3.0,
                0.5)
        rate += np.log2(1 + np.abs(quant[:, 0])) + 2.0
        costs[bs] = (dist + lam * rate).reshape(h // n, w // n)
    # Bottom-up quadtree DP.
    best = costs[0]
    choice = {0: np.zeros_like(best, dtype=np.int8)}
    split_overhead = lam * 2.5  # split-symbol rate estimate
    for bs in range(1, 4):
        kids = (best[0::2, 0::2] + best[0::2, 1::2]
                + best[1::2, 0::2] + best[1::2, 1::2]) + split_overhead
        leaf = costs[bs]
        take_leaf = leaf <= kids
        choice[bs] = take_leaf
        best = np.where(take_leaf, leaf, kids)
    # Emit the grid top-down.
    grid = np.zeros((h // 4, w // 4), dtype=np.int8)
    decided = np.zeros((h // 4, w // 4), dtype=bool)
    for bs in range(3, 0, -1):
        cells = 1 << bs
        up = np.repeat(np.repeat(choice[bs], cells, 0), cells, 1)
        sel = up & ~decided
        grid[sel] = bs
        decided |= sel
    return grid
