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

__all__ = ["split_superblocks", "uniform_grid"]


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
