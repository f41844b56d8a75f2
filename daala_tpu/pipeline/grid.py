"""Variable block-size grid machinery.

The bsize grid (one entry per luma 4x4 cell, values 0..3, an aligned
quadtree per 32x32 superblock) drives:

  * which block edges get the 4-point lapped filter (every internal
    quadtree boundary — od_prefilter_split applied over the recursion,
    filter.c:1486-1554 — plus all superblock edges);
  * per-size batched forward/inverse transforms;
  * the keyframe Haar-DC combine (only at split nodes,
    od_compute_dcts, encode.c:1316-1350).

All passes are batched gathers/scatters over the whole plane.
"""

from __future__ import annotations

import numpy as np

from ..ops.dct import fdct2d, idct2d, _haar_kernel
from ..ops.lapping import post_filter, pre_filter

__all__ = [
    "plane_grid",
    "prefilter_plane_grid",
    "postfilter_plane_grid",
    "fdct_plane_grid",
    "idct_plane_grid",
    "haar_dc_tree_grid",
    "block_positions",
]


def plane_grid(grid_luma: np.ndarray, xdec: int) -> np.ndarray:
    """Luma-relative grid -> per-plane-cell block sizes."""
    g = grid_luma[:: 1 << xdec, :: 1 << xdec]
    return (np.maximum(g, xdec) - xdec).astype(np.int8)


def _boundary_masks(pg: np.ndarray):
    """(h-boundary mask, v-boundary mask) over plane 4x4 cells: cell
    (i, j) starts a new block vertically/horizontally."""
    i = np.arange(pg.shape[0])[:, None]
    j = np.arange(pg.shape[1])[None, :]
    size = (1 << pg.astype(np.int32))
    hb = (i % size == 0) & (i > 0)
    vb = (j % size == 0) & (j > 0)
    return hb, vb


def _h_spans(pg):
    hb, _ = _boundary_masks(pg)
    ci, cj = np.nonzero(hb)
    ys = (ci * 4).repeat(4)
    xs = (cj[:, None] * 4 + np.arange(4)[None, :]).ravel()
    return ys, xs


def _v_spans(pg):
    _, vb = _boundary_masks(pg)
    ci, cj = np.nonzero(vb)
    xs = (cj * 4).repeat(4)
    ys = (ci[:, None] * 4 + np.arange(4)[None, :]).ravel()
    return ys, xs


def prefilter_plane_grid(plane: np.ndarray, pg: np.ndarray) -> np.ndarray:
    """Lapped prefilter across every internal block edge (h then v)."""
    out = plane.copy()
    ys, xs = _h_spans(pg)
    if len(ys):
        spans = out[ys[:, None] + np.arange(-2, 2)[None, :], xs[:, None]]
        out[ys[:, None] + np.arange(-2, 2)[None, :], xs[:, None]] = \
            pre_filter(spans, 4)
    ys, xs = _v_spans(pg)
    if len(ys):
        spans = out[ys[:, None], xs[:, None] + np.arange(-2, 2)[None, :]]
        out[ys[:, None], xs[:, None] + np.arange(-2, 2)[None, :]] = \
            pre_filter(spans, 4)
    return out


def postfilter_plane_grid(plane: np.ndarray, pg: np.ndarray) -> np.ndarray:
    """Exact inverse (v then h, postfilters)."""
    out = plane.copy()
    ys, xs = _v_spans(pg)
    if len(ys):
        spans = out[ys[:, None], xs[:, None] + np.arange(-2, 2)[None, :]]
        out[ys[:, None], xs[:, None] + np.arange(-2, 2)[None, :]] = \
            post_filter(spans, 4)
    ys, xs = _h_spans(pg)
    if len(ys):
        spans = out[ys[:, None] + np.arange(-2, 2)[None, :], xs[:, None]]
        out[ys[:, None] + np.arange(-2, 2)[None, :], xs[:, None]] = \
            post_filter(spans, 4)
    return out


def block_positions(pg: np.ndarray, bs: int):
    """(ys, xs) pixel top-lefts of every leaf block of size bs."""
    step = 1 << bs
    cells = pg[::step, ::step]
    i = np.arange(cells.shape[0])
    j = np.arange(cells.shape[1])
    # A cell at a step-aligned position with value bs is a leaf origin.
    mask = cells == bs
    ci, cj = np.nonzero(mask)
    return (ci * step * 4).astype(np.int64), (cj * step * 4).astype(np.int64)


def _gather_blocks(plane, ys, xs, n):
    return plane[ys[:, None, None] + np.arange(n)[None, :, None],
                 xs[:, None, None] + np.arange(n)[None, None, :]]


def _scatter_blocks(plane, ys, xs, n, blocks):
    plane[ys[:, None, None] + np.arange(n)[None, :, None],
          xs[:, None, None] + np.arange(n)[None, None, :]] = blocks


def fdct_plane_grid(c: np.ndarray, pg: np.ndarray) -> np.ndarray:
    """Per-size batched forward DCT of every leaf block."""
    d = np.zeros_like(c)
    for bs in range(4):
        ys, xs = block_positions(pg, bs)
        if len(ys) == 0:
            continue
        n = 4 << bs
        blocks = _gather_blocks(c, ys, xs, n)
        _scatter_blocks(d, ys, xs, n, fdct2d(blocks, n))
    return d


def idct_plane_grid(d: np.ndarray, pg: np.ndarray) -> np.ndarray:
    c = np.zeros_like(d)
    for bs in range(4):
        ys, xs = block_positions(pg, bs)
        if len(ys) == 0:
            continue
        n = 4 << bs
        blocks = _gather_blocks(np.asarray(d, dtype=np.int32), ys, xs, n)
        _scatter_blocks(c, ys, xs, n, idct2d(blocks, n))
    return c


def haar_dc_tree_grid(d: np.ndarray, pg: np.ndarray,
                      max_level: int = 3) -> np.ndarray:
    """Bottom-up Haar DC combine at split nodes only.

    max_level caps the combine at the plane's superblock size: 3 for
    luma (32 px), 3 - xdec for subsampled chroma (the chroma SB is
    16 px, so combining a 32 px chroma node would merge DCs ACROSS
    superblocks — a level the per-SB coding pass never undoes)."""
    d = d.copy()
    for level in range(1, max_level + 1):   # node sizes 8..32 px
        step = 1 << level            # node size in cells
        node = pg[::step, ::step]
        internal = node < level      # node is split
        ni, nj = np.nonzero(internal)
        if len(ni) == 0:
            continue
        ypix = ni * step * 4
        xpix = nj * step * 4
        off = (1 << level) * 2       # child pixel offset = node_px / 2
        a = d[ypix, xpix]
        right = d[ypix, xpix + off]
        down = d[ypix + off, xpix]
        diag = d[ypix + off, xpix + off]
        a, down, right, diag = _haar_kernel(a, down, right, diag)
        d[ypix, xpix] = a
        d[ypix, xpix + off] = right
        d[ypix + off, xpix] = down
        d[ypix + off, xpix + off] = diag
    return d
