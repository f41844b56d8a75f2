"""Lapped pre/post filters — Daala's replacement for a deblocking filter.

Invertible biorthogonal filters applied across transform-block edges:
the prefilter before the forward DCT decorrelates across block
boundaries; the postfilter after the inverse DCT smooths them, with
perfect reconstruction.  Structure per filter (filter.c:60-115 spec):

    +1/-1 butterflies -> dyadic scaling of the high half (positive-
    increment trick for exact invertibility) -> type-3 p/u lifting
    rotations -> closing butterflies.

All four sizes (4/8/16/32-point, filter.c:141-1240) are built from one
generic constructor over their trained 6-bit parameter sets; inverses
derive mechanically from the lifting engine.  The codec applies the
4-point filter across every block edge (OD_FILT_SIZE == 0,
filter.h:94-99).

TPU-native frame application: instead of the reference's per-edge
scalar loops with a recursive split walk (od_apply_prefilter_frame_sbs
filter.c:1556, od_prefilter_split filter.c:1486), we gather ALL
horizontal edge spans of a plane into one (nedges, 4, width) batch and
run the filter once, then the same for vertical edges.  The postfilter
applies the exact inverse in reverse order (v then h).  The h-then-v
order differs from the reference's per-level interleaving at edge
crossings; it is self-consistent between our encoder and decoder and
RD-equivalent.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .lifting import (
    LanedTransform,
    addf,
    lift,
    rsub,
    scale6,
    subf,
)

__all__ = [
    "pre_filter",
    "post_filter",
    "FILTER_PARAMS",
    "lap_frame_h",
    "lap_frame_v",
    "prefilter_frame",
    "postfilter_frame",
]

# Trained 6-bit parameter sets (filter.c:154-173, 255-305, 641-676,
# 806-875): per size, K scales, K-1 p's, K-1 u's.
FILTER_PARAMS = {
    4: (85, 75, -15, 33),
    8: (93, 72, 73, 78, -28, -23, -10, 50, 37, 23),
    16: (94, 71, 68, 68, 68, 69, 70, 73,
         -32, -37, -36, -32, -26, -17, -7,
         56, 49, 45, 40, 34, 26, 15),
    32: (91, 70, 68, 67, 67, 67, 67, 66, 66, 67, 67, 66, 67, 67, 67, 70,
         -32, -41, -42, -41, -40, -38, -36, -34, -32, -29, -24, -19, -14,
         -9, -5,
         58, 52, 50, 48, 45, 43, 40, 38, 35, 32, 29, 24, 18, 13, 8),
}


def _build_filter(n: int) -> LanedTransform:
    params = FILTER_PARAMS[n]
    k = n // 2
    scales = params[:k]
    ps = params[k:2 * k - 1]
    us = params[2 * k - 1:]
    prog = []
    # Opening +1/-1 butterflies.
    for i in range(k):
        prog.append(rsub(n - 1 - i, i))     # t[n-1-i] = x[i] - x[n-1-i]
    for i in range(k):
        prog.append(subf(i, n - 1 - i))     # t[i] -= t[n-1-i] >> 1
    # Biorthogonal scaling of the high half.
    for i in range(k):
        if scales[i] != 64:
            prog.append(scale6(k + i, scales[i]))
    # Type-3 p/u rotations, outermost pair inward.
    for m in range(k - 1, 0, -1):
        prog.append(lift(k + m, k + m - 1, ps[m - 1], 32, 6))
        prog.append(lift(k + m - 1, k + m, us[m - 1], 32, 6))
    # Closing butterflies.
    for i in range(k):
        prog.append(addf(i, n - 1 - i))     # t[i] += t[n-1-i] >> 1
    for i in range(k):
        prog.append(rsub(n - 1 - i, i))     # y[n-1-i] = t[i] - t[n-1-i]
    return LanedTransform(n, {i: i for i in range(n)}, prog, list(range(n)))


_FILTERS = {n: _build_filter(n) for n in FILTER_PARAMS}


def pre_filter(x, n: int):
    """Apply the n-point prefilter along the last axis of (..., n)."""
    return _FILTERS[n].forward(x)


def post_filter(y, n: int):
    """Exact inverse of pre_filter."""
    return _FILTERS[n].inverse(y)


# -- whole-frame batched application --------------------------------------


def lap_frame_h(plane, rows: Sequence[int], inverse: bool = False):
    """Filter across horizontal edges: for each edge row r in `rows`, the
    4-pixel column spans plane[r-2:r+2, :] are filtered vertically.

    plane: (h, w) int32 array.  Edges must be >= 4px apart (block grid
    guarantees this).  Returns the filtered plane.
    """
    if len(rows) == 0:
        return plane
    idx = np.asarray(rows, dtype=np.int32)[:, None] + np.arange(-2, 2)
    spans = plane[idx]                      # (nedges, 4, w)
    spans = spans.swapaxes(-1, -2)          # (nedges, w, 4)
    out = post_filter(spans, 4) if inverse else pre_filter(spans, 4)
    out = out.swapaxes(-1, -2)
    if isinstance(plane, np.ndarray):
        plane = plane.copy()
        plane[idx] = out
        return plane
    return plane.at[idx].set(out)


def lap_frame_v(plane, cols: Sequence[int], inverse: bool = False):
    """Filter across vertical edges (4-pixel row spans, horizontally)."""
    if len(cols) == 0:
        return plane
    idx = np.asarray(cols, dtype=np.int32)[:, None] + np.arange(-2, 2)
    spans = plane[:, idx]                   # (h, nedges, 4)
    out = post_filter(spans, 4) if inverse else pre_filter(spans, 4)
    if isinstance(plane, np.ndarray):
        plane = plane.copy()
        plane[:, idx] = out
        return plane
    return plane.at[:, idx].set(out)


def block_edges(size: int, block: int) -> np.ndarray:
    """Interior block-grid edge positions for a dimension of `size`."""
    return np.arange(block, size, block, dtype=np.int32)


def prefilter_frame(plane, block: int):
    """Prefilter a plane across every interior block edge (h then v)."""
    h, w = plane.shape[-2], plane.shape[-1]
    plane = lap_frame_h(plane, block_edges(h, block))
    return lap_frame_v(plane, block_edges(w, block))


def postfilter_frame(plane, block: int):
    """Exact inverse of prefilter_frame (v then h, inverse filters)."""
    h, w = plane.shape[-2], plane.shape[-1]
    plane = lap_frame_v(plane, block_edges(w, block), inverse=True)
    return lap_frame_h(plane, block_edges(h, block), inverse=True)
