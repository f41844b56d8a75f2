"""Directional deringing filter (the CDEF ancestor).

Per 8x8 block: estimate the dominant direction by maximizing the
directional projection energy over 8 candidate line fields
(od_dir_find8, filter.c:1655-1707), then apply a 7-tap conditional
filter along that direction and a conservative 4-tap filter orthogonal
to it (filter.c:1717-1793).  Thresholds scale as q^0.84182 modulated by
local and superblock variance (od_compute_thresh, filter.c:1816-1832).

Everything here is batched over the 4x4 grid of 8x8 blocks in a
superblock (and vectorizes further over superblocks), replacing the
reference's per-pixel scalar loops and its SSE4.1/AVX dispatch.
"""

from __future__ import annotations

import numpy as np

__all__ = ["dir_find8", "dering_sb", "dering_frame",
           "DERING_VERY_LARGE"]

DERING_VERY_LARGE = 30000
FILT_BORDER = 3

_DLIB = None


def _dering_lib():
    """Native dering (native/ec.cpp dtpu_dering_frame), a bit-exact
    twin of the batched numpy path; DTPU_PY_DERING=1 forces numpy."""
    global _DLIB
    if _DLIB is not None:
        return _DLIB
    import ctypes
    import os

    if os.environ.get("DTPU_PY_DERING"):
        _DLIB = False
        return False
    try:
        from ..entropy.native import _load

        lib = _load()
        if not lib or not hasattr(lib, "dtpu_dering_frame"):
            _DLIB = False
            return False
        p = ctypes.c_void_p
        i = ctypes.c_int
        lib.dtpu_dering_frame.argtypes = [p, i, i, i, i, i, i, i, p, p,
                                          p]
        _DLIB = lib
    except Exception:
        _DLIB = False
    return _DLIB

# Direction offset tables: for dir d, taps at +-(dy, dx) * k distance
# (direction_offsets_table, filter.c:146-155 with OD_FILT_BSTRIDE
# converted to (dy, dx) pairs).
DIR_OFFSETS = np.array([
    [(-1, 1), (-2, 2), (-3, 3)],
    [(0, 1), (-1, 2), (-1, 3)],
    [(0, 1), (0, 2), (0, 3)],
    [(0, 1), (1, 2), (1, 3)],
    [(1, 1), (2, 2), (3, 3)],
    [(1, 0), (2, 1), (3, 1)],
    [(1, 0), (2, 0), (3, 0)],
    [(1, 0), (2, -1), (3, -1)],
], dtype=np.int32)

# x^0.16 lookup by log2(x), Q8 (od_thresh_table_q8, filter.c:1800).
THRESH_TABLE_Q8 = np.array([
    128, 134, 150, 168, 188, 210, 234, 262,
    292, 327, 365, 408, 455, 509, 569, 635,
    710, 768,
], dtype=np.int32)

# Precomputed projection-bin assignment per direction: bins[d][i][j] is
# the partial index pixel (i, j) accumulates into (od_dir_find8).
_I, _J = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
_BINS = np.stack([
    _I + _J,
    _I + (_J // 2),
    _I,
    3 + _I - (_J // 2),
    7 + _I - _J,
    3 - (_I // 2) + _J,
    _J,
    (_I // 2) + _J,
])  # (8, 8, 8) values in [0, 15)

_ONE_HOT = np.zeros((8, 15, 64), dtype=np.int32)
for _d in range(8):
    for _y in range(8):
        for _x in range(8):
            _ONE_HOT[_d, _BINS[_d, _y, _x], _y * 8 + _x] = 1


def dir_find8(blocks):
    """Direction + variance for a batch of 8x8 blocks.

    blocks: (N, 8, 8) int (coeff domain; >> 4 applied internally).
    Returns (dirs (N,), var (N,))."""
    x = (np.asarray(blocks, dtype=np.int64) >> 4).reshape(-1, 64)
    nblk = x.shape[0]
    # partial[d] = x @ one_hot[d].T : (N, 15)
    partial = np.einsum("nk,dbk->ndb", x, _ONE_HOT)
    cost = np.zeros((nblk, 8), dtype=np.int64)
    p = partial
    # Horizontal / vertical (8 equal-length lines of 8).
    cost[:, 2] = (p[:, 2, :8] ** 2 >> 3).sum(axis=1)
    cost[:, 6] = (p[:, 6, :8] ** 2 >> 3).sum(axis=1)
    # 45-degree diagonals: line lengths 1..8..1.
    for d in (0, 4):
        c = np.zeros(nblk, dtype=np.int64)
        for i in range(7):
            c += (p[:, d, i] ** 2) // (i + 1) \
                + (p[:, d, 14 - i] ** 2) // (i + 1)
        c += (p[:, d, 7] * p[:, d, 7]) >> 3
        cost[:, d] = c
    # Off-diagonals: 5 middle bins of length 8 + tapering ends.
    for d in (1, 3, 5, 7):
        c = np.zeros(nblk, dtype=np.int64)
        for j in range(5):
            c += p[:, d, 3 + j] ** 2 >> 3
        for j in range(3):
            c += (p[:, d, j] ** 2) // (2 * j + 2) \
                + (p[:, d, 10 - j] ** 2) // (2 * j + 2)
        cost[:, d] = c
    best = np.argmax(cost, axis=1)
    best_cost = cost[np.arange(nblk), best]
    var = best_cost - cost[np.arange(nblk), (best + 4) & 7]
    return best.astype(np.int32), var.astype(np.int64)


def _shift(padded, dy, dx, n):
    b = FILT_BORDER
    return padded[..., b + dy:b + dy + n, b + dx:b + dx + n]


def _dir_filter(padded, dirs_grid, thresh_grid, n, bsize):
    """7-tap directional pass over an n x n SB area.

    padded: (n + 6, n + 6) int32; dirs/thresh per 8x8 (or 4x4 chroma)
    block, broadcast to pixels."""
    taps = (3, 2, 2)
    x = _shift(padded, 0, 0, n).astype(np.int64)
    total = np.zeros_like(x)
    for d in range(8):
        sum_d = np.zeros_like(x)
        for k in range(3):
            dy, dx = DIR_OFFSETS[d, k]
            for sgn in (1, -1):
                pdiff = _shift(padded, sgn * dy, sgn * dx, n) - x
                sum_d += np.where(np.abs(pdiff) < thresh_grid,
                                  taps[k] * pdiff, 0)
        total = np.where(dirs_grid == d, sum_d, total)
    return (x + ((total + 8) >> 4)).astype(np.int32)


def _ortho_filter(y1_padded, orig, dirs_grid, thresh_grid, n):
    """Conservative 4-tap pass orthogonal to the direction."""
    x = _shift(y1_padded, 0, 0, n).astype(np.int64)
    athresh = np.minimum(thresh_grid,
                         thresh_grid // 3 + np.abs(x - orig))
    total = np.zeros_like(x)
    for vert in (True, False):
        sum_o = np.zeros_like(x)
        for off in (1, 2, -1, -2):
            dy, dx = (off, 0) if vert else (0, off)
            pdiff = _shift(y1_padded, dy, dx, n) - x
            sum_o += np.where(np.abs(pdiff) < athresh, pdiff, 0)
        is_vert = dirs_grid <= 4
        total = np.where(is_vert == vert, sum_o, total)
    return (x + ((3 * total + 8) >> 4)).astype(np.int32)


def dering_sb(frame, sbx, sby, nhsb, nvsb, q, xdec, pli,
              dirs=None, threshold_scale=1.0):
    """Dering one superblock of a plane (od_dering, filter.c:1835-1950).

    frame: full pre-dering plane (int32 coeff domain).  Returns
    (filtered n x n block, dirs grid) — dirs computed on luma and reused
    for chroma."""
    ln = 5 - xdec
    n = 1 << ln
    bsize = 3 - xdec
    nb = n >> bsize
    y0 = sby << ln
    x0 = sbx << ln
    b = FILT_BORDER
    # Gather the padded input; unavailable frame edges use VERY_LARGE so
    # the conditional taps reject them.
    padded = np.full((n + 2 * b, n + 2 * b), DERING_VERY_LARGE,
                     dtype=np.int32)
    ys = y0 - b * (sby != 0)
    ye = y0 + n + b * (sby != nvsb - 1)
    xs = x0 - b * (sbx != 0)
    xe = x0 + n + b * (sbx != nhsb - 1)
    padded[b - (y0 - ys):b + (ye - y0), b - (x0 - xs):b + (xe - x0)] = \
        frame[ys:ye, xs:xe]
    threshold = int(np.power(q, 0.84182) * threshold_scale)
    if pli == 0:
        blocks = (padded[b:b + n, b:b + n]
                  .reshape(nb, 8, nb, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8))
        dirs, var = dir_find8(blocks)
        dirs = dirs.reshape(nb, nb)
        var = var.reshape(nb, nb)
        varsum = int(var.sum())
        v1 = np.minimum(32767, var >> 6)
        v2 = min(32767, varsum // (32 * 32))
        idx = np.clip(_ilog_arr(v1 * v2) - 9, 0, 17)
        thresh = (threshold * THRESH_TABLE_Q8[idx]) >> 8
    else:
        assert dirs is not None
        thresh = np.full((nb, nb), threshold, dtype=np.int64)
        if dirs.shape[0] != nb:
            # 4:2:0 chroma: one 4x4 chroma block per luma 8x8; reuse the
            # co-located direction.
            dirs = dirs[:nb, :nb]
    dirs_grid = np.repeat(np.repeat(dirs, 1 << bsize, 0), 1 << bsize, 1)
    thresh_grid = np.repeat(np.repeat(thresh, 1 << bsize, 0),
                            1 << bsize, 1)
    y1 = _dir_filter(padded, dirs_grid, thresh_grid, n, bsize)
    y1p = np.full((n + 2 * b, n + 2 * b), DERING_VERY_LARGE,
                  dtype=np.int32)
    y1p[b:b + n, b:b + n] = y1
    orig = padded[b:b + n, b:b + n].astype(np.int64)
    out = _ortho_filter(y1p, orig, dirs_grid, thresh_grid, n)
    return out, dirs


def dering_frame(frame, nhsb, nvsb, q, xdec, pli, dirs=None,
                 threshold_scale=1.0):
    """Dering every superblock of a plane in ONE batched pass.

    Identical per-SB semantics to dering_sb (the filter reads the
    pre-dering plane with a 3 px halo; frame edges reject via
    VERY_LARGE), but the direction search and both filter passes run
    with a leading (nvsb * nhsb) batch axis — one call per plane per
    frame instead of one per superblock.

    Returns (filtered (nvsb, nhsb, n, n) int32,
             dirs (nvsb, nhsb, nb_luma, nb_luma) when pli == 0 else the
             dirs that were passed in)."""
    lib = _dering_lib()
    if lib:
        ln = 5 - xdec
        n = 1 << ln
        nb = n >> (3 - xdec)
        h, w = frame.shape
        import ctypes

        fr = np.ascontiguousarray(frame, dtype=np.int32)
        out = np.empty((nvsb, nhsb, n, n), dtype=np.int32)
        threshold = int(np.power(q, 0.84182) * threshold_scale)
        vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        if pli == 0:
            dout = np.empty((nvsb, nhsb, nb, nb), dtype=np.int32)
            lib.dtpu_dering_frame(vp(fr), h, w, nhsb, nvsb, threshold,
                                  xdec, 0, None, vp(out), vp(dout))
            return out, dout
        din = np.ascontiguousarray(dirs, dtype=np.int32)
        lib.dtpu_dering_frame(vp(fr), h, w, nhsb, nvsb, threshold,
                              xdec, pli, vp(din), vp(out), None)
        return out, None
    ln = 5 - xdec
    n = 1 << ln
    bsize = 3 - xdec
    nb = n >> bsize
    b = FILT_BORDER
    h, w = frame.shape
    P = np.full((h + 2 * b, w + 2 * b), DERING_VERY_LARGE,
                dtype=np.int32)
    P[b:b + h, b:b + w] = frame
    win = np.lib.stride_tricks.sliding_window_view(
        P, (n + 2 * b, n + 2 * b))[::n, ::n]
    padded = np.ascontiguousarray(
        win.reshape(-1, n + 2 * b, n + 2 * b))     # (N, n+6, n+6)
    N = padded.shape[0]
    threshold = int(np.power(q, 0.84182) * threshold_scale)
    if pli == 0:
        blocks = (padded[:, b:b + n, b:b + n]
                  .reshape(N, nb, 8, nb, 8).transpose(0, 1, 3, 2, 4)
                  .reshape(-1, 8, 8))
        d8, var = dir_find8(blocks)
        dirs = d8.reshape(N, nb, nb)
        var = var.reshape(N, nb, nb)
        varsum = var.sum(axis=(1, 2))
        v1 = np.minimum(32767, var >> 6)
        v2 = np.minimum(32767, varsum // (32 * 32))[:, None, None]
        idx = np.clip(_ilog_arr(v1 * v2) - 9, 0, 17)
        thresh = (threshold * THRESH_TABLE_Q8[idx]) >> 8
        out_dirs = dirs.reshape(nvsb, nhsb, nb, nb)
    else:
        assert dirs is not None
        ldirs = dirs.reshape(nvsb * nhsb, dirs.shape[2], dirs.shape[3])
        if ldirs.shape[1] != nb:
            ldirs = ldirs[:, :nb, :nb]
        dirs = ldirs
        thresh = np.full((N, nb, nb), threshold, dtype=np.int64)
        out_dirs = None
    dirs_grid = np.repeat(np.repeat(dirs, 1 << bsize, 1), 1 << bsize, 2)
    thresh_grid = np.repeat(np.repeat(thresh, 1 << bsize, 1),
                            1 << bsize, 2)
    y1 = _dir_filter(padded, dirs_grid, thresh_grid, n, bsize)
    y1p = np.full((N, n + 2 * b, n + 2 * b), DERING_VERY_LARGE,
                  dtype=np.int32)
    y1p[:, b:b + n, b:b + n] = y1
    orig = padded[:, b:b + n, b:b + n].astype(np.int64)
    out = _ortho_filter(y1p, orig, dirs_grid, thresh_grid, n)
    return out.reshape(nvsb, nhsb, n, n), out_dirs


def _ilog_arr(x):
    """Elementwise OD_ILOG (bit length)."""
    x = np.asarray(x, dtype=np.int64)
    out = np.zeros_like(x)
    v = x.copy()
    while np.any(v > 0):
        out = np.where(v > 0, out + 1, out)
        v >>= 1
    return out
