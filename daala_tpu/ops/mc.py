"""Motion compensation: 1/8-pel subpel interpolation + OBMC blending.

Subpel: separable 6-tap windowed-sinc filters, one per fractional phase
(OD_SUBPEL_FILTER_SET, mc.c:66-78), Q7 coefficients; horizontal pass
into a 16-bit intermediate, vertical pass with Q14 rounding
(od_mc_predict1fmv8_c, mc.c:94-203).

OBMC: the MV mesh assigns a motion vector to each grid VERTEX; the
block between 4 vertices is predicted by bilinearly blending the 4
whole-block predictions translated by the corner MVs
(od_mc_blend_full8_c, mc.c spec).  Adjacent blocks share corner MVs, so
the prediction field is continuous — no block edges to deblock.

Everything is batched over all mesh blocks of a frame: the per-corner
subpel predictions are one gather + two einsum filter passes, and the
blend is a fixed bilinear weighting — the TPU replacement for
src/x86/sse2mc.c.
"""

from __future__ import annotations

import numpy as np

__all__ = ["SUBPEL_FILTERS", "subpel_predict_blocks", "subpel_sads",
           "obmc_predict", "pad_ref"]

_MCLIB = None


def _mc_lib():
    """Native batched subpel/SAD kernels (native/ec.cpp); bit-exact
    twins of the numpy path below, threaded over blocks."""
    global _MCLIB
    if _MCLIB is not None:
        return _MCLIB
    import ctypes
    import os

    if os.environ.get("DTPU_PY_MC"):
        _MCLIB = False
        return False
    try:
        from ..entropy.native import _load

        lib = _load()
        if not lib or not hasattr(lib, "dtpu_subpel_blocks"):
            _MCLIB = False
            return False
        p = ctypes.c_void_p
        i64 = ctypes.c_int64
        i32 = ctypes.c_int
        lib.dtpu_subpel_blocks.argtypes = [
            p, i32, i64, i32, p, p, p, i64, i32, i32, p]
        lib.dtpu_subpel_sad.argtypes = [
            p, i32, i64, i32, p, p, p, p, p, i64, i64, i32, i32, p]
        _MCLIB = lib
    except Exception:
        _MCLIB = False
    return _MCLIB


def _c64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def subpel_sads(ref_padded, pad, cur_blocks, ys, xs, mvs, cands,
                bitdepth: int = 8):
    """SAD of every (block, candidate) pair at 1/8-pel: the fused
    search primitive (prediction is never materialized).

    ref_padded: (H+2p, W+2p) uint8/uint16; cur_blocks (N, n, n) same
    dtype; mvs (N, 2) and cands (C, 2) eighth-pel.  Returns (N, C)
    int64."""
    import ctypes

    n = cur_blocks.shape[-1]
    # Accelerator route: one fused jitted sweep over all candidates
    # (bit-exact with both host paths) when the batch is large enough
    # to amortize dispatch.
    if len(ys) * len(cands) * n * n >= (1 << 20):
        from .backend import accel

        if accel() is not None:
            from .mc_jax import subpel_sads_accel

            out = subpel_sads_accel(ref_padded, pad, cur_blocks, ys, xs,
                                    mvs, cands, bitdepth)
            if out is not None:
                return out
    lib = _mc_lib()
    if lib and n <= 64 and ref_padded.dtype in (np.uint8, np.uint16):
        cur = np.ascontiguousarray(cur_blocks)
        assert cur.dtype == ref_padded.dtype
        rp = np.ascontiguousarray(ref_padded)
        ysv, xsv, mvv, cdv = _c64(ys), _c64(xs), _c64(mvs), _c64(cands)
        out = np.empty((len(ysv), len(cdv)), dtype=np.int64)
        vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        lib.dtpu_subpel_sad(
            vp(rp), rp.dtype.itemsize, rp.shape[1], int(pad), vp(cur),
            vp(ysv), vp(xsv), vp(mvv), vp(cdv), len(cdv), len(ysv), n,
            int(bitdepth), vp(out))
        return out
    cb = cur_blocks.astype(np.int32)
    out = np.empty((len(ys), len(cands)), dtype=np.int64)
    for ci, d in enumerate(np.asarray(cands)):
        p = subpel_predict_blocks(ref_padded, pad, ys, xs,
                                  np.asarray(mvs) + d, n, bitdepth)
        out[:, ci] = np.abs(cb - p.astype(np.int32)).sum(axis=(1, 2))
    return out

# Q7 6-tap filters per 1/8-pel phase (set #2: sinc(x)*sinc(x/3)).
SUBPEL_FILTERS = np.array([
    [0, 0, 128, 0, 0, 0],
    [1, -9, 122, 18, -5, 1],
    [3, -15, 112, 37, -11, 2],
    [3, -18, 97, 58, -15, 3],
    [4, -20, 80, 80, -20, 4],
    [3, -15, 58, 97, -18, 3],
    [2, -11, 37, 112, -15, 3],
    [1, -5, 18, 122, -9, 1],
], dtype=np.int32)

TOP_APRON = 2      # taps/2 - 1
BOT_APRON = 3      # taps/2
PAD = 80           # reference-frame padding (search range + filter apron)


def pad_ref(plane: np.ndarray, pad: int = PAD) -> np.ndarray:
    """Replicate-pad a reconstructed reference plane."""
    return np.pad(plane, pad, mode="edge")


def subpel_predict_blocks(ref_padded: np.ndarray, pad: int,
                          ys: np.ndarray, xs: np.ndarray,
                          mvs: np.ndarray, n: int,
                          bitdepth: int = 8) -> np.ndarray:
    """Batched single-MV prediction of N blocks.

    ref_padded: (H + 2*pad, W + 2*pad) uint8-ish int array.
    ys, xs: (N,) top-left block positions in the unpadded frame.
    mvs: (N, 2) 1/8-pel (mvy, mvx).
    Returns (N, n, n) uint8 predictions."""
    import ctypes

    lib = _mc_lib()
    if lib and n <= 64 and getattr(ref_padded, "dtype", None) in (
            np.uint8, np.uint16):
        rp = np.ascontiguousarray(ref_padded)
        ysv, xsv, mvv = _c64(ys), _c64(xs), _c64(mvs)
        out = np.empty((len(mvv), n, n), dtype=rp.dtype)
        vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        lib.dtpu_subpel_blocks(
            vp(rp), rp.dtype.itemsize, rp.shape[1], int(pad), vp(ysv),
            vp(xsv), vp(mvv), len(mvv), n, int(bitdepth), vp(out))
        return out
    mvy = mvs[:, 0]
    mvx = mvs[:, 1]
    iy = ys + (mvy >> 3) + pad
    ix = xs + (mvx >> 3) + pad
    fy = (mvy & 7).astype(np.int32)
    fx = (mvx & 7).astype(np.int32)
    maxv = (1 << bitdepth) - 1
    dtype = np.uint8 if bitdepth <= 8 else np.uint16
    out = np.empty((len(mvs), n, n), dtype=dtype)
    rng_n = np.arange(n)
    # Phase-0 filters are the identity, so integer MVs are a pure
    # gather — but splitting the batch only pays when a sizable share
    # is integer (static/panning content); otherwise one fused pass
    # is faster.
    center = 128 << (bitdepth - 8)
    zero = (fy == 0) & (fx == 0)
    nzero = int(zero.sum())
    if nzero * 2 < len(mvs):
        # Few integer MVs: one fused pass over the whole batch.
        wy = iy[:, None] - TOP_APRON + np.arange(n + 5)[None, :]
        wx = ix[:, None] - TOP_APRON + np.arange(n + 5)[None, :]
        win = ref_padded[wy[:, :, None], wx[:, None, :]].astype(np.int32)
        fh = SUBPEL_FILTERS[fx]                # (N, 6)
        h = np.einsum(
            "brck,bk->brc",
            np.lib.stride_tricks.sliding_window_view(win, 6, axis=2),
            fh) - (center << 7)
        fv = SUBPEL_FILTERS[fy]
        v = np.einsum(
            "brck,bk->brc",
            np.lib.stride_tricks.sliding_window_view(h, 6, axis=1),
            fv)
        res = (v + (1 << 13) + (center << 14)) >> 14
        return np.clip(res, 0, maxv).astype(dtype)
    zi = np.where(zero)[0]
    wy = iy[zi, None] + rng_n[None, :]
    wx = ix[zi, None] + rng_n[None, :]
    out[zi] = ref_padded[wy[:, :, None], wx[:, None, :]]
    sub = np.where(~zero)[0]
    if len(sub):
        wy = iy[sub, None] - TOP_APRON + np.arange(n + 5)[None, :]
        wx = ix[sub, None] - TOP_APRON + np.arange(n + 5)[None, :]
        win = ref_padded[wy[:, :, None], wx[:, None, :]].astype(np.int32)
        # Horizontal 6-tap with per-block phase filters:
        # h[b, r, c] = sum_k win[b, r, c + k] * fh[b, k], c in [0, n).
        fh = SUBPEL_FILTERS[fx[sub]]           # (N, 6)
        h = np.einsum(
            "brck,bk->brc",
            np.lib.stride_tricks.sliding_window_view(win, 6, axis=2),
            fh) - (center << 7)
        # Vertical 6-tap (sliding window appends the tap axis last).
        fv = SUBPEL_FILTERS[fy[sub]]
        v = np.einsum(
            "brck,bk->brc",
            np.lib.stride_tricks.sliding_window_view(h, 6, axis=1),
            fv)
        res = (v + (1 << 13) + (center << 14)) >> 14
        out[sub] = np.clip(res, 0, maxv)
    return out


def obmc_predict_mixed(ref_padded, pad: int, h: int, w: int,
                       mv_grid: np.ndarray, levels: np.ndarray,
                       fine_log: int, ref_ids: np.ndarray = None,
                       bitdepth: int = 8):
    """Mixed-block-size OBMC from a dense fine vertex grid + per-SB
    subdivision levels (search/mesh.py) — the od_mc_blend multi-level
    capability (mc.c:1228-1564) restructured for batching: one
    whole-frame uniform-size blend per level, then exact per-SB
    selection.  Blocks never straddle superblocks, so selecting SBs of
    level l from the level-l pass is identical to a native mixed-size
    blend; each SB only reads its own lattice vertices, which the mesh
    coder guarantees are coded.

    mv_grid: dense (h>>fine_log + 1, ..., 2) grid; levels: (h>>5 >> ?)
    per-SB ints 0..2 in LUMA superblock units scaled to this plane
    (32 >> (3 - fine_log) px per SB side)."""
    sb = 1 << (fine_log + 2)           # SB side in this plane's pixels
    nsby, nsbx = h // sb, w // sb
    levels = np.asarray(levels)
    assert levels.shape == (nsby, nsbx)
    if h * w >= (1 << 16):
        from .backend import accel

        if accel() is not None:
            from .mc_jax import obmc_mixed_accel

            refs = ref_padded if isinstance(ref_padded, (list, tuple)) \
                else [ref_padded]
            out = obmc_mixed_accel(refs, pad, h, w, mv_grid, levels,
                                   fine_log, ref_ids, bitdepth)
            if out is not None:
                return out
    out = np.zeros((h, w),
                   dtype=np.uint8 if bitdepth <= 8 else np.uint16)
    for lv in range(3):
        sel = levels == lv
        if not sel.any():
            continue
        stride = 4 >> lv
        sub = mv_grid[::stride, ::stride]
        subr = None if ref_ids is None else ref_ids[::stride, ::stride]
        bper = 1 << lv                 # blocks per SB side at this level
        bmask = np.repeat(np.repeat(sel, bper, 0), bper, 1)
        obmc_predict(ref_padded, pad, h, w, sub, fine_log + 2 - lv,
                     ref_ids=subr, block_mask=bmask, out=out,
                     bitdepth=bitdepth)
    return out


def _obmc_frame_native(lib, refs, pad, h, w, mv_grid, blk_log, ref_ids,
                       block_mask, out, bitdepth):
    """One threaded C++ pass for the whole-frame OBMC blend
    (dtpu_obmc_frame) — interp + bilinear blend per block."""
    import ctypes

    if not getattr(lib, "_obmc_ready", False):
        p = ctypes.c_void_p
        lib.dtpu_obmc_frame.argtypes = [
            p, ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
            p, p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, p, p]
        lib._obmc_ready = True
    refs_c = [np.ascontiguousarray(r) for r in refs]
    arr = (ctypes.c_void_p * len(refs_c))(
        *[r.ctypes.data_as(ctypes.c_void_p).value for r in refs_c])
    mv = np.ascontiguousarray(mv_grid, dtype=np.int64)
    vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    rid_p = None
    if ref_ids is not None and len(refs_c) > 1:
        rid = np.ascontiguousarray(ref_ids, dtype=np.int32)
        rid_p = vp(rid)
    bm_p = None
    if block_mask is not None:
        bm = np.ascontiguousarray(block_mask, dtype=np.uint8)
        bm_p = vp(bm)
    dtype = np.uint8 if bitdepth <= 8 else np.uint16
    if out is None:
        out = np.zeros((h, w), dtype=dtype)
    lib.dtpu_obmc_frame(
        arr, len(refs_c), refs_c[0].dtype.itemsize,
        refs_c[0].shape[1], int(pad), vp(mv), rid_p,
        mv_grid.shape[1], h, w, int(blk_log), int(bitdepth), bm_p,
        vp(out))
    return out


def obmc_predict(ref_padded, pad: int, h: int, w: int,
                 mv_grid: np.ndarray, blk_log: int,
                 ref_ids: np.ndarray = None,
                 block_mask: np.ndarray = None,
                 out: np.ndarray = None,
                 bitdepth: int = 8) -> np.ndarray:
    """Whole-frame OBMC prediction from a uniform MV vertex grid.

    mv_grid: (nvy + 1, nvx + 1, 2) 1/8-pel (mvy, mvx) per vertex, where
    nvy = h >> blk_log, nvx = w >> blk_log.
    Multi-reference: ref_padded may be a list of padded reference
    planes with ref_ids (nvy+1, nvx+1) selecting the reference per
    vertex — each corner's whole-block prediction comes from its own
    reference before the blend (the od_mc_blend_multi capability,
    mc.c:1228-1564, on the uniform mesh).
    block_mask: optional (nby, nbx) bool — predict only those blocks,
    writing them into `out` (the mixed-size path predicts each level's
    share without paying for the whole frame).
    Returns (h, w) uint8 prediction."""
    n = 1 << blk_log
    nby = h >> blk_log
    nbx = w >> blk_log
    if block_mask is None and out is None and h * w >= (1 << 16):
        from .backend import accel

        if accel() is not None:
            from .mc_jax import obmc_accel

            refs = ref_padded if isinstance(ref_padded, (list, tuple)) \
                else [ref_padded]
            r = obmc_accel(refs, pad, h, w, mv_grid, blk_log, ref_ids,
                           bitdepth)
            if r is not None:
                return r
    lib = _mc_lib()
    if lib and n <= 64:
        refs = ref_padded if isinstance(ref_padded, (list, tuple)) \
            else [ref_padded]
        if all(getattr(r, "dtype", None) in (np.uint8, np.uint16)
               for r in refs):
            return _obmc_frame_native(lib, refs, pad, h, w, mv_grid,
                                      blk_log, ref_ids, block_mask,
                                      out, bitdepth)
    by, bx = np.meshgrid(np.arange(nby), np.arange(nbx), indexing="ij")
    by = by.ravel()
    bx = bx.ravel()
    if block_mask is not None:
        keep = block_mask.ravel()
        by = by[keep]
        bx = bx[keep]
    ys = (by << blk_log).astype(np.int64)
    xs = (bx << blk_log).astype(np.int64)
    refs = ref_padded if isinstance(ref_padded, (list, tuple)) \
        else [ref_padded]
    if ref_ids is None:
        ref_ids = np.zeros(mv_grid.shape[:2], dtype=np.int32)
    # Corner MVs per block: TL, TR, BR, BL.
    corners = [(by, bx), (by, bx + 1), (by + 1, bx + 1), (by + 1, bx)]
    preds = []
    for cy, cx in corners:
        mvs = mv_grid[cy, cx].astype(np.int64)
        rid = ref_ids[cy, cx]
        p = np.zeros((len(mvs), n, n), dtype=np.int32)
        for r in range(len(refs)):
            sel = rid == r
            if np.any(sel):
                p[sel] = subpel_predict_blocks(
                    refs[r], pad, ys[sel], xs[sel], mvs[sel], n,
                    bitdepth).astype(np.int32)
        preds.append(p)
    # Bilinear blend (od_mc_blend_full8_c weights).
    i = np.arange(n)[None, None, :]
    j = np.arange(n)[None, :, None]
    a = (preds[0] << blk_log) + (preds[1] - preds[0]) * i
    b = (preds[3] << blk_log) + (preds[2] - preds[3]) * i
    blk2 = 2 * blk_log
    blocks = ((a << blk_log) + (b - a) * j + (1 << (blk2 - 1))) >> blk2
    dtype = np.uint8 if bitdepth <= 8 else np.uint16
    blocks = np.clip(blocks, 0, (1 << bitdepth) - 1).astype(dtype)
    if block_mask is None:
        return (blocks.reshape(nby, nbx, n, n)
                .transpose(0, 2, 1, 3).reshape(h, w))
    if out is None:
        out = np.zeros((h, w), dtype=dtype)
    r_idx = (ys[:, None, None] + np.arange(n)[None, :, None])
    c_idx = (xs[:, None, None] + np.arange(n)[None, None, :])
    out[r_idx, c_idx] = blocks
    return out
