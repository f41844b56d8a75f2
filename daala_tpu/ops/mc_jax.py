"""Device (jax) motion compensation — bit-exact twin of ops/mc.py.

Same integer arithmetic as the numpy subpel/OBMC path (6-tap Q7
filters, Q14 rounding, bilinear corner blend), expressed as one fused
jit per (shape, block size) so a whole frame's prediction is a single
XLA computation.  Exactness matters: the decoder may run either
implementation, so every op mirrors the numpy twin bit for bit
(tests/test_device.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mc import SUBPEL_FILTERS, TOP_APRON

__all__ = ["subpel_predict_blocks_jax", "obmc_predict_jax"]


def _window_slices(plane, ys, xs, wh, ww):
    """(N, wh, ww) windows at dynamic top-left starts — the TPU-fast
    form of a window gather (lowered as a slice-gather rather than an
    element gather; ~6x faster on real chips).

    Starts may run up to 8 px past the plane (the subpel apron at the
    bottom/right frame edge); the edge padding below reproduces the
    element-gather clamp semantics exactly."""
    p = jnp.pad(plane, ((0, 8), (0, 8)), mode="edge")
    ys = ys.astype(jnp.int32)
    xs = xs.astype(jnp.int32)
    return jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(p, (y, x), (wh, ww)))(ys, xs)


def subpel_predict_blocks_jax(ref_padded, pad, ys, xs, mvs, n,
                              bitdepth=8):
    """jax twin of mc.subpel_predict_blocks (single fused pass)."""
    mvy = mvs[:, 0]
    mvx = mvs[:, 1]
    iy = ys + (mvy >> 3) + pad
    ix = xs + (mvx >> 3) + pad
    fy = (mvy & 7).astype(jnp.int32)
    fx = (mvx & 7).astype(jnp.int32)
    win = _window_slices(ref_padded, iy - TOP_APRON, ix - TOP_APRON,
                         n + 5, n + 5).astype(jnp.int32)
    filters = jnp.asarray(SUBPEL_FILTERS, dtype=jnp.int32)
    center = 128 << (bitdepth - 8)
    fh = filters[fx]
    # h[b, r, c] = sum_k win[b, r, c + k] * fh[b, k]
    hacc = jnp.zeros(win.shape[:2] + (n,), dtype=jnp.int32)
    for k in range(6):
        hacc = hacc + win[:, :, k:k + n] * fh[:, k][:, None, None]
    hacc = hacc - (center << 7)
    fv = filters[fy]
    vacc = jnp.zeros((win.shape[0], n, n), dtype=jnp.int32)
    for k in range(6):
        vacc = vacc + hacc[:, k:k + n, :] * fv[:, k][:, None, None]
    out = (vacc + (1 << 13) + (center << 14)) >> 14
    maxv = (1 << bitdepth) - 1
    dtype = jnp.uint8 if bitdepth <= 8 else jnp.uint16
    return jnp.clip(out, 0, maxv).astype(dtype)


def _banded_windows(p, row_base, iy, ix, K, Bh, G=8):
    """(R, C, K, K) windows via per-row bands and one-hot MXU
    selection — the fast form when windows are small and numerous
    (per-slice fetch overhead dominates below ~16x16).

    p: (H, W) int plane; row_base: (R,) static band start rows;
    iy/ix: (R, C) absolute window starts with iy - row_base in
    [0, Bh - K).  Exact: one-hot matmuls pick single elements and
    values <= 2^15 are exact in f32 accumulation.

    Rows are processed G per scan step: the one-hot matmuls batch up
    (better MXU utilization, ~2.4-6x faster on chip than one scan step
    per row — tools/exp_kernels.py)."""
    W = p.shape[1]
    R = len(row_base)
    Rp = ((R + G - 1) // G) * G
    rb = list(row_base) + [row_base[-1]] * (Rp - R)
    # f32 (not bf16): CPU XLA lacks batched bf16 dots and both are
    # exact here (one-hot weights, values <= 2^15).
    bands = jnp.stack([jax.lax.dynamic_slice(
        p, (int(r), 0), (Bh, W)) for r in rb]).astype(jnp.float32)
    ry = (iy - jnp.asarray(row_base, dtype=jnp.int32)[:, None])
    pad_r = Rp - R
    if pad_r:
        ry = jnp.concatenate([ry, jnp.zeros((pad_r, ry.shape[1]),
                                            ry.dtype)])
        ix = jnp.concatenate([ix, jnp.zeros((pad_r, ix.shape[1]),
                                            ix.dtype)])
    C = ix.shape[1]
    kk = jnp.arange(K, dtype=jnp.int32)
    bands = bands.reshape(Rp // G, G, Bh, W)
    ry = ry.reshape(Rp // G, G, C).astype(jnp.int32)
    ixc = ix.reshape(Rp // G, G, C).astype(jnp.int32)

    def step(carry, args):
        band, ryr, ixr = args        # (G, Bh, W), (G, C), (G, C)
        wi = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0]
        sx = (wi[None, :, None] == (ixr[:, None, :, None]
              + kk[None, None, None, :]).reshape(G, 1, C * K)
              ).astype(jnp.float32)            # (G, W, C*K)
        e1 = jnp.einsum("gbw,gwc->gbc", band, sx,
                        preferred_element_type=jnp.float32)
        e1 = e1.reshape(G, Bh, C, K)
        bi = jax.lax.broadcasted_iota(jnp.int32, (Bh, 1), 0)[:, 0]
        sy = (bi[None, None, :, None] == ryr[:, :, None, None]
              + kk[None, None, None, :]).astype(jnp.float32)   # (G,C,Bh,K)
        e2 = jnp.einsum("gcbk,gbcl->gckl", sy, e1,
                        preferred_element_type=jnp.float32)
        return carry, e2.astype(jnp.int32)

    _, wins = jax.lax.scan(step, 0, (bands, ry, ixc))
    return wins.reshape(Rp, C, K, K)[:R]


def _static_windows(plane, row_ys, col_xs, k):
    """(R, C, k, k) possibly-overlapping windows at STATIC positions
    via separable static slicing: R row bands then C column slices —
    R + C static slices total instead of R*C dynamic-slice loop
    iterations (~1.8 us each on a real chip; the static form is ~free).
    row_ys / col_xs are host ints (e.g. a clipped SB lattice)."""
    import jax.numpy as _jnp

    bands = _jnp.stack([
        jax.lax.slice(plane, (int(y), 0), (int(y) + k, plane.shape[1]))
        for y in row_ys])                      # (R, k, W)
    return _jnp.stack([
        jax.lax.slice(bands, (0, 0, int(x)), (bands.shape[0], k,
                                              int(x) + k))
        for x in col_xs], axis=1)              # (R, C, k, k)


def _vertex_patches(refs, pad, h, w, mv_grid, ref_ids, n, bitdepth):
    """Interpolated (2n, 2n) patch around every mesh vertex at the
    vertex's MV — each patch serves the 4 adjacent blocks' corner
    contributions as static quadrant slices, so the frame costs one
    slice-fetch + one interpolation per VERTEX instead of four per
    block (per-slice overhead dominates on real chips)."""
    nvy, nvx = mv_grid.shape[:2]
    vy = (jnp.arange(nvy, dtype=jnp.int32) << int(np.log2(n)))
    vx = (jnp.arange(nvx, dtype=jnp.int32) << int(np.log2(n)))
    ys = jnp.repeat(vy, nvx) - n
    xs = jnp.tile(vx, nvy) - n
    mvs = mv_grid.reshape(-1, 2).astype(jnp.int32)
    rid = ref_ids.reshape(-1)
    mvy = mvs[:, 0]
    mvx = mvs[:, 1]
    # Vertex windows can start up to n+2 px before the padded plane
    # (edge vertices with max-negative MVs); extend the edge padding
    # so the slice start never clamps.  The extra rows replicate the
    # plane's own edge padding, so out-of-frame quadrants (never used
    # by the blend) are the only pixels that see them.
    E = n + 8
    K = 2 * n + 5
    filters = jnp.asarray(SUBPEL_FILTERS, dtype=jnp.int32)
    center = 128 << (bitdepth - 8)
    iy = ys + (mvy >> 3) + pad + E - TOP_APRON
    ix = xs + (mvx >> 3) + pad + E - TOP_APRON
    # Banded one-hot fetch at every size: the vmapped dynamic_slice
    # loop costs ~1.8 us/window on a real chip (2135 windows of a
    # 32 px lattice = ~3 ms/frame per pass), the banded form ~0.3.
    row_base = [int(rr * n - n - 62 + pad + E)
                for rr in range(nvy)]
    win = None
    for r in range(len(refs)):
        # Multi-ref: select WINDOWS per vertex, then run ONE shared
        # interpolation cascade — bit-identical to interpolating each
        # ref and selecting patches (the cascade is elementwise per
        # vertex), at half the multiply-accumulate work.
        p = jnp.pad(refs[r], ((E, E), (E, E)), mode="edge")
        wr = _banded_windows(
            p, row_base, iy.reshape(nvy, nvx),
            ix.reshape(nvy, nvx), K, K + 121).reshape(-1, K, K)
        win = wr if win is None else \
            jnp.where((rid == r)[:, None, None], wr, win)
    fh = filters[(mvx & 7).astype(jnp.int32)]
    hacc = jnp.zeros((win.shape[0], K, 2 * n), dtype=jnp.int32)
    for k in range(6):
        hacc = hacc + win[:, :, k:k + 2 * n] * fh[:, k][:, None, None]
    hacc = hacc - (center << 7)
    fv = filters[(mvy & 7).astype(jnp.int32)]
    vacc = jnp.zeros((win.shape[0], 2 * n, 2 * n), dtype=jnp.int32)
    for k in range(6):
        vacc = vacc + hacc[:, k:k + 2 * n, :] * fv[:, k][:, None, None]
    out = (vacc + (1 << 13) + (center << 14)) >> 14
    patches = jnp.clip(out, 0, (1 << bitdepth) - 1)
    return patches.reshape(nvy, nvx, 2 * n, 2 * n)


def obmc_predict_jax(refs, pad, h, w, mv_grid, blk_log, ref_ids=None,
                     bitdepth=8):
    """jax twin of mc.obmc_predict (uniform grid, whole frame).

    refs: list of padded reference planes (jnp arrays)."""
    n = 1 << blk_log
    nby = h >> blk_log
    nbx = w >> blk_log
    if ref_ids is None:
        ref_ids = jnp.zeros(mv_grid.shape[:2], dtype=jnp.int32)
    P = _vertex_patches(refs, pad, h, w, mv_grid, ref_ids, n, bitdepth)
    # Corner contributions as quadrants of the vertex patches: block
    # (by, bx)'s NW corner is vertex (by, bx)'s SE quadrant, etc.
    quads = {
        0: P[0:nby, 0:nbx, n:, n:],        # NW corner
        1: P[0:nby, 1:nbx + 1, n:, 0:n],   # NE
        2: P[1:nby + 1, 1:nbx + 1, 0:n, 0:n],  # SE
        3: P[1:nby + 1, 0:nbx, 0:n, n:],   # SW
    }
    preds = [quads[c].reshape(nby * nbx, n, n) for c in range(4)]
    i = jnp.arange(n)[None, None, :]
    j = jnp.arange(n)[None, :, None]
    a = (preds[0] << blk_log) + (preds[1] - preds[0]) * i
    b = (preds[3] << blk_log) + (preds[2] - preds[3]) * i
    blk2 = 2 * blk_log
    blocks = ((a << blk_log) + (b - a) * j + (1 << (blk2 - 1))) >> blk2
    maxv = (1 << bitdepth) - 1
    dtype = jnp.uint8 if bitdepth <= 8 else jnp.uint16
    blocks = jnp.clip(blocks, 0, maxv).astype(dtype)
    return (blocks.reshape(nby, nbx, n, n)
            .transpose(0, 2, 1, 3).reshape(h, w))


_JIT_CACHE = {}


def obmc_jit(h, w, blk_log, nrefs, bitdepth):
    """Cached jit of the uniform-grid OBMC for one configuration."""
    key = (h, w, blk_log, nrefs, bitdepth)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        def f(refs, grid, rids):
            return obmc_predict_jax(list(refs), 80, h, w, grid,
                                    blk_log, ref_ids=rids,
                                    bitdepth=bitdepth)
        fn = jax.jit(f)
        _JIT_CACHE[key] = fn
    return fn


def obmc_predict_mixed_gated(ref_padded, pad, h, w, mv_grid, levels,
                             fine_log, ref_ids, bitdepth):
    """Mixed-size OBMC via per-level fused jax passes + host per-SB
    selection — bit-exact with ops.mc.obmc_predict_mixed (each level's
    full-frame pass equals the numpy pass block for block, and blocks
    never straddle superblocks).  Only the levels actually present
    run."""
    assert pad == 80
    cpu = jax.devices("cpu")[0]
    sb = 1 << (fine_log + 2)
    lv_present = sorted(set(np.asarray(levels).ravel().tolist()))
    refs = tuple(jnp.asarray(r) for r in ref_padded)
    if ref_ids is None:
        ref_ids = np.zeros(mv_grid.shape[:2], dtype=np.int32)
    out = None
    with jax.default_device(cpu):
        for lv in lv_present:
            stride = 4 >> lv
            fn = obmc_jit(h, w, fine_log + 2 - lv, len(refs), bitdepth)
            p = np.asarray(fn(refs,
                              np.ascontiguousarray(
                                  mv_grid[::stride, ::stride]),
                              np.ascontiguousarray(
                                  ref_ids[::stride, ::stride])))
            if out is None and len(lv_present) == 1:
                return p
            mask = np.repeat(np.repeat(np.asarray(levels) == lv, sb, 0),
                             sb, 1)
            out = p if out is None else np.where(mask, p, out)
    return out


# -- accelerator (TPU) routes ---------------------------------------------
# Bit-exact device twins of the host primitives, dispatched from
# ops/mc.py when ops.backend.accel() reports a real accelerator.

_SADS_CACHE = {}


def _sads_jit(ref_shape, ref_dtype, pad, n, bitdepth):
    key = (ref_shape, str(ref_dtype), pad, n, bitdepth)
    fn = _SADS_CACHE.get(key)
    if fn is None:
        def f(ref, blocks, ys, xs, mvs, cands):
            b32 = blocks.astype(jnp.int32)

            def body(c, cand):
                p = subpel_predict_blocks_jax(
                    ref, pad, ys, xs, mvs + cand[None, :], n, bitdepth)
                return c, jnp.abs(b32 - p.astype(jnp.int32)).sum((1, 2))

            _, sads = jax.lax.scan(body, 0, cands)
            return sads.T                      # (N, C) int32
        fn = jax.jit(f)
        _SADS_CACHE[key] = fn
    return fn


def subpel_sads_accel(ref_padded, pad, cur_blocks, ys, xs, mvs, cands,
                      bitdepth=8):
    """Accelerator twin of mc.subpel_sads; None when unavailable."""
    from .backend import accel, put

    if accel() is None:
        return None
    n = cur_blocks.shape[-1]
    fn = _sads_jit(ref_padded.shape, ref_padded.dtype, int(pad), n,
                   bitdepth)
    out = fn(put(ref_padded), jnp.asarray(np.ascontiguousarray(cur_blocks)),
             jnp.asarray(ys, dtype=jnp.int32),
             jnp.asarray(xs, dtype=jnp.int32),
             jnp.asarray(mvs, dtype=jnp.int32),
             jnp.asarray(cands, dtype=jnp.int32))
    return np.asarray(out).astype(np.int64)


def obmc_accel(refs_padded, pad, h, w, mv_grid, blk_log, ref_ids,
               bitdepth=8):
    """Accelerator twin of mc.obmc_predict (full frame, uniform grid);
    None when unavailable."""
    from .backend import accel, put

    if accel() is None:
        return None
    key = (tuple(r.shape for r in refs_padded), int(pad), h, w, blk_log,
           len(refs_padded), bitdepth)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        nrefs = len(refs_padded)

        def f(refs, grid, rids):
            return obmc_predict_jax(list(refs), int(pad), h, w, grid,
                                    blk_log, ref_ids=rids,
                                    bitdepth=bitdepth)
        fn = jax.jit(f)
        _JIT_CACHE[key] = fn
        del nrefs
    if ref_ids is None:
        ref_ids = np.zeros(np.asarray(mv_grid).shape[:2], dtype=np.int32)
    out = fn(tuple(put(r) for r in refs_padded),
             jnp.asarray(mv_grid, dtype=jnp.int32),
             jnp.asarray(ref_ids, dtype=jnp.int32))
    return np.asarray(out)


def obmc_mixed_accel(refs_padded, pad, h, w, mv_grid, levels, fine_log,
                     ref_ids, bitdepth=8):
    """Accelerator mixed-size OBMC: one fused full-frame pass per level
    actually present + per-SB select (bit-exact with the host
    obmc_predict_mixed); None when unavailable."""
    from .backend import accel

    if accel() is None:
        return None
    sb = 1 << (fine_log + 2)
    levels = np.asarray(levels)
    lv_present = sorted(set(levels.ravel().tolist()))
    if ref_ids is None:
        ref_ids = np.zeros(np.asarray(mv_grid).shape[:2], dtype=np.int32)
    out = None
    for lv in lv_present:
        stride = 4 >> lv
        p = obmc_accel(refs_padded, pad, h, w,
                       np.ascontiguousarray(mv_grid[::stride, ::stride]),
                       fine_log + 2 - lv,
                       np.ascontiguousarray(ref_ids[::stride, ::stride]),
                       bitdepth)
        if p is None:
            return None
        if out is None and len(lv_present) == 1:
            return p
        mask = np.repeat(np.repeat(levels == lv, sb, 0), sb, 1)
        out = p if out is None else np.where(mask, p, out)
    return out


_REFINE_CACHE = {}


def refine_midpoints_jit(ref_shape, nblocks, n):
    """Cached jit of the full midpoint-refinement inner loop
    (search/me.py:_refine_midpoints): one fused computation instead of
    ~16 separate interpolation passes.  Encoder-side only, but the
    arithmetic mirrors numpy exactly, so the searched MVs — and hence
    the streams — are identical either way."""
    key = (ref_shape, nblocks, n)
    fn = _REFINE_CACHE.get(key)
    if fn is not None:
        return fn

    cands = np.array([(dy, dx) for dy in (-8, 0, 8)
                      for dx in (-8, 0, 8)], dtype=np.int64)
    dev_bias = jnp.asarray(
        (np.abs(cands).sum(axis=1) >> 3) * (n * n // 8))

    def f(refp8, blocks, ys, xs, mv):
        b32 = blocks.astype(jnp.int32)
        mv = jnp.clip(mv, -58 * 8, 58 * 8)
        ext = subpel_predict_blocks_jax(refp8, 64, ys - 1, xs - 1, mv,
                                        n + 2).astype(jnp.int32)
        sads = []
        for ci, (dy, dx) in enumerate(cands):
            py = 1 + (int(dy) >> 3)
            px = 1 + (int(dx) >> 3)
            sads.append(jnp.abs(
                b32 - ext[:, py:py + n, px:px + n]
            ).sum(axis=(1, 2)).astype(jnp.int64) + dev_bias[ci])
        pick = jnp.argmin(jnp.stack(sads, axis=1), axis=1)
        mv = jnp.clip(mv + jnp.asarray(cands)[pick], -60 * 8, 60 * 8)
        for step in (4, 2, 1):
            c8 = np.array([(0, 0), (-step, 0), (step, 0), (0, -step),
                           (0, step)], dtype=np.int64)
            s2 = []
            for d in c8:
                p = subpel_predict_blocks_jax(refp8, 64, ys, xs,
                                              mv + jnp.asarray(d), n)
                s2.append(jnp.abs(b32 - p.astype(jnp.int32)
                                  ).sum(axis=(1, 2)))
            pick = jnp.argmin(jnp.stack(s2, axis=1), axis=1)
            mv = jnp.clip(mv + jnp.asarray(c8)[pick], -60 * 8, 60 * 8)
        return mv

    fn = jax.jit(f)
    _REFINE_CACHE[key] = fn
    return fn
