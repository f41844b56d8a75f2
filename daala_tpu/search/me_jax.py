"""Device (jax) motion estimation — bit-exact twin of search/me.py.

The full hierarchical dense-mesh search (coarse quarter-res full-pel
sweep, full-res refine, subpel descent, coherence + global-motion
passes, then per-level midpoint refinement) expressed as pure jax so a
frame's — or a whole chunk's — motion field is computed in ONE fused
XLA computation with no host round trips.  Every stage mirrors the
numpy twin's integer arithmetic and candidate order, so the searched
MVs are identical (tests/test_me_jax.py).

The reference's serial EPZS^2 + Viterbi pipeline (od_mv_est,
mcenc.c:6390-6548) maps here to batched whole-lattice sweeps; MVs are
encoder-side choices, so the redesign is measured on RD, not bit
parity (SURVEY.md section 7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["motion_search_dense_jax", "pad_edge"]


def pad_edge(p, pad):
    return jnp.pad(p, pad, mode="edge")


def _down2(p):
    """2x box downsample via two pair-sum matmuls: lane-strided
    slicing is ~50x slower than the MXU on real chips, and 2x2 sums
    (<= 1020) are exact in f32."""
    h, w = p.shape
    pf = p.astype(jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (h // 2, h), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (h // 2, h), 1)
    R = ((rj >> 1) == ri).astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 1)
    C = ((ci >> 1) == cj).astype(jnp.float32)
    s = jnp.dot(jnp.dot(R, pf, preferred_element_type=jnp.float32), C,
                preferred_element_type=jnp.float32)
    return ((s.astype(jnp.int32) + 2) >> 2).astype(jnp.uint8)


def _gather_blocks(plane, ys, xs, n):
    """(N, n, n) blocks at static top-left positions (slice-fetched:
    element gathers are ~10x slower on real chips)."""
    return jax.vmap(lambda y, x: jax.lax.dynamic_slice(
        plane, (y, x), (n, n)))(jnp.asarray(ys, dtype=jnp.int32),
                                jnp.asarray(xs, dtype=jnp.int32))


def _vertex_positions(h, w, blk_log):
    n = 1 << blk_log
    nvy = (h >> blk_log) + 1
    nvx = (w >> blk_log) + 1
    vy, vx = np.meshgrid(np.arange(nvy) << blk_log,
                         np.arange(nvx) << blk_log, indexing="ij")
    vy = vy.ravel()
    vx = vx.ravel()
    ys = np.clip(vy - n // 2, 0, h - n)
    xs = np.clip(vx - n // 2, 0, w - n)
    return nvy, nvx, ys, xs


def _window_sads_cl(win, b32, cands, n, rad):
    """Channels-last twin of _window_sads: win (n+2r, n+2r, N),
    b32 (n, n, N); blocks ride the lane axis so the small spatial dims
    do not pad out vector tiles.  Returns (N, C)."""
    sads = []
    for dy, dx in cands:
        sl = win[rad + dy:rad + dy + n, rad + dx:rad + dx + n]
        sads.append(jnp.abs(b32 - sl).sum((0, 1)))
    return jnp.stack(sads, axis=1)        # (N, C)


def _dense_sads_cl(win, b32, n, rad):
    """SADs of every full-pel offset in [-rad, rad]^2, accumulated by
    BLOCK PIXEL instead of by candidate: n*n sliced adds instead of
    (2r+1)^2 — the sum over pixels commutes exactly, so the result is
    _window_sads_cl's on the dense row-major candidate grid bit for
    bit.  win: (n+2r, n+2r, N); b32: (n, n, N).  Returns (N, C)."""
    S = 2 * rad + 1
    N = win.shape[-1]
    # int16 accumulation (exact: n*n * 255 < 2^15) halves the
    # accumulator traffic of the n*n sliced adds.
    w16 = win.astype(jnp.int16)
    b16 = b32.astype(jnp.int16)
    acc = jnp.zeros((S, S, N), dtype=jnp.int16)
    for i in range(n):
        for j in range(n):
            acc = acc + jnp.abs(w16[i:i + S, j:j + S]
                                - b16[i, j][None, None, :])
    return acc.reshape(S * S, N).T.astype(jnp.int32)


def _subpel_sad1_cl(refp8, pad, ys, xs, b32c, mv, n, bitdepth,
                    lattice=None):
    """SAD of one subpel MV per block, channels-last: one window fetch
    plus an in-window interpolation (b32c: (n, n, N)).

    lattice: optional (row_ys, nvx) static lattice structure — when
    given, the fetch rides the banded one-hot path (~6x faster than
    the per-block dynamic-slice loop on chip)."""
    from ..ops.mc_jax import _banded_windows, _window_slices

    base = mv >> 3
    K = n + 5
    if lattice is not None:
        row_ys, nvx = lattice
        R = len(row_ys)
        pe = jnp.pad(refp8, ((0, 8), (0, 8)), mode="edge")
        row_base = [int(y) + pad - 62 for y in row_ys]
        iy = (jnp.asarray(ys + pad - 2, dtype=jnp.int32)
              + base[:, 0]).reshape(R, nvx)
        ix = (jnp.asarray(xs + pad - 2, dtype=jnp.int32)
              + base[:, 1]).reshape(R, nvx)
        win = _banded_windows(pe, row_base, iy, ix, K, K + 121)
        win = win.reshape(-1, K, K)
    else:
        win = _window_slices(refp8,
                             jnp.asarray(ys + pad - 2) + base[:, 0],
                             jnp.asarray(xs + pad - 2) + base[:, 1],
                             K, K).astype(jnp.int32)
    p = _interp_rel(win.transpose(1, 2, 0), mv[:, 0] & 7, mv[:, 1] & 7,
                    n, bitdepth)
    return jnp.abs(b32c - p).sum((0, 1))


def _interp_rel(win, rely, relx, n, bitdepth):
    """Interpolate an (n, n, N) block at per-block eighth-pel offsets
    (rely, relx) inside a prefetched window.

    win: (K, K, N) int32 channels-last — the block axis rides the
    128-lane dimension so the small window rows/cols do not pad out
    whole vector tiles.  The window origin corresponds to the integer
    anchor minus TOP_APRON; rely/relx are eighth-pel offsets from the
    anchor, with 0 <= rel >> 3 <= K - n - 5.  The arithmetic is
    subpel_predict_blocks_jax's bit for bit — only the fetch is
    hoisted out (one slice-fetch serves every candidate of a descent
    instead of one fetch per candidate)."""
    from ..ops.mc import SUBPEL_FILTERS

    K = win.shape[0]
    span = K - n - 5            # max integer offset inside the window
    oy = (rely >> 3).astype(jnp.int32)
    ox = (relx >> 3).astype(jnp.int32)
    fy = (rely & 7).astype(jnp.int32)
    fx = (relx & 7).astype(jnp.int32)
    rows = win[0:n + 5]
    for k in range(1, span + 1):
        rows = jnp.where((oy == k)[None, None, :], win[k:k + n + 5],
                         rows)
    sub = rows[:, 0:n + 5]
    for k in range(1, span + 1):
        sub = jnp.where((ox == k)[None, None, :],
                        rows[:, k:k + n + 5], sub)
    filters = jnp.asarray(SUBPEL_FILTERS, dtype=jnp.int32)
    center = 128 << (bitdepth - 8)
    fh = filters[fx]                     # (N, 6)
    N = win.shape[-1]
    hacc = jnp.zeros((n + 5, n, N), dtype=jnp.int32)
    for k in range(6):
        hacc = hacc + sub[:, k:k + n] * fh[:, k][None, None, :]
    hacc = hacc - (center << 7)
    fv = filters[fy]
    vacc = jnp.zeros((n, n, N), dtype=jnp.int32)
    for k in range(6):
        vacc = vacc + hacc[k:k + n] * fv[:, k][None, None, :]
    out = (vacc + (1 << 13) + (center << 14)) >> 14
    return jnp.clip(out, 0, (1 << bitdepth) - 1)


def _window_descent(win, b32, mv, anchor8, n, bitdepth,
                    limit=60 * 8):
    """Greedy (+-4, +-2, +-1 eighth-pel) descent evaluated inside a
    prefetched channels-last window: bit-exact twin of three
    _subpel_step_sads rounds with one fetch total.  win: (K, K, N);
    b32: (n, n, N); anchor8: (N, 2) eighth-pel window anchor."""
    for step in (4, 2, 1):
        c8 = np.array([(0, 0), (-step, 0), (step, 0), (0, -step),
                       (0, step)], dtype=np.int32)
        sads = []
        for d in c8:
            mvc = mv + jnp.asarray(d, jnp.int32)[None, :]
            rel = mvc - anchor8
            p = _interp_rel(win, rel[:, 0], rel[:, 1], n, bitdepth)
            sads.append(jnp.abs(b32 - p).sum((0, 1)))
        pick = jnp.argmin(jnp.stack(sads, axis=1), axis=1)
        mv = jnp.clip(mv + jnp.asarray(c8)[pick], -limit, limit)
    return mv


def motion_search_jax(cur, ref, refp8, h, w, blk_log=5, coarse_range=12,
                      bitdepth=8):
    """Twin of me.motion_search on device; h/w static ints."""
    n = 1 << blk_log
    nvy, nvx, ys, xs = _vertex_positions(h, w, blk_log)

    # -- stage 1a: exhaustive coarse on the 8x-down pyramid ---------------
    # (twin of me.motion_search stage 1a/1b: same coverage as the old
    # quarter-res exhaustive sweep at ~1/10th the SAD work.)
    cur4 = _down2(_down2(cur))
    ref4 = _down2(_down2(ref))
    cur8 = _down2(cur4)
    ref8 = _down2(ref4)
    from ..ops.mc_jax import _static_windows

    rad8 = (coarse_range + 1) // 2
    pad8 = rad8 + 4
    ref8p = pad_edge(ref8, pad8)
    n8 = max(4, n >> 3)
    h8, w8 = h // 8, w // 8
    # The vertex lattice is STATIC and separable: fetch row bands +
    # column slices instead of a 2135-iteration dynamic-slice loop.
    ys8_r = np.clip((np.arange(nvy) << blk_log >> 3) - n8 // 2, 0,
                    h8 - n8)
    xs8_c = np.clip((np.arange(nvx) << blk_log >> 3) - n8 // 2, 0,
                    w8 - n8)
    blocks8 = _static_windows(cur8, ys8_r, xs8_c, n8) \
        .reshape(-1, n8, n8).astype(jnp.int32)
    cands8 = np.array([(dy, dx)
                       for dy in range(-rad8, rad8 + 1)
                       for dx in range(-rad8, rad8 + 1)], dtype=np.int32)
    bias8 = (np.abs(cands8).sum(axis=1)
             * (n8 * n8 // 16)).astype(np.int32)
    win8 = _static_windows(ref8p, ys8_r + pad8 - rad8,
                           xs8_c + pad8 - rad8, n8 + 2 * rad8) \
        .reshape(-1, n8 + 2 * rad8, n8 + 2 * rad8).astype(jnp.int32)
    sads8 = _dense_sads_cl(win8.transpose(1, 2, 0),
                           blocks8.transpose(1, 2, 0), n8, rad8) \
        + jnp.asarray(bias8)[None, :]
    best8 = jnp.asarray(cands8)[jnp.argmin(sads8, axis=1)]

    # -- stage 1b: +-2 refine at quarter res ------------------------------
    # Small numerous windows: banded one-hot gather (per-block slice
    # fetches pay the ~1.3us/slice floor thousands of times).
    from ..ops.mc_jax import _banded_windows

    pad4 = coarse_range + 8
    ref4p = pad_edge(ref4, pad4)
    n4 = max(4, n >> 2)
    h4, w4 = h // 4, w // 4
    vy4 = (np.repeat(np.arange(nvy) << blk_log, nvx) >> 2)
    vx4 = (np.tile(np.arange(nvx) << blk_log, nvy) >> 2)
    ys4 = np.clip(vy4 - n4 // 2, 0, h4 - n4)
    xs4 = np.clip(vx4 - n4 // 2, 0, w4 - n4)
    ys4_c = np.clip((np.arange(nvy) << blk_log >> 2) - n4 // 2, 0,
                    h4 - n4)
    xs4_cc = np.clip((np.arange(nvx) << blk_log >> 2) - n4 // 2, 0,
                     w4 - n4)
    blocks4 = _static_windows(cur4, ys4_c, xs4_cc, n4) \
        .reshape(-1, n4, n4).astype(jnp.int32)
    steps4 = np.array([(dy, dx) for dy in range(-2, 3)
                       for dx in range(-2, 3)], dtype=np.int32)
    base4 = (best8 * 2).astype(jnp.int32)
    K4 = n4 + 4
    span8 = 2 * rad8 * 2            # |base4| range
    ys4_row = np.clip((np.arange(nvy) << blk_log >> 2) - n4 // 2, 0,
                      h4 - n4)
    row_base = [int(y + pad4 - 2 - span8 // 2) for y in ys4_row]
    iy = (jnp.asarray(ys4 + pad4 - 2).reshape(nvy, nvx)
          + base4[:, 0].reshape(nvy, nvx))
    ix = (jnp.asarray(xs4 + pad4 - 2).reshape(nvy, nvx)
          + base4[:, 1].reshape(nvy, nvx))
    win4 = _banded_windows(ref4p, row_base, iy, ix, K4,
                           K4 + span8 + 1).reshape(-1, K4, K4)
    bias4 = (jnp.abs(base4[:, None, :]
                     + jnp.asarray(steps4)[None, :, :]).sum(-1)
             * (n4 * n4 // 32)).astype(jnp.int32)
    sads4 = _window_sads_cl(win4.transpose(1, 2, 0),
                            blocks4.transpose(1, 2, 0), steps4, n4, 2) \
        + bias4
    best = (base4 + jnp.asarray(steps4)[jnp.argmin(sads4, axis=1)]) * 4

    # -- stage 2: +-2 full-pel refine at full resolution -----------------
    from ..ops.mc_jax import _banded_windows

    ys_r = np.clip((np.arange(nvy) << blk_log) - n // 2, 0, h - n)
    xs_c = np.clip((np.arange(nvx) << blk_log) - n // 2, 0, w - n)
    b32 = _static_windows(cur, ys_r, xs_c, n) \
        .reshape(-1, n, n).astype(jnp.int32)
    b32c = b32.transpose(1, 2, 0)
    steps = np.array([(dy, dx) for dy in range(-2, 3)
                      for dx in range(-2, 3)], dtype=np.int32)
    # Data-dependent windows around each block's coarse MV (banded
    # one-hot fetch; |best| <= 56), then 25 static slices.
    K2 = n + 4
    iy2 = (jnp.asarray(ys + 62, dtype=jnp.int32)
           + best[:, 0]).reshape(nvy, nvx)
    ix2 = (jnp.asarray(xs + 62, dtype=jnp.int32)
           + best[:, 1]).reshape(nvy, nvx)
    win = _banded_windows(refp8, [int(y) + 6 for y in ys_r], iy2, ix2,
                          K2, K2 + 113).reshape(-1, K2, K2)
    sads = _window_sads_cl(win.transpose(1, 2, 0), b32c, steps, n, 2)
    pick = jnp.asarray(steps)[jnp.argmin(sads, axis=1)]
    mv = jnp.clip(best + pick, -60, 60).astype(jnp.int32) * 8

    # -- stage 3: subpel refinement (+-4, +-2, +-1 eighth-pel) -----------
    # One window fetch (apron 2 int px) serves all 15 candidate
    # evaluations of the descent.
    base = mv >> 3
    anchor = base - 2
    K3 = n + 9
    pe3 = jnp.pad(refp8, ((0, 8), (0, 8)), mode="edge")
    iy3 = (jnp.asarray(ys + 62, dtype=jnp.int32)
           + anchor[:, 0]).reshape(nvy, nvx)
    ix3 = (jnp.asarray(xs + 62, dtype=jnp.int32)
           + anchor[:, 1]).reshape(nvy, nvx)
    dwin = _banded_windows(pe3, [int(y) for y in ys_r], iy3, ix3,
                           K3, K3 + 121).reshape(-1, K3, K3)
    mv = _window_descent(dwin.transpose(1, 2, 0), b32c, mv,
                         anchor << 3, n, bitdepth)

    grid = mv.reshape(nvy, nvx, 2)

    # -- stage 4: coherence pass (3x3 median on each component) ----------
    gp = jnp.pad(grid, ((1, 1), (1, 1), (0, 0)), mode="edge")
    stack = jnp.stack([gp[dy:dy + nvy, dx:dx + nvx]
                       for dy in range(3) for dx in range(3)])
    med = jnp.median(stack, axis=0).astype(jnp.int32)
    s_cur = _subpel_sad1_cl(refp8, 64, ys, xs, b32c,
                            grid.reshape(-1, 2), n, bitdepth,
                            lattice=(ys_r, nvx))
    s_med = _subpel_sad1_cl(refp8, 64, ys, xs, b32c,
                            med.reshape(-1, 2), n, bitdepth,
                            lattice=(ys_r, nvx))
    keep_med = (s_med <= s_cur + (s_cur >> 4)).reshape(nvy, nvx)
    grid = jnp.where(keep_med[..., None], med, grid)

    # -- stage 5: global-motion candidate --------------------------------
    gmv = jnp.median(grid.reshape(-1, 2), axis=0).astype(jnp.int32)
    # SAD of the stage-4 result is already known per vertex: the
    # element-wise select of med/cur SADs (saves one full interp+SAD
    # evaluation — bit-identical to re-evaluating).
    s_cur2 = jnp.where(keep_med.reshape(-1), s_med, s_cur)
    s_glob = _subpel_sad1_cl(refp8, 64, ys, xs, b32c,
                             jnp.broadcast_to(gmv, (len(ys), 2)), n,
                             bitdepth, lattice=(ys_r, nvx))
    keep_glob = (s_glob <= s_cur2 + (s_cur2 >> 3) + n).reshape(nvy, nvx)
    return jnp.where(keep_glob[..., None], gmv[None, None, :], grid)


def _upsample_grid(g):
    """Dyadic 2x upsample (midpoints = floor avg), int32."""
    nvy, nvx = g.shape[:2]
    u = jnp.zeros((2 * nvy - 1, 2 * nvx - 1, 2), dtype=jnp.int32)
    u = u.at[::2, ::2].set(g)
    u = u.at[::2, 1::2].set((g[:, :-1] + g[:, 1:]) >> 1)
    u = u.at[1::2, ::2].set((g[:-1] + g[1:]) >> 1)
    u = u.at[1::2, 1::2].set((g[:-1, :-1] + g[:-1, 1:]
                              + g[1:, :-1] + g[1:, 1:]) >> 2)
    return u


def _lattice_blocks(plane, row_ys, col_xs, n):
    """(R*C, n, n) blocks at a static position lattice via static row
    bands + ONE constant one-hot matmul over columns — small numerous
    blocks pay ~1.3us per slice-fetch otherwise."""
    R, C = len(row_ys), len(col_xs)
    W = plane.shape[1]
    bands = jnp.concatenate([
        jax.lax.dynamic_slice(plane, (int(y), 0), (n, W))
        for y in row_ys], axis=0).astype(jnp.bfloat16)
    targ = jnp.asarray(np.repeat(col_xs, n)
                       + np.tile(np.arange(n), C), dtype=jnp.int32)
    wi = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0]
    sx = (wi[:, None] == targ[None, :]).astype(jnp.bfloat16)
    e = jnp.dot(bands, sx, preferred_element_type=jnp.float32)
    return (e.reshape(R, n, C, n).transpose(0, 2, 1, 3)
            .reshape(R * C, n, n).astype(jnp.int32))


def _refine_group(cur, refp8, flat, vys, vxs, idx, n, h, w, bitdepth,
                  cands, dev_bias):
    """Refine one rectangular lattice group of midpoint vertices.

    vys: (R,) static vertex rows; vxs: (C,) static vertex cols; idx:
    flat grid indices in row-major (R, C) order.  Returns the refined
    (R*C, 2) MVs.  The window fetch is banded (one-hot MXU selection)
    — per-row bands cover the +-58 px MV range."""
    from ..ops.mc_jax import _banded_windows

    R, C = len(vys), len(vxs)
    ys_row = np.clip(vys - n // 2, 0, h - n)
    xs_col = np.clip(vxs - n // 2, 0, w - n)
    b32 = _lattice_blocks(cur, ys_row, xs_col, n)
    mv = jnp.clip(flat[idx], -58 * 8, 58 * 8).astype(jnp.int32)
    base = mv >> 3
    anchor = base - 3
    anchor8 = anchor << 3
    K = n + 10
    pe = jnp.pad(refp8, ((0, 8), (0, 8)), mode="edge")
    iy = (jnp.asarray(np.repeat(ys_row, C) + 62, dtype=jnp.int32)
          + anchor[:, 0]).reshape(R, C)
    ix = (jnp.asarray(np.tile(xs_col, R) + 62, dtype=jnp.int32)
          + anchor[:, 1]).reshape(R, C)
    win = _banded_windows(pe, [int(y) + 1 for y in ys_row], iy, ix, K,
                          K + 121)
    win = win.reshape(R * C, K, K).transpose(1, 2, 0)
    b32c = b32.transpose(1, 2, 0)
    # Shared subpel phase: one in-window interpolation of the (n+2)
    # extended block serves all 9 integer offsets as static slices.
    rel = mv - anchor8 - 8
    ext = _interp_rel(win, rel[:, 0], rel[:, 1], n + 2, bitdepth)
    sads = []
    for ci, (dy, dx) in enumerate(cands):
        py = 1 + (int(dy) >> 3)
        px = 1 + (int(dx) >> 3)
        sads.append(jnp.abs(b32c - ext[py:py + n, px:px + n]
                            ).sum((0, 1)) + dev_bias[ci])
    pick = jnp.argmin(jnp.stack(sads, axis=1), axis=1)
    mv = jnp.clip(mv + jnp.asarray(cands)[pick], -60 * 8, 60 * 8)
    return _window_descent(win, b32c, mv, anchor8, n, bitdepth)


def _refine_midpoints_jax(cur, refp8, g, vlog, h, w, bitdepth=8):
    """Twin of me._refine_midpoints: refine the odd-lattice vertices.
    The non-lattice positions split into two rectangular groups (odd
    rows x all cols; even rows x odd cols) so the fetches can ride the
    banded one-hot path."""
    nvy = (h >> vlog) + 1
    nvx = (w >> vlog) + 1
    n = 1 << vlog
    cands = np.array([(dy, dx) for dy in (-8, 0, 8)
                      for dx in (-8, 0, 8)], dtype=np.int32)
    dev_bias = jnp.asarray(
        (np.abs(cands).sum(axis=1) >> 3) * (n * n // 8), dtype=jnp.int32)
    flat = g.reshape(-1, 2)
    groups = []
    rows_a = np.arange(1, nvy, 2)
    if len(rows_a):
        cols_a = np.arange(nvx)
        idx_a = (rows_a[:, None] * nvx + cols_a[None, :]).ravel()
        groups.append((rows_a << vlog, cols_a << vlog, idx_a))
    rows_b = np.arange(0, nvy, 2)
    cols_b = np.arange(1, nvx, 2)
    if len(rows_b) and len(cols_b):
        idx_b = (rows_b[:, None] * nvx + cols_b[None, :]).ravel()
        groups.append((rows_b << vlog, cols_b << vlog, idx_b))
    for (vys, vxs, idx) in groups:
        mv = _refine_group(cur, refp8, flat, vys, vxs, idx, n, h, w,
                           bitdepth, cands, dev_bias)
        flat = flat.at[idx].set(mv)
    return flat.reshape(nvy, nvx, 2)


def _hat32():
    """Bilinear OBMC vertex hat: weight of a vertex at pixel offset
    (u-32, v-32) of its 64x64 support — exactly the per-corner weights
    of the 32 px block blend ((32-|dy|)(32-|dx|), Q10 total)."""
    a = 32 - np.abs(np.arange(64) - 32)
    return (a[:, None] * a[None, :]).astype(np.int32)


def _mv_bits8_j(d, tab8):
    """Generic-model MV cost of a res-domain delta component in
    INTEGER 1/8-bit units: lookup into the model-derived cost table
    (search/mvcost.mv_cost_table8) — twin of native mv_bits_tab,
    identical entries by construction.  Integer rate keeps every
    cost comparison order-independent (deterministic across runs and
    recompiles; the round-4 f32 near-tie nondeterminism lived in the
    float rate terms)."""
    a = jnp.minimum(jnp.abs(d), tab8.shape[0] - 1)
    return tab8[a]


def _med3_j(a, b, c):
    """np.median of 3 per component == clamp(c, min(a,b), max(a,b))."""
    return jnp.clip(c, jnp.minimum(a, b), jnp.maximum(a, b))


def _mean2_j(a, b):
    """2-candidate np.median: float mean truncated toward zero."""
    s = a + b
    return jnp.sign(s) * (jnp.abs(s) // 2)


def _mesh_pred_j(snapres, vy, vx, st, ov=None):
    """Coding-order median predictor of lattice vertices (vy, vx) on
    the stride-`st` sub-lattice, from an immutable res-domain snapshot
    — jax twin of native mesh_pred_c incl. the left/up/up-right (or
    up-left) candidate order and np.median semantics.  ov: optional
    (ovy, ovx, oval) trial override, matching the Jacobi-within-color
    candidate pass of dtpu_obmc_refine.  vy/vx: (...,) int arrays;
    returns (..., 2) res-domain predictions."""
    nvy, nvx = snapres.shape[:2]

    def at(y, x):
        yc = jnp.clip(y, 0, nvy - 1)
        xc = jnp.clip(x, 0, nvx - 1)
        v = snapres[yc, xc]
        if ov is not None:
            ovy, ovx, oval = ov
            hit = ((yc == ovy) & (xc == ovx))[..., None]
            v = jnp.where(hit, oval, v)
        return v

    has_l = (vx >= st)[..., None]
    has_u = (vy >= st)[..., None]
    has_r = (vx + st < nvx)[..., None]
    lv = at(vy, vx - st)
    uv = at(vy - st, vx)
    third = jnp.where(has_r, at(vy - st, vx + st), at(vy - st, vx - st))
    # has_l & has_u -> 3 cands (third always exists then); only-up ->
    # 2 cands (up, up-right) when has_r else 1; only-left -> 1; else 0.
    p3 = _med3_j(lv, uv, third)
    p_up = jnp.where(has_r, _mean2_j(uv, third), uv)
    return jnp.where(has_l & has_u, p3,
                     jnp.where(has_u, p_up,
                               jnp.where(has_l, lv,
                                         jnp.zeros_like(lv))))


# Dependent coding-order readers of a vertex per color parity, as
# (dy, dx, st, w2): which finer/coarser-lattice vertices' median
# predictors read this vertex (native dtpu_obmc_refine's deps table
# with the parity filtering applied statically per color).  w2 is the
# doubled integer weight (2 = full, 1 = half for midpoint readers
# whose coding depends on the later level RDO).
_REFINE_DEPS = {
    (0, 0): (((0, 2, 2, 2), (2, 0, 2, 2), (2, -2, 2, 2),
              (0, 1, 1, 1), (1, 0, 1, 1), (1, -1, 1, 1))),
    (0, 1): (((1, 0, 1, 1), (1, -1, 1, 1))),
    (1, 0): (((0, 1, 1, 1), (1, -1, 1, 1))),
    (1, 1): (((0, 1, 1, 1), (1, 0, 1, 1))),
}


def refine_lattice_jax(cur, refp8, g, h, w, quantizer, mv_res=0,
                       lam=None, iters=1, bitdepth=8):
    """Device twin of native dtpu_obmc_refine: rate-aware Gauss-Seidel
    refinement of the 32 px OBMC vertex lattice, scored by the EXACT
    4-block bilinear-blend SAD plus generic-model MV bits of the vertex
    and its coding-order dependent readers, with the median predictor
    as a joint candidate (the od_mv_est_refine_row/col role,
    mcenc.c:5216-6388, recast against the blend objective).

    Vertex-centric formulation: the whole-frame pre-rounding blend
    accumulator S = sum_v hat (.) P_v is carried exactly (int32), so a
    candidate MV at vertex v re-scores its 64x64 support as
    clip((S - hat.P_old + hat.P_cand + 512) >> 10) — no per-block
    corner cache.  Same-color supports tile disjointly, so each color
    pass is one batched update; rate reads come from a per-pass
    snapshot (Jacobi within color), bit-identical to the (race-fixed)
    C++ at any thread count.

    All costs are INTEGER: cost = sad * 256 + lamq * rate16 with
    rate16 in doubled 1/8-bit units and lamq = round(lam * 16) — both
    twins compute the identical int32, so decisions are reproducible
    across runs, recompiles and platforms (round-4 weak #4).

    g: (nvy, nvx, 2) int32 eighth-pel 32 px lattice, multiples of
    1 << mv_res; returns the refined lattice."""
    import os as _os

    nvy, nvx = (h >> 5) + 1, (w >> 5) + 1
    maxv = (1 << bitdepth) - 1
    if lam is None:
        lam = (float(_os.environ.get("DTPU_REFINE_LAM", 1.0))
               * max(1, quantizer) / 16.0)
    lamq = int(round(lam * 16.0))
    iters = int(_os.environ.get("DTPU_REFINE_ITERS", iters))
    if iters <= 0:
        return g
    from .mvcost import mv_cost_table8

    tab8 = jnp.asarray(mv_cost_table8(), dtype=jnp.int32)
    # Step schedule shared with the C++ twin (me.py passes the same
    # env): "8,2" trades 1/3 of the step passes for ~-5 ms/frame at
    # 1080p (RD-checked on the warp ladder before changing defaults).
    steps_env = _os.environ.get("DTPU_REFINE_STEPS", "8,2")
    steps = tuple(int(s) << mv_res
                  for s in (int(x) for x in steps_env.split(",")))
    # Per-iteration movement cap (eighth-pel): all step passes of one
    # iteration reuse ONE fetched window per color, so the candidate
    # walk may not leave it.  The cap equals the maximum possible
    # drift (sum of steps), so it only rejects candidates the window
    # cannot serve — mirrored exactly in the C++ twin.
    CAP = sum(steps)
    M = (CAP + 7) >> 3                  # window margin, full pels
    hat = jnp.asarray(_hat32())
    hatc = hat[:, :, None]
    E = 48
    K = 69 + 2 * M
    Kp = 69
    pe = jnp.pad(refp8, E, mode="edge")

    # Exact S from the vertex patches (pre-rounding Q10 accumulator).
    from ..ops.mc_jax import _banded_windows, _vertex_patches

    rid0 = jnp.zeros((nvy, nvx), dtype=jnp.int32)
    P = _vertex_patches([refp8], 64, h, w, g, rid0, 32, bitdepth) \
        .astype(jnp.int32)

    cur_pad = jnp.pad(cur.astype(jnp.int32), 32)
    mask_pad = jnp.pad(jnp.ones((h, w), dtype=jnp.int32), 32)

    colors = []
    for cy0 in (0, 1):
        for cx0 in (0, 1):
            vys = np.arange(cy0, nvy, 2)
            vxs = np.arange(cx0, nvx, 2)
            colors.append((cy0, cx0, vys, vxs))

    def _region(plane_pad, cy0, cx0, R, C):
        """(64, 64, R*C) channels-last view of the color's disjoint
        64x64 supports (static slice + reshape)."""
        sl = jax.lax.slice(plane_pad, (cy0 * 32, cx0 * 32),
                           (cy0 * 32 + R * 64, cx0 * 32 + C * 64))
        return (sl.reshape(R, 64, C, 64).transpose(1, 3, 0, 2)
                .reshape(64, 64, R * C))

    def _place(region_cl, cy0, cx0, R, C, S):
        img = (region_cl.reshape(64, 64, R, C).transpose(2, 0, 3, 1)
               .reshape(R * 64, C * 64))
        return S.at[cy0 * 32:cy0 * 32 + R * 64,
                    cx0 * 32:cx0 * 32 + C * 64].set(img)

    def _ctx(color):
        cy0, cx0, vys, vxs = color
        R, C = len(vys), len(vxs)
        VY = jnp.asarray(np.broadcast_to(vys[:, None], (R, C)))
        VX = jnp.asarray(np.broadcast_to(vxs[None, :], (R, C)))
        st_lat = 2 if (cy0 == 0 and cx0 == 0) else 1
        self_w2 = 2 if st_lat == 2 else 1
        posy = (vys.astype(np.int64) * 32 + 30 + E).astype(np.int32)
        posx = (vxs.astype(np.int64) * 32 + 30 + E).astype(np.int32)
        # cur/mask supports are loop-invariant: extracted once, closed
        # over by every pass of every iteration.
        curreg = _region(cur_pad, cy0, cx0, R, C)
        maskreg = _region(mask_pad, cy0, cx0, R, C)
        return (cy0, cx0, R, C, VY, VX, st_lat, self_w2, posy, posx,
                _REFINE_DEPS[(cy0, cx0)], curreg, maskreg)

    ctxs = [_ctx(c) for c in colors]

    # Per-color channels-last patch tensors (64, 64, N): the scan
    # carries these instead of the (nvy, nvx, 64, 64) array — the
    # strided slice + transpose + scatter per pass were a large share
    # of the pass time in the op trace.
    Pcs = []
    for (cy0, cx0, vys, vxs) in colors:
        R, C = len(vys), len(vxs)
        Pcs.append(P[cy0::2, cx0::2].transpose(2, 3, 0, 1)
                   .reshape(64, 64, R * C))
    del P

    def _build_S(Pcs):
        S = jnp.zeros((h + 64, w + 64), dtype=jnp.int32)
        for ci, (cy0, cx0, vys, vxs) in enumerate(colors):
            R, C = len(vys), len(vxs)
            S = _place(_region(S, cy0, cx0, R, C) + hatc * Pcs[ci],
                       cy0, cx0, R, C, S)
        return S

    def _pass(g, Pc, S, ctx, mk_cands):
        """One colored accept pass: mk_cands returns STACKED candidate
        MVs (nc, R, C, 2), patches (nc, 64, 64, N) and validity
        (nc, R, C) — every candidate's SAD/rate rides one fused op.
        Candidate 0 is the incumbent (patch = Pc), so argmin ties keep
        it, matching the C++ strict <."""
        (cy0, cx0, R, C, VY, VX, st_lat, self_w2, posy, posx, deps,
         curreg, maskreg) = ctx
        N = R * C
        mv = g[cy0::2, cx0::2]              # (R, C, 2)
        snapres = (g >> mv_res).astype(jnp.int32)
        spred = _mesh_pred_j(snapres, VY, VX, st_lat)    # (R, C, 2)

        Sreg = _region(S, cy0, cx0, R, C)
        S_f = Sreg - hatc * Pc

        cands, patches, ok = mk_cands(mv, Pc, spred, ctx)
        cres = cands >> mv_res                           # (nc, R, C, 2)
        rate16 = self_w2 * (
            _mv_bits8_j(cres[..., 0] - spred[..., 0][None], tab8)
            + _mv_bits8_j(cres[..., 1] - spred[..., 1][None], tab8))
        ov = (VY, VX, cres)
        for (dy, dx, dst, dw2) in deps:
            uy, ux = VY + dy, VX + dx
            okd = (uy < nvy) & (ux >= 0) & (ux < nvx)
            dp = _mesh_pred_j(snapres, uy, ux, dst, ov=ov)  # (nc,R,C,2)
            uval = snapres[jnp.clip(uy, 0, nvy - 1),
                           jnp.clip(ux, 0, nvx - 1)]
            db = (_mv_bits8_j(uval[None, ..., 0] - dp[..., 0], tab8)
                  + _mv_bits8_j(uval[None, ..., 1] - dp[..., 1], tab8))
            rate16 = rate16 + dw2 * jnp.where(okd[None], db, 0)

        blend = jnp.clip((S_f[None] + hatc[None] * patches + 512) >> 10,
                         0, maxv)
        # int32 cost: sad * 256 <= 2^28 and lamq * rate16 <= ~2^26, so
        # the total is exact in int32 and orders identically to the
        # C++ int64 — int64 argmin lowers to a slow bitcast-reduce
        # pair on TPU (op trace).  All-integer costs are reduction-
        # order independent: deterministic across runs/recompiles.
        sad = (jnp.abs(curreg[None] - blend)
               * maskreg[None]).sum((1, 2)).astype(jnp.int32)  # (nc, N)
        okr = ((jnp.abs(cands[..., 0]) <= 480)
               & (jnp.abs(cands[..., 1]) <= 480))
        if ok is not None:
            okr = okr & ok
        rat = (lamq * rate16).reshape(len(cands), N)
        costs = jnp.where(okr.reshape(len(cands), N), sad * 256 + rat,
                          jnp.int32(1) << 30)
        pick = jnp.argmin(costs, axis=0)                      # (N,)
        best_mv = jnp.take_along_axis(
            cands.reshape(-1, N, 2), pick[None, :, None],
            axis=0)[0].reshape(R, C, 2)
        best_p = patches[0]
        for ci in range(1, len(patches)):
            best_p = jnp.where(pick[None, None, :] == ci,
                               patches[ci], best_p)

        g = g.at[cy0::2, cx0::2].set(best_mv)
        S = _place(S_f + hatc * best_p, cy0, cx0, R, C, S)
        return g, best_p, S

    def _jump_cands(mv, Pc, spred, ctx):
        """Predictor-jump candidates: {incumbent, coding-order median
        predictor} — the joint MV/rate move that matters at coarse
        lambda, evaluated once per iteration (its window is anchored at
        the predictor itself, so it needs its own fetch)."""
        (cy0, cx0, R, C, VY, VX, st_lat, self_w2, posy, posx, deps,
         curreg, maskreg) = ctx
        N = R * C
        pmv = (spred << mv_res).astype(jnp.int32)
        ap = pmv >> 3
        iy2 = jnp.asarray(posy)[:, None] + ap[..., 0]
        ix2 = jnp.asarray(posx)[None, :] + ap[..., 1]
        rb2 = [int(p) - 60 for p in posy]
        winp = _banded_windows(pe, rb2, iy2, ix2, Kp, Kp + 121) \
            .reshape(N, Kp, Kp).transpose(1, 2, 0)
        relp = pmv - (ap << 3)
        pp = _interp_rel(winp, relp[..., 0].reshape(-1),
                         relp[..., 1].reshape(-1), 64, bitdepth)
        return (jnp.stack([mv, pmv]), jnp.stack([Pc, pp]), None)

    def _fetch_win(g0, ctx):
        """One candidate window per vertex per iteration, anchored at
        the post-jump lattice; every step pass of the iteration
        interpolates its candidates from it (the CAP rule keeps them
        inside)."""
        (cy0, cx0, R, C, VY, VX, st_lat, self_w2, posy, posx, deps,
         curreg, maskreg) = ctx
        N = R * C
        mv0 = g0[cy0::2, cx0::2]
        anchor = (mv0 >> 3) - M
        iy = jnp.asarray(posy)[:, None] + anchor[..., 0]
        ix = jnp.asarray(posx)[None, :] + anchor[..., 1]
        rb = [int(p) - 60 - M for p in posy]
        win = _banded_windows(pe, rb, iy, ix, K, K + 121) \
            .reshape(N, K, K).transpose(1, 2, 0)
        return win, anchor, mv0

    def _dir_cands(st, win, anchor, mv0):
        def mk(mv, Pc, spred, ctx):
            (cy0, cx0, R, C) = ctx[:4]
            N = R * C
            offs = jnp.stack([
                jnp.stack([st, jnp.int32(0)]),
                jnp.stack([-st, jnp.int32(0)]),
                jnp.stack([jnp.int32(0), st]),
                jnp.stack([jnp.int32(0), -st])]).astype(jnp.int32)
            cmv = mv[None] + offs[:, None, None, :]     # (4, R, C, 2)
            # All 4 direction candidates ride ONE interpolation call:
            # the shared window is tiled along the channel axis, so
            # the 6-tap passes run 4x wider instead of 4x more often.
            rel = (cmv - (anchor << 3)[None]).reshape(4 * N, 2)
            pc = _interp_rel(jnp.tile(win, (1, 1, 4)), rel[:, 0],
                             rel[:, 1], 64, bitdepth)
            pc = jnp.moveaxis(pc.reshape(64, 64, 4, N), 2, 0)
            okc = ((jnp.abs(cmv[..., 0] - mv0[None, ..., 0]) <= CAP)
                   & (jnp.abs(cmv[..., 1] - mv0[None, ..., 1]) <= CAP))
            cands = jnp.concatenate([mv[None], cmv])
            patches = jnp.concatenate([Pc[None], pc])
            ok = jnp.concatenate(
                [jnp.ones((1, R, C), dtype=bool), okc])
            return cands, patches, ok
        return mk

    S = _build_S(Pcs)
    # DTPU_REFINE_UNROLL=1 unrolls the step passes statically instead
    # of scanning (the scan carries ~27 MB: S + 4 per-color patch
    # tensors).  Default stays the scan — the round-4 full path is
    # proven on it at 1080p on the real chip.
    unroll = _os.environ.get("DTPU_REFINE_UNROLL", "0") \
        not in ("0", "false")
    steps_arr = jnp.asarray(np.asarray(steps, np.int32))
    for _ in range(iters):
        for ci, ctx in enumerate(ctxs):
            g, Pcs[ci], S = _pass(g, Pcs[ci], S, ctx, _jump_cands)
        wins = [_fetch_win(g, ctx) for ctx in ctxs]
        if unroll:
            for st in steps:
                for ci, (ctx, (win, anchor, mv0)) in enumerate(
                        zip(ctxs, wins)):
                    g, Pcs[ci], S = _pass(
                        g, Pcs[ci], S, ctx,
                        _dir_cands(jnp.int32(st), win, anchor, mv0))
        else:
            def sweep(carry, st):
                g, P0, P1, P2, P3, S = carry
                Ps = [P0, P1, P2, P3]
                for ci, (ctx, (win, anchor, mv0)) in enumerate(
                        zip(ctxs, wins)):
                    g, Ps[ci], S = _pass(
                        g, Ps[ci], S, ctx,
                        _dir_cands(st, win, anchor, mv0))
                return (g, Ps[0], Ps[1], Ps[2], Ps[3], S), None

            (g, Pcs[0], Pcs[1], Pcs[2], Pcs[3], S), _ = jax.lax.scan(
                sweep, (g, Pcs[0], Pcs[1], Pcs[2], Pcs[3], S),
                steps_arr)
    return g


def motion_search_dense_jax(cur, refp8, h, w, bitdepth=8):
    """Twin of me.motion_search_dense: dense (h/8+1, w/8+1, 2) grid.

    cur: (h, w) uint8 on device; refp8: the reference padded by 64
    (pad_edge(ref, 64)).  The unpadded reference is refp8's center."""
    ref = refp8[64:64 + h, 64:64 + w]
    g = motion_search_jax(cur, ref, refp8, h, w, 5, bitdepth=bitdepth)
    for lvl in (4, 3):
        g = _upsample_grid(g)
        g = _refine_midpoints_jax(cur, refp8, g, lvl, h, w, bitdepth)
    return g
