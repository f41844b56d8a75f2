"""Motion estimation: batched hierarchical search over the MV mesh.

A TPU-first redesign of the reference's serial EPZS^2 + mesh-decimation
+ per-row Viterbi pipeline (od_mv_est, mcenc.c:6390-6548).  MVs are
encoder-side choices — RD parity is measured, not bitstream parity
(SURVEY.md section 7) — so the search is reformulated as dense batched
work:

  1. coarse: exhaustive full-pel search on a 4x-downsampled pyramid,
     evaluated as whole-frame shifted-SAD maps (every candidate is one
     vectorized subtract+boxsum over all vertex blocks at once);
  2. refine: +-2 full-pel on the full resolution around the upscaled
     coarse MVs;
  3. subpel: +-4, +-2, +-1 eighth-pel steps using the real 6-tap
     interpolation, batched across all vertices per step;
  4. smooth: one mesh-median pass to favor coherent fields (the OBMC
     blend rewards neighbor agreement the way the reference's
     rate-aware DP refinement does).

Vertex scoring uses the block centered on the vertex so that each MV
serves the 4 mesh blocks that blend it (OBMC geometry, mc.h:39-59).
"""

from __future__ import annotations

import numpy as np

from ..ops.mc import pad_ref, subpel_predict_blocks, subpel_sads

__all__ = ["motion_search", "motion_search_multi", "motion_search_dense"]

_ZERO2 = np.zeros((1, 2), dtype=np.int64)


def _refine_midpoints(cur, refp8, g, vspacing_log):
    """Refine the odd-lattice (midpoint) vertices of g in place.

    g: grid at vertex spacing 1 << vspacing_log px, midpoints
    pre-filled by dyadic interpolation.  Each midpoint searches a +-2 px
    integer window + subpel steps around its interpolation, biased
    toward it.  The window shares the MV's subpel phase, so ONE
    interpolation of an (n+4) window yields all integer SADs."""
    nvy, nvx = g.shape[:2]
    n = 1 << vspacing_log          # score block = vertex spacing
    mask = np.ones((nvy, nvx), dtype=bool)
    mask[::2, ::2] = False
    idx = np.where(mask.ravel())[0]
    if len(idx) == 0:
        return g
    vy, vx = np.meshgrid(np.arange(nvy) << vspacing_log,
                         np.arange(nvx) << vspacing_log, indexing="ij")
    vy = vy.ravel()[idx]
    vx = vx.ravel()[idx]
    blocks, ys, xs = _vertex_blocks(cur, vy, vx, n)
    from ..ops.backend import accel, put
    from ..ops.mc import _mc_lib

    # Fused jax path (bit-exact — the searched MVs are identical):
    # always on a real accelerator; on the host only when there is no
    # native lib and the jax platform is already up.
    import os
    import sys
    use_jax = False
    if accel() is not None and len(idx) * n * n >= 1 << 18:
        use_jax = True
    elif (not _mc_lib() and len(idx) * n * n >= 1 << 18
            and ("jax" in sys.modules
                 or os.environ.get("JAX_PLATFORMS"))):
        use_jax = True
    if use_jax:
        try:
            import jax

            from ..ops.mc_jax import refine_midpoints_jit

            fn = refine_midpoints_jit(refp8.shape, len(idx), n)
            dev = accel() or jax.devices("cpu")[0]
            with jax.default_device(dev):
                mv = np.asarray(fn(put(refp8), blocks, ys, xs,
                                   g.reshape(-1, 2)[idx]))
            g.reshape(-1, 2)[idx] = mv
            return g
        except Exception:
            pass
    mv = np.clip(g.reshape(-1, 2)[idx], -58 * 8, 58 * 8)
    # +-1 px integer window + subpel descent (was +-2 px / 25 cands):
    # midpoints start at the dyadic interpolation of already-refined
    # parents, so the wide reach almost never won and the window fetch
    # dominated the on-chip ME cost (tools/parse_xplane.py).
    cands = np.array([(dy, dx) for dy in (-8, 0, 8)
                      for dx in (-8, 0, 8)], dtype=np.int64)
    dev_bias = (np.abs(cands).sum(axis=1) >> 3) * (n * n // 8)
    sads = subpel_sads(refp8, 64, blocks, ys, xs, mv, cands) + dev_bias
    mv = np.clip(mv + cands[np.argmin(sads, axis=1)], -60 * 8, 60 * 8)
    for step in (4, 2, 1):
        c8 = np.array([(0, 0), (-step, 0), (step, 0), (0, -step),
                       (0, step)], dtype=np.int64)
        sads = subpel_sads(refp8, 64, blocks, ys, xs, mv, c8)
        mv = np.clip(mv + c8[np.argmin(sads, axis=1)], -60 * 8, 60 * 8)
    g.reshape(-1, 2)[idx] = mv
    return g


def _upsample_grid(g):
    """Dyadic 2x upsample of a vertex grid (midpoints = floor avg)."""
    nvy, nvx = g.shape[:2]
    u = np.zeros((2 * nvy - 1, 2 * nvx - 1, 2), dtype=np.int64)
    u[::2, ::2] = g
    u[::2, 1::2] = (g[:, :-1] + g[:, 1:]) >> 1
    u[1::2, ::2] = (g[:-1] + g[1:]) >> 1
    u[1::2, 1::2] = (g[:-1, :-1] + g[:-1, 1:]
                     + g[1:, :-1] + g[1:, 1:]) >> 2
    return u


_DENSE_JIT = {}


def _dense_jit(h, w):
    """Cached jit of the whole dense hierarchical search
    (search/me_jax.py) for one frame geometry."""
    fn = _DENSE_JIT.get((h, w))
    if fn is None:
        import jax

        from .me_jax import motion_search_dense_jax

        fn = jax.jit(lambda c, r: motion_search_dense_jax(c, r, h, w))
        _DENSE_JIT[(h, w)] = fn
    return fn


def motion_search_dense(cur: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Fully hierarchical dense mesh search for the adaptive MV mesh
    (search/mesh.py): a 32 px vertex search anchors the field (so the
    coarse lattice is optimal for level-0 OBMC blends), then the 16 px
    and 8 px midpoints refine locally around their dyadic interpolation
    with a deviation bias.  Bounded refinement keeps the field coherent
    and the finer levels' coded deltas small — the role of mcenc.c's
    per-level rate-aware passes.

    Returns the dense (h/8+1, w/8+1, 2) eighth-pel grid."""
    from ..ops.backend import accel, put

    dev = accel()
    if dev is not None and cur.dtype == np.uint8:
        # One fused device computation for the entire hierarchical
        # search; the jax twin's MVs are bit-identical to the host path
        # (tests/test_me_jax.py), so streams do not change.
        try:
            import jax

            h, w = cur.shape
            fn = _dense_jit(h, w)
            with jax.default_device(dev):
                g = np.asarray(fn(put(np.ascontiguousarray(cur)),
                                  put(pad_ref(ref, 64))))
            return g.astype(np.int64)
        except Exception:
            pass
    g = motion_search(cur, ref, 5)
    refp8 = pad_ref(ref, 64)
    for lvl in (4, 3):
        g = _upsample_grid(g)
        g = _refine_midpoints(cur, refp8, g, lvl)
    return g


def _satd_subpel_stage(blocks, refp8, ys, xs, mv, steps=(1,)):
    """Optional SATD-metric subpel polish (od_mv_subpel_refine's SATD
    stage, mcenc.c:6325-6388 + gate :6527-6545): re-rank +-step
    eighth-pel moves of every vertex MV by batched Hadamard SATD
    (ops/satd.py) instead of SAD.  Encoder choice only — the stream
    stays valid for any MV field."""
    from ..ops.mc import subpel_predict_blocks
    from ..ops.satd import satd

    n = blocks.shape[-1]
    for step in steps:
        c8 = np.array([(0, 0), (-step, 0), (step, 0), (0, -step),
                       (0, step)], dtype=np.int64)
        scores = np.stack(
            [satd(blocks, subpel_predict_blocks(refp8, 64, ys, xs,
                                                mv + c, n))
             for c in c8], axis=1)
        mv = np.clip(mv + c8[np.argmin(scores, axis=1)], -60 * 8, 60 * 8)
    return mv


def motion_search_multi(cur: np.ndarray, refs, blk_log: int,
                        ref_bias: int = None, dense: bool = False,
                        use_satd: bool = False):
    """Per-vertex multi-reference search (the multiref capability of
    od_mv_est_init_mvs, mcenc.c:6480-6494, recast as independent
    batched searches + a per-vertex argmin).

    refs: list of (h, w) reference planes (e.g. [PREV, GOLD] for P,
    [PREV, NEXT] for B).  use_satd adds the Hadamard-SATD subpel
    polish stage and scores the ref selection by SATD (complexity >= 8
    / OD_SET_MC_SATD).  Returns (grid (nvy+1, nvx+1, 2),
    ref_ids (nvy+1, nvx+1))."""
    from ..ops.mc import pad_ref, subpel_predict_blocks
    from ..ops.satd import satd

    n = 1 << blk_log
    if dense:
        assert blk_log == 3
        grids = [motion_search_dense(cur, r) for r in refs]
    else:
        grids = [motion_search(cur, r, blk_log) for r in refs]
    h, w = cur.shape
    nvy = (h >> blk_log) + 1
    nvx = (w >> blk_log) + 1
    if use_satd:
        vy, vx = np.meshgrid(np.arange(nvy) << blk_log,
                             np.arange(nvx) << blk_log, indexing="ij")
        blocks, ys, xs = _vertex_blocks(cur, vy.ravel(), vx.ravel(), n)
        for ri, r in enumerate(refs):
            mv = _satd_subpel_stage(blocks, pad_ref(r, 64), ys, xs,
                                    grids[ri].reshape(-1, 2).copy())
            grids[ri] = mv.reshape(nvy, nvx, 2)
    if len(refs) == 1:
        return grids[0], np.zeros(grids[0].shape[:2], dtype=np.int32)
    if not use_satd:
        vy, vx = np.meshgrid(np.arange(nvy) << blk_log,
                             np.arange(nvx) << blk_log, indexing="ij")
        blocks, ys, xs = _vertex_blocks(cur, vy.ravel(), vx.ravel(), n)
    if ref_bias is None:
        ref_bias = n * n // 16  # slight preference for reference 0
    sads = []
    for ri, (r, g) in enumerate(zip(refs, grids)):
        if use_satd:
            s = satd(blocks, subpel_predict_blocks(
                pad_ref(r, 64), 64, ys, xs, g.reshape(-1, 2), n))
        else:
            s = subpel_sads(pad_ref(r, 64), 64, blocks, ys, xs,
                            g.reshape(-1, 2), _ZERO2)[:, 0]
        sads.append(s + (ref_bias if ri > 0 else 0))
    ref_ids = np.argmin(np.stack(sads), axis=0).astype(np.int32)
    flat = np.stack([g.reshape(-1, 2) for g in grids])
    grid = flat[ref_ids, np.arange(len(ref_ids))].reshape(nvy, nvx, 2)
    return grid, ref_ids.reshape(nvy, nvx)


def refine_mesh_lattice(cur, refs_padded, pad, grid, rids, quantizer,
                        iters=1, mv_res=0):
    """Blend-aware refinement of the 32 px OBMC vertex lattice
    (encoder-only; native C++).  Perturbs each stride-4 vertex of the
    dense grid to minimize the EXACT 4-block blend SAD plus a small
    rate anchor toward the neighbor median — the role of the
    reference's rate-aware DP refinement (mcenc.c:5216-6388) recast
    against the blend objective.  Mutates `grid` in place.

    mv_res: the frame's coded MV resolution — the perturbation steps
    scale to multiples of 1<<mv_res so the refinement optimizes the
    lattice the decoder will actually see (refining at quarter-pel and
    then rounding to full-pel both wastes the search and leaves the
    mesh off its blend optimum at coarse quantizers)."""
    import ctypes

    from ..ops.mc import _mc_lib

    lib = _mc_lib()
    if not lib or cur.dtype != np.uint8:
        return grid
    if not getattr(lib, "_refine_ready", False):
        p = ctypes.c_void_p
        lib.dtpu_obmc_refine.argtypes = [
            p, ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
            p, ctypes.c_int, ctypes.c_int, p, p, p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
            p, ctypes.c_int]
        lib._refine_ready = True
    h, w = cur.shape
    g4 = np.ascontiguousarray(grid[::4, ::4], dtype=np.int64)
    r4 = np.ascontiguousarray(rids[::4, ::4], dtype=np.int32)
    refs = [np.ascontiguousarray(r, dtype=np.uint8) for r in refs_padded]
    arr = (ctypes.c_void_p * len(refs))(
        *[r.ctypes.data_as(ctypes.c_void_p).value for r in refs])
    import os

    steps_env = os.environ.get("DTPU_REFINE_STEPS", "8,2")
    steps = (np.asarray([int(x) for x in steps_env.split(",")],
                        dtype=np.int64) << mv_res)
    # Coarse quantizers: the residual is too expensive to fix what the
    # prediction misses, so spend more search (3 Gauss-Seidel sweeps).
    if quantizer >= 900:
        iters = max(iters, 3)
    iters = int(os.environ.get("DTPU_REFINE_ITERS", iters))
    # The refine pass charges generic-model mesh bits on coding-order
    # median deltas of the vertex and its dependent readers.  The rate
    # of one delta is a lookup into the model-derived INTEGER cost
    # table (search/mvcost.mv_cost_table8: actual generic-coder
    # tell_frac 1/8-bits at a canonical adapted state — the true
    # 16-symbol head / raw-LSB / Laplace-tail shape, not a fitted
    # curve).  lamq = round(lam * 16) converts bits to SAD at this
    # quantizer (role of the reference's rate-aware DP, mcenc.c λ);
    # all-integer costs make the refinement deterministic.
    from .mvcost import mv_cost_table8

    mvtab = np.ascontiguousarray(mv_cost_table8(), dtype=np.int32)
    lam = (float(os.environ.get("DTPU_REFINE_LAM", 1.0))
           * max(1, quantizer) / 16.0)
    cur_c = np.ascontiguousarray(cur)
    vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    lib.dtpu_obmc_refine(
        arr, len(refs), 1, refs[0].shape[1], int(pad), vp(cur_c), h, w,
        vp(g4), vp(r4), vp(steps), len(steps), int(iters), 8,
        int(round(lam * 16.0)), int(mv_res), vp(mvtab), len(mvtab))
    grid[::4, ::4] = g4
    return grid


def _downsample2(p):
    p = p.astype(np.int32)
    return ((p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
             + p[1::2, 1::2] + 2) >> 2).astype(np.uint8)


def _block_sads(cur_blocks, ref_padded, pad, ys, xs, cands):
    """SAD of every (block, candidate) pair at full-pel.

    cur_blocks: (N, n, n); cands: (C, 2) integer-pel offsets.
    Returns (N, C) int64."""
    N = len(cur_blocks)
    mv0 = np.zeros((N, 2), dtype=np.int64)
    return subpel_sads(ref_padded, pad, cur_blocks, ys, xs, mv0,
                       np.asarray(cands, dtype=np.int64) * 8)


def _vertex_blocks(plane, vy, vx, n):
    """Blocks of size n centered on each vertex (clamped to the frame)."""
    h, w = plane.shape
    ys = np.clip(vy - n // 2, 0, h - n)
    xs = np.clip(vx - n // 2, 0, w - n)
    blocks = plane[ys[:, None, None] + np.arange(n)[None, :, None],
                   xs[:, None, None] + np.arange(n)[None, None, :]]
    return blocks, ys, xs


def motion_search(cur: np.ndarray, ref: np.ndarray, blk_log: int,
                  coarse_range: int = 12, lam: float = 0.0) -> np.ndarray:
    """Estimate the uniform MV vertex grid for OBMC.

    cur, ref: (h, w) uint8 planes.  Returns (nvy+1, nvx+1, 2) int
    eighth-pel (mvy, mvx)."""
    h, w = cur.shape
    n = 1 << blk_log
    nvy = (h >> blk_log) + 1
    nvx = (w >> blk_log) + 1
    vy, vx = np.meshgrid(np.arange(nvy) << blk_log,
                         np.arange(nvx) << blk_log, indexing="ij")
    vy = vy.ravel()
    vx = vx.ravel()

    # -- stage 1a: exhaustive coarse on the 8x-down pyramid ---------------
    # Same +-4*coarse_range full-res coverage as the old quarter-res
    # exhaustive sweep at ~1/10th the SAD work (169 x 4x4 + 25 x 8x8
    # instead of 625 x 8x8 per vertex).
    cur4 = _downsample2(_downsample2(cur))
    ref4 = _downsample2(_downsample2(ref))
    cur8 = _downsample2(cur4)
    ref8 = _downsample2(ref4)
    rad8 = (coarse_range + 1) // 2
    pad8 = rad8 + 4
    ref8p = pad_ref(ref8, pad8)
    n8 = max(4, n >> 3)
    blocks8, ys8, xs8 = _vertex_blocks(cur8, vy >> 3, vx >> 3, n8)
    cands8 = np.array([(dy, dx)
                       for dy in range(-rad8, rad8 + 1)
                       for dx in range(-rad8, rad8 + 1)], dtype=np.int32)
    # Zero-bias (rate proxy), per-pixel strength matched to the old
    # quarter-res sweep: |c|_1/16px-units on 16-px SADs.
    bias8 = (np.abs(cands8).sum(axis=1)
             * (n8 * n8 // 16)).astype(np.int64)
    sads8 = _block_sads(blocks8, ref8p, pad8, ys8, xs8, cands8) + bias8
    best8 = cands8[np.argmin(sads8, axis=1)].astype(np.int64)

    # -- stage 1b: +-2 refine at quarter res ------------------------------
    pad4 = coarse_range + 4
    ref4p = pad_ref(ref4, pad4)
    n4 = max(4, n >> 2)
    blocks4, ys4, xs4 = _vertex_blocks(cur4, vy >> 2, vx >> 2, n4)
    steps4 = np.array([(dy, dx) for dy in range(-2, 3)
                       for dx in range(-2, 3)], dtype=np.int64)
    base4 = best8 * 2
    bias4 = (np.abs(base4[:, None, :] + steps4[None, :, :]).sum(-1)
             * (n4 * n4 // 32)).astype(np.int64)
    sads = subpel_sads(ref4p, pad4, blocks4, ys4, xs4, base4 * 8,
                       steps4 * 8) + bias4
    best = (base4 + steps4[np.argmin(sads, axis=1)]) * 4  # full-res px

    # -- stage 2: +-2 full-pel refine at full resolution -----------------
    # (|best| <= 4*coarse_range and |step| <= 2 stay well inside the
    # 60 px clamp, so the fused per-block-mv + shared-step form is
    # identical to the old per-candidate clip.)
    refp8 = pad_ref(ref, 64)
    blocks, ys, xs = _vertex_blocks(cur, vy, vx, n)
    steps = np.array([(dy, dx) for dy in range(-2, 3)
                      for dx in range(-2, 3)], dtype=np.int64)
    sads = subpel_sads(refp8, 64, blocks, ys, xs,
                       best.astype(np.int64) * 8, steps * 8)
    pick = steps[np.argmin(sads, axis=1)]
    mv = np.clip(best + pick, -60, 60).astype(np.int64) * 8  # eighth-pel

    # -- stage 3: subpel refinement (+-4, +-2, +-1 eighth-pel) -----------
    for step in (4, 2, 1):
        cands8 = np.array([(0, 0), (-step, 0), (step, 0), (0, -step),
                           (0, step)], dtype=np.int64)
        sads = subpel_sads(refp8, 64, blocks, ys, xs, mv, cands8)
        mv = mv + cands8[np.argmin(sads, axis=1)]
        mv = np.clip(mv, -60 * 8, 60 * 8)

    grid = mv.reshape(nvy, nvx, 2)

    # -- stage 4: coherence pass (3x3 median on each component) ----------
    med = grid.copy()
    gp = np.pad(grid, ((1, 1), (1, 1), (0, 0)), mode="edge")
    stack = np.stack([gp[dy:dy + nvy, dx:dx + nvx]
                      for dy in range(3) for dx in range(3)])
    med = np.median(stack, axis=0).astype(np.int64)
    # Accept the median where it does not hurt SAD by more than 1/16.
    s_cur = subpel_sads(refp8, 64, blocks, ys, xs, grid.reshape(-1, 2),
                        _ZERO2)[:, 0]
    s_med = subpel_sads(refp8, 64, blocks, ys, xs, med.reshape(-1, 2),
                        _ZERO2)[:, 0]
    keep_med = (s_med <= s_cur + (s_cur >> 4)).reshape(nvy, nvx)
    grid = np.where(keep_med[..., None], med, grid)
    # -- stage 5: global-motion candidate --------------------------------
    # Self-similar content (texture, repeated patterns) leaves the
    # per-vertex SAD ambiguous; a dominant global motion resolves the
    # aperture problem the way the reference's rate-aware DP converges
    # neighbors.  Accept the field-wide median wherever it is nearly as
    # good as the local choice.
    gmv = np.median(grid.reshape(-1, 2), axis=0).astype(np.int64)
    s_cur2 = subpel_sads(refp8, 64, blocks, ys, xs,
                         grid.reshape(-1, 2), _ZERO2)[:, 0]
    s_glob = subpel_sads(refp8, 64, blocks, ys, xs,
                         np.broadcast_to(gmv, (len(ys), 2)),
                         _ZERO2)[:, 0]
    keep_glob = (s_glob <= s_cur2 + (s_cur2 >> 3) + n).reshape(nvy, nvx)
    grid = np.where(keep_glob[..., None], gmv, grid)
    return grid
