"""Adaptive MV mesh subdivision.

The reference's motion mesh is multi-level: od_mv_est (mcenc.c) decides
per region how finely to subdivide the OBMC vertex grid (blocks from
32 px down to 8 px), and mc.c blends across mixed block sizes with
balancing constraints.  That design is serial and pointer-heavy, so
this framework restructures it TPU-first:

  * the RECONSTRUCTION is always a DENSE vertex grid at the finest
    level (8 px) — whole-frame OBMC stays one batched pass
    (ops/mc.py:obmc_predict), no mixed-size blend cases;
  * the ADAPTIVITY lives in the coding: each 32x32 superblock signals
    a subdivision level (0 = 32 px vertices, 1 = 16 px, 2 = 8 px).
    Only the vertices a level requires are entropy-coded; every other
    vertex is filled by deterministic dyadic interpolation that the
    encoder and decoder run identically.

Vertex ownership and tiles: a vertex adopts the finest requirement of
its adjacent superblocks, restricted to the superblock rows of the
tile that owns the vertex row (pipeline/tiles.py), and the dyadic fill
clamps at tile boundaries — so each tile's MV symbols depend only on
its own level symbols and the per-tile streams stay independent.

Coding order (per frame): level symbols per SB, then three vertex
passes at strides 4/2/1 (in fine-grid units).  After each pass the
fill interpolates the still-uncoded vertices of the NEXT stride's
lattice, so the median predictor of the following pass always reads
finalized values on both sides.
"""

from __future__ import annotations

import numpy as np

__all__ = ["MV_FINE_LOG", "MV_LEVELS", "vertex_spans", "required_stride",
           "pass_mask", "fill_stride", "choose_levels", "level_counts"]

MV_FINE_LOG = 3     # finest vertex spacing: 8 px
MV_LEVELS = 3       # blend levels 0..2 (32 / 16 / 8 px blocks)
_SB_V = 4           # fine vertices per 32px superblock side

# Level symbol 3 = "coarse64": the SB still blends with 32 px blocks
# (level 0 geometry) but only the 64 px vertex lattice is entropy-coded
# — the rest interpolates.  Matches the reference's level-0 mesh, whose
# vertices sit every 64 px (internal.h:63-98); halves MV rate again at
# low rates.
LEVEL_COARSE64 = 3


def level_to_stride(levels):
    """Coded vertex stride (8/4/2/1 fine units) per SB level symbol."""
    lv = np.asarray(levels, dtype=np.int32)
    return np.where(lv == LEVEL_COARSE64, 8,
                    _SB_V >> np.minimum(lv, 2)).astype(np.int32)


def blend_levels(levels):
    """Blend geometry per level symbol (coarse64 blends like level 0)."""
    lv = np.asarray(levels)
    return np.where(lv == LEVEL_COARSE64, 0, lv).astype(lv.dtype)


def vertex_spans(bounds, nsby):
    """Owned vertex-row span per tile: [4*r0, 4*r1), with the frame's
    bottom row going to the last tile."""
    out = []
    for ti, (r0, r1) in enumerate(bounds):
        v1 = _SB_V * nsby + 1 if ti == len(bounds) - 1 else _SB_V * r1
        out.append((_SB_V * r0, v1))
    return out


def required_stride(levels, nvy, nvx, bounds):
    """Per-vertex required stride (8/4/2/1 fine units) from per-SB
    levels (nsby, nsbx).  At tile-boundary vertex rows only the owning
    tile's SB rows are consulted."""
    s = level_to_stride(levels)
    nsby, nsbx = s.shape
    u = np.arange(nvx)
    cr = np.minimum(u // _SB_V, nsbx - 1)
    colmin = s[:, cr]
    has_left = (u % _SB_V == 0) & (u > 0)
    cl = np.maximum(u // _SB_V - 1, 0)
    colmin = np.where(has_left[None, :],
                      np.minimum(colmin, s[:, cl]), colmin)
    out = np.full((nvy, nvx), 2 * _SB_V, dtype=np.int32)
    for (r0, r1), (v0, v1) in zip(bounds, vertex_spans(bounds, nsby)):
        for v in range(v0, v1):
            rr = min(v // _SB_V, r1 - 1)
            m = colmin[rr]
            if v % _SB_V == 0 and v // _SB_V - 1 >= r0:
                m = np.minimum(m, colmin[v // _SB_V - 1])
            out[v] = m
    return out


def pass_mask(req, stride, nvy, nvx):
    """Vertices coded in the given stride pass (single-tile geometry).
    Stride 8 codes the whole 64 px lattice; finer passes code the new
    lattice positions whose requirement reaches them."""
    vy = np.arange(nvy)[:, None]
    vx = np.arange(nvx)[None, :]
    on = (vy % stride == 0) & (vx % stride == 0)
    if stride == 2 * _SB_V:
        return on
    coarser = (vy % (2 * stride) == 0) & (vx % (2 * stride) == 0)
    return on & ~coarser & (req <= stride)


def fill_stride(wrk, wrids, stride, spans):
    """Interpolate the not-yet-coded vertices of the `stride` lattice
    from the 2*stride lattice, in place, clamping at tile-span edges.
    Must run after the 2*stride pass and before the `stride` pass.
    wrk: (nvy, nvx, 2) int64 working mesh; wrids: (nvy, nvx) ref ids
    (midpoints inherit from their first parent).

    Row-lattice alignment is SPAN-RELATIVE (the stride-8 lattice of a
    tile starting at an odd SB row anchors at its own first vertex
    row); for strides <= 2 this coincides with the global lattice since
    spans start at multiples of 4."""
    s = stride
    S = 2 * s
    nvx = wrk.shape[1]
    cu = np.arange(0, nvx, S)      # on-lattice columns
    cc = np.arange(s, nvx, S)      # offset (midpoint) columns
    for (v0, v1) in spans:
        for v in range(v0, v1):
            if (v - v0) % S == 0:
                # a) horizontal midpoints on an S-lattice row.
                wrk[v, cc] = (wrk[v, cc - s] + wrk[v, cc + s]) >> 1
                wrids[v, cc] = wrids[v, cc - s]
            elif (v - v0) % S == s:
                up = v - s          # >= v0 (first offset row is v0+s)
                dn = v + s
                if dn >= v1:
                    # Tile-clamped: the row below belongs to the next
                    # tile's stream, so copy/average from above only.
                    wrk[v, cu] = wrk[up, cu]
                    wrids[v, cu] = wrids[up, cu]
                    wrk[v, cc] = (wrk[up, cc - s] + wrk[up, cc + s]) >> 1
                    wrids[v, cc] = wrids[up, cc - s]
                else:
                    # b) vertical midpoints + c) centers.
                    wrk[v, cu] = (wrk[up, cu] + wrk[dn, cu]) >> 1
                    wrids[v, cu] = wrids[up, cu]
                    wrk[v, cc] = (wrk[up, cc - s] + wrk[up, cc + s]
                                  + wrk[dn, cc - s] + wrk[dn, cc + s]) >> 2
                    wrids[v, cc] = wrids[up, cc - s]
    return wrk


def level_counts(levels):
    """Nominal coded-vertex share per SB for each level (used by the
    rate side of the level RDO)."""
    return np.choose(np.asarray(levels), [4, 16, 64, 1])


#: ctl mesh-level index (0 coarse .. 3 fine, OD_SET_MV_LEVEL_MIN/MAX
#: daalaenc.h) -> internal level code (3 = 64 px coarse lattice,
#: 0/1/2 = 32/16/8 px).
CTL_LEVEL_TO_INTERNAL = (3, 0, 1, 2)


def level_mask_from_ctl(mv_level_min: int, mv_level_max: int):
    """Allowed internal levels for the user's MV-level bounds."""
    allow = set(CTL_LEVEL_TO_INTERNAL[mv_level_min:mv_level_max + 1])
    return tuple(lv in allow for lv in range(4))


def choose_levels(cur, refs_padded, pad, dense_grid, dense_rids,
                  quantizer, bounds, level_mask=None):
    """Encoder-side per-SB subdivision level RDO.

    Builds the three uniform-level candidate meshes (coarse lattices
    dyadically refined, exactly as the decoder would), runs the batched
    OBMC predictor for each, and picks per SB
    argmin(SSE + lambda * bits) where bits is the nominal coded-vertex
    count at that level.  cur: (h, w) uint8 luma; refs_padded: list of
    padded reference planes.  level_mask: optional 4-bool tuple of
    permitted internal levels (mv_level_min/max ctl,
    level_mask_from_ctl)."""
    from ..ops.mc import obmc_predict

    h, w = cur.shape
    nsby, nsbx = h >> 5, w >> 5
    sses = []
    for lv in range(MV_LEVELS):
        # Exactly the blend the decoder will run for SBs at this level:
        # the lattice-subsampled grid at the level's block size.
        stride = _SB_V >> lv
        pred = obmc_predict(refs_padded, pad, h, w,
                            dense_grid[::stride, ::stride],
                            MV_FINE_LOG + 2 - lv,
                            ref_ids=dense_rids[::stride, ::stride])
        err = (cur.astype(np.int64) - pred) ** 2
        sses.append(err.reshape(nsby, 32, nsbx, 32).sum(axis=(1, 3)))
    # coarse64 candidate: the 32 px lattice dyadically interpolated
    # from the 64 px lattice (encoder-side estimate of the fill the
    # decoder runs), blended with 32 px blocks.
    g4, r4 = _coarse64_lattice(dense_grid, dense_rids)
    pred = obmc_predict(refs_padded, pad, h, w, g4, MV_FINE_LOG + 2,
                        ref_ids=r4)
    err = (cur.astype(np.int64) - pred) ** 2
    sses.append(err.reshape(nsby, 32, nsbx, 32).sum(axis=(1, 3)))
    sse = np.stack(sses)                       # (4, nsby, nsbx)
    import os

    # Rate weight for the per-SB level decision.  Decoder bit
    # accounting vs the reference showed the old 5.0 q^2 weight let MV
    # bits reach 13% of the packet at high rate (reference: ~3%):
    # 40 q^2, capped so coarse quantizers keep a useful mesh, is
    # -8..-13% bytes at equal quality over the mid/high ladder and
    # neutral at the low end (swept on the warp clip, 2026-08).
    lam = (float(os.environ.get("DTPU_LEVEL_LAM", "40.0"))
           * (max(1, quantizer) / 16.0) ** 2)
    lam = min(lam, float(os.environ.get("DTPU_LEVEL_LAM_CAP", "15000")))
    bits = np.array([1, 4, 16, 0.3])[:, None, None] * 7.0 + 1.6
    cost = sse + lam * bits
    if level_mask is not None and not all(level_mask):
        dis = np.array([0 if m else np.inf for m in level_mask])
        cost = cost + dis[:, None, None]
    return np.argmin(cost, axis=0).astype(np.int32)


def _coarse64_lattice(dense_grid, dense_rids):
    """32 px-lattice mesh as interpolated from the 64 px lattice."""
    g8 = dense_grid[::8, ::8]
    r8 = dense_rids[::8, ::8]
    ny, nx = g8.shape[:2]
    uy, ux = 2 * ny - 1, 2 * nx - 1
    u = np.zeros((uy, ux, 2), dtype=np.int64)
    u[::2, ::2] = g8
    u[::2, 1::2] = (g8[:, :-1] + g8[:, 1:]) >> 1
    u[1::2, ::2] = (g8[:-1] + g8[1:]) >> 1
    u[1::2, 1::2] = (g8[:-1, :-1] + g8[:-1, 1:]
                     + g8[1:, :-1] + g8[1:, 1:]) >> 2
    ur = np.zeros((uy, ux), dtype=r8.dtype)
    ur[::2, ::2] = r8
    ur[::2, 1::2] = r8[:, :-1]
    ur[1::2, ::2] = r8[:-1]
    ur[1::2, 1::2] = r8[:-1, :-1]
    g4t = dense_grid[::4, ::4]
    nvy4, nvx4 = g4t.shape[:2]
    g4 = np.zeros((nvy4, nvx4, 2), dtype=np.int64)
    g4[:min(uy, nvy4), :min(ux, nvx4)] = u[:nvy4, :nvx4]
    r4 = np.zeros((nvy4, nvx4), dtype=r8.dtype)
    r4[:min(uy, nvy4), :min(ux, nvx4)] = ur[:nvy4, :nvx4]
    if uy < nvy4:
        g4[uy:] = g4[uy - 1]
        r4[uy:] = r4[uy - 1]
    if ux < nvx4:
        g4[:, ux:] = g4[:, ux - 1:ux]
        r4[:, ux:] = r4[:, ux - 1:ux]
    return g4, r4
