"""Device-side encode, end to end: the TPU computes EVERY encoder
decision and reconstruction for a chunk of P frames — motion search,
mesh-level RDO, decoder-exact mixed OBMC prediction, lapped transforms,
stream-valid PVQ symbols through the INTEGER synthesis spec
(pvq/isynth.py), DC quantization, and the directional dering filter
with per-SB flags — and the host merely range-codes the returned symbol
tensors into a standard dres-mode packet (pipeline/inter.py stream
layout).  The decoder (DecoderSession) reconstructs bit-identically to
the reconstruction the device carried as its reference: the
--enable-encoder-check invariant (encode.c:3204-3243) holds across the
host/device boundary.

Why this shape: the reference interleaves search, quantization and
entropy coding per block (daala_encode_img_in, encode.c:2876-3201); on
TPU the only fast shape is one fused lax.scan per GOP chunk with the
reconstruction carried on device (SURVEY.md section 2.11).  The serial
range coding stays on the host (native C++ walk, pvq/native_walk.py)
and overlaps the device's compute on the next chunk.

Prediction exactness: the decoder predicts from the CODED mesh — every
vertex the per-SB levels require is entropy-coded (= the searched
value rounded to the frame MV resolution), the rest interpolate
(search/mesh.py fill_stride).  The device therefore simulates the
decoded mesh: level-0/1/2 superblocks read only coded (truth) lattice
vertices, and the coarse64 stride-4 lattice is rebuilt as
"interpolated from the 64 px lattice, except where a neighboring
finer superblock forces the vertex to be coded" (_sim_stride4) —
bit-exact with mesh.required_stride + fill_stride.

Stream constraints of this mode (all enforced):
  * dres P frames (container flag bit 6): bands are noref residuals,
    integer k rule + integer synthesis;
  * multi-ref P by default (round 4): {prev, gold} with the
    FT_P/FT_GOLDEN cadence and rotation the host decoder implements
    (encode.c:3146-3175); multiref=False falls back to the round-3
    single-ref FT_GOLDEN chain;
  * uniform per-frame block sizes (bs ladder 8/16/32 px by rate
    point), masking off, 8-bit, frame dims 64-aligned.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..core.quant import N_CODED_QUANTIZERS, QM8_HVS, \
    codedquantizer_to_quantizer, init_qm
from ..core.state import interp_pvq_qm
from ..pvq.isynth import icompute_k
from ..pvq.scan import BAND_OFFSETS, _FLAT as _FLAT_IDX

__all__ = ["make_device_chunk_fn", "pack_device_frame",
           "DeviceEncoderSession", "PAD"]

PAD = 80  # carry padding: 60 px search range + subpel/OBMC apron


# ---------------------------------------------------------------------------
# device side (jax)
# ---------------------------------------------------------------------------


def _lap_idx(extent, rows):
    import numpy as _np

    r = _np.asarray(rows, dtype=_np.int32)
    return r[:, None] + _np.arange(-2, 2)


def _fwd_input(c, bs):
    """Uniform lapped forward transform of an input plane — twin of
    prefilter_plane_grid + fdct_plane_grid on a uniform grid."""
    from ..ops.dct import fdct2d
    from .device import _lap_h_idx, _to_blocks, _from_blocks, lap_cols, \
        lap_rows

    n = 4 << bs
    h, w = c.shape[-2], c.shape[-1]
    c = lap_rows(c, _lap_h_idx(h, n))
    c = lap_cols(c, _lap_h_idx(w, n))
    return _from_blocks(fdct2d(_to_blocks(c, n), n), h, w, n)


def _fwd_pred(p, bs, xdec):
    """Lapped transform of the MC prediction — twin of the
    _mc_pred_tables cascade (SB-edge pass, then per-level middle
    crosses, H then V within each pass) read at block size bs."""
    import numpy as _np

    from ..ops.dct import fdct2d
    from .device import _to_blocks, _from_blocks, lap_cols, lap_rows

    n = 4 << bs
    h, w = p.shape[-2], p.shape[-1]
    sbn = 32 >> xdec
    c = lap_rows(p, _lap_idx(h, _np.arange(sbn, h, sbn)))
    c = lap_cols(c, _lap_idx(w, _np.arange(sbn, w, sbn)))
    npx = sbn
    while npx > n:
        mid = npx >> 1
        c = lap_rows(c, _lap_idx(h, _np.arange(mid, h, npx)))
        c = lap_cols(c, _lap_idx(w, _np.arange(mid, w, npx)))
        npx = mid
    return _from_blocks(fdct2d(_to_blocks(c, n), n), h, w, n)


def _inv(d, bs):
    """Batched idct + uniform postfilter — twin of _to_spatial."""
    from ..ops.dct import idct2d
    from .device import _lap_h_idx, _to_blocks, _from_blocks, lap_cols, \
        lap_rows

    n = 4 << bs
    h, w = d.shape[-2], d.shape[-1]
    c = _from_blocks(idct2d(_to_blocks(d, n), n), h, w, n)
    c = lap_cols(c, _lap_h_idx(w, n), inverse=True)
    return lap_rows(c, _lap_h_idx(h, n), inverse=True)


def _interp_stride4(g8):
    """Dyadic interpolation of the stride-4 lattice from the stride-8
    lattice — jax twin of mesh.fill_stride's s=4 pass on a 64-aligned
    frame (== mesh._coarse64_lattice's core)."""
    import jax.numpy as jnp

    ny, nx = g8.shape[:2]
    uy, ux = 2 * ny - 1, 2 * nx - 1
    u = jnp.zeros((uy, ux, 2), dtype=jnp.int32)
    u = u.at[::2, ::2].set(g8)
    u = u.at[::2, 1::2].set((g8[:, :-1] + g8[:, 1:]) >> 1)
    u = u.at[1::2, ::2].set((g8[:-1] + g8[1:]) >> 1)
    u = u.at[1::2, 1::2].set((g8[:-1, :-1] + g8[:-1, 1:]
                              + g8[1:, :-1] + g8[1:, 1:]) >> 2)
    return u


def _sim_stride4(g_res, levels):
    """Decoded-mesh stride-4 lattice in the MV-resolution domain: the
    searched (truth) value where mesh.required_stride <= 4 — i.e. any
    superblock adjacent to the vertex codes at level 0..2 — else the
    stride-8 interpolation (fill_stride)."""
    import jax.numpy as jnp

    u = _interp_stride4(g_res[::8, ::8])
    g4t = g_res[::4, ::4]
    # For 64-aligned frames the interpolated lattice covers g4t exactly.
    assert u.shape == g4t.shape, (u.shape, g4t.shape)
    s = jnp.where(levels == 3, 8,
                  4 >> jnp.minimum(levels, 2)).astype(jnp.int32)
    sp = jnp.pad(s, 1, mode="edge")
    req = jnp.minimum(jnp.minimum(sp[:-1, :-1], sp[1:, :-1]),
                      jnp.minimum(sp[:-1, 1:], sp[1:, 1:]))
    return jnp.where((req <= 4)[:, :, None], g4t, u)


def _fill_rid_up(r):
    """One dyadic rid interpolation step — jax twin of fill_stride's
    rid inheritance (mesh.py:110-149): horizontal midpoints inherit
    the LEFT parent, vertical midpoints the UP parent, centers the
    UP-LEFT parent."""
    import jax.numpy as jnp

    ny, nx = r.shape
    u = jnp.zeros((2 * ny - 1, 2 * nx - 1), dtype=r.dtype)
    u = u.at[::2, ::2].set(r)
    u = u.at[::2, 1::2].set(r[:, :-1])
    u = u.at[1::2, ::2].set(r[:-1, :])
    u = u.at[1::2, 1::2].set(r[:-1, :-1])
    return u


def _sim_rid4(rid4, levels):
    """Decoded-mesh rid lattice on the stride-4 (32 px) lattice: the
    encoder's decision where any adjacent superblock forces the vertex
    coded (required_stride <= 4), else fill_stride inheritance from
    the 64 px lattice — the rid twin of _sim_stride4."""
    import jax.numpy as jnp

    u = _fill_rid_up(rid4[::2, ::2])
    s = jnp.where(levels == 3, 8,
                  4 >> jnp.minimum(levels, 2)).astype(jnp.int32)
    sp = jnp.pad(s, 1, mode="edge")
    req = jnp.minimum(jnp.minimum(sp[:-1, :-1], sp[1:, :-1]),
                      jnp.minimum(sp[:-1, 1:], sp[1:, 1:]))
    return jnp.where(req <= 4, rid4, u)


def _gold_pass(cy, ry, gy, grid, g_res, mv_res, quantizer, h, w,
               has_gold, veto):
    """Golden-reference selection on the 32 px lattice: per vertex,
    keep (prev, mv) or switch to (gold, mv=0) / (gold, mv), scored by
    the hat-weighted 64x64 support SAD plus generic-model rate (the
    encoder-side role of the reference's multi-ref EPZS init picking
    GOLD candidates, mcenc.c:6480-6494, recast as a post-refinement
    substitution: gold wins exactly where re-quantization drift on the
    prev chain exceeds the rid+delta bits).  Returns (grid, g_res,
    rid4) with gold vertices' MVs zeroed when the zero-MV candidate
    won."""
    import os as _os

    import jax
    import jax.numpy as jnp

    from ..ops.mc_jax import _vertex_patches
    from ..search.me_jax import _hat32, _mesh_pred_j, _mv_bits8_j
    from ..search.mvcost import mv_cost_table8

    nvy, nvx = (h >> 5) + 1, (w >> 5) + 1
    g32 = (g_res[::4, ::4] << mv_res).astype(jnp.int32)
    rid0 = jnp.zeros((nvy, nvx), dtype=jnp.int32)
    z32 = jnp.zeros_like(g32)
    Pp = _vertex_patches([ry], PAD, h, w, g32, rid0, 32, 8) \
        .astype(jnp.int32)
    Pg0 = _vertex_patches([gy], PAD, h, w, z32, rid0, 32, 8) \
        .astype(jnp.int32)
    Pgm = _vertex_patches([gy], PAD, h, w, g32, rid0, 32, 8) \
        .astype(jnp.int32)

    hat = jnp.asarray(_hat32())[None, None]          # (1, 1, 64, 64)

    def _supports(plane, fill):
        p = jnp.pad(plane.astype(jnp.int32), 32,
                    constant_values=fill)
        nby, nbx = (h + 64) >> 5, (w + 64) >> 5
        cb = (p.reshape(nby, 32, nbx, 32).transpose(0, 2, 1, 3))
        top = jnp.concatenate([cb[:-1, :-1], cb[:-1, 1:]], axis=3)
        bot = jnp.concatenate([cb[1:, :-1], cb[1:, 1:]], axis=3)
        return jnp.concatenate([top, bot], axis=2)   # (nvy, nvx, 64, 64)

    curW = _supports(cy, 0)
    maskW = _supports(jnp.ones((h, w), dtype=jnp.uint8), 0)

    def wsad(P):
        d = jnp.abs(curW - P) * maskW * hat
        return d.sum((2, 3), dtype=jnp.int64)

    tab8 = jnp.asarray(mv_cost_table8(), dtype=jnp.int32)
    snap = g_res[::4, ::4]
    VY = jnp.asarray(np.broadcast_to(np.arange(nvy)[:, None],
                                     (nvy, nvx)))
    VX = jnp.asarray(np.broadcast_to(np.arange(nvx)[None, :],
                                     (nvy, nvx)))
    even = ((VY & 1) == 0) & ((VX & 1) == 0)
    sp1 = _mesh_pred_j(snap, VY, VX, 1)
    sp2 = _mesh_pred_j(snap, VY, VX, 2)
    spred = jnp.where(even[..., None], sp2, sp1)
    mres = snap

    def rbits8(cres):
        return (_mv_bits8_j(cres[..., 0] - spred[..., 0], tab8)
                + _mv_bits8_j(cres[..., 1] - spred[..., 1], tab8))

    lam = (float(_os.environ.get("DTPU_REFINE_LAM", 1.0))
           * max(1, quantizer) / 16.0)
    lamq = np.int64(round(lam * 16.0))
    # rid symbol cost (adaptive binary CDF, gold rare) + a switching
    # margin so prev keeps ties.
    rid8 = np.int64(round(
        float(_os.environ.get("DTPU_GOLD_RID_BITS", 3.0)) * 8.0))
    # INTEGER costs in Q10-SAD units: wsad is the hat-weighted Q10
    # accumulator, and lam*bits scaled by 1024 is 8*lamq*rate8 exactly
    # — order-independent, so the pick is deterministic across runs
    # and recompiles (round-4 weak #4 lived in these f32 costs).
    c_keep = wsad(Pp) + 8 * lamq * rbits8(mres).astype(jnp.int64)
    c_g0 = wsad(Pg0) + 8 * lamq * (
        rbits8(jnp.zeros_like(mres)).astype(jnp.int64) + rid8)
    c_gm = wsad(Pgm) + 8 * lamq * (
        rbits8(mres).astype(jnp.int64) + rid8)
    costs = jnp.stack([c_keep, c_g0, c_gm])
    pick = jnp.argmin(costs, axis=0).astype(jnp.int32)
    pick = jnp.where(has_gold > 0, pick, 0)
    pick = jnp.where(veto, 0, pick)
    rid4 = (pick > 0).astype(jnp.int32)
    new32 = jnp.where((pick == 1)[..., None], 0, g_res[::4, ::4])
    g_res = g_res.at[::4, ::4].set(new32)
    grid = (g_res << mv_res).astype(jnp.int32)
    return grid, g_res, rid4


def _select_by_sb(preds, levels, sb):
    """Per-SB select between candidate planes.  Elementwise nested
    where, NOT take_along_axis: the gather form costs ~25 ms/frame at
    1080p on a v5e chip (measured, tools/parse_xplane.py) while the
    select fuses into one vector pass."""
    import jax.numpy as jnp

    lv_px = jnp.repeat(jnp.repeat(levels, sb, 0), sb, 1)
    out = preds[-1]
    for i in range(len(preds) - 2, -1, -1):
        out = jnp.where(lv_px == i, preds[i], out)
    return out


def _choose_levels(cur, preds, quantizer, sb=32):
    """Per-SB subdivision RDO — twin of mesh.choose_levels costs.
    sb: superblock size in the scoring domain (16 when scoring on
    2x-downsampled blends; lambda rescales with the pixel count)."""
    import jax.numpy as jnp

    h, w = cur.shape
    nsby, nsbx = h // sb, w // sb
    c32 = cur.astype(jnp.int32)
    sses = []
    for p in preds:
        e = c32 - p.astype(jnp.int32)
        sses.append((e * e).reshape(nsby, sb, nsbx, sb).sum((1, 3)))
    import os as _os

    sse = jnp.stack(sses)                      # int32, exact
    # Device-side lambda cap 1800 (the host keeps 15000): the sweep on
    # the warp ladder (2026-08-21, real chip) showed the capped-lambda
    # region — coarse quantizers — is exactly where the device
    # underspends on motion vs the host (RDCOMP.md decomposition);
    # cap 1800 buys +0.27 dB @q30 (+3.6% bytes) and +0.52 dB @q38
    # (+7.3% bytes), both far inside the ~7.6 kB/dB ladder slope.
    # The host's own cap sweep prefers 15000 (its search spends
    # motion bits well without the crutch).
    lam = min(float(_os.environ.get("DTPU_LEVEL_LAM", "40.0"))
              * (max(1, quantizer) / 16.0) ** 2,
              float(_os.environ.get("DTPU_LEVEL_LAM_CAP", "1800")))
    lam *= (sb * sb) / 1024.0
    bits = np.array([1, 4, 16, 0.3], dtype=np.float64) * 7.0 + 1.6
    # Host-side integer rate constants: the whole cost is int32, so
    # the level pick is reduction-order independent (deterministic
    # across runs/recompiles — round-4 weak #4).
    rate_i = np.round(lam * bits).astype(np.int32)
    cost = sse + jnp.asarray(rate_i)[:, None, None]
    return jnp.argmin(cost, axis=0).astype(jnp.int32)


def _plane_code(cur_u8, pred_u8, bs, xdec, quantizer, qm, qm_inv,
                pvq_qm_pl):
    """Residual coding of one plane: uniform-lap transform of the
    input, cascade-lap transform of the prediction, stream-valid PVQ
    symbols of the residual, reconstruction.  Returns (recon coeff
    plane int32, dc_idx, qg, y)."""
    import jax.numpy as jnp

    from ..pvq.device_search import pvq_symbols_frame

    c = (cur_u8.astype(jnp.int32) - 128) << 4
    p = (pred_u8.astype(jnp.int32) - 128) << 4
    dcur = _fwd_input(c, bs)
    dp = _fwd_pred(p, bs, xdec)
    dq, dc_idx, qg, y = pvq_symbols_frame(dcur - dp, bs, quantizer, qm,
                                          qm_inv, pvq_qm_pl)
    return dp + dq, dc_idx, qg, y


def _masked_lap_rows_2d(c, edges, colmask, inverse=False):
    """Row laps at the given edge rows, applied only where colmask
    (per edge x per column) is True — the 2D form the quadtree grid
    lapping needs (an interior split edge laps only across the
    columns of SPLIT superblocks)."""
    import jax.numpy as jnp

    from .device import lap_rows

    edges = np.asarray(edges, dtype=np.int32)
    if len(edges) == 0:
        return c
    idx = edges[:, None] + np.arange(-2, 2)
    lapped = lap_rows(c, idx, inverse=inverse)
    m = jnp.zeros(c.shape, dtype=bool)
    m = m.at[jnp.asarray(idx.reshape(-1))].set(
        jnp.repeat(colmask, 4, axis=0))
    return jnp.where(m, lapped, c)


def _masked_lap_cols_2d(c, edges, rowmask, inverse=False):
    import jax.numpy as jnp

    from .device import lap_cols

    edges = np.asarray(edges, dtype=np.int32)
    if len(edges) == 0:
        return c
    idx = edges[:, None] + np.arange(-2, 2)
    lapped = lap_cols(c, idx, inverse=inverse)
    m = jnp.zeros(c.shape, dtype=bool)
    m = m.at[:, jnp.asarray(idx.reshape(-1))].set(
        jnp.repeat(rowmask, 4, axis=1))
    return jnp.where(m, lapped, c)


def _grid_prefilter(c, split, sbn, inverse=False):
    """Quadtree-grid lapped pre/post filter for a 2-size grid: laps at
    every sbn-px edge (block boundaries of BOTH sizes) plus the
    sbn/2-offset interior edges of SPLIT superblocks — the device twin
    of grid.prefilter_plane_grid restricted to a one-level quadtree.
    split: (nsby, nsbx) bool.  Pre: h then v; post: v then h."""
    import jax.numpy as jnp

    h, w = c.shape[-2], c.shape[-1]
    mid = sbn >> 1
    always_r = np.arange(sbn, h, sbn)
    always_c = np.arange(sbn, w, sbn)
    mid_r = np.arange(mid, h, sbn)
    mid_c = np.arange(mid, w, sbn)
    # Column mask for the mid ROW edges: the edge at row 32k+16 is
    # interior to SB row k — lap across columns of split SBs.
    cm = jnp.repeat(split, sbn, axis=1)          # (nsby, w)
    rm = jnp.repeat(split, sbn, axis=0)          # (h, nsbx)

    def rows_always(x):
        from .device import lap_rows

        return lap_rows(x, always_r[:, None] + np.arange(-2, 2),
                        inverse=inverse)

    def cols_always(x):
        from .device import lap_cols

        return lap_cols(x, always_c[:, None] + np.arange(-2, 2),
                        inverse=inverse)

    def rows_mid(x):
        return _masked_lap_rows_2d(x, mid_r, cm, inverse=inverse)

    def cols_mid(x):
        return _masked_lap_cols_2d(x, mid_c, rm, inverse=inverse)

    if not inverse:
        x = rows_always(c)
        x = rows_mid(x)
        x = cols_always(x)
        return cols_mid(x)
    x = cols_mid(c)
    x = cols_always(x)
    x = rows_mid(x)
    return rows_always(x)


def _sb_cost_est(res, bs, quantizer, pvq_qm, sb_px):
    """Per-SB cost estimate of coding a residual plane at uniform size
    4 << bs: analytic K-tokens rate (the skip-RDO formula) + companded
    gain distortion, plus a DC magnitude estimate — the cheap trial
    that drives the 2-size grid decision (no pulse search).  Returns
    (nsby, nsbx) float32."""
    import jax.numpy as jnp

    from ..pvq.core import PVQ_LAMBDA
    from ..pvq.scan import qm_get_index

    n = 4 << bs
    h, w = res.shape
    blocks = (res.reshape(h // n, n, w // n, n).swapaxes(1, 2)
              .reshape(-1, n * n))
    vec = blocks[:, _FLAT_IDX[n]]
    offs = BAND_OFFSETS[bs]
    lam = np.float32(PVQ_LAMBDA)
    gw = np.float32(1.4)
    cost = jnp.zeros(blocks.shape[0], dtype=jnp.float32)
    for b in range(offs[0]):
        lo, hi = offs[1 + b], offs[2 + b]
        nn = hi - lo
        qb = max(1, (int(quantizer)
                     * int(pvq_qm[qm_get_index(bs, b + 1)])) >> 4)
        x = vec[:, lo:hi].astype(jnp.float32)
        g = jnp.sqrt((x * x).astype(jnp.float64).sum(-1)
                     ).astype(jnp.float32) / np.float32(qb)
        qg = jnp.round(g)
        k = jnp.where(qg > 0, jnp.maximum(
            1.0, jnp.floor(0.5 + (qg - 0.2)
                           * np.float32(np.sqrt((nn + 3) // 2)))), 0.0)
        rate = jnp.where(
            k > 0,
            nn * jnp.log2(1.0 + np.float32(np.log(2.0 * nn)) * k / nn)
            + np.float32(2.5), np.float32(1.0))
        dist = gw * (qg - g) ** 2
        skip = gw * g * g
        cost = cost + jnp.minimum(dist + lam * rate, skip + lam)
    dcq = max(1, (int(quantizer)
                  * int(pvq_qm[qm_get_index(bs, 0)])) >> 4)
    dci = jnp.round(jnp.abs(vec[:, 0].astype(jnp.float32))
                    / np.float32(dcq))
    cost = cost + lam * 2.0 * jnp.log2(1.0 + dci)
    per_blk = cost.reshape(h // n, w // n)
    r = sb_px // n
    return (per_blk.reshape(h // (n * r), r, w // (n * r), r)
            .sum((1, 3)))


def _plane_code_mixed(cur_u8, pred_u8, split, lo, hi, xdec, quantizer,
                      qms, qm_invs, pvq_qm_pl):
    """Residual coding of one plane with a per-SB 2-size grid: the
    input rides the quadtree-grid lapped transform (the decoder's
    prefilter_plane_grid semantics), the prediction reads the uniform
    cascade tables (exact per leaf regardless of the split structure —
    _mc_pred_tables invariant), and BOTH sizes' stream-valid PVQ
    symbols are produced so the host pack selects per SB.  Returns
    (recon coeff plane, per-size (dc, qg, y) pairs)."""
    import jax.numpy as jnp

    from ..pvq.device_search import pvq_symbols_frame

    sbn = 4 << hi
    c = (cur_u8.astype(jnp.int32) - 128) << 4
    p = (pred_u8.astype(jnp.int32) - 128) << 4
    ci = _grid_prefilter(c, split, sbn)
    from ..ops.dct import fdct2d, idct2d
    from .device import _to_blocks, _from_blocks

    h, w = c.shape
    outs = []
    dq_sizes = []
    dp_sizes = []
    for bs in (lo, hi):
        n = 4 << bs
        d = _from_blocks(fdct2d(_to_blocks(ci, n), n), h, w, n)
        dp = _fwd_pred(p, bs, xdec)
        dq, dc_idx, qg, y = pvq_symbols_frame(
            d - dp, bs, quantizer, qms[bs], qm_invs[bs], pvq_qm_pl)
        outs.append((dc_idx, qg, y))
        dq_sizes.append(dq)
        dp_sizes.append(dp)
    selpx = jnp.repeat(jnp.repeat(split, sbn, 0), sbn, 1)
    dmix = jnp.where(selpx, dq_sizes[0] + dp_sizes[0],
                     dq_sizes[1] + dp_sizes[1])
    rec_lo = _from_blocks(idct2d(_to_blocks(dmix, 4 << lo), 4 << lo),
                          h, w, 4 << lo)
    rec_hi = _from_blocks(idct2d(_to_blocks(dmix, 4 << hi), 4 << hi),
                          h, w, 4 << hi)
    rec = jnp.where(selpx, rec_lo, rec_hi)
    rec = _grid_prefilter(rec, split, sbn, inverse=True)
    return rec, outs


def _dering_select(recs, orig_y, flags_thr, quantizer, xdecs):
    """Directional dering with per-SB flags decided on luma distortion
    (encoder choice; the host codes these flags verbatim).  recs are
    coeff-domain int32 planes; returns (filtered planes, flags)."""
    import jax.numpy as jnp

    from ..ops.dering import DERING_VERY_LARGE
    from ..ops.dering_jax import dering_padded_jax

    thr = np.int32(np.power(float(max(1, quantizer)), 0.84182))
    h, w = recs[0].shape
    nvsb, nhsb = h >> 5, w >> 5

    def _pad(plane):
        hh, ww = plane.shape
        P = jnp.full((hh + 6, ww + 6), DERING_VERY_LARGE,
                     dtype=jnp.int32)
        return P.at[3:3 + hh, 3:3 + ww].set(plane)

    bufs0, dirs = dering_padded_jax(_pad(recs[0]), nhsb, nvsb, thr, 0, 0)
    # Flags: filtered-vs-unfiltered SSE on the luma source PLUS the
    # lambda * q^2 * flag-rate term of the host RDO
    # (pipeline/intra._dering_pass, encode.c:2550-2686).  The host
    # charges the LIVE adaptive CDF — rare flags stay rare because
    # coding a 1 gets expensive.  The device models that feedback in
    # mean field: estimate the flag probability from the current
    # decisions, recompute both symbol rates, iterate (3 fixed
    # rounds; all vectorized, no serial scan).
    from ..pvq.core import PVQ_LAMBDA

    qf = float(max(1, quantizer))
    # orig/recs and the host's _dering_pass errors are both in the
    # x16 coeff domain with the coeff-domain quantizer, so lambda *
    # q^2 * bits applies unscaled.
    lamq = np.float64(PVQ_LAMBDA * qf * qf)
    o = orig_y.reshape(nvsb, 32, nhsb, 32).transpose(0, 2, 1, 3)
    r = recs[0].reshape(nvsb, 32, nhsb, 32).transpose(0, 2, 1, 3)
    # int64 SSE sums: the x16-domain squares overflow f32's 2^24
    # mantissa, and float reductions are not order-independent — the
    # integer form makes the flag decisions deterministic across
    # runs/recompiles (round-4 weak #4).
    d_f = (o - bufs0).astype(jnp.int64)
    d_u = (o - r).astype(jnp.int64)
    fe = (d_f * d_f).sum((2, 3))
    ue = (d_u * d_u).sum((2, 3))
    flags = (fe < ue)
    for _ in range(3):
        # The mean-field flag probability is a scalar: its f32 math is
        # elementwise (no reduction ordering), and the per-SB compare
        # rounds the rate terms to integers first.
        p1 = jnp.clip(flags.astype(jnp.float32).mean(),
                      1.0 / 64, 1 - 1.0 / 64)
        r1 = jnp.round(lamq * -jnp.log2(p1)).astype(jnp.int64)
        r0 = jnp.round(lamq * -jnp.log2(1 - p1)).astype(jnp.int64)
        flags = fe + r1 < ue + r0
    flags = flags.astype(jnp.int32)
    out = []
    sel = jnp.where((flags > 0)[:, :, None, None], bufs0, r)
    out.append(sel.transpose(0, 2, 1, 3).reshape(h, w))
    for pli in range(1, len(recs)):
        xd = xdecs[pli]
        hh, ww = recs[pli].shape
        n = 32 >> xd
        bufs, _ = dering_padded_jax(_pad(recs[pli]), nhsb, nvsb, thr,
                                    xd, 1, dirs)
        rp = (recs[pli].reshape(nvsb, n, nhsb, n)
              .transpose(0, 2, 1, 3))
        selp = jnp.where((flags > 0)[:, :, None, None], bufs, rp)
        out.append(selp.transpose(0, 2, 1, 3).reshape(hh, ww))
    return out, flags


def _frame_body(carry, xs, h, w, quantizer, mv_res, qms, qm_invs,
                pvq_qms, use_dering, emit_recon, bs_luma=1,
                rate_refine=True, multiref=False, adaptive_bs=False):
    """One P frame of the device encode: search -> level RDO ->
    decoder-exact mixed OBMC -> residual symbols -> recon [-> dering].
    The reconstruction is carried as the next reference.

    multiref: carry a golden reference beside prev ({prev, gold} — the
    reference's P-frame ref set, encode.c:3146-3175); per-frame flags
    in xs drive the golden cadence, and the 32 px lattice may assign
    vertices to gold (_gold_pass), fixing the re-quantization drift of
    long prev-only chains."""
    import jax.numpy as jnp

    from ..ops.mc_jax import obmc_predict_jax
    from ..search.me_jax import pad_edge

    if multiref:
        ry, ru, rv, gy, gu, gv = carry
        cy, cu, cv, is_gold, has_gold = xs
    else:
        ry, ru, rv = carry
        cy, cu, cv = xs
    hc, wc = h // 2, w // 2
    from ..search.me_jax import (_down2, _refine_midpoints_jax,
                                 _upsample_grid, motion_search_jax)

    refp8 = ry[16:16 + h + 128, 16:16 + w + 128]
    g32 = motion_search_jax(cy, refp8[64:64 + h, 64:64 + w], refp8,
                            h, w, 5)
    import jax as _jax

    cy2 = _down2(cy)
    ry2 = pad_edge(_down2(ry[PAD:PAD + h, PAD:PAD + w]), PAD)
    import os as _os

    levels_full = rate_refine and _os.environ.get(
        "DTPU_DEV_LEVELS", "full") == "full"
    if rate_refine:
        # RD mode (the host pipeline's structure): rate-aware blend
        # refinement of the 32 px lattice (device twin of
        # dtpu_obmc_refine; snap to the coded MV resolution first,
        # exactly as pipeline/inter.py does).
        from ..search.me_jax import refine_lattice_jax

        g32 = ((g32 >> mv_res) << mv_res).astype(jnp.int32)
        g32 = refine_lattice_jax(cy, refp8, g32, h, w, quantizer,
                                 mv_res=mv_res)
        # The refine's fused scan output feeding lax.cond branches
        # kernel-faults the TPU backend at 1080p (round-4 bisect); the
        # barrier stops XLA from fusing the refine into the gated
        # consumers and sidesteps the miscompile.
        g32 = _jax.lax.optimization_barrier(g32)
    nvy32, nvx32 = (h >> 5) + 1, (w >> 5) + 1
    if levels_full:
        # Then the midpoint refinements of the 16/8 px lattices BEFORE
        # the level decision, so the level RDO scores the fine levels
        # it would actually get — scoring them on dyadic-interpolated
        # lattices starves the mesh (~90% coarse64 at q30) and pays
        # the bits back in residual (RDCOMP.md round-4 decomposition).
        g16 = _refine_midpoints_jax(cy, refp8, _upsample_grid(g32),
                                    4, h, w)
        grid = _refine_midpoints_jax(cy, refp8, _upsample_grid(g16),
                                     3, h, w)
        g_res = (grid >> mv_res).astype(jnp.int32)
        g = (g_res << mv_res).astype(jnp.int32)
        if multiref:
            # VETO DECOUPLED (round-4 weak #2): the gold pass runs
            # BEFORE the level RDO with no fine-level veto, and the
            # COARSE candidates (lv0 / coarse64 — the geometries gold
            # actually applies under) are scored rid-aware, while the
            # fine candidates are scored prev-only from the PRE-gold
            # lattice.  The level decision therefore arbitrates the
            # real decoder tradeoff explicitly — "finer mesh WITHOUT
            # gold vs coarse WITH gold" — instead of the old order
            # where a fine win silently disabled the drift fix (the
            # non-monotonic level-lambda mechanism).  After the
            # decision, rid and the substituted MVs are rolled back at
            # fine-adjacent vertices (post-veto), so the fine blends
            # stay prev-only and bit-exact for reuse.
            # No lax.cond around any of this: conds whose branches
            # contain full-res banded-window scans downstream of the
            # refine kernel-fault the TPU backend at 1080p (round-5
            # bisect).  _gold_pass's internal has_gold gate keeps
            # no-gold frames bit-identical.
            pre32 = g_res[::4, ::4]
            grid, g_res, rid4 = _gold_pass(
                cy, ry, gy, grid, g_res, mv_res, quantizer, h, w,
                has_gold, jnp.zeros((nvy32, nvx32), dtype=bool))
            gg32 = (g_res[::4, ::4] << mv_res).astype(jnp.int32)
            rid_c64 = _fill_rid_up(rid4[::2, ::2])
            c64 = (_interp_stride4(g_res[::8, ::8] * 1)
                   << mv_res).astype(jnp.int32)
            # Window-select multiref blends: one shared interpolation,
            # marginal cost = one extra fetch; rid all-zero makes them
            # bit-identical to single-ref.
            p_lv0s = obmc_predict_jax([ry, gy], PAD, h, w, gg32, 5,
                                      ref_ids=rid4)
            p_c64 = obmc_predict_jax([ry, gy], PAD, h, w, c64, 5,
                                     ref_ids=rid_c64)
        else:
            c64 = (_interp_stride4(g_res[::8, ::8] * 1)
                   << mv_res).astype(jnp.int32)
            p_lv0s = obmc_predict_jax([ry], PAD, h, w, g[::4, ::4], 5)
            p_c64 = obmc_predict_jax([ry], PAD, h, w, c64, 5)
        # FULL-RES level scoring: the 2x-downsampled scoring smooths
        # away exactly the high-frequency residual that distinguishes
        # fine meshes, starving levels 1/2 (the host's choose_levels
        # scores full-res; mesh.py).  The level-1/2 scoring blends ARE
        # the final predictions — reused below (prev-only from the
        # pre-gold lattice; the post-veto guarantees fine SBs' coded
        # vertices equal exactly these values).
        p_lv1 = obmc_predict_jax([ry], PAD, h, w, g[::2, ::2], 4)
        p_lv2 = obmc_predict_jax([ry], PAD, h, w, g, 3)
        levels = _choose_levels(cy, [p_lv0s, p_lv1, p_lv2, p_c64],
                                quantizer, sb=32)
        blend = jnp.where(levels == 3, 0, levels)
        if multiref:
            # Post-veto: fine-adjacent vertices roll back to prev ref
            # and their pre-gold MVs, so every vertex a level-1/2 SB
            # reads is the value the prev-only scoring blends used.
            lvf = (levels == 1) | (levels == 2)
            lp = jnp.pad(lvf, 1, constant_values=False)
            veto = (lp[:-1, :-1] | lp[1:, :-1]
                    | lp[:-1, 1:] | lp[1:, 1:])
            new32 = jnp.where(veto[..., None], pre32,
                              g_res[::4, ::4])
            g_res = g_res.at[::4, ::4].set(new32)
            grid = grid.at[::4, ::4].set(
                (new32 << mv_res).astype(jnp.int32))
            rid4 = jnp.where(veto, 0, rid4)
    else:
        g_unref = _upsample_grid(_upsample_grid(g32))
        gu_res = (g_unref >> mv_res).astype(jnp.int32)
        gq = (gu_res << mv_res).astype(jnp.int32)
        c64 = (_interp_stride4(gu_res[::8, ::8] * 1)  # interp in res
               << mv_res).astype(jnp.int32)
        # Gated mode (DTPU_DEV_LEVELS=half, or rate_refine off): level
        # decision (encoder choice) scored on 2x-DOWNSAMPLED blends of
        # the dyadic-interpolated fine lattices (built from the
        # rate-refined 32 px lattice when rate_refine is on): the
        # midpoint refinement below then runs only when a fine level
        # is actually selected (~10 ms/frame at 1080p otherwise).
        half = []
        for (gg, bl) in ((gq[::4, ::4], 4), (gq[::2, ::2], 3), (gq, 2),
                         (c64, 4)):
            half.append(obmc_predict_jax([ry2], PAD, h // 2, w // 2,
                                         gg >> 1, bl))
        levels = _choose_levels(cy2, half, quantizer, sb=16)
        # Keep the level decision (and the cond predicates derived
        # from it) out of the refine/search fusion neighborhood: the
        # fused combination kernel-faults the TPU backend at 1080p
        # (round-4 bisect).
        levels = _jax.lax.optimization_barrier(levels)
        blend = jnp.where(levels == 3, 0, levels)
        lv_used = _jax.lax.optimization_barrier(blend.max())
        # (coarse64 blends with level-0 geometry)
        # Midpoint refinement of the 16 px lattice (level >= 1 SBs
        # code these vertices) and the 8 px lattice (level 2), gated
        # on use.
        # The dyadic upsample (scatter-based) is hoisted OUT of the
        # cond: both branches share one upsampled lattice and the
        # skip branch is a pure passthrough.  DTPU_DEV_GATECOND=0
        # drops the lax.cond gating (midpoints always refine) — the
        # structural bisect knob for the 1080p TPU kernel fault.
        # Default "while": the lax.cond form of these gates
        # kernel-faults the TPU backend at 1080p downstream of the
        # refine (round-4 blocker); the while-once form compiles and
        # runs (round-5 fix — XLA While instead of Conditional).
        gatecond = _os.environ.get("DTPU_DEV_GATECOND", "while")

        def _once(pred, fn, init):
            """Run fn at most once when pred holds, as a while_loop
            (XLA While instead of Conditional — the cond form
            kernel-faults the backend at 1080p; see ROADMAP)."""
            return _jax.lax.while_loop(
                lambda c: (c[0] == 0) & pred,
                lambda c: (jnp.int32(1), fn()),
                (jnp.int32(0), init))[1]

        g16u = _upsample_grid(g32)
        if gatecond == "while":
            g16 = _once(lv_used >= 1,
                        lambda: _refine_midpoints_jax(cy, refp8, g16u,
                                                      4, h, w), g16u)
        elif gatecond not in ("0", "false"):
            g16 = _jax.lax.cond(
                lv_used >= 1,
                lambda: _refine_midpoints_jax(cy, refp8, g16u, 4, h, w),
                lambda: g16u)
        else:
            g16 = _refine_midpoints_jax(cy, refp8, g16u, 4, h, w)
        g8u = _upsample_grid(g16)
        if gatecond == "while":
            grid = _once(lv_used >= 2,
                         lambda: _refine_midpoints_jax(cy, refp8, g8u,
                                                       3, h, w), g8u)
        elif gatecond not in ("0", "false"):
            grid = _jax.lax.cond(
                lv_used >= 2,
                lambda: _refine_midpoints_jax(cy, refp8, g8u, 3, h, w),
                lambda: g8u)
        else:
            grid = _refine_midpoints_jax(cy, refp8, g8u, 3, h, w)
        g_res = (grid >> mv_res).astype(jnp.int32)
        g = (g_res << mv_res).astype(jnp.int32)
    if multiref and not levels_full:
        # Gated mode keeps the round-4 order: golden substitution on
        # the 32 px lattice AFTER the level decision, vetoed at
        # vertices any level-1/2 superblock reads — those SBs'
        # cond-computed predictions below are prev-only, so gold
        # applies exactly under level-0/coarse64 geometry only.
        lvf = (levels == 1) | (levels == 2)
        lp = jnp.pad(lvf, 1, constant_values=False)
        veto = (lp[:-1, :-1] | lp[1:, :-1] | lp[:-1, 1:] | lp[1:, 1:])
        # Unconditional (no lax.cond — the cond-wrapped vertex-patch
        # scans kernel-fault the TPU backend at 1080p; see above):
        # _gold_pass's internal has_gold gate makes no-gold frames
        # bit-identical.
        grid, g_res, rid4 = _gold_pass(cy, ry, gy, grid, g_res,
                                       mv_res, quantizer, h, w,
                                       has_gold, veto)
        g = (g_res << mv_res).astype(jnp.int32)
    if multiref:
        # The decoded stride-4 rid lattice feeding the level-0 OBMC
        # (the host pack derives the full fine grid with
        # _sim_rid_grids_np for the mesh coder).
        d4 = _sim_rid4(rid4, levels)
    else:
        rid4 = d4 = None
        refs_y = [ry]
    # Decoder-exact final prediction: level-0 geometry reads the
    # simulated decoded stride-4 lattice.  The gold-plane window fetch
    # in the multiref OBMC only runs when some vertex actually picked
    # gold (rid all-zero makes the single-ref pass bit-identical).
    g4s = (_sim_stride4(g_res, levels) << mv_res).astype(jnp.int32)
    if multiref:
        p0 = obmc_predict_jax([ry, gy], PAD, h, w, g4s, 5, ref_ids=d4)
    else:
        p0 = obmc_predict_jax(refs_y, PAD, h, w, g4s, 5)
    need1 = _jax.lax.optimization_barrier(jnp.any(blend == 1))
    need2 = _jax.lax.optimization_barrier(jnp.any(blend == 2))
    # Fallback zeros are DERIVED from the (varying) reference so both
    # cond branches carry the same varying type under shard_map.
    zy = (ry[0, 0] * 0).astype(jnp.uint8)
    if not levels_full:
        # The level-1/2 full-res passes run ONLY when some SB actually
        # selected that level (lax.cond: the fine-grid vertex-patch
        # OBMC is ~9 ms/frame at 1080p and levels stay coarse at
        # normal rates; the select below never reads an unselected
        # level's pixels, so the zero fallback is bit-neutral).
        p_lv1 = _jax.lax.cond(
            need1,
            lambda: obmc_predict_jax([ry], PAD, h, w, g[::2, ::2], 4),
            lambda: jnp.broadcast_to(zy, (h, w)))
        p_lv2 = _jax.lax.cond(
            need2,
            lambda: obmc_predict_jax([ry], PAD, h, w, g, 3),
            lambda: jnp.broadcast_to(zy, (h, w)))
    pred_y = _select_by_sb([p0, p_lv1, p_lv2], blend, 32)
    # U and V ride one vmapped pass per level (same grid, same
    # geometry: better lane utilization than two separate passes).
    ruv = jnp.stack([ru, rv])
    if multiref:
        guv = jnp.stack([gu, gv])
        uv0 = _jax.vmap(lambda r, gg: obmc_predict_jax(
            [r, gg], PAD, hc, wc, g4s >> 1, 4,
            ref_ids=d4))(ruv, guv)
    else:
        uv0 = _jax.vmap(lambda r: obmc_predict_jax(
            [r], PAD, hc, wc, g4s >> 1, 4))(ruv)
    # Chroma fine-level blends are prev-only in BOTH modes: the
    # (post-)veto guarantees no level-1/2 SB reads a gold vertex, so
    # the single-ref cond'd passes stay bit-exact and cheap (these
    # single-ref conds predate the refine and never faulted).
    uv1 = _jax.lax.cond(
        need1,
        lambda: _jax.vmap(lambda r: obmc_predict_jax(
            [r], PAD, hc, wc, (g[::2, ::2]) >> 1, 3))(ruv),
        lambda: jnp.broadcast_to(zy, (2, hc, wc)))
    uv2 = _jax.lax.cond(
        need2,
        lambda: _jax.vmap(lambda r: obmc_predict_jax(
            [r], PAD, hc, wc, g >> 1, 2))(ruv),
        lambda: jnp.broadcast_to(zy, (2, hc, wc)))
    pred_u = _select_by_sb([uv0[0], uv1[0], uv2[0]], blend, 16)
    pred_v = _select_by_sb([uv0[1], uv1[1], uv2[1]], blend, 16)
    bsy = bs_luma
    bsc = max(bs_luma - 1, 0)
    if adaptive_bs:
        # Per-SB 2-size grid {bs_luma-1, bs_luma} (VERDICT round-4
        # item 5, first tier): the split decision comes from a cheap
        # analytic rate/dist trial on the uniform residual transforms,
        # the final coding rides the quadtree-grid lapped transform
        # (decoder semantics), and both sizes' stream-valid symbols
        # travel so the host pack selects per SB.
        lo = bs_luma - 1
        cpx = (cy.astype(jnp.int32) - 128) << 4
        ppx = (pred_y.astype(jnp.int32) - 128) << 4
        rt_lo = _fwd_input(cpx, lo) - _fwd_pred(ppx, lo, 0)
        rt_hi = _fwd_input(cpx, bsy) - _fwd_pred(ppx, bsy, 0)
        cl = _sb_cost_est(rt_lo, lo, quantizer, pvq_qms[0], 4 << bsy)
        ch = _sb_cost_est(rt_hi, bsy, quantizer, pvq_qms[0], 4 << bsy)
        bias = jnp.float32(float(_os.environ.get(
            "DTPU_BS_SPLIT_BIAS", "2.0")))
        split = cl + bias < ch
        ry_d, ysy = _plane_code_mixed(cy, pred_y, split, lo, bsy, 0,
                                      quantizer, qms, qm_invs,
                                      pvq_qms[0])
        ru_d, usy = _plane_code_mixed(cu, pred_u, split, lo - 1,
                                      bsy - 1, 1, quantizer, qms,
                                      qm_invs, pvq_qms[1])
        rv_d, vsy = _plane_code_mixed(cv, pred_v, split, lo - 1,
                                      bsy - 1, 1, quantizer, qms,
                                      qm_invs, pvq_qms[2])
    else:
        ry_d, dc_y, qg_y, y_y = _plane_code(cy, pred_y, bsy, 0,
                                            quantizer, qms[bsy],
                                            qm_invs[bsy], pvq_qms[0])
        ru_d, dc_u, qg_u, y_u = _plane_code(cu, pred_u, bsc, 1,
                                            quantizer, qms[bsc],
                                            qm_invs[bsc], pvq_qms[1])
        rv_d, dc_v, qg_v, y_v = _plane_code(cv, pred_v, bsc, 1,
                                            quantizer, qms[bsc],
                                            qm_invs[bsc], pvq_qms[2])
    if adaptive_bs:
        # _plane_code_mixed already applied the per-size idct + the
        # inverse quadtree-grid laps.
        rec_y, rec_u, rec_v = ry_d, ru_d, rv_d
    else:
        rec_y = _inv(ry_d, bsy)
        rec_u = _inv(ru_d, bsc)
        rec_v = _inv(rv_d, bsc)
    if use_dering:
        oy = (cy.astype(jnp.int32) - 128) << 4
        (rec_y, rec_u, rec_v), dflags = _dering_select(
            [rec_y, rec_u, rec_v], oy, None, quantizer, (0, 1, 1))
    else:
        dflags = jnp.zeros((h >> 5, w >> 5), dtype=jnp.int32)
    r8y = jnp.clip(((rec_y + 8) >> 4) + 128, 0, 255).astype(jnp.uint8)
    r8u = jnp.clip(((rec_u + 8) >> 4) + 128, 0, 255).astype(jnp.uint8)
    r8v = jnp.clip(((rec_v + 8) >> 4) + 128, 0, 255).astype(jnp.uint8)
    py_, pu_, pv_ = (pad_edge(r8y, PAD), pad_edge(r8u, PAD),
                     pad_edge(r8v, PAD))
    if multiref:
        # FT_GOLDEN frames refresh the golden reference (decoder
        # rotation, pipeline/inter.DecoderSession._rotate).
        gy2 = jnp.where(is_gold > 0, py_, gy)
        gu2 = jnp.where(is_gold > 0, pu_, gu)
        gv2 = jnp.where(is_gold > 0, pv_, gv)
        carry = (py_, pu_, pv_, gy2, gu2, gv2)
    else:
        carry = (py_, pu_, pv_)
    check = (jnp.sum(r8y.astype(jnp.int32)) & 0xffffff) \
        + (jnp.sum(r8u.astype(jnp.int32)) & 0xffffff) \
        + (jnp.sum(r8v.astype(jnp.int32)) & 0xffffff)
    if adaptive_bs:
        # Both sizes' symbol tensors travel; the host pack selects
        # per SB from the split grid (int8 compaction skipped in this
        # mode — opt-in RD tier, not the throughput path).
        outs = {
            "grid": grid, "levels": levels, "dflags": dflags,
            "split": split.astype(jnp.int32), "check": check,
            "dc2": tuple(s[0] for s in (ysy[0], usy[0], vsy[0])
                         ) + tuple(s[0] for s in (ysy[1], usy[1],
                                                  vsy[1])),
            "qg2": tuple(s[1] for s in (ysy[0], usy[0], vsy[0])
                         ) + tuple(s[1] for s in (ysy[1], usy[1],
                                                  vsy[1])),
            "y2": tuple(s[2] for s in (ysy[0], usy[0], vsy[0])
                        ) + tuple(s[2] for s in (ysy[1], usy[1],
                                                 vsy[1])),
        }
    else:
        # On-device symbol compaction: the pulse tensors dominate the
        # device->host transfer (~8 MB/frame int32 at 1080p); pulses
        # fit int8 at every practical rate, so the session fetches the
        # int8 twin (4x less wire) and falls back to the exact int32
        # tensor only when the per-frame overflow counter says a pulse
        # escaped the range (exactness-preserving: k is unbounded).
        y8 = tuple(jnp.clip(yv, -127, 127).astype(jnp.int8)
                   for yv in (y_y, y_u, y_v))
        yovf = sum((jnp.abs(yv) > 127).sum().astype(jnp.int32)
                   for yv in (y_y, y_u, y_v))
        outs = {
            "grid": grid, "levels": levels, "dflags": dflags,
            "dc": (dc_y, dc_u, dc_v), "qg": (qg_y, qg_u, qg_v),
            "y": (y_y, y_u, y_v), "y8": y8, "yovf": yovf,
            "check": check,
        }
    if multiref:
        outs["rid4"] = rid4
    if emit_recon:
        outs["recon"] = (r8y, r8u, r8v)
    return carry, outs


def make_device_chunk_fn(h, w, quantizer, use_dering=True,
                         emit_recon=False, qm_flat=False, bs_luma=1,
                         multiref=False, adaptive_bs=False):
    """Jit the chunked device encode for one frame geometry.  Returns
    fn(ys (T,h,w) u8, us, vs, ref_y (h+160, w+160) u8, ref_u, ref_v)
    -> (carry, outs) with every out stacked over T.  Runs (and must be
    called) under jax.enable_x64 — the integer synthesis is specified
    in int64.

    multiref: fn additionally takes (gold_y, gold_u, gold_v, is_gold
    (T,) int32, has_gold (T,) int32) and carries the golden reference
    ({prev, gold} P frames, FT_GOLDEN cadence driven by the flags)."""
    import jax

    from ..core.quant import QM8_FLAT
    from .inter import _choose_mv_res

    if h % 64 or w % 64:
        raise ValueError("device encode needs 64-aligned frame dims")
    qm, qm_inv = init_qm(QM8_FLAT if qm_flat else QM8_HVS)
    qms = tuple(np.asarray(qm[bs], dtype=np.int32) for bs in range(4))
    qmis = tuple(np.asarray(qm_inv[bs], dtype=np.int32)
                 for bs in range(4))
    pvq_qms = tuple(interp_pvq_qm(quantizer, pli, False, flat=qm_flat)
                    for pli in range(3))
    if bs_luma not in (1, 2, 3):
        raise ValueError("device encode: bs_luma must be 1, 2 or 3")
    if adaptive_bs and bs_luma < 2:
        raise ValueError("adaptive bs needs bs_luma in (2, 3) "
                         "(the grid mixes bs_luma-1 and bs_luma)")
    import os as _os

    rr = _os.environ.get("DTPU_DEV_REFINE", "1") not in ("0", "false")
    body = partial(_frame_body, h=h, w=w, quantizer=int(quantizer),
                   mv_res=_choose_mv_res(quantizer), qms=qms,
                   qm_invs=qmis, pvq_qms=pvq_qms,
                   use_dering=bool(use_dering),
                   emit_recon=bool(emit_recon), bs_luma=int(bs_luma),
                   rate_refine=rr, multiref=bool(multiref),
                   adaptive_bs=bool(adaptive_bs))

    if multiref:
        def fn(ys, us, vs, ref_y, ref_u, ref_v, gold_y, gold_u,
               gold_v, is_gold, has_gold):
            carry0 = (ref_y, ref_u, ref_v, gold_y, gold_u, gold_v)
            return jax.lax.scan(body, carry0,
                                (ys, us, vs, is_gold, has_gold))
    else:
        def fn(ys, us, vs, ref_y, ref_u, ref_v):
            carry0 = (ref_y, ref_u, ref_v)
            return jax.lax.scan(body, carry0, (ys, us, vs))

    with jax.enable_x64(True):
        return jax.jit(fn)


# ---------------------------------------------------------------------------
# device keyframe: wavefront Haar-DC + noref integer-synthesis bands
# ---------------------------------------------------------------------------


def _div_r0_jax(x, q):
    import jax.numpy as jnp

    a = jnp.abs(x)
    return jnp.sign(x) * ((a + (q >> 1)) // q)


def _tdiv5_jax(x):
    import jax.numpy as jnp

    return jnp.sign(x) * (jnp.abs(x) // 5)


def _sb_dc_wavefront(S, dcq):
    """SB-DC prediction/quantization as a slope-2 anti-diagonal
    wavefront scan — the lax.scan form of the sequential raster in
    _sb_dc_code (encode.c:1368-1421): each diagonal's superblocks read
    only finished neighbors (left / up / up-left are >=1 diagonal back;
    up-RIGHT is why the slope is 2).  S: (nvsb, nhsb) int32 raw tree
    DCs.  Returns (quant indices, reconstructed DCs)."""
    import jax
    import jax.numpy as jnp

    nvsb, nhsb = S.shape
    ii = jnp.arange(nvsb, dtype=jnp.int32)
    cols = jnp.arange(nhsb, dtype=jnp.int32)

    def body(d2, carry):
        R, Q = carry
        jj = d2 - 2 * ii
        valid = (jj >= 0) & (jj < nhsb)
        jc = jnp.clip(jj, 0, nhsb - 1)
        iu = jnp.maximum(ii - 1, 0)
        left = R[ii, jnp.maximum(jc - 1, 0)]
        up = R[iu, jc]
        ul = R[iu, jnp.maximum(jc - 1, 0)]
        ur = R[iu, jnp.minimum(jc + 1, nhsb - 1)]
        has_l = jc > 0
        has_u = ii > 0
        has_ur = has_u & (jc < nhsb - 1)
        pf = jnp.where(has_ur,
                       (22 * left - 9 * ul + 15 * up + 4 * ur + 16) >> 5,
                       (23 * left - 10 * ul + 19 * up + 16) >> 5)
        pred = jnp.where(has_l & has_u, pf,
                         jnp.where(has_u, up,
                                   jnp.where(has_l, left, 0)))
        q = _div_r0_jax(S[ii, jc] - pred, dcq).astype(jnp.int32)
        rec = q * dcq + pred
        onrow = (cols[None, :] == jc[:, None]) & valid[:, None]
        R = jnp.where(onrow, rec[:, None], R)
        Q = jnp.where(onrow, q[:, None], Q)
        return (R, Q)

    R0 = jnp.zeros_like(S)
    Q0 = jnp.zeros_like(S)
    R, Q = jax.lax.fori_loop(0, 2 * (nvsb - 1) + nhsb, body, (R0, Q0))
    return Q, R


def _haar_level_quant(x0, x1, x2, x3, hgrad, vgrad, q01, q3):
    """One Haar-DC level, vectorized over all nodes: gradient-
    compensated plain quantization of the 3 ACs + child reconstruction
    (_haar_dc_level without the adaptive-rate RDO bump — an encoder
    choice the device replicates exactly on both sides)."""
    from ..ops.dct import _haar_kernel

    def _q(v, q):
        import jax.numpy as jnp

        idx = jnp.sign(v) * (jnp.abs(v) // q)
        return idx.astype(v.dtype), (idx * q).astype(v.dtype)

    x1 = x1 - _tdiv5_jax(hgrad)
    x2 = x2 - _tdiv5_jax(vgrad)
    i1, x1 = _q(x1, q01)
    i2, x2 = _q(x2, q01)
    i3, x3 = _q(x3, q3)
    x1 = x1 + _tdiv5_jax(hgrad)
    x2 = x2 + _tdiv5_jax(vgrad)
    c0, c1, c2, c3 = _haar_kernel(x0, x1, x2, x3)
    return (i1, i2, i3), (c0, c1, c2, c3), x1, x2


def _plane_key_dc(d, n, dcq, acq):
    """Whole-plane keyframe DC coding on device: bottom-up Haar tree,
    wavefront SB-DC, two vectorized Haar-AC levels.  d: transform
    plane; n: block size (8 luma / 4 chroma); acq[level][i].
    Returns (plane with reconstructed leaf DCs, sbdc idx, level-2 idx
    (nvsb, nhsb, 3), level-1 idx (nvsb, nhsb, 4, 3))."""
    import jax.numpy as jnp

    from .device import haar_dc_tree_fwd

    d = haar_dc_tree_fwd(d, n)
    L = d[::n, ::n]
    sb_idx, R = _sb_dc_wavefront(L[::4, ::4].astype(jnp.int32), dcq)
    # Grads from reconstructed neighbor SB DCs (edge rows/cols: 0).
    hg = jnp.zeros_like(R).at[:, 1:].set(R[:, :-1] - R[:, 1:])
    vg = jnp.zeros_like(R).at[1:, :].set(R[:-1, :] - R[1:, :])
    # Level "2": node = SB, children = 16px-equivalent (stride 2 in L).
    x1 = L[0::4, 2::4].astype(jnp.int32)
    x2 = L[2::4, 0::4].astype(jnp.int32)
    x3 = L[2::4, 2::4].astype(jnp.int32)
    iA, cA, hg2, vg2 = _haar_level_quant(R, x1, x2, x3, hg, vg,
                                         acq[0][0], acq[0][1])
    # Level "1": 4 child nodes per SB share the parent's grads.
    idxB = []
    leaf = jnp.zeros((L.shape[0], L.shape[1]), dtype=jnp.int32)
    for ci, (oy, ox) in enumerate(((0, 0), (0, 2), (2, 0), (2, 2))):
        x0 = cA[ci]
        y1 = L[oy::4, ox + 1::4].astype(jnp.int32)
        y2 = L[oy + 1::4, ox::4].astype(jnp.int32)
        y3 = L[oy + 1::4, ox + 1::4].astype(jnp.int32)
        iB, cB, _, _ = _haar_level_quant(x0, y1, y2, y3, hg2, vg2,
                                         acq[1][0], acq[1][1])
        idxB.append(jnp.stack(iB, axis=-1))
        for di, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            leaf = leaf.at[oy + dy::4, ox + dx::4].set(cB[di])
    d = d.at[::n, ::n].set(leaf.astype(d.dtype))
    return (d, sb_idx, jnp.stack(iA, axis=-1),
            jnp.stack(idxB, axis=-2))


def _key_frame_planes(cy, cu, cv, quantizer, qms, qm_invs, pvq_qms,
                      dc_quants, ac_quants, use_dering):
    """Device keyframe encode (dres keyframe stream mode): per plane,
    uniform lapped transform, Haar-DC (wavefront + levels), noref
    integer-synthesis PVQ of the AC bands, reconstruction [+ dering].
    Returns (recon uint8 planes, symbol dict)."""
    import jax.numpy as jnp

    from ..pvq.device_search import pvq_symbols_frame

    outs = {"sbdc": [], "acA": [], "acB": [], "qg": [], "y": []}
    recs = []
    for pli, (cur, bs) in enumerate(((cy, 1), (cu, 0), (cv, 0))):
        n = 4 << bs
        c = (cur.astype(jnp.int32) - 128) << 4
        d = _fwd_input(c, bs)
        d, sb_idx, iA, iB = _plane_key_dc(d, n, dc_quants[pli],
                                          ac_quants[pli])
        dq, _, qg, y = pvq_symbols_frame(d, bs, quantizer,
                                         qms[bs], qm_invs[bs],
                                         pvq_qms[pli])
        # pvq_symbols_frame quantizes the DC lattice too — restore the
        # Haar-reconstructed DCs (the stream codes DC via the tree).
        dq = dq.at[::n, ::n].set(d[::n, ::n])
        recs.append(_inv(dq, bs))
        outs["sbdc"].append(sb_idx)
        outs["acA"].append(iA)
        outs["acB"].append(iB)
        outs["qg"].append(qg)
        outs["y"].append(y)
    if use_dering:
        oy = (cy.astype(jnp.int32) - 128) << 4
        recs, dflags = _dering_select(recs, oy, None, quantizer,
                                      (0, 1, 1))
    else:
        dflags = jnp.zeros((cy.shape[0] >> 5, cy.shape[1] >> 5),
                           dtype=jnp.int32)
    outs["dflags"] = dflags
    r8 = [jnp.clip(((r + 8) >> 4) + 128, 0, 255).astype(jnp.uint8)
          for r in recs]
    return r8, outs


def _key_quants(quality, qm_flat=False):
    """Keyframe quantization setup shared by the single-chip and
    sharded device keyframe paths.  quality is the session coded
    quantizer; the keyframe boost (encode.c:3059) applies here.
    Returns (cq, quantizer, qms, qmis, pvq_qms, dc_quants,
    ac_quants)."""
    from ..pvq.scan import qm_get_index
    from ..core.quant import DC_QM, QM8_FLAT

    cq = max(1, int(quality) - 3)
    quantizer = codedquantizer_to_quantizer(cq)
    qm, qm_inv = init_qm(QM8_FLAT if qm_flat else QM8_HVS)
    qms = tuple(np.asarray(qm[b], dtype=np.int32) for b in range(4))
    qmis = tuple(np.asarray(qm_inv[b], dtype=np.int32)
                 for b in range(4))
    pvq_qms = tuple(interp_pvq_qm(quantizer, pli, False, flat=qm_flat)
                    for pli in range(3))
    dc_quants = []
    ac_quants = []
    for pli in range(3):
        xdec = 0 if pli == 0 else 1
        dcq = max(1, quantizer
                  * int(pvq_qms[pli][qm_get_index(3, 0)]) >> 4)
        dc_quants.append(dcq)
        # _haar_dc_level: level param 2 then 1, DC_QM[level - xdec].
        ac_quants.append(tuple(
            (max(1, (dcq * int(DC_QM[lv - xdec][0]) + 8) >> 4),
             max(1, (dcq * int(DC_QM[lv - xdec][1]) + 8) >> 4))
            for lv in (2, 1)))
    return (cq, quantizer, qms, qmis, pvq_qms, tuple(dc_quants),
            tuple(ac_quants))


def make_device_key_fn(h, w, quality, use_dering=True, qm_flat=False):
    """Jit the device keyframe encode.
    Returns (fn, cq): fn(y, u, v) -> (recon planes, symbols)."""
    import jax

    (cq, quantizer, qms, qmis, pvq_qms, dc_quants,
     ac_quants) = _key_quants(quality, qm_flat)

    def fn(y, u, v):
        return _key_frame_planes(y, u, v, quantizer, qms, qmis,
                                 pvq_qms, dc_quants, ac_quants,
                                 bool(use_dering))

    with jax.enable_x64(True):
        return jax.jit(fn), cq


# ---------------------------------------------------------------------------
# host side: slim symbol pack
# ---------------------------------------------------------------------------


def _pack_key_leaf(ec, state, pli, bs, qg_row, y_row):
    """Code one keyframe leaf's skip symbol + noref bands from device
    tensors — pvq_encode_block's dres-keyframe syntax without the
    search (zero bands <=> qg == 0; whole-block skip only when every
    band is zero, which is recon-neutral)."""
    from ..entropy.adapt import encode_cdf_adapt
    from ..pvq.coding import _encode_partition

    adapt = state.pvq
    offs = BAND_OFFSETS[bs]
    nb = offs[0]
    off = offs[1:]
    skip_cdf = state.skip_cdf[2 * bs + (1 if pli != 0 else 0)]
    nsym = 4 + (1 if (pli == 0 and bs > 0) else 0)
    zero = [int(qg_row[i]) == 0 for i in range(nb)]
    skip_rest = 1 if all(zero[1:]) else 0
    if zero[0] and skip_rest:
        encode_cdf_adapt(ec, 2, skip_cdf[:nsym], state.skip_increment)
        return
    encode_cdf_adapt(ec, 0, skip_cdf[:nsym], state.skip_increment)
    skip_dir = 0
    if nb > 1:
        for i in range(3):
            if all(zero[j] for j in range(i + 1, nb, 3)):
                skip_dir |= 1 << i
    for i in range(nb):
        if i == 0 or (not skip_rest
                      and not (skip_dir & (1 << ((i - 1) % 3)))):
            n = off[i + 1] - off[i]
            qg = int(qg_row[i])
            k = int(icompute_k(n, True, qg))
            y = np.asarray(y_row[off[i] - 1:off[i + 1] - 1],
                           dtype=np.int64)
            _encode_partition(
                ec, adapt, qg, -1, 0, y, n, k, pli, i, True,
                (1 if pli != 0 else 0) * 4 * 9 + bs * 9 + i,
                True, 1 if (i == 0 and i < nb - 1) else 0,
                skip_rest, bs)
        if i == 0 and not skip_rest and bs > 0:
            encode_cdf_adapt(
                ec, skip_dir,
                adapt.skip_dir_cdf[(1 if pli != 0 else 0) + 2 * (bs - 1)],
                adapt.skip_dir_increment)


def _pack_key_sb(ec, state, pli, xdec, sby, sbx, syms):
    """One superblock of one plane: SB DC, the split/Haar-level walk,
    leaf bands — exactly _sb_dc_code + _code_recursive's symbol order
    for the fixed bs_luma=1 grid."""
    from ..entropy import generic_encode
    from ..entropy.adapt import encode_cdf_adapt

    v = int(syms["sbdc"][pli][sby, sbx])
    new_ex = generic_encode(ec, state.model_dc[pli], abs(v), -1,
                            int(state.ex_sb_dc[pli]), 2)
    state.ex_sb_dc[pli] = new_ex
    if v:
        ec.encode_bits(int(v < 0), 1)

    def haar(level, idx3):
        for i in range(3):
            q = int(idx3[i])
            new_ex = generic_encode(ec, state.model_dc[pli], abs(q), -1,
                                    int(state.ex_dc[pli, level, i]), 2)
            state.ex_dc[pli, level, i] = new_ex
            if q:
                ec.encode_bits(int(q < 0), 1)

    bs = max(1 - xdec, 0)   # leaf bs: luma 1, chroma 0
    if pli == 0:
        encode_cdf_adapt(ec, 4, state.skip_cdf[6][:5],
                         state.skip_increment)
    haar(2, syms["acA"][pli][sby, sbx])
    for ci in range(4):
        if pli == 0:
            encode_cdf_adapt(ec, 4, state.skip_cdf[4][:5],
                             state.skip_increment)
        haar(1, syms["acB"][pli][sby, sbx, ci])
        cby, cbx = 2 * sby + (ci >> 1), 2 * sbx + (ci & 1)
        for li in range(4):
            lby, lbx = 2 * cby + (li >> 1), 2 * cbx + (li & 1)
            row = lby * (syms["nbx"][pli]) + lbx
            _pack_key_leaf(ec, state, pli, bs,
                           syms["qg"][pli][row], syms["y"][pli][row])


def pack_device_keyframe(info, quality, syms, use_dering=True):
    """Range-code one device-encoded keyframe (dres keyframe mode) into
    the standard keyframe packet layout (encode_keyframe: QM header,
    quantizers, per-SB DC tree + leaves, dering flags; single tile)."""
    from ..entropy import make_encoder
    from ..entropy.adapt import encode_cdf_adapt
    from .intra import _tile_states
    from .tiles import pack_tiles

    cq = max(1, int(quality) - 3)
    quantizer = codedquantizer_to_quantizer(cq)
    nplanes = info.nplanes
    nvsb = info.frame_height >> 5
    nhsb = info.frame_width >> 5
    state = _tile_states(nplanes, quantizer, False, 1,
                         qm_flat=getattr(info, "qm", 1) == 0)[0]
    ec = make_encoder()
    for pli in range(nplanes):
        for v in state.pvq_qm_q4[pli]:
            ec.encode_bits(int(v), 8)
    for _ in range(nplanes):
        ec.encode_uint(cq, N_CODED_QUANTIZERS)
    syms = dict(syms)
    # Leaf blocks per row: luma 8px blocks and 4:2:0 chroma 4px blocks
    # both give frame_width >> 3.
    syms["nbx"] = [info.frame_width >> 3] * nplanes
    for sby in range(nvsb):
        for sbx in range(nhsb):
            for pli in range(nplanes):
                _pack_key_sb(ec, state, pli, info.xdec[pli], sby, sbx,
                             syms)
    if use_dering:
        fl = np.asarray(syms["dflags"], dtype=np.int32)
        for sby in range(nvsb):
            for sbx in range(nhsb):
                up = int(fl[sby - 1, sbx]) if sby > 0 else 0
                left = int(fl[sby, sbx - 1]) if sbx > 0 else 0
                encode_cdf_adapt(ec, int(fl[sby, sbx]),
                                 state.clpf_cdf[(up << 1) + left],
                                 state.clpf_increment)
    return pack_tiles([ec.done()])


class _PackPlane:
    """Minimal plane context for the native walk in device mode."""

    __slots__ = ("pli", "xdec", "quantizer", "grid", "mcpred", "h", "w")


def _pack_planes(info, quantizer, bs_luma=1):
    h, w = info.frame_height, info.frame_width
    grid = np.full((h // 4, w // 4), bs_luma, dtype=np.int8)
    pcs = []
    for pli in range(info.nplanes):
        pc = _PackPlane()
        pc.pli = pli
        pc.xdec = info.xdec[pli]
        pc.quantizer = quantizer
        pc.grid = grid
        pc.h = h >> info.ydec[pli]
        pc.w = w >> pc.xdec
        bs = max(bs_luma - pc.xdec, 0)
        n = 4 << bs
        ncoded = {0: 16, 1: 64, 2: 256, 3: 512}[bs]
        predt = np.zeros((pc.h // n, pc.w // n, ncoded), dtype=np.int32)
        pc.mcpred = {bs: (None, predt)}
        pcs.append(pc)
    return pcs


def _pack_planes_mixed(info, quantizer, split, hi):
    """Plane contexts for the native walk with a per-SB 2-size grid:
    luma cells take bs = hi-1 inside split superblocks, hi elsewhere
    (legal one-level quadtree; the walk signals the split through the
    skip symbol, _inter_recursive)."""
    h, w = info.frame_height, info.frame_width
    lo = hi - 1
    nsby, nsbx = h >> 5, w >> 5
    cells = np.where(np.asarray(split, dtype=bool), lo, hi)
    grid = np.repeat(np.repeat(cells, 8, 0), 8, 1).astype(np.int8)
    pcs = []
    for pli in range(info.nplanes):
        pc = _PackPlane()
        pc.pli = pli
        pc.xdec = info.xdec[pli]
        pc.quantizer = quantizer
        pc.grid = grid
        pc.h = h >> info.ydec[pli]
        pc.w = w >> pc.xdec
        pc.mcpred = {}
        for bs in (max(lo - pc.xdec, 0), max(hi - pc.xdec, 0)):
            n = 4 << bs
            ncoded = {0: 16, 1: 64, 2: 256, 3: 512}[bs]
            predt = np.zeros((pc.h // n, pc.w // n, ncoded),
                             dtype=np.int32)
            pc.mcpred[bs] = (None, predt)
        pcs.append(pc)
    return pcs, nsby, nsbx


def _device_pre_mixed(info, syms, split, hi):
    """Flattened Pre for the native walk from 2-size device symbol
    tensors.  syms: dc2/qg2/y2, each a 6-tuple [lo_y, lo_u, lo_v,
    hi_y, hi_u, hi_v] of DENSE per-size arrays; split: (nsby, nsbx)
    bool — slots cover hi-size leaves of unsplit SBs and lo-size
    leaves of split SBs, in per-plane (size-major) row-major order."""
    from ..pvq.native_walk import Pre

    sb = np.asarray(split, dtype=bool)
    pre = Pre()
    pre.leaf_slot = []
    band_start = []
    dc0 = []
    qg = []
    ys = []
    offsets = [0]
    nslots = 0
    for pli in range(info.nplanes):
        xd = info.xdec[pli]
        ph = info.frame_height >> info.ydec[pli]
        pw = info.frame_width >> xd
        sl = np.full((ph // 4, pw // 4), -1, dtype=np.int32)
        for si, bsl in enumerate((max(hi - xd, 0), max(hi - 1 - xd, 0))):
            # si 0: hi-size leaves (unsplit); si 1: lo (split).
            n = 4 << bsl
            nby, nbx = ph // n, pw // n
            r = (nby + sb.shape[0] - 1) // sb.shape[0]
            mask = np.repeat(np.repeat(sb, r, 0), r, 1)[:nby, :nbx]
            mask = ~mask if si == 0 else mask
            # Device order: [lo_y, lo_u, lo_v, hi_y, hi_u, hi_v];
            # si 0 walks the HI-size leaves.
            dcs = np.asarray(syms["dc2"][3 * (1 - si) + pli]).reshape(-1)
            qgs = np.asarray(syms["qg2"][3 * (1 - si) + pli])
            yv = np.asarray(syms["y2"][3 * (1 - si) + pli])
            nb = BAND_OFFSETS[bsl][0]
            offs = BAND_OFFSETS[bsl][1:]
            lens = np.diff(np.asarray(offs[:nb + 1], dtype=np.int32))
            bidx = np.nonzero(mask.reshape(-1))[0]
            for bi in bidx:
                by, bx = divmod(int(bi), nbx)
                sl[by * (n // 4), bx * (n // 4)] = nslots
                band_start.append(len(qg))
                dc0.append(int(dcs[bi]))
                for b in range(nb):
                    qg.append(int(qgs[bi, b]))
                    offsets.append(offsets[-1] + int(lens[b]))
                ys.append(np.asarray(yv[bi], dtype=np.int32))
                nslots += 1
        pre.leaf_slot.append(sl)
    pre.nslots = nslots
    pre.band_start = np.asarray(band_start, dtype=np.int32)
    pre.dc0 = np.asarray(dc0, dtype=np.int32)
    pre.offsets = np.asarray(offsets, dtype=np.int32)
    qga = np.asarray(qg, dtype=np.int32)
    pre.qg = qga
    pre.noref = (qga > 0).astype(np.int32)
    pre.itheta = np.where(qga > 0, -1, 0).astype(np.int32)
    pre.max_theta = np.zeros(len(qga), dtype=np.int32)
    k = np.zeros(len(qga), dtype=np.int32)
    pos = 0
    # k per band from the integer rule (sizes vary per slot; walk the
    # same slot order).
    i = 0
    for pli in range(info.nplanes):
        xd = info.xdec[pli]
        ph = info.frame_height >> info.ydec[pli]
        pw = info.frame_width >> xd
        for si, bsl in enumerate((max(hi - xd, 0), max(hi - 1 - xd, 0))):
            n = 4 << bsl
            nby, nbx = ph // n, pw // n
            r = (nby + sb.shape[0] - 1) // sb.shape[0]
            mask = np.repeat(np.repeat(sb, r, 0), r, 1)[:nby, :nbx]
            mask = ~mask if si == 0 else mask
            cnt = int(mask.sum())
            nb = BAND_OFFSETS[bsl][0]
            offs = BAND_OFFSETS[bsl][1:]
            for b in range(nb):
                nn = offs[b + 1] - offs[b]
                sel = np.arange(i + b, i + cnt * nb, nb)
                k[sel] = icompute_k(int(nn), True, qga[sel])
            i += cnt * nb
            pos += cnt
    pre.k = k
    pre.skip_diff = np.full(len(qga), 1e30, dtype=np.float64)
    pre.y = (np.concatenate(ys) if ys
             else np.zeros(0, dtype=np.int32))
    pre.groups = []
    return pre


_PRE_CACHE = {}


def _device_pre(info, syms, bs_luma=1):
    """Build the native walk's flattened Pre from the device symbol
    tensors of one frame (plain-DC + rigged skip: the walk's block-skip
    RDO may only take the recon-neutral all-zero branch).

    The geometry-constant index arrays (leaf_slot, band_start,
    offsets, skip_diff) and the buffers are cached per frame geometry
    and reused across frames — a frame's pack completes before the
    next frame's Pre is built (DeviceEncoderSession packs serially)."""
    from ..pvq.native_walk import Pre

    ck = (info.frame_height, info.frame_width, tuple(info.xdec),
          tuple(info.ydec), info.nplanes, bs_luma)
    cached = _PRE_CACHE.get(ck)
    if cached is None:
        pre = Pre()
        pre.leaf_slot = []
        nslots = 0
        nbands = 0
        total = 0
        metas = []
        for pli in range(info.nplanes):
            xd = info.xdec[pli]
            bs = max(bs_luma - xd, 0)
            n = 4 << bs
            ph = info.frame_height >> info.ydec[pli]
            pw = info.frame_width >> xd
            nby, nbx = ph // n, pw // n
            nb = BAND_OFFSETS[bs][0]
            clen = BAND_OFFSETS[bs][1 + nb] - 1
            metas.append((pli, bs, nby, nbx, nslots, nbands, total))
            sl = np.full((ph // 4, pw // 4), -1, dtype=np.int32)
            step = n // 4
            sl[::step, ::step] = (nslots + np.arange(nby * nbx,
                                                     dtype=np.int32)
                                  ).reshape(nby, nbx)
            pre.leaf_slot.append(sl)
            nslots += nby * nbx
            nbands += nby * nbx * nb
            total += nby * nbx * clen
        pre.nslots = nslots
        pre.band_start = np.zeros(nslots, dtype=np.int32)
        pre.dc0 = np.zeros(nslots, dtype=np.int32)
        pre.offsets = np.zeros(nbands + 1, dtype=np.int32)
        pre.qg = np.zeros(nbands, dtype=np.int32)
        pre.itheta = np.zeros(nbands, dtype=np.int32)
        pre.max_theta = np.zeros(nbands, dtype=np.int32)
        pre.k = np.zeros(nbands, dtype=np.int32)
        pre.noref = np.zeros(nbands, dtype=np.int32)
        # Rigged: never cheaper to force-skip a nonzero residual (the
        # walk's nbeff==0 branch remains, which is recon-neutral).
        pre.skip_diff = np.full(nbands, 1e30, dtype=np.float64)
        pre.y = np.zeros(total, dtype=np.int32)
        pre.groups = []
        for (pli, bs, nby, nbx, slot0, band0, off0) in metas:
            nleaf = nby * nbx
            nb = BAND_OFFSETS[bs][0]
            offs = BAND_OFFSETS[bs][1:]
            lens = np.diff(np.asarray(offs[:nb + 1], dtype=np.int32))
            pre.band_start[slot0:slot0 + nleaf] = \
                band0 + nb * np.arange(nleaf, dtype=np.int32)
            pre.offsets[band0 + 1:band0 + nleaf * nb + 1] = \
                off0 + np.cumsum(np.tile(lens, nleaf), dtype=np.int64)
        _PRE_CACHE[ck] = (pre, metas)
        cached = _PRE_CACHE[ck]
    pre, metas = cached
    for (pli, bs, nby, nbx, slot0, band0, off0) in metas:
        nleaf = nby * nbx
        nb = BAND_OFFSETS[bs][0]
        offs = BAND_OFFSETS[bs][1:]
        clen = offs[nb] - 1
        dc, qg, yv = syms["dc"][pli], syms["qg"][pli], syms["y"][pli]
        pre.dc0[slot0:slot0 + nleaf] = dc
        bb = slice(band0, band0 + nleaf * nb)
        qf = qg.reshape(-1)
        pre.qg[bb] = qf
        pre.noref[bb] = qf > 0
        pre.itheta[bb] = np.where(qf > 0, -1, 0)
        lens = np.diff(np.asarray(offs[:nb + 1], dtype=np.int32))
        for b in range(nb):
            sel = slice(band0 + b, band0 + nleaf * nb, nb)
            pre.k[sel] = icompute_k(int(lens[b]), True, qg[:, b])
        pre.y[off0:off0 + nleaf * clen] = yv.reshape(-1)
    return pre


def _sim_rid_grids_np(rid4, levels):
    """Host twin of sim_rid_grids: expand the coded 32 px rid lattice
    to the full fine grid with the decoder's fill inheritance."""
    rid4 = np.asarray(rid4, dtype=np.int32)
    levels = np.asarray(levels, dtype=np.int32)

    def up(r):
        ny, nx = r.shape
        u = np.zeros((2 * ny - 1, 2 * nx - 1), dtype=r.dtype)
        u[::2, ::2] = r
        u[::2, 1::2] = r[:, :-1]
        u[1::2, ::2] = r[:-1, :]
        u[1::2, 1::2] = r[:-1, :-1]
        return u

    u = up(rid4[::2, ::2])
    s = np.where(levels == 3, 8, 4 >> np.minimum(levels, 2))
    sp = np.pad(s, 1, mode="edge")
    req = np.minimum(np.minimum(sp[:-1, :-1], sp[1:, :-1]),
                     np.minimum(sp[:-1, 1:], sp[1:, 1:]))
    d4 = np.where(req <= 4, rid4, u)
    return up(up(d4))


def pack_device_frame(info, cq, grid, levels, syms, dflags,
                      use_dering=True, tiles=1, tile_workers=None,
                      bs_luma=1, rid4=None, split=None):
    """Range-code one device-encoded P frame into a standard dres-mode
    packet (exact _code_inter_packet layout: per-plane quantizers in
    tile 0, MV mesh, coefficient walk, dering flags — each tile's rows
    in its own entropy stream).

    rid4: the device's 32 px-lattice golden assignments — when given
    the mesh is coded with nrefs=2 ({prev, gold} ref-id symbols per
    coded vertex, fine vertices inheriting per fill_stride).

    tiles > 1 splits the SB rows into independent per-tile streams
    (tiles.tile_rows), and tile_workers threads the native walks: the
    C++ calls release the GIL, so the pack scales with host cores."""
    from ..entropy import make_encoder
    from ..entropy.adapt import encode_cdf_adapt
    from ..pvq import native_walk as _nw
    from .inter import _MvCtx, _code_mesh
    from .intra import _tile_states
    from .tiles import pack_tiles, tile_rows

    quantizer = codedquantizer_to_quantizer(cq)
    nvsb = info.frame_height >> 5
    nhsb = info.frame_width >> 5
    bounds = tile_rows(nvsb, tiles)
    ecs = [make_encoder() for _ in bounds]
    mvctxs = [_MvCtx() for _ in bounds]
    for _ in range(info.nplanes):
        ecs[0].encode_uint(cq, N_CODED_QUANTIZERS)
    truth = np.asarray(grid, dtype=np.int64)
    if rid4 is None:
        nrefs = 1
        rids = np.zeros(truth.shape[:2], dtype=np.int32)
    else:
        nrefs = 2
        rids = _sim_rid_grids_np(rid4, levels)
    _code_mesh(ecs, mvctxs, bounds, info, nrefs, True, truth=truth,
               truth_rids=rids, levels=np.asarray(levels, np.int32),
               quantizer=quantizer)
    states = _tile_states(info.nplanes, quantizer, False, len(bounds),
                          is_keyframe=False,
                          qm_flat=getattr(info, "qm", 1) == 0)
    if split is not None:
        # Per-SB 2-size grid {bs_luma-1, bs_luma}: the walk signals
        # splits through the skip symbol and walks lo-size leaves
        # inside split SBs (_inter_recursive semantics).
        pcs, _, _ = _pack_planes_mixed(info, quantizer, split, bs_luma)
        pre = _device_pre_mixed(info, syms, split, bs_luma)
    else:
        pcs = _pack_planes(info, quantizer, bs_luma)
        pre = _device_pre(info, syms, bs_luma)
    dummy_dc = np.zeros(pre.nslots, dtype=np.int32)
    dummy_ac = np.zeros(pre.nslots, dtype=np.uint8)
    dummy_bk = np.zeros(pre.nslots, dtype=np.uint8)
    fl = np.asarray(dflags, dtype=np.int32) if use_dering else None

    def _tile_job(ti):
        rows = bounds[ti]
        _nw.walk_enc(ecs[ti], states[ti], pcs, pre, rows, nhsb, False,
                     dummy_dc, dummy_ac, dummy_bk, dres=True,
                     plain_dc=True)
        if use_dering:
            st = states[ti]
            if not _nw.dering_flags_enc(ecs[ti], st, fl, nhsb, rows):
                r0, r1 = rows
                for sby in range(r0, r1):
                    for sbx in range(nhsb):
                        up = int(fl[sby - 1, sbx]) if sby > r0 else 0
                        left = int(fl[sby, sbx - 1]) if sbx > 0 else 0
                        encode_cdf_adapt(ecs[ti], int(fl[sby, sbx]),
                                         st.clpf_cdf[(up << 1) + left],
                                         st.clpf_increment)

    nw = tile_workers if tile_workers else 1
    if len(bounds) > 1 and nw > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(nw, len(bounds))) as ex:
            list(ex.map(_tile_job, range(len(bounds))))
    else:
        for ti in range(len(bounds)):
            _tile_job(ti)
    return pack_tiles([ec.done() for ec in ecs])


# ---------------------------------------------------------------------------
# session
# ---------------------------------------------------------------------------


class DeviceEncoderSession:
    """Chunked device encoder: host keyframes seed a device-resident
    reconstruction chain; P frames are computed on device and packed on
    the host while the device runs the NEXT chunk (pipeline overlap via
    jax async dispatch).

    Packets interoperate with pipeline.inter.DecoderSession: pass
    ftype and dres from the packet dicts."""

    def __init__(self, info, quality=None, use_dering=True, chunk=8,
                 keyframe_rate=None, emit_recon=False,
                 gray_start=False, key=None, pack_tiles=None,
                 pack_workers=None, config=None, bs_luma=None,
                 multiref=None, adaptive_bs=False):
        # config: a core.config.EncoderConfig — the same unified object
        # EncoderSession consumes.  Device-relevant fields (quality,
        # use_dering, qm, chunk, gray_gop, keyframe_rate) are honored;
        # fields the device mode cannot express (b_frames, masking,
        # adaptive bs, mv bounds) must be at their device values or the
        # config is rejected, so nothing is silently ignored.
        bs_luma = -1 if bs_luma is None else bs_luma
        if config is not None:
            if config.b_frames:
                raise ValueError("device encode: b_frames=0 only")
            if config.use_masking:
                raise ValueError("device encode: masking unsupported")
            quality = config.quality if quality is None else quality
            use_dering = config.use_dering
            chunk = config.chunk
            gray_start = gray_start or config.gray_gop
            keyframe_rate = keyframe_rate or config.keyframe_rate
            info.qm = config.qm
            if bs_luma < 0:
                bs_luma = config.bs_luma
        if quality is None:
            raise ValueError("quality or config required")
        if info.bitdepth != 8:
            raise ValueError("device encode: 8-bit only")
        if tuple(info.xdec) != (0, 1, 1):
            raise ValueError("device encode: 4:2:0 only")
        self.info = info
        self.quality = int(quality)
        self.use_dering = bool(use_dering)
        self.chunk = int(chunk)
        # Host pack parallelism: split each P frame's stream into
        # per-tile streams packed by a thread pool (the native walks
        # release the GIL).  Default: one tile per available core (max
        # 4) when the frame is tall enough to matter.
        if pack_tiles is None:
            import os as _os

            nvsb = info.frame_height >> 5
            pack_tiles = 1 if nvsb < 16 else min(
                4, max(1, len(_os.sched_getaffinity(0))))
        self.pack_tiles = int(pack_tiles)
        self.pack_workers = int(pack_workers or self.pack_tiles)
        self.keyframe_rate = keyframe_rate or info.keyframe_rate
        self.emit_recon = bool(emit_recon)
        # gray_start: no host keyframes at all — every GOP opens with a
        # gray-reference P frame (container gray_ref flag), so the
        # ENTIRE encode runs on the device.
        self.gray_start = bool(gray_start)
        # Keyframe source.  Default "host": the full host intra
        # encoder (H/V prediction + CfL + RDO split — measurably
        # better RD; 1/keyframe_rate frames of host compute that
        # overlaps the device pipeline).  key="device" runs the
        # device keyframe (wavefront Haar-DC + noref isynth bands,
        # whole encode on the accelerator); gray_start implies "gray".
        self.key = key or ("gray" if gray_start else "host")
        self._key_fn = None
        self.quantizer = codedquantizer_to_quantizer(self.quality)
        self._qm_flat = getattr(info, "qm", 1) == 0
        # Device P-frame block size: uniform per frame.  Auto (-1)
        # picks by rate point — measured on the warp ladder, 32x32
        # blocks match the host RDO splitter above quantizer ~170 and
        # 8x8 wins below ~120 (RDCOMP.md round-3 device-bs sweep).
        if bs_luma < 0:
            bs_luma = (1 if self.quantizer < 120
                       else 2 if self.quantizer < 170 else 3)
        self.bs_luma = int(bs_luma)
        # Per-SB adaptive block sizes (2-size grid {bs-1, bs}): the
        # first device feature-tier lift of the uniform-bs ladder —
        # opt-in (costs a second PVQ pass per plane on device).
        self.adaptive_bs = bool(adaptive_bs) and self.bs_luma >= 2
        # Multi-ref P: {prev, gold} reference set with FT_GOLDEN
        # cadence (encode.c:3146-3175 rotation) — fixes the
        # re-quantization drift of long prev-only chains at coarse
        # quantizers (RDCOMP.md round-4 q38 chain decay).
        if multiref is None:
            import os as _os

            multiref = _os.environ.get("DTPU_DEV_MULTIREF", "1") \
                not in ("0", "false")
        self.multiref = bool(multiref)
        self._since_golden = 0
        self._prev_was_anchor = True
        self._gold_valid = False
        self._fn = make_device_chunk_fn(
            info.frame_height, info.frame_width, self.quantizer,
            use_dering=self.use_dering, emit_recon=self.emit_recon,
            qm_flat=self._qm_flat, bs_luma=self.bs_luma,
            multiref=self.multiref, adaptive_bs=self.adaptive_bs)

    # -- internals -------------------------------------------------------

    def _seed_carry(self, rec):
        import jax
        import jax.numpy as jnp

        from .intra import pad_plane

        with jax.enable_x64(True):
            out = []
            for pli in range(3):
                p = pad_plane(rec[pli],
                              self.info.frame_width >> self.info.xdec[pli],
                              self.info.frame_height >> self.info.ydec[pli])
                out.append(jnp.pad(jnp.asarray(p), PAD, mode="edge"))
        return tuple(out)

    def _encode_key(self, planes, idx):
        from .intra import encode_keyframe

        pkt, rec = encode_keyframe(
            planes, self.info, self.quality, use_masking=False,
            bs_luma=-1, use_dering=self.use_dering, return_recon=True)
        return {"data": pkt, "ftype": 0, "display_order": idx,
                "recon": rec, "use_haar": False, "dres": False}, rec

    def _encode_key_device(self, planes, idx):
        """Device keyframe: wavefront Haar-DC + noref isynth bands on
        the accelerator; host packs the symbol tensors.  The recon
        stays on device as the GOP's reference carry."""
        import jax
        import jax.numpy as jnp

        from ..search.me_jax import pad_edge
        from .intra import pad_plane

        if self._key_fn is None:
            self._key_fn = make_device_key_fn(
                self.info.frame_height, self.info.frame_width,
                self.quality, use_dering=self.use_dering,
                qm_flat=self._qm_flat)[0]
        padded = []
        for pli in range(3):
            w = self.info.frame_width >> self.info.xdec[pli]
            h = self.info.frame_height >> self.info.ydec[pli]
            padded.append(jnp.asarray(pad_plane(planes[pli], w, h)))
        with jax.enable_x64(True):
            r8, outs = self._key_fn(*padded)
            self._carry = tuple(pad_edge(r, PAD) for r in r8)
        syms = {
            "sbdc": [np.asarray(a) for a in outs["sbdc"]],
            "acA": [np.asarray(a) for a in outs["acA"]],
            "acB": [np.asarray(a) for a in outs["acB"]],
            "qg": [np.asarray(a) for a in outs["qg"]],
            "y": [np.asarray(a) for a in outs["y"]],
            "dflags": np.asarray(outs["dflags"]),
        }
        data = pack_device_keyframe(self.info, self.quality, syms,
                                    self.use_dering)
        d = {"data": data, "ftype": 0, "display_order": idx,
             "use_haar": False, "dres": True}
        if self.emit_recon:
            d["recon"] = tuple(
                np.asarray(r8[p])
                [:self.info.pic_height >> self.info.ydec[p],
                 :self.info.pic_width >> self.info.xdec[p]]
                for p in range(3))
        return d

    def _full_carry(self, c3):
        """Seed the scan carry from a 3-plane reference: multiref
        duplicates it as the initial golden (key/gray anchors seed
        both prev and gold at the decoder too)."""
        return tuple(c3) + tuple(c3) if self.multiref else tuple(c3)

    def _chunk_flags(self, n):
        """Per-frame (ftype, is_gold, has_gold) for the next n P
        frames, advancing the golden cadence (GOLDEN_INTERVAL, the
        OD_GOLDEN_FRAME_INTERVAL role).  has_gold mirrors the decoder:
        gold is a distinct reference exactly when a golden anchor
        exists at all (gray GOPs have none until the first FT_GOLDEN
        — the decoder's rotation never set one) and the previous
        coded frame was not itself the anchor."""
        from .inter import FT_GOLDEN, FT_P, GOLDEN_INTERVAL

        ftypes = []
        is_gold = np.zeros(n, dtype=np.int32)
        has_gold = np.zeros(n, dtype=np.int32)
        for t in range(n):
            has_gold[t] = (1 if self._gold_valid
                           and not self._prev_was_anchor else 0)
            self._since_golden += 1
            if self._since_golden >= GOLDEN_INTERVAL:
                self._since_golden = 0
                self._prev_was_anchor = True
                self._gold_valid = True
                is_gold[t] = 1
                ftypes.append(FT_GOLDEN)
            else:
                self._prev_was_anchor = False
                ftypes.append(FT_P)
        return ftypes, is_gold, has_gold

    def _run_chunk(self, frames):
        import jax
        import jax.numpy as jnp

        from .intra import pad_plane

        def _stack(pli):
            w = self.info.frame_width >> self.info.xdec[pli]
            h = self.info.frame_height >> self.info.ydec[pli]
            return jnp.asarray(np.stack(
                [pad_plane(f[pli], w, h) for f in frames]))

        ys, us, vs = _stack(0), _stack(1), _stack(2)
        if self.multiref:
            ftypes, is_gold, has_gold = self._chunk_flags(len(frames))
            with jax.enable_x64(True):
                carry, outs = self._fn(ys, us, vs, *self._carry,
                                       jnp.asarray(is_gold),
                                       jnp.asarray(has_gold))
            self._carry = carry
            outs["_ftypes"] = ftypes
            outs["_has_gold"] = has_gold
            return outs
        with jax.enable_x64(True):
            carry, outs = self._fn(ys, us, vs, *self._carry)
        self._carry = carry
        return outs

    def _pack_chunk(self, outs, n, idx0):
        grid = np.asarray(outs["grid"])
        levels = np.asarray(outs["levels"])
        dflags = np.asarray(outs["dflags"])
        if "split" in outs:
            return self._pack_chunk_adaptive(outs, n, idx0, grid,
                                             levels, dflags)
        dcs = [np.asarray(a) for a in outs["dc"]]
        qgs = [np.asarray(a) for a in outs["qg"]]
        # Compact transfer: int8 pulse tensors unless the overflow
        # counter says any pulse left the int8 range (then the exact
        # int32 tensors are fetched instead — rare, ultra-high rate).
        if "yovf" in outs and int(np.asarray(outs["yovf"]).sum()) == 0:
            yys = [np.asarray(a).astype(np.int32) for a in outs["y8"]]
        else:
            yys = [np.asarray(a) for a in outs["y"]]
        recs = ([tuple(np.asarray(a) for a in outs["recon"])]
                if "recon" in outs else None)
        ftypes = outs.get("_ftypes")
        has_gold = outs.get("_has_gold")
        rid4s = (np.asarray(outs["rid4"]) if "rid4" in outs else None)
        pkts = []
        for t in range(n):
            syms = {"dc": [d[t] for d in dcs],
                    "qg": [q[t] for q in qgs],
                    "y": [yv[t] for yv in yys]}
            rid4 = (rid4s[t] if rid4s is not None and has_gold is not None
                    and has_gold[t] else None)
            data = pack_device_frame(self.info, self.quality, grid[t],
                                     levels[t], syms, dflags[t],
                                     self.use_dering,
                                     tiles=self.pack_tiles,
                                     tile_workers=self.pack_workers,
                                     bs_luma=self.bs_luma, rid4=rid4)
            ftype = ftypes[t] if ftypes is not None else 3
            d = {"data": data, "ftype": ftype,
                 "display_order": idx0 + t,
                 "use_haar": False, "dres": True}
            if recs is not None:
                d["recon"] = tuple(
                    np.asarray(outs["recon"][p])[t]
                    [:self.info.pic_height >> self.info.ydec[p],
                     :self.info.pic_width >> self.info.xdec[p]]
                    for p in range(3))
            pkts.append(d)
        return pkts

    def _pack_chunk_adaptive(self, outs, n, idx0, grid, levels,
                             dflags):
        """Pack chunk frames coded with the per-SB 2-size grid."""
        split = np.asarray(outs["split"])
        dc2 = [np.asarray(a) for a in outs["dc2"]]
        qg2 = [np.asarray(a) for a in outs["qg2"]]
        y2 = [np.asarray(a) for a in outs["y2"]]
        ftypes = outs.get("_ftypes")
        has_gold = outs.get("_has_gold")
        rid4s = (np.asarray(outs["rid4"]) if "rid4" in outs else None)
        recs = outs.get("recon")
        pkts = []
        for t in range(n):
            syms = {"dc2": [d[t] for d in dc2],
                    "qg2": [q[t] for q in qg2],
                    "y2": [yv[t] for yv in y2]}
            rid4 = (rid4s[t] if rid4s is not None
                    and has_gold is not None and has_gold[t] else None)
            data = pack_device_frame(
                self.info, self.quality, grid[t], levels[t], syms,
                dflags[t], self.use_dering, tiles=self.pack_tiles,
                tile_workers=self.pack_workers, bs_luma=self.bs_luma,
                rid4=rid4, split=split[t])
            ftype = ftypes[t] if ftypes is not None else 3
            d = {"data": data, "ftype": ftype,
                 "display_order": idx0 + t,
                 "use_haar": False, "dres": True}
            if recs is not None:
                d["recon"] = tuple(
                    np.asarray(recs[p])[t]
                    [:self.info.pic_height >> self.info.ydec[p],
                     :self.info.pic_width >> self.info.xdec[p]]
                    for p in range(3))
            pkts.append(d)
        return pkts

    # -- public ----------------------------------------------------------

    def _gray_carry(self):
        import jax
        import jax.numpy as jnp

        with jax.enable_x64(True):
            out = []
            for pli in range(3):
                w = self.info.frame_width >> self.info.xdec[pli]
                h = self.info.frame_height >> self.info.ydec[pli]
                out.append(jnp.full((h + 2 * PAD, w + 2 * PAD), 128,
                                    dtype=jnp.uint8))
        return tuple(out)

    def encode_clip(self, frames):
        """Encode a full clip (list of [y, u, v] uint8 planes, display
        order).  Returns packet dicts in coding order.  Device chunks
        are dispatched ahead: the device computes chunk N+1 while the
        host packs chunk N.  With gray_start, GOPs open with a
        gray-reference P frame and the whole encode runs on device."""
        out = []
        idx = 0
        while idx < len(frames):
            gop_end = min(idx + self.keyframe_rate, len(frames))
            # GOP anchors reset the golden cadence (keyframes are
            # golden refreshes at the decoder's rotation).  Gray RAPs
            # do NOT touch the decoder's ref_gold (only FT_INTRA /
            # FT_GOLDEN rotate it, DecoderSession._rotate), so a
            # golden anchor from a previous GOP SURVIVES a gray GOP
            # start: _gold_valid persists and the golden carry planes
            # are kept — only prev re-seeds from gray.  (Resetting
            # _gold_valid here desynced nrefs after the first
            # FT_GOLDEN: the encoder packed nrefs=1 while the decoder
            # computed nrefs=2 — round-4 advisor finding.)
            self._since_golden = 0
            self._prev_was_anchor = True
            if self.key != "gray":
                self._gold_valid = True
            if self.key == "gray":
                g3 = self._gray_carry()
                if self.multiref and self._gold_valid:
                    self._carry = tuple(g3) + tuple(self._carry[3:6])
                else:
                    self._carry = self._full_carry(g3)
                p0 = idx
            elif self.key == "device":
                out.append(self._encode_key_device(frames[idx], idx))
                self._carry = self._full_carry(self._carry)
                p0 = idx + 1
            else:
                key_pkt, rec = self._encode_key(frames[idx], idx)
                out.append(key_pkt)
                self._carry = self._full_carry(self._seed_carry(rec))
                p0 = idx + 1
            first_p = p0 if self.key == "gray" else None
            pending = None   # (outs, nframes, first_display_idx)
            while p0 < gop_end or pending is not None:
                nxt = None
                if p0 < gop_end:
                    p1 = min(p0 + self.chunk, gop_end)
                    nxt = (self._run_chunk(frames[p0:p1]), p1 - p0, p0)
                    p0 = p1
                if pending is not None:
                    pkts = self._pack_chunk(*pending)
                    if first_p is not None and pkts \
                            and pkts[0]["display_order"] == first_p:
                        pkts[0]["gray_ref"] = True
                    out.extend(pkts)
                pending = nxt
            idx = gop_end
        return out
