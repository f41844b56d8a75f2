"""Spatially-tiled device P-frame encode: one inter frame split into
SB-row bands across chips, per-tile entropy streams.

Extends the intra tile-axis stream production (device_tiles.py) to the
inter path — the round-4 gap: until now a frame bigger than one chip
had no inter path at all.  The sharded computation reproduces the
single-chip `_frame_body` (multiref=False, rate-refine default,
full-res levels, bs_luma=1) SYMBOL FOR SYMBOL, so
`pack_device_frame(tiles=N)` emits byte-identical per-tile streams
(tests/test_device_tiles_p.py asserts symbols, recon and packed bytes
against the real single-chip device chunk).

Decomposition (v1, this round):

  * the MESH pipeline (hierarchical ME, the rate-aware 32 px lattice
    refinement, midpoint refinements, the level-0 decoded-lattice
    simulation) runs REPLICATED on every device from the gathered
    frame — the lattice state is tiny (a few hundred KB at 1080p) and
    the Gauss-Seidel refinement's cross-vertex rate/blend couplings
    span the whole frame, so replication is the exactness-preserving
    v1.  The banded refine (boundary-vertex snapshot ppermute per
    color pass + S-strip exchange, designed in ROADMAP.md) is the
    round-6 scaling step;
  * the PIXEL pipeline — level-RDO scoring blends, decoder-exact
    final OBMC, lapped transforms of input and prediction, PVQ
    symbols, reconstruction, dering — runs BANDED: each device
    computes only its own SB rows (the bulk of the frame time).
    Cross-band couplings reuse the intra tiling machinery:
    frame-boundary-masked row laps make band-local lapped transforms
    bit-equal to whole-frame ones (the reference's cross-SB lapping,
    filter.c:1556), dq/recon aprons slice from gathered neighbor
    rows, and the dering flag decision psums its global mean-field
    count;
  * the prediction's SB-cascade lapping (`_fwd_pred`) gets a banded
    twin (`_fwd_pred_band`) with the same masked-boundary treatment
    at every cascade level.

Inter-stage state moves by all-gather in v1 (correctness first; the
ppermute halo form of each coupling is demonstrated on the intra path
and is the follow-up optimization).
"""

from __future__ import annotations

import numpy as np

__all__ = ["sharded_inter_tiled", "make_sharded_p_fn"]

_APRON = 8


def _masked_lap_rows_at(c, edges, gy0, H, inverse=False,
                        mask_boundary=True):
    """Row laps at the given local edge rows of an extended band;
    edges whose GLOBAL position is 0 or H (the frame boundary) revert
    to unlapped (device_tiles._masked_lap_rows generalized to an
    explicit edge list — the prediction cascade's laps are not
    n-periodic).  gy0: global row of local row 0 (may be traced)."""
    import jax.numpy as jnp

    from .device import lap_rows

    edges = np.asarray(edges, dtype=np.int32)
    if len(edges) == 0:
        return c
    h_ext = c.shape[-2]
    idx = edges[:, None] + np.arange(-2, 2)
    lapped = lap_rows(c, idx, inverse=inverse)
    if not mask_boundary:
        return lapped
    gpos = gy0 + jnp.asarray(edges, jnp.int32)
    ok = (gpos > 0) & (gpos < H)
    m = jnp.zeros((h_ext,), dtype=bool)
    m = m.at[jnp.asarray(idx.reshape(-1))].set(jnp.repeat(ok, 4))
    return jnp.where(m[:, None], lapped, c)


def _fwd_input_band(c_ext, bs, gy0, H):
    """Uniform lapped forward transform of an extended input band —
    the _fwd_input twin with frame-boundary-masked row laps.  The
    apron must be a multiple of the block size so local lap rows are
    globally aligned."""
    from ..ops.dct import fdct2d
    from .device import _lap_h_idx, _to_blocks, _from_blocks, lap_cols

    n = 4 << bs
    h, w = c_ext.shape[-2], c_ext.shape[-1]
    c = _masked_lap_rows_at(c_ext, np.arange(n, h, n), gy0, H)
    c = lap_cols(c, _lap_h_idx(w, n))
    return _from_blocks(fdct2d(_to_blocks(c, n), n), h, w, n)


def _cols_at(w, first, step):
    cols = np.arange(first, w, step, dtype=np.int32)
    return cols[:, None] + np.arange(-2, 2)


def _rows_in_ext(h_ext, a, first_g_mod, step):
    """Local rows of an extended band whose global position is
    ≡ first_g_mod (mod step), restricted to rows whose 4-wide lap
    span fits the extended array.  Requires the band start to be
    step-aligned, so local ≡ global + a (mod step)."""
    start = (first_g_mod + a) % step
    while start < 2:
        start += step
    return np.arange(start, h_ext - 2, step, dtype=np.int32)


def _fwd_pred_band(p_ext, bs, xdec, gy0, H):
    """Banded twin of device_encode._fwd_pred: the prediction's
    SB-edge pass then per-level middle crosses (H then V within each
    pass), with the SB-edge row laps masked at the frame boundary
    (the mid-cross rows are never on the frame boundary).  The band
    must be SB-aligned and the apron a multiple of the block size."""
    from ..ops.dct import fdct2d
    from .device import _to_blocks, _from_blocks, lap_cols

    n = 4 << bs
    h, w = p_ext.shape[-2], p_ext.shape[-1]
    a = _APRON
    sbn = 32 >> xdec
    c = _masked_lap_rows_at(p_ext, _rows_in_ext(h, a, 0, sbn),
                            gy0, H)
    c = lap_cols(c, _cols_at(w, sbn, sbn))
    npx = sbn
    while npx > n:
        mid = npx >> 1
        c = _masked_lap_rows_at(c, _rows_in_ext(h, a, mid, npx),
                                gy0, H, mask_boundary=False)
        c = lap_cols(c, _cols_at(w, mid, npx))
        npx = mid
    return _from_blocks(fdct2d(_to_blocks(c, n), n), h, w, n)


def _mesh_pipeline(cy, ry, h, w, quantizer, mv_res):
    """The replicated mesh pipeline of _frame_body (multiref=False,
    rate-refine on, full-res levels): search, lattice refinement,
    midpoint refinements.  Returns (grid fine lattice, g_res, g, c64)
    — identical on every device by construction (all-integer)."""
    import jax
    import jax.numpy as jnp

    from ..search.me_jax import (_refine_midpoints_jax, _upsample_grid,
                                 motion_search_jax, refine_lattice_jax)
    from .device_encode import _interp_stride4

    refp8 = ry[16:16 + h + 128, 16:16 + w + 128]
    g32 = motion_search_jax(cy, refp8[64:64 + h, 64:64 + w], refp8,
                            h, w, 5)
    g32 = ((g32 >> mv_res) << mv_res).astype(jnp.int32)
    g32 = refine_lattice_jax(cy, refp8, g32, h, w, quantizer,
                             mv_res=mv_res)
    g32 = jax.lax.optimization_barrier(g32)
    g16 = _refine_midpoints_jax(cy, refp8, _upsample_grid(g32), 4, h, w)
    grid = _refine_midpoints_jax(cy, refp8, _upsample_grid(g16),
                                 3, h, w)
    g_res = (grid >> mv_res).astype(jnp.int32)
    g = (g_res << mv_res).astype(jnp.int32)
    c64 = (_interp_stride4(g_res[::8, ::8] * 1)
           << mv_res).astype(jnp.int32)
    return grid, g_res, g, c64


def _band_blend(ref_pad, lat_rows, px0, hb, w, blk_log, pad):
    """OBMC blend of one band: sliced lattice rows against the ref
    slice whose padded row 0 sits `pad` above global pixel row px0."""
    import jax

    from ..ops.mc_jax import obmc_predict_jax

    import jax.numpy as jnp

    r = jax.lax.dynamic_slice(
        ref_pad, (jnp.int32(px0), jnp.int32(0)),
        (hb + 2 * pad, ref_pad.shape[1]))
    return obmc_predict_jax([r], pad, hb, w, lat_rows, blk_log)


def _lat_slice(lat, r0, rows):
    import jax
    import jax.numpy as jnp

    z = jnp.int32(0)
    return jax.lax.dynamic_slice(
        lat, (jnp.int32(r0), z, z), (rows, lat.shape[1], 2))


def _frame_tiled_member(cy, cu, cv, ry, ru, rv, h, w, nt, band,
                        quantizer, mv_res, qms, qm_invs, pvq_qms,
                        use_dering, gsum, gather_bands):
    """One P frame for band index `band` (traced axis index).  cy/cu/
    cv: FULL current planes; ry/ru/rv: FULL PAD-padded references
    (replicated).  gsum(x): global scalar sum (psum); gather_bands(x):
    stack this band's rows into the full plane (all_gather tiled).
    Returns banded outs + this band's recon planes.  bs_luma=1 (the
    _APRON-alignment restriction of the masked laps)."""
    import jax
    import jax.numpy as jnp

    from ..pvq.device_search import pvq_symbols_frame
    from .device_encode import (PAD, _choose_levels, _select_by_sb,
                                _sim_stride4)
    from .device_tiles import (_apply_flags, _dering_band,
                               _dering_flags)

    bs_luma = 1
    hb = h // nt
    hbc = hb // 2
    nvb = hb // 32
    a = _APRON
    grid, g_res, g, c64 = _mesh_pipeline(cy, ry, h, w, quantizer,
                                         mv_res)

    vr0 = band * nvb
    cyb = jax.lax.dynamic_slice(cy, (jnp.int32(vr0 * 32), jnp.int32(0)), (hb, w))

    # Level scoring blends, banded (lattice rows sliced per level).
    lv32 = _lat_slice(g[::4, ::4], vr0, nvb + 1)
    lv16 = _lat_slice(g[::2, ::2], 2 * vr0, 2 * nvb + 1)
    lv8 = _lat_slice(g, 4 * vr0, 4 * nvb + 1)
    lvc = _lat_slice(c64, vr0, nvb + 1)
    p_lv0s = _band_blend(ry, lv32, vr0 * 32, hb, w, 5, PAD)
    p_lv1 = _band_blend(ry, lv16, vr0 * 32, hb, w, 4, PAD)
    p_lv2 = _band_blend(ry, lv8, vr0 * 32, hb, w, 3, PAD)
    p_c64 = _band_blend(ry, lvc, vr0 * 32, hb, w, 5, PAD)
    levels_b = _choose_levels(cyb, [p_lv0s, p_lv1, p_lv2, p_c64],
                              quantizer, sb=32)
    # The decoded level-0 lattice reads neighbor SBs' levels
    # (required_stride): gather the tiny level grid.
    levels = gather_bands(levels_b)
    blend_b = jnp.where(levels_b == 3, 0, levels_b)

    g4s = (_sim_stride4(g_res, levels) << mv_res).astype(jnp.int32)
    g4sb = _lat_slice(g4s, vr0, nvb + 1)
    p0 = _band_blend(ry, g4sb, vr0 * 32, hb, w, 5, PAD)
    pred_y_b = _select_by_sb([p0, p_lv1, p_lv2], blend_b, 32)

    cub = jax.lax.dynamic_slice(cu, (jnp.int32(vr0 * 16), jnp.int32(0)), (hbc, w // 2))
    cvb = jax.lax.dynamic_slice(cv, (jnp.int32(vr0 * 16), jnp.int32(0)), (hbc, w // 2))
    preds_uv = []
    for rp, curb in ((ru, cub), (rv, cvb)):
        q0 = _band_blend(rp, g4sb >> 1, vr0 * 16, hbc, w // 2, 4, PAD)
        q1 = _band_blend(rp, lv16 >> 1, vr0 * 16, hbc, w // 2, 3, PAD)
        q2 = _band_blend(rp, lv8 >> 1, vr0 * 16, hbc, w // 2, 2, PAD)
        preds_uv.append(_select_by_sb([q0, q1, q2], blend_b, 16))
    pred_u_b, pred_v_b = preds_uv

    # Residual coding, banded, frame-boundary-masked laps.
    outs = {"dc": [], "qg": [], "y": []}
    dqs = []
    geoms = []
    for pli, (curb, predb) in enumerate(
            ((cyb, pred_y_b), (cub, pred_u_b), (cvb, pred_v_b))):
        bs = bs_luma if pli == 0 else max(bs_luma - 1, 0)
        xd = 0 if pli == 0 else 1
        hp = h if pli == 0 else h // 2
        wp = w if pli == 0 else w // 2
        hbp = hp // nt
        gy0 = band * hbp
        curf = gather_bands(curb)
        predf = gather_bands(predb)
        cur_ext = jax.lax.dynamic_slice(
            jnp.pad(curf, ((a, a), (0, 0))),
            (jnp.int32(gy0), jnp.int32(0)), (hbp + 2 * a, wp))
        pred_ext = jax.lax.dynamic_slice(
            jnp.pad(predf, ((a, a), (0, 0))),
            (jnp.int32(gy0), jnp.int32(0)), (hbp + 2 * a, wp))
        c = (cur_ext.astype(jnp.int32) - 128) << 4
        p = (pred_ext.astype(jnp.int32) - 128) << 4
        dcur = _fwd_input_band(c, bs, gy0 - a, hp)
        dp = _fwd_pred_band(p, bs, xd, gy0 - a, hp)
        dres = (dcur - dp)[a:a + hbp]
        dq, dc_idx, qg, y = pvq_symbols_frame(
            dres, bs, quantizer, qms[bs], qm_invs[bs], pvq_qms[pli])
        outs["dc"].append(dc_idx)
        outs["qg"].append(qg)
        outs["y"].append(y)
        dqs.append(dp[a:a + hbp] + dq)
        geoms.append((bs, hp, wp, hbp, gy0))

    # Reconstruction: the postfilter reads the neighbors' dq boundary
    # block rows — extended dq bands from the gathered planes.
    recs = []
    for pli in range(3):
        bs, hp, wp, hbp, gy0 = geoms[pli]
        dqf = gather_bands(dqs[pli])
        dq_ext = jax.lax.dynamic_slice(
            jnp.pad(dqf, ((a, a), (0, 0))),
            (jnp.int32(gy0), jnp.int32(0)), (hbp + 2 * a, wp))
        from .device_tiles import _inv_band

        recs.append(_inv_band(dq_ext, bs, gy0 - a, hp))

    if use_dering:
        oy = (cyb.astype(jnp.int32) - 128) << 4
        bufs, fe, ue = _dering_band(recs, oy, quantizer, (a, a, a),
                                    band == 0, band == nt - 1)
        total = (h >> 5) * (w >> 5)
        dflags_b = _dering_flags(fe, ue, quantizer, total, gsum)
        r8 = _apply_flags(recs, bufs, dflags_b, (a, a, a))
    else:
        dflags_b = jnp.zeros((hb >> 5, w >> 5), dtype=jnp.int32)
        r8 = _apply_flags(recs, [None] * 3, None, (a, a, a))

    # Band's fine-lattice rows, boundary row shared with the next
    # band (folded back in sharded_inter_tiled).
    outs["grid_b"] = _lat_slice(grid, 4 * vr0, 4 * nvb + 1)
    outs["levels_b"] = levels_b
    outs["dflags_b"] = dflags_b
    outs["r8"] = tuple(r8)
    outs["dc"] = tuple(outs["dc"])
    outs["qg"] = tuple(outs["qg"])
    outs["y"] = tuple(outs["y"])
    return outs


def make_sharded_p_fn(mesh, h, w, quantizer, use_dering=True,
                      axis="tile"):
    """Jit the sharded one-P-frame encode over the mesh's `axis`.
    Returns fn(cy, cu, cv, ry, ru, rv) -> outs with banded leaves
    (row-concatenated = the single-chip _frame_body values).  Inputs:
    full current planes + full PAD-padded reference planes
    (replicated).  Restrictions (v1): multiref off, bs_luma=1, 8-bit
    4:2:0, h % (32 * ntiles) == 0."""
    import jax
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from ..core.quant import QM8_HVS, init_qm
    from ..core.state import interp_pvq_qm
    from .inter import _choose_mv_res

    nt = mesh.shape[axis]
    if h % (32 * nt):
        raise ValueError("P tiling needs 32*ntiles | height")
    qm, qm_inv = init_qm(QM8_HVS)
    qms = tuple(np.asarray(qm[b], dtype=np.int32) for b in range(4))
    qmis = tuple(np.asarray(qm_inv[b], dtype=np.int32)
                 for b in range(4))
    pvq_qms = tuple(interp_pvq_qm(quantizer, pli, False)
                    for pli in range(3))
    mv_res = _choose_mv_res(quantizer)

    def member(cy, cu, cv, ry, ru, rv):
        band = jax.lax.axis_index(axis)

        def gather_bands(x):
            full = jax.lax.all_gather(x, axis, tiled=False)
            return full.reshape((-1,) + x.shape[1:])

        return _frame_tiled_member(
            cy, cu, cv, ry, ru, rv, h, w, nt, band, int(quantizer),
            mv_res, qms, qmis, pvq_qms, bool(use_dering),
            lambda s: jax.lax.psum(s, axis), gather_bands)

    rep = P()
    band = P(axis)
    skel = {"dc": (0,) * 3, "qg": (0,) * 3, "y": (0,) * 3,
            "grid_b": 0, "levels_b": 0, "dflags_b": 0, "r8": (0,) * 3}
    fn = shard_map(member, mesh=mesh,
                   in_specs=(rep,) * 6,
                   out_specs=jax.tree.map(lambda _: band, skel),
                   check_vma=False)
    with jax.enable_x64(True):
        return jax.jit(fn)


def sharded_inter_tiled(mesh, cur_planes, ref_planes, quantizer,
                        use_dering=True, axis="tile"):
    """Run one spatially-sharded P frame.  cur_planes: 3 full planes
    (uint8, 64-aligned); ref_planes: 3 full UNPADDED reconstruction
    planes (the prev recon).  Returns the single-chip-_frame_body-
    compatible outs dict (full-frame numpy leaves) + recon planes."""
    import jax.numpy as jnp

    from ..search.me_jax import pad_edge
    from .device_encode import PAD

    import jax

    h, w = cur_planes[0].shape
    fn = make_sharded_p_fn(mesh, h, w, quantizer,
                           use_dering=use_dering, axis=axis)
    with jax.enable_x64(True):
        refs = [pad_edge(jnp.asarray(p), PAD) for p in ref_planes]
        outs = fn(jnp.asarray(cur_planes[0]),
                  jnp.asarray(cur_planes[1]),
                  jnp.asarray(cur_planes[2]), *refs)
    res = {
        "dc": [np.asarray(x) for x in outs["dc"]],
        "qg": [np.asarray(x) for x in outs["qg"]],
        "y": [np.asarray(x) for x in outs["y"]],
        "levels": np.asarray(outs["levels_b"]),
        "dflags": np.asarray(outs["dflags_b"]),
        "recon": tuple(np.asarray(r) for r in outs["r8"]),
    }
    # The banded fine-lattice rows overlap at band boundaries (each
    # band carries its top..bottom vertex rows inclusive): fold back.
    nt = mesh.shape[axis]
    gb = np.asarray(outs["grid_b"])
    rows_per = gb.shape[0] // nt
    nvy = (h >> 3) + 1
    full = np.zeros((nvy, gb.shape[1], 2), dtype=gb.dtype)
    for b in range(nt):
        r0 = b * (rows_per - 1)
        full[r0:r0 + rows_per] = gb[b * rows_per:(b + 1) * rows_per]
    res["grid"] = full
    return res
