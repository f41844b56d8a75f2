"""Native inter-frame symbol walk: bindings + batched reconstruction.

The inter pipeline's sequential symbol pass (pipeline/inter.py
`_inter_recursive` + pvq/coding.py `pvq_encode_block`/`pvq_decode_block`)
becomes ONE FFI call per tile:

  encoder:  flatten leaves/bands (prepass) -> dtpu_pvq_theta_batch
            (band search) -> dtpu_pvq_synth_batch (reconstruction) ->
            dtpu_inter_walk(encoder=1) (all symbols, whole-block skip
            RDO with EC+adaptation rollback) -> batched writeback.
  decoder:  dtpu_inter_walk(encoder=0) (all symbols -> leaf/band lists)
            -> dtpu_pvq_synth_batch -> batched writeback.

Both sides reconstruct through the SAME C++ synthesis (linear-order
doubles), so encoder recon == decoder recon by construction — the
--enable-encoder-check invariant (encode.c:3204-3243).  The Python
band path in pvq/coding.py remains the no-native fallback and the
unit-test oracle.

Behavioral spec: pvq_encoder.c:645-815, pvq_decoder.c:311-387,
od_block_encode/decode (encode.c:1066-1285, decode.c:528-636).
"""

from __future__ import annotations

import ctypes
from ctypes import POINTER, c_double, c_int32, c_int64, c_uint8, c_void_p

import numpy as np

from ..entropy import native as _native
from .core import PVQ_LAMBDA
from .scan import BAND_OFFSETS, qm_get_index

__all__ = ["available", "prepass_search", "walk_enc", "walk_dec",
           "assemble_recon", "synth_batch"]

NBSIZES = 4
_NCODED = {0: 16, 1: 64, 2: 256, 3: 512}


class _WalkCtx(ctypes.Structure):
    _fields_ = [
        ("skip_cdf", c_void_p), ("gaintheta_cdf", c_void_p),
        ("skip_dir_cdf", c_void_p), ("k1_cdf", c_void_p),
        ("pvq_adapt", c_void_p), ("exg", c_void_p), ("ext", c_void_p),
        ("pm_cdf0", c_void_p), ("pm_cdf1", c_void_p), ("pm_cdf2", c_void_p),
        ("dc_cdf", c_void_p * 4), ("ex_dc", c_void_p),
        ("skip_inc", c_int32), ("gt_inc", c_int32), ("sd_inc", c_int32),
        ("k1_inc", c_int32), ("pm_inc", c_int32), ("dc_inc", c_int32),
        ("grid", c_void_p), ("h4", c_int32), ("w4", c_int32),
        ("nplanes", c_int32), ("nhsb", c_int32),
        ("row0", c_int32), ("row1", c_int32),
        ("xdec", c_int32 * 4), ("q0", c_int32), ("use_masking", c_int32),
        ("lam", c_double),
        ("pvq_qm", c_void_p * 4), ("qm", c_void_p * 4),
        ("qm_inv", c_void_p * 4),
        ("predt", (c_void_p * 4) * 4), ("predt_w", (c_int32 * 4) * 4),
        ("leaf_slot", c_void_p * 4),
        ("e_band_start", c_void_p), ("e_dc0", c_void_p),
        ("b_qg", c_void_p), ("b_itheta", c_void_p),
        ("b_max_theta", c_void_p), ("b_k", c_void_p), ("b_noref", c_void_p),
        ("b_skip_diff", c_void_p), ("b_y", c_void_p), ("b_yoff", c_void_p),
        ("o_dc", c_void_p), ("o_acskip", c_void_p), ("o_bskip", c_void_p),
        ("d_leaf_pli", c_void_p), ("d_leaf_bs", c_void_p),
        ("d_leaf_cy", c_void_p), ("d_leaf_cx", c_void_p),
        ("d_leaf_dc", c_void_p), ("d_leaf_acskip", c_void_p),
        ("d_leaf_bskip", c_void_p),
        ("d_b_qg", c_void_p), ("d_b_itheta", c_void_p),
        ("d_b_noref", c_void_p), ("d_b_k", c_void_p), ("d_b_q", c_void_p),
        ("d_y", c_void_p),
        ("n_leaves", c_int64), ("n_bands", c_int64), ("y_len", c_int64),
        ("dres", c_int32), ("plain_dc", c_int32),
    ]


class _KeyCtx(ctypes.Structure):
    _fields_ = [
        ("skip_cdf", c_void_p), ("gaintheta_cdf", c_void_p),
        ("skip_dir_cdf", c_void_p), ("k1_cdf", c_void_p),
        ("pvq_adapt", c_void_p), ("exg", c_void_p), ("ext", c_void_p),
        ("pm_cdf0", c_void_p), ("pm_cdf1", c_void_p), ("pm_cdf2", c_void_p),
        ("dc_cdf", c_void_p * 4), ("ex_dc", c_void_p),
        ("ex_sb_dc", c_void_p),
        ("skip_inc", c_int32), ("gt_inc", c_int32), ("sd_inc", c_int32),
        ("k1_inc", c_int32), ("pm_inc", c_int32), ("dc_inc", c_int32),
        ("grid", c_void_p), ("h4", c_int32), ("w4", c_int32),
        ("nplanes", c_int32), ("nhsb", c_int32),
        ("row0", c_int32), ("row1", c_int32),
        ("xdec", c_int32 * 4), ("q0", c_int32), ("use_masking", c_int32),
        ("lam", c_double),
        ("pvq_qm", c_void_p * 4), ("qm", c_void_p * 4),
        ("qm_inv", c_void_p * 4), ("scan", c_void_p * 4),
        ("d", c_void_p * 4), ("pw", c_int32 * 4), ("ph", c_int32 * 4),
        ("sb_dc_mem", c_void_p * 4),
        ("dc_qm", c_void_p), ("cfl4", c_void_p),
    ]


_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = _native._load()
    if not lib or not hasattr(lib, "dtpu_inter_walk"):
        _LIB = False
        return False
    # Ensure the Laplace tables are registered (idempotent).
    from .coding import _partition_lib

    if not _partition_lib():
        _LIB = False
        return False
    lib.dtpu_inter_walk.argtypes = [c_void_p, POINTER(_WalkCtx), c_int32]
    lib.dtpu_inter_walk.restype = c_int32
    lib.dtpu_key_walk.argtypes = [c_void_p, POINTER(_KeyCtx), c_int32]
    lib.dtpu_key_walk.restype = c_int32
    lib.dtpu_pvq_synth_batch.argtypes = [c_int32] + [c_void_p] * 9 + [
        c_void_p, c_int32, c_void_p, c_void_p, c_int32]
    # Register the sin LUT format constants for the integer synthesis.
    from .isynth import SIN_Q15

    lut = np.ascontiguousarray(SIN_Q15, dtype=np.int64)
    lib.dtpu_set_sin_lut.argtypes = [c_void_p]
    lib.dtpu_set_sin_lut(lut.ctypes.data_as(c_void_p))
    _LIB = lib
    return lib


def available() -> bool:
    return bool(_load())


def _vp(a):
    return a.ctypes.data_as(c_void_p)


def mesh_pass_native(ec, mvctx, wrk, truth, req, s, vspan, encoder,
                     limit, nrefs=1, wrids=None, truth_rids=None):
    """Native twin of pipeline/inter.py _code_mesh_pass (single- or
    multi-ref: nrefs=2 also codes the per-vertex ref-id symbols).
    Returns False when the lib is unavailable (caller falls back)."""
    import os

    lib = _load()
    if not lib or os.environ.get("DTPU_PY_WALK"):
        return False
    if not getattr(lib, "_mesh_ready", False):
        lib.dtpu_mesh_pass.argtypes = [
            c_void_p, c_int32, c_void_p, c_void_p, c_void_p, c_int32,
            c_int32, c_int32, c_int32, c_int32, c_void_p, c_int32,
            c_void_p, c_int32, c_int32, c_void_p, c_void_p, c_void_p,
            c_int32]
        lib.dtpu_mesh_pass.restype = c_int32
        lib._mesh_ready = True
    nvy, nvx = wrk.shape[:2]
    assert wrk.dtype == np.int64 and wrk.flags["C_CONTIGUOUS"]
    req = np.ascontiguousarray(req, dtype=np.int32)
    if encoder:
        truth = np.ascontiguousarray(truth, dtype=np.int64)
    else:
        truth = wrk
    ex = np.array([mvctx.ex, mvctx.ey], dtype=np.int64)
    cdf = mvctx.model.cdf
    assert cdf.dtype == np.int32 and cdf.flags["C_CONTIGUOUS"]
    if nrefs > 1:
        assert wrids is not None and wrids.dtype == np.int32 \
            and wrids.flags["C_CONTIGUOUS"]
        if encoder:
            trid = np.ascontiguousarray(truth_rids, dtype=np.int32)
        else:
            trid = wrids
        rcdf = mvctx.ref_cdf
        assert rcdf.dtype == np.int32 and rcdf.flags["C_CONTIGUOUS"]
        rid_args = (_vp(wrids), _vp(trid), _vp(rcdf),
                    int(mvctx.ref_increment))
    else:
        rid_args = (None, None, None, 0)
    v0, v1 = vspan
    err = lib.dtpu_mesh_pass(
        ec._h, int(bool(encoder)), _vp(wrk), _vp(truth), _vp(req),
        nvy, nvx, int(v0), int(v1), int(s), _vp(cdf),
        int(mvctx.model.increment), _vp(ex), int(limit), int(nrefs),
        *rid_args)
    if not encoder and hasattr(ec, "error"):
        ec.error = ec.error or int(err)
    mvctx.ex = int(ex[0])
    mvctx.ey = int(ex[1])
    return True


def synth_batch(offsets, r0s, qms, qm_invs, ys, qgs, ithetas, norefs,
                q0s, betas, is_keyframe, plis, isynth=False):
    """Batched PVQ band synthesis (both sides).  All arrays int32
    except betas (f64); returns the int32 flattened out vectors.
    isynth selects the integer-spec synthesis (dres stream mode)."""
    lib = _load()
    nb = len(offsets) - 1
    outs = np.zeros(int(offsets[-1]), dtype=np.int32)
    if nb == 0:
        return outs
    lib.dtpu_pvq_synth_batch(
        nb, _vp(offsets), _vp(r0s), _vp(qms), _vp(qm_invs), _vp(ys),
        _vp(qgs), _vp(ithetas), _vp(norefs), _vp(q0s), _vp(betas),
        int(is_keyframe), _vp(plis), _vp(outs), int(bool(isynth)))
    return outs


class Pre:
    """Flattened per-leaf / per-band arrays for one inter frame."""

    __slots__ = (
        "groups", "leaf_slot", "band_start", "dc0", "offsets", "r0s",
        "qms", "qm_invs", "q0s", "betas", "plis", "qg", "itheta",
        "max_theta", "k", "noref", "skip_diff", "y", "outs", "nslots",
    )


def prepass_search(pcs, state, use_masking, dres=False):
    """Flatten every leaf of every plane, run the batched band search
    and the batched synthesis.  Returns a Pre.

    dres: bands are noref residuals (x0 = d - predt, r0 = 0) with the
    integer k rule and integer synthesis."""
    import ctypes as ct

    from ..pipeline.grid import block_positions
    from .coding import _native_search

    lib = _native_search()
    if lib and not hasattr(lib, "_batch_ready"):
        lib.dtpu_pvq_theta_batch.argtypes = [ctypes.c_int] + \
            [c_void_p] * 5 + [c_void_p, ctypes.c_int, ctypes.c_int,
                              c_void_p, c_double] + [c_void_p] * 8
        lib._batch_ready = True
    pre = Pre()
    pre.groups = []       # (pli, bs, ys, xs, slot0, nleaf)
    pre.leaf_slot = []
    nslots = 0
    nbands = 0
    total = 0
    # Pass 1: count.
    metas = []
    for pc in pcs:
        pg = pc.pg()
        sl = np.full(pg.shape, -1, dtype=np.int32)
        pre.leaf_slot.append(sl)
        for bs in range(4):
            ys, xs = block_positions(pg, bs)
            if len(ys) == 0:
                continue
            nb = BAND_OFFSETS[bs][0]
            clen = BAND_OFFSETS[bs][1 + nb] - 1
            metas.append((pc, bs, ys, xs, nslots, nbands, total))
            nslots += len(ys)
            nbands += len(ys) * nb
            total += len(ys) * clen
    pre.nslots = nslots
    pre.band_start = np.zeros(nslots, dtype=np.int32)
    pre.dc0 = np.zeros(nslots, dtype=np.int32)
    pre.offsets = np.zeros(nbands + 1, dtype=np.int32)
    pre.r0s = np.empty(total, dtype=np.int32)
    pre.qms = np.empty(total, dtype=np.int32)
    pre.qm_invs = np.empty(total, dtype=np.int32)
    pre.q0s = np.empty(nbands, dtype=np.int32)
    pre.betas = np.empty(nbands, dtype=np.float64)
    pre.plis = np.empty(nbands, dtype=np.int32)
    x0s = np.empty(total, dtype=np.int32)
    # Pass 2: fill.
    from ..pipeline.intra import pvq_betas
    from .scan import raster_to_coding

    for (pc, bs, ys, xs, slot0, band0, off0) in metas:
        pli = pc.pli
        n = 4 << bs
        nb = BAND_OFFSETS[bs][0]
        offs = BAND_OFFSETS[bs][1:]
        clen = offs[nb] - 1
        nleaf = len(ys)
        sl = pre.leaf_slot[pli]
        sl[ys // 4, xs // 4] = slot0 + np.arange(nleaf, dtype=np.int32)
        pre.groups.append((pli, bs, ys, xs, slot0, nleaf))
        idx_r = ys[:, None, None] + np.arange(n)[None, :, None]
        idx_c = xs[:, None, None] + np.arange(n)[None, None, :]
        dbs = raster_to_coding(
            np.asarray(pc.d, dtype=np.int32)[idx_r, idx_c]
        ).astype(np.int32)
        predts = pc.mcpred[bs][1][ys // n, xs // n]
        pre.dc0[slot0:slot0 + nleaf] = dbs[:, 0]
        pre.band_start[slot0:slot0 + nleaf] = \
            band0 + nb * np.arange(nleaf, dtype=np.int32)
        # Flattened AC segment per leaf is contiguous: coding indices
        # [1, 1+clen) in leaf order.
        seg = slice(off0, off0 + nleaf * clen)
        if dres:
            x0s[seg] = (dbs[:, 1:1 + clen]
                        - predts[:, 1:1 + clen]).ravel()
            pre.r0s[seg] = 0
        else:
            x0s[seg] = dbs[:, 1:1 + clen].ravel()
            pre.r0s[seg] = predts[:, 1:1 + clen].ravel()
        pre.qms[seg] = np.tile(state.qm[bs][1:1 + clen], nleaf)
        pre.qm_invs[seg] = np.tile(state.qm_inv[bs][1:1 + clen], nleaf)
        beta = pvq_betas(use_masking, pli, bs)
        qrow = np.empty(nb, dtype=np.int32)
        for b in range(nb):
            qrow[b] = max(1, pc.quantizer * int(
                state.pvq_qm_q4[pli][qm_get_index(bs, b + 1)]) >> 4)
        bb = slice(band0, band0 + nleaf * nb)
        pre.q0s[bb] = np.tile(qrow, nleaf)
        pre.betas[bb] = np.tile(np.asarray(beta, dtype=np.float64), nleaf)
        pre.plis[bb] = pli
        lens = np.diff(np.asarray(offs[:nb + 1], dtype=np.int32))
        pre.offsets[band0 + 1:band0 + nleaf * nb + 1] = \
            off0 + np.cumsum(np.tile(lens, nleaf), dtype=np.int64)
    # Batched band search (one native call).
    pre.y = np.zeros(total, dtype=np.int32)
    pre.qg = np.zeros(nbands, dtype=np.int32)
    pre.itheta = np.zeros(nbands, dtype=np.int32)
    pre.max_theta = np.zeros(nbands, dtype=np.int32)
    pre.k = np.zeros(nbands, dtype=np.int32)
    pre.noref = np.zeros(nbands, dtype=np.int32)
    pre.skip_diff = np.zeros(nbands, dtype=np.float64)
    extras = np.zeros(nbands * 6, dtype=np.float64)
    if nbands:
        lib.dtpu_pvq_theta_batch(
            nbands, _vp(pre.offsets), _vp(x0s), _vp(pre.r0s),
            _vp(pre.qms), _vp(pre.q0s), _vp(pre.betas), 1, 0,
            _vp(pre.plis), PVQ_LAMBDA, _vp(pre.y), _vp(pre.qg),
            _vp(pre.itheta), _vp(pre.max_theta), _vp(pre.k),
            _vp(pre.noref), _vp(pre.skip_diff), _vp(extras))
    del ct
    if dres and nbands:
        _recheck_k_int(pre, x0s)
    pre.outs = synth_batch(
        pre.offsets, pre.r0s, pre.qms, pre.qm_invs, pre.y, pre.qg,
        pre.itheta, pre.noref, pre.q0s, pre.betas, 0, pre.plis,
        isynth=dres)
    return pre


def _recheck_k_int(pre, x0s):
    """dres: the decoder derives k with the INTEGER rule
    (isynth.icompute_k); redo the pulse search for the (rare) bands
    where the float search used a different k."""
    from .coding import pvq_search
    from .core import QM_SCALE_1
    from .isynth import icompute_k

    ns = np.diff(pre.offsets)
    v = np.where(pre.noref != 0, pre.qg, pre.itheta)
    k_int = np.zeros_like(pre.k)
    for n in np.unique(ns):
        m_nr = (ns == n) & (pre.noref != 0)
        m_rf = (ns == n) & (pre.noref == 0)
        if m_nr.any():
            k_int[m_nr] = icompute_k(int(n), True, v[m_nr])
        if m_rf.any():
            k_int[m_rf] = icompute_k(int(n), False, v[m_rf])
    bad = np.nonzero(k_int != pre.k)[0]
    for b in bad:
        lo, hi = int(pre.offsets[b]), int(pre.offsets[b + 1])
        n = hi - lo
        kk = int(k_int[b])
        if kk <= 0 or not pre.noref[b]:
            pre.y[lo:hi] = 0
            pre.k[b] = kk
            continue
        qmf = pre.qms[lo:hi].astype(np.float64) * QM_SCALE_1
        xs = x0s[lo:hi].astype(np.float64) * qmf
        yv, _ = pvq_search(xs, kk, max(float(pre.qg[b]), 1e-3))
        pre.y[lo:hi] = yv
        pre.k[b] = kk


def _fill_ctx(ctx, state, pcs, rows, nhsb, use_masking, keep):
    """Common context fields from one tile's AdaptState + plane ctxs."""
    a = state.pvq
    ctx.skip_cdf = _vp(state.skip_cdf)
    ctx.gaintheta_cdf = _vp(a.gaintheta_cdf)
    ctx.skip_dir_cdf = _vp(a.skip_dir_cdf)
    ctx.k1_cdf = _vp(a.k1_cdf)
    ctx.pvq_adapt = _vp(a.pvq_adapt)
    ctx.exg = _vp(a.exg)
    ctx.ext = _vp(a.ext)
    ctx.pm_cdf0 = _vp(a.param_model[0].cdf)
    ctx.pm_cdf1 = _vp(a.param_model[1].cdf)
    ctx.pm_cdf2 = _vp(a.param_model[2].cdf)
    for pli in range(len(pcs)):
        ctx.dc_cdf[pli] = _vp(state.model_dc[pli].cdf)
    # ex_dc must be (4, 4, 3)-strided per plane; AdaptState allocates
    # (nplanes, 4, 3) — padding not needed since indexing is per plane
    # via (pli*4+bs)*3 with nplanes rows present.
    ctx.ex_dc = _vp(state.ex_dc)
    ctx.skip_inc = int(state.skip_increment)
    ctx.gt_inc = int(a.gaintheta_increment)
    ctx.sd_inc = int(a.skip_dir_increment)
    ctx.k1_inc = int(a.k1_increment)
    ctx.pm_inc = int(a.param_model[0].increment)
    ctx.dc_inc = int(state.model_dc[0].increment)
    grid = pcs[0].grid
    ctx.grid = _vp(grid)
    ctx.h4, ctx.w4 = grid.shape
    ctx.nplanes = len(pcs)
    ctx.nhsb = nhsb
    ctx.row0, ctx.row1 = rows
    for pli, pc in enumerate(pcs):
        ctx.xdec[pli] = pc.xdec
        ctx.pvq_qm[pli] = _vp(state.pvq_qm_q4[pli])
        for bs, (pred, predt) in pc.mcpred.items():
            if not predt.flags["C_CONTIGUOUS"] or predt.dtype != np.int32:
                predt = np.ascontiguousarray(predt, dtype=np.int32)
                pc.mcpred[bs] = (pred, predt)
            ctx.predt[pli][bs] = _vp(predt)
            ctx.predt_w[pli][bs] = predt.shape[1]
    for bs in range(4):
        ctx.qm[bs] = _vp(state.qm[bs])
        ctx.qm_inv[bs] = _vp(state.qm_inv[bs])
    ctx.q0 = max(1, pcs[0].quantizer)
    ctx.use_masking = int(bool(use_masking))
    ctx.lam = PVQ_LAMBDA
    keep.extend([state, pcs, grid])


def walk_enc(ec, state, pcs, pre: Pre, rows, nhsb, use_masking,
             out_dc, out_acskip, out_bskip, dres=False, plain_dc=False):
    """One tile's encoder symbol pass (native).

    plain_dc: pre.dc0 holds already-quantized DC residual indices (the
    device-emitted symbol mode); the walk codes them verbatim."""
    lib = _load()
    keep = []
    ctx = _WalkCtx()
    ctx.dres = int(bool(dres))
    ctx.plain_dc = int(bool(plain_dc))
    _fill_ctx(ctx, state, pcs, rows, nhsb, use_masking, keep)
    for pli in range(len(pcs)):
        ctx.leaf_slot[pli] = _vp(pre.leaf_slot[pli])
    ctx.e_band_start = _vp(pre.band_start)
    ctx.e_dc0 = _vp(pre.dc0)
    ctx.b_qg = _vp(pre.qg)
    ctx.b_itheta = _vp(pre.itheta)
    ctx.b_max_theta = _vp(pre.max_theta)
    ctx.b_k = _vp(pre.k)
    ctx.b_noref = _vp(pre.noref)
    ctx.b_skip_diff = _vp(pre.skip_diff)
    ctx.b_y = _vp(pre.y)
    ctx.b_yoff = _vp(pre.offsets)
    ctx.o_dc = _vp(out_dc)
    ctx.o_acskip = _vp(out_acskip)
    ctx.o_bskip = _vp(out_bskip)
    lib.dtpu_inter_walk(ec._h, ctypes.byref(ctx), 1)


def mesh_levels_enc(ec, mvctx, levels, nsbx, rows):
    """Batched per-SB mesh level coding for one tile's rows (native
    twin of pipeline/inter.py _code_levels, encoder side).  Returns
    False when the lib is unavailable (caller falls back)."""
    import os

    lib = _load()
    if not lib or os.environ.get("DTPU_PY_WALK"):
        return False
    if not getattr(lib, "_mesh_levels_ready", False):
        lib.dtpu_mesh_levels_enc.argtypes = [
            c_void_p, c_void_p, c_int32, c_void_p, c_int32, c_int32,
            c_int32]
        lib.dtpu_mesh_levels_enc.restype = None
        lib._mesh_levels_ready = True
    cdf = mvctx.level_cdf
    assert cdf.dtype == np.int32 and cdf.flags["C_CONTIGUOUS"]
    lv = np.ascontiguousarray(levels, dtype=np.int32)
    r0, r1 = rows
    lib.dtpu_mesh_levels_enc(ec._h, _vp(cdf),
                             int(mvctx.level_increment), _vp(lv),
                             int(nsbx), int(r0), int(r1))
    return True


def dering_flags_enc(ec, state, flags, nhsb, rows):
    """Batched per-SB dering flag coding for one tile's rows (native
    twin of the encode_cdf_adapt loop in pack_device_frame).  Returns
    False when the lib is unavailable (caller falls back)."""
    import os

    lib = _load()
    if not lib or os.environ.get("DTPU_PY_WALK"):
        return False
    if not getattr(lib, "_dering_flags_ready", False):
        lib.dtpu_dering_flags_enc.argtypes = [
            c_void_p, c_void_p, c_int32, c_void_p, c_int32, c_int32,
            c_int32]
        lib.dtpu_dering_flags_enc.restype = None
        lib._dering_flags_ready = True
    cdf = state.clpf_cdf
    assert cdf.dtype == np.int32 and cdf.flags["C_CONTIGUOUS"]
    fl = np.ascontiguousarray(flags, dtype=np.int32)
    r0, r1 = rows
    lib.dtpu_dering_flags_enc(ec._h, _vp(cdf),
                              int(state.clpf_increment), _vp(fl),
                              int(nhsb), int(r0), int(r1))
    return True


def walk_dec(ec, state, pcs, rows, nhsb, use_masking, dres=False):
    """One tile's decoder symbol pass (native).  Returns dict with the
    appended leaf/band arrays, trimmed to the real counts."""
    lib = _load()
    keep = []
    ctx = _WalkCtx()
    ctx.dres = int(bool(dres))
    _fill_ctx(ctx, state, pcs, rows, nhsb, use_masking, keep)
    r0, r1 = rows
    w4 = pcs[0].grid.shape[1]
    cells = 0
    for pc in pcs:
        cells += ((r1 - r0) * 8 >> pc.xdec) * (w4 >> pc.xdec)
    leaf_pli = np.zeros(cells, dtype=np.int32)
    leaf_bs = np.zeros(cells, dtype=np.int32)
    leaf_cy = np.zeros(cells, dtype=np.int32)
    leaf_cx = np.zeros(cells, dtype=np.int32)
    leaf_dc = np.zeros(cells, dtype=np.int32)
    leaf_acskip = np.zeros(cells, dtype=np.uint8)
    leaf_bskip = np.zeros(cells, dtype=np.uint8)
    b_qg = np.zeros(cells, dtype=np.int32)
    b_itheta = np.zeros(cells, dtype=np.int32)
    b_noref = np.zeros(cells, dtype=np.int32)
    b_k = np.zeros(cells, dtype=np.int32)
    b_q = np.zeros(cells, dtype=np.int32)
    d_y = np.zeros(cells * 16, dtype=np.int32)
    ctx.d_leaf_pli = _vp(leaf_pli)
    ctx.d_leaf_bs = _vp(leaf_bs)
    ctx.d_leaf_cy = _vp(leaf_cy)
    ctx.d_leaf_cx = _vp(leaf_cx)
    ctx.d_leaf_dc = _vp(leaf_dc)
    ctx.d_leaf_acskip = _vp(leaf_acskip)
    ctx.d_leaf_bskip = _vp(leaf_bskip)
    ctx.d_b_qg = _vp(b_qg)
    ctx.d_b_itheta = _vp(b_itheta)
    ctx.d_b_noref = _vp(b_noref)
    ctx.d_b_k = _vp(b_k)
    ctx.d_b_q = _vp(b_q)
    ctx.d_y = _vp(d_y)
    err = lib.dtpu_inter_walk(ec._h, ctypes.byref(ctx), 0)
    if hasattr(ec, "error"):
        ec.error = ec.error or int(err)
    nl, nb, yl = int(ctx.n_leaves), int(ctx.n_bands), int(ctx.y_len)
    return {
        "pli": leaf_pli[:nl], "bs": leaf_bs[:nl],
        "cy": leaf_cy[:nl], "cx": leaf_cx[:nl], "dc": leaf_dc[:nl],
        "acskip": leaf_acskip[:nl], "bskip": leaf_bskip[:nl],
        "b_qg": b_qg[:nb], "b_itheta": b_itheta[:nb],
        "b_noref": b_noref[:nb], "b_k": b_k[:nb], "b_q": b_q[:nb],
        "y": d_y[:yl],
    }


def assemble_recon(pcs, pre: Pre, out_dc, out_acskip, out_bskip,
                   dres=False):
    """Encoder-side batched writeback: synthesized bands + walk DC/skip
    decisions -> pc.d and pc.bskip.  In dres mode the synthesized bands
    are residuals: the transformed prediction is added back."""
    from .scan import coding_to_raster

    for (pli, bs, ys, xs, slot0, nleaf) in pre.groups:
        pc = pcs[pli]
        n = 4 << bs
        nb = BAND_OFFSETS[bs][0]
        clen = BAND_OFFSETS[bs][1 + nb] - 1
        ncoded = _NCODED[bs]
        b0 = int(pre.band_start[slot0])
        off0 = int(pre.offsets[b0])
        seg = pre.outs[off0:off0 + nleaf * clen].reshape(nleaf, clen)
        predts = pc.mcpred[bs][1][ys // n, xs // n]
        preds = pc.mcpred[bs][0][ys // n, xs // n]
        acskip = out_acskip[slot0:slot0 + nleaf].astype(bool)
        if dres:
            seg = seg + predts[:, 1:1 + clen]
        outv = np.zeros((nleaf, ncoded), dtype=np.int32)
        outv[:, 1:1 + clen] = np.where(acskip[:, None],
                                       predts[:, 1:1 + clen], seg)
        if ncoded > 1 + clen:  # bs==3: uncoded 32-level diagonal band
            outv[:, 1 + clen:] = predts[:, 1 + clen:]
        outv[:, 0] = out_dc[slot0:slot0 + nleaf]
        blocks = coding_to_raster(outv, n, base=preds.astype(np.int32))
        pc.d[ys[:, None, None] + np.arange(n)[None, :, None],
             xs[:, None, None] + np.arange(n)[None, None, :]] = blocks
        _mark_bskip_batch(pc, ys, xs, n,
                          out_bskip[slot0:slot0 + nleaf])


def _mark_bskip_batch(pc, ys, xs, n, bskip):
    span = n >> 2
    on = np.nonzero(bskip)[0]
    for i in on:
        c0 = int(ys[i]) >> 2
        c1 = int(xs[i]) >> 2
        pc.bskip[c0:c0 + span, c1:c1 + span] = 1


def assemble_dec(pcs, state, results, use_masking, dres=False):
    """Decoder-side batched synthesis + writeback from one or more
    tiles' walk outputs (list of dicts from walk_dec)."""
    pli_a = np.concatenate([r["pli"] for r in results])
    bs_a = np.concatenate([r["bs"] for r in results])
    cy_a = np.concatenate([r["cy"] for r in results])
    cx_a = np.concatenate([r["cx"] for r in results])
    dc_a = np.concatenate([r["dc"] for r in results])
    ac_a = np.concatenate([r["acskip"] for r in results])
    bsk_a = np.concatenate([r["bskip"] for r in results])
    b_qg = np.concatenate([r["b_qg"] for r in results])
    b_it = np.concatenate([r["b_itheta"] for r in results])
    b_nr = np.concatenate([r["b_noref"] for r in results])
    b_q = np.concatenate([r["b_q"] for r in results])
    ys_flat = np.concatenate([r["y"] for r in results])
    from ..pipeline.intra import pvq_betas
    from .scan import coding_to_raster

    # Rebuild flattened band layout from the leaf sequence (coded
    # leaves only; acskip leaves contribute no bands).
    nbands = len(b_qg)
    offsets = np.zeros(nbands + 1, dtype=np.int32)
    r0s = np.empty(len(ys_flat), dtype=np.int32)
    qms = np.empty(len(ys_flat), dtype=np.int32)
    qm_invs = np.empty(len(ys_flat), dtype=np.int32)
    betas = np.empty(nbands, dtype=np.float64)
    plis = np.empty(nbands, dtype=np.int32)
    bi = 0
    pos = 0
    leaf_band0 = np.zeros(len(pli_a), dtype=np.int64)
    for li in range(len(pli_a)):
        leaf_band0[li] = bi
        if ac_a[li]:
            continue
        pli = int(pli_a[li])
        bs = int(bs_a[li])
        pc = pcs[pli]
        n = 4 << bs
        nb = BAND_OFFSETS[bs][0]
        offs = BAND_OFFSETS[bs][1:]
        by = int(cy_a[li]) >> bs
        bx = int(cx_a[li]) >> bs
        predt = pcs[pli].mcpred[bs][1][by, bx]
        beta = pvq_betas(use_masking, pli, bs)
        for b in range(nb):
            lo, hi = offs[b], offs[b + 1]
            bn = hi - lo
            r0s[pos:pos + bn] = 0 if dres else predt[lo:hi]
            qms[pos:pos + bn] = state.qm[bs][lo:hi]
            qm_invs[pos:pos + bn] = state.qm_inv[bs][lo:hi]
            betas[bi] = beta[b]
            plis[bi] = pli
            pos += bn
            bi += 1
            offsets[bi] = pos
        del pc, n
    outs = synth_batch(offsets, r0s, qms, qm_invs, ys_flat, b_qg, b_it,
                       b_nr, b_q, betas, 0, plis, isynth=dres)
    # Scatter per (pli, bs) group.
    for pli in range(len(pcs)):
        pc = pcs[pli]
        for bs in range(4):
            sel = np.nonzero((pli_a == pli) & (bs_a == bs))[0]
            if len(sel) == 0:
                continue
            n = 4 << bs
            nb = BAND_OFFSETS[bs][0]
            clen = BAND_OFFSETS[bs][1 + nb] - 1
            ncoded = _NCODED[bs]
            ys = cy_a[sel].astype(np.int64) * 4
            xs = cx_a[sel].astype(np.int64) * 4
            predts = pc.mcpred[bs][1][ys // n, xs // n]
            preds = pc.mcpred[bs][0][ys // n, xs // n]
            outv = np.zeros((len(sel), ncoded), dtype=np.int32)
            outv[:, 1:] = predts[:, 1:]
            coded = ~ac_a[sel].astype(bool)
            ci = sel[coded]
            if len(ci):
                segs = np.empty((len(ci), clen), dtype=np.int32)
                for j, li in enumerate(ci):
                    b0 = int(leaf_band0[li])
                    o0 = int(offsets[b0])
                    segs[j] = outs[o0:o0 + clen]
                if dres:
                    segs = segs + predts[coded, 1:1 + clen]
                outv[coded, 1:1 + clen] = segs
            outv[:, 0] = dc_a[sel]
            blocks = coding_to_raster(outv, n,
                                      base=preds.astype(np.int32))
            pc.d[ys[:, None, None] + np.arange(n)[None, :, None],
                 xs[:, None, None] + np.arange(n)[None, None, :]] = blocks
            _mark_bskip_batch(pc, ys, xs, n, bsk_a[sel])


class KeyPlanes:
    """Shared int32 plane buffers for the keyframe walk — one set per
    frame, reused across (serial) tile calls, merged back after."""

    def __init__(self, pcs):
        self.d32 = [np.ascontiguousarray(pc.d, dtype=np.int32)
                    for pc in pcs]

    def writeback(self, pcs):
        for pc, d in zip(pcs, self.d32):
            pc.d[...] = d


def walk_key(ec, state, pcs, kp: KeyPlanes, rows, nhsb, use_masking):
    """One tile's keyframe symbol pass (native).  Mutates kp.d32 (the
    reconstruction), pc.sb_dc_mem, pc.grid and the adaptation state in
    place; encoder/decoder selected by the coder type."""
    from ..core.quant import DC_QM
    from ..pipeline.intra import _CFL_SCALING4
    from .scan import _FLAT

    lib = _load()
    ctx = _KeyCtx()
    a = state.pvq
    ctx.skip_cdf = _vp(state.skip_cdf)
    ctx.gaintheta_cdf = _vp(a.gaintheta_cdf)
    ctx.skip_dir_cdf = _vp(a.skip_dir_cdf)
    ctx.k1_cdf = _vp(a.k1_cdf)
    ctx.pvq_adapt = _vp(a.pvq_adapt)
    ctx.exg = _vp(a.exg)
    ctx.ext = _vp(a.ext)
    ctx.pm_cdf0 = _vp(a.param_model[0].cdf)
    ctx.pm_cdf1 = _vp(a.param_model[1].cdf)
    ctx.pm_cdf2 = _vp(a.param_model[2].cdf)
    for pli in range(len(pcs)):
        ctx.dc_cdf[pli] = _vp(state.model_dc[pli].cdf)
    ctx.ex_dc = _vp(state.ex_dc)
    ctx.ex_sb_dc = _vp(state.ex_sb_dc)
    ctx.skip_inc = int(state.skip_increment)
    ctx.gt_inc = int(a.gaintheta_increment)
    ctx.sd_inc = int(a.skip_dir_increment)
    ctx.k1_inc = int(a.k1_increment)
    ctx.pm_inc = int(a.param_model[0].increment)
    ctx.dc_inc = int(state.model_dc[0].increment)
    grid = pcs[0].grid
    ctx.grid = _vp(grid)
    ctx.h4, ctx.w4 = grid.shape
    ctx.nplanes = len(pcs)
    ctx.nhsb = nhsb
    ctx.row0, ctx.row1 = rows
    keep = []
    for pli, pc in enumerate(pcs):
        ctx.xdec[pli] = pc.xdec
        ctx.pvq_qm[pli] = _vp(state.pvq_qm_q4[pli])
        ctx.d[pli] = _vp(kp.d32[pli])
        ctx.pw[pli] = pc.w
        ctx.ph[pli] = pc.h
        ctx.sb_dc_mem[pli] = _vp(pc.sb_dc_mem)
    scans = []
    for bs in range(4):
        ctx.qm[bs] = _vp(state.qm[bs])
        ctx.qm_inv[bs] = _vp(state.qm_inv[bs])
        sc = np.ascontiguousarray(_FLAT[4 << bs], dtype=np.int32)
        scans.append(sc)
        ctx.scan[bs] = _vp(sc)
    dcqm = np.ascontiguousarray(DC_QM, dtype=np.int32)
    cfl = np.ascontiguousarray(_CFL_SCALING4, dtype=np.int32)
    ctx.dc_qm = _vp(dcqm)
    ctx.cfl4 = _vp(cfl)
    ctx.q0 = max(1, pcs[0].quantizer)
    ctx.use_masking = int(bool(use_masking))
    ctx.lam = PVQ_LAMBDA
    keep.extend([scans, dcqm, cfl, grid, state, kp])
    encoder = not hasattr(ec, "decode_bits")
    err = lib.dtpu_key_walk(ec._h, ctypes.byref(ctx), 1 if encoder else 0)
    if not encoder and hasattr(ec, "error"):
        ec.error = ec.error or int(err)
