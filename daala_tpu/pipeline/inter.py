"""P-frame (inter) encode/decode: OBMC prediction + PVQ residual coding.

Flow per frame (reference: od_predict_frame encode.c:2205 +
od_encode_coefficients inter paths; decoder decode.c:1159-1295):

  1. motion search on luma against the previous reconstruction
     (search/me.py — batched hierarchical, a TPU-native redesign of
     mcenc.c).
  2. adaptive MV mesh coding (search/mesh.py + _code_mesh below):
     per-SB subdivision levels, median-predicted vertices in three
     stride passes, magnitudes through the generic model + sign bits
     (od_encode_mv encode.c:1678-1725 / od_mv_est mcenc.c semantics,
     restructured onto a dense fine grid).
  3. whole-frame OBMC prediction per plane (ops/mc.py); chroma MVs are
     halved for 4:2:0.
  4. input padding is overwritten with the MC prediction so padding
     costs no bits (encode.c:2443-2458).
  5. both input and prediction go through coeff conversion + lapped
     prefilter + batched DCT; per block the transformed prediction is
     the PVQ reference (od_encode_compute_pred inter path), DC is
     delta-coded through the generic model with dc-skip fusion
     (od_block_encode encode.c:1192-1207).
  6. postfilter + dering (with skip tracking) -> reconstruction becomes
     the next reference.
"""

from __future__ import annotations

import numpy as np

from ..core.quant import N_CODED_QUANTIZERS, QM8_HVS, \
    codedquantizer_to_quantizer, init_qm
from ..core.state import FrameInfo
from ..entropy import (
    GenericModel,
    generic_decode,
    generic_encode,
    make_decoder,
    make_encoder,
)
from ..ops.dct import fdct2d
from ..ops.lapping import lap_frame_h, lap_frame_v
from ..ops.mc import obmc_predict_mixed, pad_ref
from ..pvq.coding import pvq_decode_block, pvq_encode_block
from ..pvq.scan import coding_to_raster, qm_get_index, raster_to_coding
from ..search.me import motion_search_multi
from ..search.mesh import MV_FINE_LOG, choose_levels
from .intra import (
    _PlaneCtx,
    _crop,
    _dering_buffers,
    _dering_pass,
    _to_spatial,
    pad_plane,
    pvq_betas,
    to_coeff,
)

__all__ = ["EncoderSession", "DecoderSession", "MV_FINE_LOG"]

MV_LIMIT = 60 * 8  # max MV magnitude in eighth-pel (search range)


class _MvCtx:
    """MV coding context: generic magnitude models + expectations, plus
    the per-vertex reference-id CDFs (mv_ref_cdf, state.c:602)."""

    def __init__(self):
        from ..entropy import cdf_init

        self.model = GenericModel()
        self.ex = 24 << 16
        self.ey = 24 << 16
        self.ref_cdf = cdf_init(2, 2, 128, 128)
        self.ref_increment = 128
        # Per-SB mesh subdivision level (search/mesh.py; 0..2 = 32/16/8
        # px blocks, 3 = coarse64 lattice); context is the left (or,
        # first in row, the up) neighbor's level.
        self.level_cdf = cdf_init(4, 4, 128, 128)
        self.level_increment = 128


def _code_levels(ec, mvctx, levels, rows, encoder):
    """Per-SB mesh subdivision level symbols for one tile's SB rows
    (context cut at the tile top)."""
    from ..entropy.adapt import decode_cdf_adapt, encode_cdf_adapt

    r0, r1 = rows
    nsbx = levels.shape[1]
    if (encoder and getattr(ec, "acct", None) is None
            and getattr(ec, "_h", None) is not None):
        from ..pvq.native_walk import mesh_levels_enc

        if mesh_levels_enc(ec, mvctx, levels, nsbx, rows):
            return
    for r in range(r0, r1):
        for c in range(nsbx):
            if c > 0:
                ctx = int(levels[r, c - 1])
            elif r > r0:
                ctx = int(levels[r - 1, c])
            else:
                ctx = 0
            cdf = mvctx.level_cdf[ctx]
            a = getattr(ec, "acct", None)
            if a is not None:
                a.set_location("mv:level", 0, 0, c * 32, r * 32)
            if encoder:
                encode_cdf_adapt(ec, int(levels[r, c]), cdf,
                                 mvctx.level_increment)
            else:
                levels[r, c] = decode_cdf_adapt(ec, cdf,
                                                mvctx.level_increment)


def _mesh_pred(wrk, vy, vx, s, v0):
    """Median predictor on the stride-s lattice (left / up / up-right),
    cut at the tile's first owned vertex row v0."""
    cands = []
    if vx >= s:
        cands.append(wrk[vy, vx - s])
    if vy - s >= v0:
        cands.append(wrk[vy - s, vx])
        if vx + s < wrk.shape[1]:
            cands.append(wrk[vy - s, vx + s])
        elif vx >= s:
            cands.append(wrk[vy - s, vx - s])
    if not cands:
        return np.zeros(2, dtype=np.int64)
    return np.median(np.stack(cands), axis=0).astype(np.int64)


def _code_mesh_pass(ec, mvctx, wrk, wrids, truth, truth_rids, req, s,
                    vspan, encoder, nrefs, limit=MV_LIMIT):
    """One stride-s vertex pass of the adaptive mesh for one tile.

    wrk/wrids hold the working mesh (coarser passes coded, current
    lattice pre-filled by fill_stride), so the predictor reads
    finalized values on both sides.  truth/truth_rids are the
    encoder's searched dense grid (None on the decoder)."""
    from ..entropy.adapt import decode_cdf_adapt, encode_cdf_adapt

    if (getattr(ec, "acct", None) is None
            and getattr(ec, "_h", None) is not None):
        from ..pvq.native_walk import mesh_pass_native

        if mesh_pass_native(ec, mvctx, wrk, truth, req, s, vspan,
                            encoder, limit, nrefs, wrids, truth_rids):
            return

    v0, v1 = vspan
    nvx = wrk.shape[1]
    S = 2 * s
    for vy in range(v0, v1, s):
        for vx in range(0, nvx, s):
            if s != 8:
                # Row lattice is span-relative (mesh.py fill_stride).
                if (vy - v0) % S == 0 and vx % S == 0:
                    continue           # coded in a coarser pass
                if req[vy, vx] > s:
                    continue           # stays interpolated
            if nrefs > 1:
                rp = 0
                nb = []
                if vx >= s:
                    nb.append(int(wrids[vy, vx - s]))
                if vy - s >= v0:
                    nb.append(int(wrids[vy - s, vx]))
                if nb:
                    rp = 1 if sum(nb) * 2 > len(nb) else 0
                if encoder:
                    wrids[vy, vx] = int(truth_rids[vy, vx])
                    encode_cdf_adapt(ec, int(wrids[vy, vx]),
                                     mvctx.ref_cdf[rp],
                                     mvctx.ref_increment)
                else:
                    wrids[vy, vx] = decode_cdf_adapt(
                        ec, mvctx.ref_cdf[rp], mvctx.ref_increment)
            a = getattr(ec, "acct", None)
            if a is not None:
                a.set_location("mv", 0, 4 - s, vx << MV_FINE_LOG,
                               vy << MV_FINE_LOG)
            pred = _mesh_pred(wrk, vy, vx, s, v0)
            if encoder:
                dy = int(truth[vy, vx, 0]) - int(pred[0])
                dx = int(truth[vy, vx, 1]) - int(pred[1])
                mvctx.ex = generic_encode(ec, mvctx.model, abs(dy), -1,
                                          mvctx.ex, 2)
                if dy:
                    ec.encode_bits(int(dy < 0), 1)
                mvctx.ey = generic_encode(ec, mvctx.model, abs(dx), -1,
                                          mvctx.ey, 2)
                if dx:
                    ec.encode_bits(int(dx < 0), 1)
                wrk[vy, vx] = truth[vy, vx]
            else:
                dy, mvctx.ex = generic_decode(ec, mvctx.model, -1,
                                              mvctx.ex, 2)
                if dy and ec.decode_bits(1):
                    dy = -dy
                dx, mvctx.ey = generic_decode(ec, mvctx.model, -1,
                                              mvctx.ey, 2)
                if dx and ec.decode_bits(1):
                    dx = -dx
                wrk[vy, vx, 0] = min(max(int(pred[0]) + dy, -limit),
                                     limit)
                wrk[vy, vx, 1] = min(max(int(pred[1]) + dx, -limit),
                                     limit)


def _choose_mv_res(quantizer):
    """Per-frame MV resolution by rate point (the cheap analogue of the
    reference's RD search over mv_res, mcenc.c:6354): eighth-pel at
    high rates, quarter/half/full-pel as the quantizer coarsens and
    subpel precision stops paying for its bits."""
    if quantizer >= 900:          # ~cq 52+
        return 3
    if quantizer >= 380:          # ~cq 44+
        return 2
    if quantizer >= 160:          # ~cq 31+
        return 1
    return 0


def _code_mesh(ecs, mvctxs, bounds, info, nrefs, encoder,
               truth=None, truth_rids=None, levels=None, quantizer=0,
               mv_res=None):
    """Full adaptive-mesh coding: per-tile level symbols, then the
    three stride passes with the deterministic fill between them.
    The whole mesh is coded at a per-frame MV resolution (2 raw bits
    in tile 0; 0 = 1/8 pel .. 2 = 1/2 pel, OD_SET_MV_RES_MIN
    semantics).  Returns the dense (nvy, nvx, 2) grid + ref ids."""
    from ..search.mesh import (
        fill_stride,
        required_stride,
        vertex_spans,
    )

    nvy = (info.frame_height >> MV_FINE_LOG) + 1
    nvx = (info.frame_width >> MV_FINE_LOG) + 1
    nsby = info.frame_height >> 5
    if encoder:
        res = _choose_mv_res(quantizer) if mv_res is None else mv_res
        ecs[0].encode_bits(res, 2)
        truth = np.asarray(truth) >> res
    else:
        res = ecs[0].decode_bits(2)
    if levels is None:
        levels = np.zeros((nsby, info.frame_width >> 5), dtype=np.int32)
    for ti, rows in enumerate(bounds):
        _code_levels(ecs[ti], mvctxs[ti], levels, rows, encoder)
    req = required_stride(levels, nvy, nvx, bounds)
    spans = vertex_spans(bounds, nsby)
    wrk = np.zeros((nvy, nvx, 2), dtype=np.int64)
    wrids = np.zeros((nvy, nvx), dtype=np.int32)
    limit = MV_LIMIT >> res
    for s in (8, 4, 2, 1):
        if s != 8:
            fill_stride(wrk, wrids, s, spans)
        for ti in range(len(bounds)):
            _code_mesh_pass(ecs[ti], mvctxs[ti], wrk, wrids, truth,
                            truth_rids, req, s, spans[ti], encoder,
                            nrefs, limit)
    return wrk << res, wrids, levels


def _code_inter_block(ec, state, pc, md, bx, by, bsi, bs, use_masking,
                      encoder, skip_in=0, dres=False):
    """Inter leaf: prediction = transformed MC block; PVQ + DC delta.
    bx/by are node coords at level bsi.

    dres: device-residual mode — AC bands code the coefficient residual
    (dblock - predt) noref with the INTEGER synthesis spec, and the
    prediction is added back after synthesis, so the reconstruction is
    reproducible bit-exactly on the TPU (the device encode pipeline
    carries it as the reference)."""
    pli = pc.pli
    n = 4 << bs
    y0 = by << (2 + bsi - pc.xdec)
    x0 = bx << (2 + bsi - pc.xdec)
    d = pc.d
    # MC prediction transform from the precomputed cascade tables
    # (_mc_pred_tables) — identical on both sides.
    pred = pc.mcpred[bs][0][y0 // n, x0 // n]
    predt = pc.mcpred[bs][1][y0 // n, x0 // n]
    pre = getattr(pc, "pre", None)
    pre_entry = pre.get((int(y0), int(x0))) if pre is not None else None
    q0 = max(1, pc.quantizer)
    qm = state.qm[bs]
    qm_inv = state.qm_inv[bs]
    beta = pvq_betas(use_masking, pli, bs)
    dc_quant = max(1, q0 * int(state.pvq_qm_q4[pli][qm_get_index(bs, 0)])
                   >> 4)
    if encoder:
        dblock = raster_to_coding(
            np.asarray(d[y0:y0 + n, x0:x0 + n])).astype(np.int32)
        if dres:
            dblock = dblock - predt
            band_ref = np.zeros_like(predt)
        else:
            band_ref = predt
        out, skip = pvq_encode_block(
            ec, state, band_ref, dblock, q0, pli, bs, beta, True, False,
            qm, qm_inv, precomputed=pre_entry, dres=dres)
        # DC magnitude with dc-skip fusion (encode.c:1192-1207).
        if out[0]:
            new_ex = generic_encode(ec, state.model_dc[pli],
                                    abs(int(out[0])) - 1, -1,
                                    int(state.ex_dc[pli, bs, 0]), 2)
            state.ex_dc[pli, bs, 0] = new_ex
            ec.encode_bits(int(out[0] < 0), 1)
            skip = 0
        if dres:
            out[1:] += predt[1:len(out)]
        out[0] = int(out[0]) * dc_quant + int(predt[0])
    else:
        nsym = 4 + (1 if (pli == 0 and bs > 0) else 0)
        del nsym  # skip decoded by caller
        band_ref = np.zeros_like(predt) if dres else predt
        out = pvq_decode_block(ec, state, band_ref, q0, pli, bs, beta,
                               True, False, skip_in, qm, qm_inv,
                               dres=dres)
        if dres:
            out[1:] += predt[1:len(out)]
        dcflag = int(out[0])
        skip = (skip_in >> 1) and not dcflag
        if dcflag:
            a = getattr(ec, "acct", None)
            if a is not None:
                a._label = "dc"
            v, new_ex = generic_decode(ec, state.model_dc[pli], -1,
                                       int(state.ex_dc[pli, bs, 0]), 2)
            state.ex_dc[pli, bs, 0] = new_ex
            dc = 1 + v
            if ec.decode_bits(1):
                dc = -dc
        else:
            dc = 0
        out[0] = dc * dc_quant + int(predt[0])
        skip = 1 if (skip_in >= 2 and dcflag == 0) else 0
    block = coding_to_raster(out, n, base=pred.astype(np.int32))
    block[0, 0] = out[0]
    d[y0:y0 + n, x0:x0 + n] = block
    return skip


def _inter_recursive(ec, state, pc, md, bx, by, bsi, use_masking,
                     encoder, dres=False):
    """Inter Z-order walk: split signaling through the luma skip symbol
    (no Haar DC on inter frames)."""
    from ..entropy.adapt import decode_cdf_adapt, encode_cdf_adapt

    xdec = pc.xdec
    g = pc.grid
    cell = (by << bsi, bx << bsi)
    if pc.pli == 0:
        if encoder:
            is_leaf = int(g[cell]) == bsi
        else:
            nsym = 4 + (1 if bsi > 0 else 0)
            a = getattr(ec, "acct", None)
            if a is not None:
                a.set_location("skip", 0, bsi, cell[1] * 4, cell[0] * 4)
            sk = decode_cdf_adapt(ec, state.skip_cdf[2 * bsi][:nsym],
                                  state.skip_increment)
            is_leaf = sk < 4
            if is_leaf:
                g[cell[0]:cell[0] + (1 << bsi),
                  cell[1]:cell[1] + (1 << bsi)] = bsi
        if is_leaf:
            if encoder:
                skip = _code_inter_block(ec, state, pc, md, bx, by, bsi,
                                         bsi, use_masking, True,
                                         dres=dres)
            else:
                skip = _code_inter_block(ec, state, pc, md, bx, by, bsi,
                                         bsi, use_masking, False, sk,
                                         dres=dres)
            _mark_bskip(pc, bx, by, bsi, skip)
            return
        if encoder:
            encode_cdf_adapt(ec, 4, state.skip_cdf[2 * bsi][:5],
                             state.skip_increment)
    else:
        obs = int(g[cell])
        if max(obs, xdec) == bsi:
            bs = bsi - xdec
            if encoder:
                skip = _code_inter_block(ec, state, pc, md, bx, by, bsi,
                                         bs, use_masking, True,
                                         dres=dres)
            else:
                sk = decode_cdf_adapt(ec, state.skip_cdf[2 * bs + 1][:4],
                                      state.skip_increment)
                skip = _code_inter_block(ec, state, pc, md, bx, by, bsi,
                                         bs, use_masking, False, sk,
                                         dres=dres)
            _mark_bskip(pc, bx, by, bsi, skip)
            return
    for dy in (0, 1):
        for dx in (0, 1):
            _inter_recursive(ec, state, pc, md, 2 * bx + dx, 2 * by + dy,
                             bsi - 1, use_masking, encoder, dres)


def _mc_pred_tables(pc, md, pg=None):
    """Batch-transform the MC prediction for EVERY aligned block of
    every size, with split lapping pre-applied as a cascade.

    A leaf at node level bsi sees md with the middle-cross laps of all
    its ancestors applied (od_prefilter_split on ctx->mc,
    decode.c:849-851).  Because a node's cross only modifies (and only
    reads) a 4 px strip strictly inside that node, crossing EVERY node
    of a level at once — full-width/-height strips — is pixel-exact for
    any leaf that actually exists, regardless of the split structure.
    So both sides can precompute: record the per-size transform tables
    top-down, applying each level's crosses before descending.

    When the encoder's block-size grid is known, pass pg to transform
    only the actual leaf positions (the decoder discovers the grid
    during its pass, so it precomputes every position).

    Fills pc.mcpred[bs] = (pred (nby, nbx, n, n),
                           predt (nby, nbx, ncoded))."""
    from ..pvq.scan import _FLAT
    from .grid import block_positions

    h, w = md.shape
    C = np.asarray(md, dtype=np.int32).copy()
    pc.mcpred = {}
    for bsi in range(3, pc.xdec - 1, -1):
        bs = bsi - pc.xdec
        n = 4 << bs
        ncoded = len(_FLAT[n])
        if pg is not None:
            ys, xs = block_positions(pg, bs)
            if len(ys):
                idx_r = ys[:, None, None] + np.arange(n)[None, :, None]
                idx_c = xs[:, None, None] + np.arange(n)[None, None, :]
                pred = fdct2d(C[idx_r, idx_c], n)
                predt = raster_to_coding(pred).astype(np.int32)
                pt = (np.zeros((h // n, w // n, n, n), dtype=np.int32),
                      np.zeros((h // n, w // n, ncoded), dtype=np.int32))
                pt[0][ys // n, xs // n] = pred
                pt[1][ys // n, xs // n] = predt
                pc.mcpred[bs] = pt
        else:
            blocks = (C.reshape(h // n, n, w // n, n)
                      .transpose(0, 2, 1, 3).reshape(-1, n, n))
            pred = fdct2d(blocks, n)
            predt = raster_to_coding(pred).astype(np.int32)
            pc.mcpred[bs] = (
                pred.reshape(h // n, w // n, n, n),
                predt.reshape(h // n, w // n, ncoded),
            )
        if bsi > pc.xdec:
            npx = (4 << bsi) >> pc.xdec
            mid = npx >> 1
            C = lap_frame_h(C, np.arange(mid, h, npx))
            C = lap_frame_v(C, np.arange(mid, w, npx))


def _prepass_inter(pcs, state, use_masking, dres=False):
    """Encoder prepass: batch-search every band of every leaf in one
    native call, using the precomputed MC transform tables.
    Fills pc.pre[(y0, x0)] = band search results."""
    from ..pvq.coding import batch_band_search
    from ..pvq.scan import BAND_OFFSETS
    from .grid import block_positions

    bands = []
    slots = []  # (pc, key, nb_bands, start_index)
    for pc in pcs:
        pc.pre = {}
        pg = pc.pg()
        for bs in range(4):
            ys, xs = block_positions(pg, bs)
            if len(ys) == 0:
                continue
            n = 4 << bs
            idx_r = ys[:, None, None] + np.arange(n)[None, :, None]
            idx_c = xs[:, None, None] + np.arange(n)[None, None, :]
            predts = pc.mcpred[bs][1][ys // n, xs // n]
            dbs = raster_to_coding(
                np.asarray(pc.d, dtype=np.int32)[idx_r, idx_c]
            ).astype(np.int32)
            if dres:
                dbs = dbs - predts
                predts = np.zeros_like(predts)
            offs = BAND_OFFSETS[bs]
            beta = pvq_betas(use_masking, pc.pli, bs)
            for bi in range(len(ys)):
                key = (int(ys[bi]), int(xs[bi]))
                slots.append((pc, key, offs[0], len(bands)))
                for b in range(offs[0]):
                    lo, hi = offs[1 + b], offs[2 + b]
                    q = max(1, pc.quantizer * int(
                        state.pvq_qm_q4[pc.pli][qm_get_index(bs, b + 1)])
                        >> 4)
                    bands.append({
                        "x0": dbs[bi, lo:hi], "r0": predts[bi][lo:hi],
                        "q0": q, "beta": beta[b], "pli": pc.pli,
                        "qm": state.qm[bs][lo:hi],
                        "qm_inv": state.qm_inv[bs][lo:hi],
                    })
    results = batch_band_search(bands, True, False, dres)
    for (pc, key, nb, start) in slots:
        pc.pre[key] = results[start:start + nb]


def _mark_bskip(pc, bx, by, bsi, skip):
    """Track per-4x4 skip cells for the dering pass."""
    c0 = by << bsi >> pc.xdec
    c1 = bx << bsi >> pc.xdec
    span = max(1, 1 << bsi >> pc.xdec)
    pc.bskip[c0:c0 + span, c1:c1 + span] = skip


def _code_inter_frame(ec, state, pcs, mds, info, bs_luma, use_masking,
                      encoder, rows=None, dres=False):
    """Per-tile inter symbol pass over SB rows [rows[0], rows[1]).
    Inter blocks have no cross-SB-row symbol prediction (MC prediction
    only), so tiling needs no further cuts here."""
    nhsb = pcs[0].nhsb
    nvsb = pcs[0].nvsb
    row0, row1 = rows if rows is not None else (0, nvsb)
    for sby in range(row0, row1):
        for sbx in range(nhsb):
            for pli in range(len(pcs)):
                _inter_recursive(ec, state, pcs[pli], mds[pli], sbx, sby,
                                 3, use_masking, encoder, dres)


GOLDEN_INTERVAL = 10  # OD_GOLDEN_FRAME_INTERVAL (encode.c:60)

FT_INTRA = 0
FT_P = 1
FT_B = 2
FT_GOLDEN = 3


def _pad_refs(info, rec):
    return [
        pad_plane(r, info.frame_width >> info.xdec[i],
                  info.frame_height >> info.ydec[i])
        for i, r in enumerate(rec)
    ]


def _frame_quality(cq, ftype, b_frames):
    """Keyframe/golden boost and B-frame offset (encode.c:3059-3080)."""
    if ftype in (FT_INTRA, FT_GOLDEN):
        return max(1, cq - 3)
    if ftype == FT_B:
        return min(N_CODED_QUANTIZERS - 2, cq + (4 if b_frames > 1 else 2))
    return cq


def _code_inter_packet(info, bs_luma, use_masking, use_dering, cq,
                       refs, planes_or_packet, encoder, tiles=1,
                       tile_workers=1, out_info=None, acct=None,
                       dres=False, search=None):
    """Shared P/B frame coder.  refs: list of padded reference plane
    lists (1 = single-ref P, 2 = multi-ref P or B).

    tiles > 1 gives every group of SB rows its own entropy stream (see
    tiles.py): each tile codes its share of MV vertex rows, then its
    superblocks, then its dering flags.  The decoder runs in phases —
    per-tile MV decode, batched whole-frame MC, per-tile coefficient
    decode, whole-frame reconstruction, per-tile dering — so the serial
    symbol work parallelizes while the data passes stay frame-level."""
    from .intra import (
        _merge_c_rows,
        _merge_d_rows,
        _merge_grid_rows,
        _tile_c_rows,
        _tile_d_rows,
        _tile_grid_rows,
        _tile_states,
    )
    from .tiles import pack_tiles, run_tiles, tile_rows, unpack_tiles

    nplanes = info.nplanes
    nrefs = len(refs)
    nvsb = info.frame_height >> 5
    if encoder:
        planes = planes_or_packet
        quantizer = codedquantizer_to_quantizer(cq)
        bounds = tile_rows(nvsb, tiles)
        ecs = [make_encoder() for _ in bounds]
        mvctxs = [_MvCtx() for _ in bounds]
        for pli in range(nplanes):
            ecs[0].encode_uint(cq, N_CODED_QUANTIZERS)
        cur_y = pad_plane(planes[0], info.frame_width, info.frame_height)
        ext = info.bitdepth - 8
        cur_y8 = (cur_y >> ext).astype(np.uint8) if ext else cur_y
        refs8 = [(r[0] >> ext).astype(np.uint8) if ext else r[0]
                 for r in refs]
        sp = search or {}
        sgrid, srids = motion_search_multi(
            cur_y8, refs8, MV_FINE_LOG,
            dense=sp.get("dense_me", True),
            use_satd=sp.get("use_satd", False))
        from ..search.me import refine_mesh_lattice

        refs8p = [pad_ref(r) for r in refs8]
        # Snap to the frame MV resolution BEFORE the blend refinement
        # so the lattice is optimized in the domain it is coded in.
        res0 = max(_choose_mv_res(quantizer), sp.get("mv_res_min", 0))
        if res0:
            sgrid = (np.asarray(sgrid) >> res0) << res0
        if sp.get("refine_iters", 1) > 0:
            sgrid = refine_mesh_lattice(cur_y8, refs8p, 80, sgrid,
                                        srids, quantizer, mv_res=res0,
                                        iters=sp["refine_iters"])
        levels = choose_levels(cur_y8, refs8p, 80, sgrid, srids,
                               quantizer, bounds,
                               level_mask=sp.get("level_mask"))
        grid, rids, levels = _code_mesh(ecs, mvctxs, bounds, info, nrefs,
                                        True, truth=sgrid,
                                        truth_rids=srids, levels=levels,
                                        quantizer=quantizer, mv_res=res0)
    else:
        planes = None
        streams = unpack_tiles(planes_or_packet)
        bounds = tile_rows(nvsb, len(streams))
        streams = streams[:len(bounds)]  # corrupt ntiles: clamp
        if acct is not None:
            from ..entropy.accounting import AccountingDecoder

            tile_workers = 1  # accounting accumulates in-process
            ecs = [AccountingDecoder(s, acct) for s in streams]
        else:
            ecs = [make_decoder(s) for s in streams]
        mvctxs = [_MvCtx() for _ in bounds]
        a0 = getattr(ecs[0], "acct", None)
        if a0 is not None:
            a0.set_location("frame:header")
        cqs = [ecs[0].decode_uint(N_CODED_QUANTIZERS)
               for _ in range(nplanes)]
        quantizer = codedquantizer_to_quantizer(cqs[0])
        grid, rids, levels = _code_mesh(ecs, mvctxs, bounds, info, nrefs,
                                        False)
    states = _tile_states(nplanes, quantizer, use_masking, len(bounds),
                          is_keyframe=False,
                          qm_flat=getattr(info, "qm", 1) == 0)
    state = states[0]
    # OBMC predict per plane (luma first: the splitter needs the
    # residual).
    from ..search.bsize import rdo_split_superblocks, uniform_grid
    from .grid import fdct_plane_grid, prefilter_plane_grid

    from ..search.mesh import blend_levels

    blend_lv = blend_levels(levels)
    mcs = []
    for pli in range(nplanes):
        xd = info.xdec[pli]
        hh = info.frame_height >> info.ydec[pli]
        ww = info.frame_width >> xd
        refps = [pad_ref(r[pli]) for r in refs]
        g = grid if xd == 0 else (grid >> 1)
        mcs.append(obmc_predict_mixed(refps, 80, hh, ww, g, blend_lv,
                                      MV_FINE_LOG - xd, ref_ids=rids,
                                      bitdepth=info.bitdepth))
    if encoder:
        cur_y = pad_plane(planes[0], info.frame_width,
                          info.frame_height)
        if bs_luma < 0:
            sp = search or {}
            if sp.get("rdo_bsize", True):
                bgrid = rdo_split_superblocks(
                    to_coeff(cur_y, False, info.bitdepth), quantizer,
                    state.qm, state.qm_inv,
                    pred=to_coeff(mcs[0], False, info.bitdepth))
            else:
                # Open-loop psycho-visual splitter on the prediction
                # residual (block_size_enc.c complexity<2 gate).
                from ..search.bsize import split_superblocks

                ext = info.bitdepth - 8
                res = (cur_y.astype(np.int32)
                       - mcs[0].astype(np.int32)) >> ext
                bgrid = split_superblocks(cur_y, quantizer,
                                          residual=res)
        else:
            bgrid = uniform_grid(info.frame_height, info.frame_width,
                                 bs_luma)
    else:
        bgrid = np.full((info.frame_height // 4, info.frame_width // 4),
                        -1, dtype=np.int8)
    from ..ops.lapping import lap_frame_h, lap_frame_v

    pcs = []
    mds = []
    for pli in range(nplanes):
        pc = _PlaneCtx(info, pli, max(bs_luma, 0), quantizer, False)
        pc.grid = bgrid
        pc.bskip = np.zeros((pc.h >> 2, pc.w >> 2), dtype=np.uint8)
        mc = mcs[pli]
        if planes is not None:
            pg = pc.pg()
            cur = pad_plane(planes[pli], pc.w, pc.h).copy()
            ph, pw = planes[pli].shape
            cur[ph:, :] = mc[ph:, :]
            cur[:ph, pw:] = mc[:ph, pw:]
            c = prefilter_plane_grid(to_coeff(cur, False, info.bitdepth),
                                     pg)
            pc.d = fdct_plane_grid(c, pg)
        else:
            pc.d = np.zeros((pc.h, pc.w), dtype=np.int64)
        pcs.append(pc)
        # MC prediction in the coeff domain with superblock-edge lapping
        # applied up front; interior split edges are lapped during the
        # traversal (_split_lap_mc) as the grid is discovered.
        sbn = 32 >> info.xdec[pli]
        mcc = to_coeff(mc, False, info.bitdepth)
        mcc = lap_frame_h(mcc, np.arange(sbn, pc.h, sbn))
        mcc = lap_frame_v(mcc, np.arange(sbn, pc.w, sbn))
        mds.append(mcc)
    for pli in range(nplanes):
        _mc_pred_tables(pcs[pli], mds[pli],
                        pg=pcs[pli].pg() if encoder else None)
    # Native symbol pass: one C++ call per tile (pvq/native_walk.py),
    # with the search and the reconstruction fully batched around it.
    # The Python per-block path below remains the fallback (no native
    # lib, pure-Python EC, or the accounting decoder) and the oracle.
    import os as _os

    from ..pvq import native_walk as _nw

    use_native = (_nw.available()
                  and not _os.environ.get("DTPU_PY_WALK")
                  and acct is None
                  and all(getattr(e, "_h", None) is not None for e in ecs))
    if use_native and encoder:
        pre = _nw.prepass_search(pcs, state, use_masking, dres)
        out_dc = np.zeros(pre.nslots, dtype=np.int32)
        out_acskip = np.zeros(pre.nslots, dtype=np.uint8)
        out_bskip = np.zeros(pre.nslots, dtype=np.uint8)
        for ti, rows in enumerate(bounds):
            _nw.walk_enc(ecs[ti], states[ti], pcs, pre, rows,
                         pcs[0].nhsb, use_masking, out_dc, out_acskip,
                         out_bskip, dres)
        _nw.assemble_recon(pcs, pre, out_dc, out_acskip, out_bskip,
                           dres)
    elif use_native:
        results = [_nw.walk_dec(ecs[ti], states[ti], pcs, rows,
                                pcs[0].nhsb, use_masking, dres)
                   for ti, rows in enumerate(bounds)]
        _nw.assemble_dec(pcs, state, results, use_masking, dres)
    else:
        if encoder:
            _prepass_inter(pcs, state, use_masking, dres)

        def _sb_job(ti):
            rows = bounds[ti]
            _code_inter_frame(ecs[ti], states[ti], pcs, mds, info,
                              bs_luma, use_masking, encoder, rows,
                              dres)
            gr = None if encoder else _tile_grid_rows(bgrid, rows)
            return ecs[ti], states[ti], _tile_d_rows(pcs, rows), gr

        for ti, (ec_t, st_t, dr, gr) in enumerate(
                run_tiles(_sb_job, len(bounds), tile_workers)):
            ecs[ti], states[ti] = ec_t, st_t
            _merge_d_rows(pcs, bounds[ti], dr)
            if gr is not None:
                _merge_grid_rows(bgrid, bounds[ti], gr)
    _to_spatial(pcs)
    dflags = np.zeros((pcs[0].nvsb, pcs[0].nhsb), dtype=np.int32)
    if use_dering:
        etmp = [pc.c.copy() for pc in pcs]
        bufs = _dering_buffers(pcs, etmp, max(1, pcs[0].quantizer))
        orig = None
        if encoder:
            orig = [to_coeff(pad_plane(planes[pli], pcs[pli].w,
                                       pcs[pli].h), False, info.bitdepth)
                    for pli in range(nplanes)]

        def _dr_job(ti):
            rows = bounds[ti]
            fl = _dering_pass(ecs[ti], states[ti], pcs, orig, encoder,
                              rows, etmp, bufs)
            return ecs[ti], _tile_c_rows(pcs, rows), fl

        for ti, (ec_t, cr, fl) in enumerate(
                run_tiles(_dr_job, len(bounds), tile_workers)):
            ecs[ti] = ec_t
            _merge_c_rows(pcs, bounds[ti], cr)
            r0, r1 = bounds[ti]
            dflags[r0:r1] = fl[r0:r1]
    rec = _crop(pcs, info)
    if out_info is not None:
        out_info.update(bsize=bgrid.copy(), mv=np.asarray(grid),
                        mv_levels=np.asarray(levels),
                        ref_ids=np.asarray(rids), dering=dflags,
                        quantizer=quantizer)
    if encoder:
        return pack_tiles([e.done() for e in ecs]), rec
    return rec


class EncoderSession:
    """Multi-frame encoder with reference management, golden-frame
    cadence and B-frame reordering (daala_enc_ctx equivalent:
    encode.c:2808-2995, 3146-3175)."""

    def __init__(self, info: FrameInfo, quality: int = None,
                 use_masking: bool = False, bs_luma: int = 1,
                 use_dering: bool = True, keyframe_rate: int = None,
                 b_frames: int = 0, tiles: int = 1,
                 tile_workers: int = 1, bitrate: int = 0,
                 dres: bool = False, config=None):
        # config: a core.config.EncoderConfig carrying the full ctl
        # surface (complexity ladder, SATD, QM select, MV res/level
        # bounds).  The legacy kwargs remain as a convenience shim;
        # when config is given it wins wholesale.
        if config is not None:
            quality = config.quality
            use_masking = config.use_masking
            bs_luma = config.bs_luma
            use_dering = config.use_dering
            keyframe_rate = keyframe_rate or config.keyframe_rate
            b_frames = config.b_frames
            tiles = config.tiles
            tile_workers = config.tile_workers
            bitrate = config.bitrate
            dres = config.dres
            info.qm = config.qm
        else:
            from ..core.config import EncoderConfig

            config = EncoderConfig(quality=int(quality),
                                   use_masking=use_masking,
                                   qm=getattr(info, "qm", 1))
        self.config = config
        from ..search.mesh import level_mask_from_ctl

        self.search = config.search_params()
        self.search["level_mask"] = level_mask_from_ctl(
            *config.effective_mv_levels())
        self.search["mv_res_min"] = config.mv_res_min
        # dres: code inter frames in device-residual mode (noref
        # integer-synthesis residual bands) — the stream mode the TPU
        # device encode pipeline emits (pipeline/device_inter.py).
        if dres and use_masking:
            raise ValueError("dres mode requires use_masking=False "
                             "(beta = 1 companding only)")
        if tuple(info.xdec) != tuple(info.ydec):
            raise ValueError(
                "only 4:4:4 / 4:2:0 / mono are supported (the codec "
                "requires xdec == ydec, as in the reference)")
        self.info = info
        self.quality = quality
        self.use_masking = use_masking
        self.bs_luma = bs_luma
        self.use_dering = use_dering
        self.keyframe_rate = keyframe_rate or info.keyframe_rate
        self.b_frames = b_frames
        self.tiles = tiles
        self.tile_workers = tile_workers
        self.dres = dres
        self.frame_idx = 0          # display index of next input
        self.since_golden = 0
        self.ref_prev = None
        self.ref_next = None
        self.ref_gold = None
        self.queue = []             # buffered (display_idx, planes)
        self.qm, self.qm_inv = init_qm(QM8_HVS)
        # -- rate control (bits/s target; 0 = constant quality) ----------
        # The reference's encoder_example exposes -V but encode.c never
        # implemented it; this is a leaky-bucket controller: each coded
        # frame pays into a rolling budget and the coded quantizer
        # index steps against the fullness error (cq is signaled per
        # frame, so no format change).
        self.bitrate = int(bitrate)
        fps = info.timebase_num / max(1, info.timebase_den)
        self.rc_target = (bitrate / 8.0 / max(1e-9, fps)
                          if bitrate else 0.0)  # bytes per frame
        self.rc_balance = 0.0       # bytes of credit (+) / debt (-)
        self.rc_quality = float(quality)

    def _rc_update(self, packets):
        """Consume coded packets and adapt quality toward the target."""
        if not self.bitrate:
            return
        import math

        for p in packets:
            self.rc_balance += self.rc_target - len(p["data"])
            # Multiplicative correction: one coded-quantizer step is
            # roughly 11% rate, so the log of the overshoot ratio maps
            # directly to steps.  Keyframes spend several frames'
            # budget by design — damp their contribution.
            ratio = len(p["data"]) / max(1.0, self.rc_target)
            if p["ftype"] == FT_INTRA:
                ratio /= 4.0
            step = math.log(max(ratio, 1e-3)) / math.log(1.11)
            self.rc_quality += min(max(0.6 * step, -3.0), 3.0)
        # Clamp the bucket to ~1s of video so a big keyframe does not
        # starve the rest of the GOP forever, then bleed the remaining
        # debt in slowly.
        limit = self.rc_target * 30
        self.rc_balance = min(max(self.rc_balance, -limit), limit)
        self.rc_quality -= 0.2 * self.rc_balance / max(
            1.0, self.rc_target * 8)
        self.rc_quality = min(max(self.rc_quality, 4.0),
                              float(N_CODED_QUANTIZERS - 6))
        self.quality = int(round(self.rc_quality))

    # -- public API ------------------------------------------------------

    def encode_frame(self, planes):
        """Zero-B-frame convenience API: returns
        (packet, is_keyframe, recon)."""
        assert self.b_frames == 0
        out = self.push_frame(planes)
        pkt = out[0]
        return pkt["data"], pkt["ftype"] == FT_INTRA, pkt["recon"]

    def push_frame(self, planes):
        """Feed one frame in display order; returns a list of packet
        dicts (data, ftype, display_order, recon) in coding order —
        possibly empty while B-frames buffer."""
        idx = self.frame_idx
        self.frame_idx += 1
        is_key = (idx % self.keyframe_rate == 0 or self.ref_prev is None
                  or self.quality == 0)
        if is_key or self.b_frames == 0:
            out = []
            if self.queue:
                out += self._flush_queue(next_anchor=None)
            out.append(self._encode_anchor(planes, idx, is_key))
            self._rc_update(out)
            return out
        self.queue.append((idx, planes))
        if len(self.queue) > self.b_frames:
            # Encode the newest frame as the P anchor, then the earlier
            # frames as B between prev and next anchors.
            anchor_idx, anchor_planes = self.queue.pop()
            out = [self._encode_anchor(anchor_planes, anchor_idx, False)]
            out += self._flush_queue(next_anchor=self.ref_next)
            self._rc_update(out)
            return out
        return []

    def flush(self):
        """Flush buffered B-frames at end of stream (coded as P chain)."""
        out = self._flush_queue(next_anchor=None)
        self.queue = []
        return out

    # -- internals -------------------------------------------------------

    def _encode_anchor(self, planes, idx, is_key):
        if self.quality == 0:
            from .wavelet import (
                decode_keyframe_lossless,
                encode_keyframe_lossless,
            )
            pkt = encode_keyframe_lossless(planes, self.info)
            rec = decode_keyframe_lossless(pkt, self.info)
            self._rotate_refs(rec, FT_INTRA)
            return {"data": pkt, "ftype": FT_INTRA, "display_order": idx,
                    "recon": rec, "use_haar": True}
        if is_key:
            from .intra import encode_keyframe
            pkt, rec = encode_keyframe(
                planes, self.info, self.quality,
                use_masking=self.use_masking, bs_luma=self.bs_luma,
                use_dering=self.use_dering, return_recon=True,
                tiles=self.tiles, tile_workers=self.tile_workers,
                rdo_bsize=self.search.get("rdo_bsize", True))
            self._rotate_refs(rec, FT_INTRA)
            return {"data": pkt, "ftype": FT_INTRA, "display_order": idx,
                    "recon": rec, "use_haar": False}
        # P frame (golden cadence).
        self.since_golden += 1
        ftype = FT_GOLDEN if self.since_golden >= GOLDEN_INTERVAL else FT_P
        if ftype == FT_GOLDEN:
            self.since_golden = 0
        refs = [self.ref_prev]
        if self.ref_gold is not None and self.ref_gold is not self.ref_prev:
            refs.append(self.ref_gold)
        cq = _frame_quality(self.quality, ftype, self.b_frames)
        pkt, rec = _code_inter_packet(
            self.info, self.bs_luma, self.use_masking, self.use_dering,
            cq, refs, planes, True, tiles=self.tiles,
            tile_workers=self.tile_workers, dres=self.dres,
            search=self.search)
        self._rotate_refs(rec, ftype)
        from ..core.logging import OD_LOG_INFO, od_log

        od_log("encoder", OD_LOG_INFO,
               "frame %d type %d: %d bytes (cq %d)", idx, ftype,
               len(pkt), cq)
        return {"data": pkt, "ftype": ftype, "display_order": idx,
                "recon": rec, "use_haar": False, "dres": self.dres}

    def _flush_queue(self, next_anchor):
        """Encode buffered frames as B (prev+next refs) or trailing P."""
        out = []
        for (idx, planes) in self.queue:
            if next_anchor is not None:
                refs = [self.ref_prev, next_anchor]
                cq = _frame_quality(self.quality, FT_B, self.b_frames)
                pkt, rec = _code_inter_packet(
                    self.info, self.bs_luma, self.use_masking,
                    self.use_dering, cq, refs, planes, True,
                    tiles=self.tiles, tile_workers=self.tile_workers,
                    dres=self.dres, search=self.search)
                out.append({"data": pkt, "ftype": FT_B,
                            "display_order": idx, "recon": rec,
                            "use_haar": False, "dres": self.dres})
            else:
                out.append(self._encode_anchor(planes, idx, False))
        self.queue = []
        return out

    def _rotate_refs(self, rec, ftype):
        """Reference rotation (encode.c:3146-3175 semantics for the
        implemented ref set): anchors become PREV (and the previous
        anchor becomes the B-frames' backward ref); keyframes and
        goldens refresh GOLD."""
        padded = _pad_refs(self.info, rec)
        self.ref_next = self.ref_prev  # backward anchor for queued Bs
        if ftype in (FT_INTRA, FT_GOLDEN):
            self.ref_gold = padded
        self.ref_prev = padded


class DecoderSession:
    """Mirror of EncoderSession: decodes coding-order packets, manages
    references, reorders B-frames for display (decode.c:1297-1326)."""

    def __init__(self, info: FrameInfo, bs_luma: int = 1,
                 use_masking: bool = False, use_dering: bool = True,
                 tile_workers: int = 1, introspect: bool = False):
        self.info = info
        self.bs_luma = bs_luma
        self.use_masking = use_masking
        self.use_dering = use_dering
        self.tile_workers = tile_workers
        self.introspect = introspect
        self.last_info = None   # per-frame bsize/mv/dering introspection
        self.ref_prev = None
        self.ref_next = None
        self.ref_gold = None

    def _gray_refs(self):
        """Synthesized gray reference planes (od_dec_init_dummy_frame,
        decode.c:239): used when a stream predicts with no decoded
        reference, or when a packet signals gray_ref (the all-device
        encode's random-access points)."""
        from .intra import pad_plane

        info = self.info
        gray = 128 << (info.bitdepth - 8)
        dtype = np.uint8 if info.bitdepth <= 8 else np.uint16
        return [np.full((info.frame_height >> info.ydec[p],
                         info.frame_width >> info.xdec[p]), gray,
                        dtype=dtype) for p in range(info.nplanes)]

    def decode_frame(self, packet: bytes, keyframe: bool,
                     use_haar: bool = False, ftype: int = None,
                     acct=None, dres: bool = False,
                     gray_ref: bool = False):
        """Single-packet decode (coding order).  ftype defaults to
        I/P by the keyframe flag for b_frames=0 streams."""
        from .intra import decode_keyframe
        from .wavelet import decode_keyframe_lossless

        if ftype is None:
            ftype = FT_INTRA if keyframe else FT_P
        oi = {} if self.introspect else None
        self.last_info = oi
        if use_haar:
            rec = decode_keyframe_lossless(packet, self.info)
            self._rotate(rec, FT_INTRA)
            return rec
        if ftype == FT_INTRA:
            rec = decode_keyframe(packet, self.info,
                                  use_masking=self.use_masking,
                                  bs_luma=self.bs_luma,
                                  use_dering=self.use_dering,
                                  tile_workers=self.tile_workers,
                                  out_info=oi, acct=acct, dres=dres)
            self._rotate(rec, FT_INTRA)
            return rec
        if gray_ref or self.ref_prev is None:
            # Gray random-access point, or a stream that predicts with
            # no decoded reference (resilience).
            refs = [self._gray_refs()]
            rec = _code_inter_packet(
                self.info, self.bs_luma, self.use_masking,
                self.use_dering, 0, refs, packet, False,
                tile_workers=self.tile_workers, out_info=oi, acct=acct,
                dres=dres)
            if ftype != FT_B:
                self._rotate(rec, ftype)
            return rec
        if ftype == FT_B:
            # ref 0 = forward (future) anchor, ref 1 = past anchor —
            # mirrors the encoder's post-anchor reference state.
            refs = [self.ref_prev, self.ref_next]
            rec = _code_inter_packet(
                self.info, self.bs_luma, self.use_masking,
                self.use_dering, 0, refs, packet, False,
                tile_workers=self.tile_workers, out_info=oi, acct=acct,
                dres=dres)
            # B frames are not references; no rotation.
            return rec
        refs = [self.ref_prev]
        if self.ref_gold is not None and self.ref_gold is not self.ref_prev:
            refs.append(self.ref_gold)
        rec = _code_inter_packet(
            self.info, self.bs_luma, self.use_masking, self.use_dering,
            0, refs, packet, False, tile_workers=self.tile_workers,
            out_info=oi, acct=acct, dres=dres)
        self._rotate(rec, ftype)
        return rec

    def _rotate(self, rec, ftype):
        padded = _pad_refs(self.info, rec)
        self.ref_next = self.ref_prev
        if ftype in (FT_INTRA, FT_GOLDEN):
            self.ref_gold = padded
        self.ref_prev = padded
