"""P-frame (inter) encode/decode: OBMC prediction + PVQ residual coding.

Flow per frame (reference: od_predict_frame encode.c:2205 +
od_encode_coefficients inter paths; decoder decode.c:1159-1295):

  1. motion search on luma against the previous reconstruction
     (search/me.py — batched hierarchical, a TPU-native redesign of
     mcenc.c).
  2. MV grid coding: median-predicted per vertex, magnitudes through
     the generic model + sign bits (od_encode_mv, encode.c:1678-1725
     semantics over a uniform one-level mesh this round).
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
from ..core.state import QM_SIZE, AdaptState, FrameInfo, interp_pvq_qm
from ..entropy import (
    GenericModel,
    RangeDecoder,
    RangeEncoder,
    generic_decode,
    generic_encode,
)
from ..ops.dct import fdct2d
from ..ops.mc import obmc_predict, pad_ref
from ..pvq.coding import pvq_decode_block, pvq_encode_block
from ..pvq.scan import coding_to_raster, qm_get_index, raster_to_coding
from ..search.me import motion_search
from .intra import (
    _PlaneCtx,
    _code_frame,
    _crop,
    _dering_pass,
    _div_r0,
    _from_blocks,
    _to_blocks,
    _to_spatial,
    from_coeff,
    pad_plane,
    prefilter_frame,
    pvq_betas,
    to_coeff,
)

__all__ = ["EncoderSession", "DecoderSession", "MV_BLK_LOG"]

MV_BLK_LOG = 4  # uniform mesh: vertices every 16 luma px


class _MvCtx:
    """MV coding context: generic magnitude models + expectations."""

    def __init__(self):
        self.model = GenericModel()
        self.ex = 24 << 16
        self.ey = 24 << 16


def _mv_pred(grid, vy, vx):
    """Median-of-neighbors predictor (od_state_get_predictor semantics
    on the uniform mesh: left, up, up-right — falling back to what
    exists)."""
    cands = []
    if vx > 0:
        cands.append(grid[vy, vx - 1])
    if vy > 0:
        cands.append(grid[vy - 1, vx])
        if vx + 1 < grid.shape[1]:
            cands.append(grid[vy - 1, vx + 1])
        elif vx > 0:
            cands.append(grid[vy - 1, vx - 1])
    if not cands:
        return np.zeros(2, dtype=np.int64)
    c = np.stack(cands)
    return np.median(c, axis=0).astype(np.int64)


def _code_mv_grid(ec, mvctx, grid, encoder):
    nvy, nvx = grid.shape[:2]
    out = np.zeros_like(grid) if not encoder else grid
    for vy in range(nvy):
        for vx in range(nvx):
            pred = _mv_pred(out, vy, vx)
            if encoder:
                dy = int(grid[vy, vx, 0]) - int(pred[0])
                dx = int(grid[vy, vx, 1]) - int(pred[1])
                mvctx.ex = generic_encode(ec, mvctx.model, abs(dy), -1,
                                          mvctx.ex, 2)
                if dy:
                    ec.encode_bits(int(dy < 0), 1)
                mvctx.ey = generic_encode(ec, mvctx.model, abs(dx), -1,
                                          mvctx.ey, 2)
                if dx:
                    ec.encode_bits(int(dx < 0), 1)
            else:
                dy, mvctx.ex = generic_decode(ec, mvctx.model, -1,
                                              mvctx.ex, 2)
                if dy and ec.decode_bits(1):
                    dy = -dy
                dx, mvctx.ey = generic_decode(ec, mvctx.model, -1,
                                              mvctx.ey, 2)
                if dx and ec.decode_bits(1):
                    dx = -dx
                out[vy, vx, 0] = pred[0] + dy
                out[vy, vx, 1] = pred[1] + dx
    return out


def _code_inter_block(ec, state, pc, md, bx, by, use_masking, encoder,
                      skip_in=0):
    """Inter leaf: prediction = transformed MC block; PVQ + DC delta."""
    pli = pc.pli
    n = pc.n
    bs = pc.bs
    y0 = by * n
    x0 = bx * n
    d = pc.d
    pred = np.asarray(md[y0:y0 + n, x0:x0 + n])
    predt = raster_to_coding(pred).astype(np.int32)
    q0 = max(1, pc.quantizer)
    qm = state.qm[bs]
    qm_inv = state.qm_inv[bs]
    beta = pvq_betas(use_masking, pli, bs)
    dc_quant = max(1, q0 * int(state.pvq_qm_q4[pli][qm_get_index(bs, 0)])
                   >> 4)
    if encoder:
        dblock = raster_to_coding(
            np.asarray(d[y0:y0 + n, x0:x0 + n])).astype(np.int32)
        out, skip = pvq_encode_block(
            ec, state, predt, dblock, q0, pli, bs, beta, True, False,
            qm, qm_inv)
        # DC magnitude with dc-skip fusion (encode.c:1192-1207).
        if out[0]:
            new_ex = generic_encode(ec, state.model_dc[pli],
                                    abs(int(out[0])) - 1, -1,
                                    int(state.ex_dc[pli, bs, 0]), 2)
            state.ex_dc[pli, bs, 0] = new_ex
            ec.encode_bits(int(out[0] < 0), 1)
            skip = 0
        out[0] = int(out[0]) * dc_quant + int(predt[0])
    else:
        nsym = 4 + (1 if (pli == 0 and bs > 0) else 0)
        del nsym  # skip decoded by caller
        out = pvq_decode_block(ec, state, predt, q0, pli, bs, beta, True,
                               False, skip_in, qm, qm_inv)
        dcflag = int(out[0])
        skip = (skip_in >> 1) and not dcflag
        if dcflag:
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


def _code_inter_frame(ec, state, pcs, mds, info, bs_luma, use_masking,
                      encoder):
    """Per-SB, per-plane, per-block raster pass with skip symbols.

    Inter has no Haar DC and no split levels this round (uniform
    grid); the skip symbol doubles as the split signal slot."""
    from ..entropy.adapt import decode_cdf_adapt, encode_cdf_adapt

    nhsb = pcs[0].nhsb
    nvsb = pcs[0].nvsb
    for sby in range(nvsb):
        for sbx in range(nhsb):
            for pli in range(len(pcs)):
                pc = pcs[pli]
                md = mds[pli]
                nb = (1 << (5 - pc.xdec)) // pc.n  # blocks per SB side
                for iy in range(nb):
                    for ix in range(nb):
                        bx = sbx * nb + ix
                        by = sby * nb + iy
                        if encoder:
                            skip = _code_inter_block(
                                ec, state, pc, md, bx, by, use_masking,
                                True)
                        else:
                            nsym = 4 + (1 if (pli == 0 and pc.bs > 0)
                                        else 0)
                            sk = decode_cdf_adapt(
                                ec,
                                state.skip_cdf[2 * pc.bs
                                               + (1 if pli else 0)][:nsym],
                                state.skip_increment)
                            if sk >= 4:
                                ec.error = 1
                                sk = 0
                            skip = _code_inter_block(
                                ec, state, pc, md, bx, by, use_masking,
                                False, sk)
                        # Track 4x4 skip cells for dering.
                        c4 = pc.n >> 2
                        pc.bskip[by * c4:(by + 1) * c4,
                                 bx * c4:(bx + 1) * c4] = skip


class EncoderSession:
    """Multi-frame encoder with reference management (the daala_enc_ctx
    equivalent for the implemented feature set)."""

    def __init__(self, info: FrameInfo, quality: int,
                 use_masking: bool = False, bs_luma: int = 1,
                 use_dering: bool = True, keyframe_rate: int = None):
        self.info = info
        self.quality = quality
        self.use_masking = use_masking
        self.bs_luma = bs_luma
        self.use_dering = use_dering
        self.keyframe_rate = keyframe_rate or info.keyframe_rate
        self.frame_idx = 0
        self.ref_planes = None     # reconstructed full padded planes
        self.qm, self.qm_inv = init_qm(QM8_HVS)

    def encode_frame(self, planes):
        """Returns (packet_bytes, is_keyframe, recon_planes)."""
        from .intra import encode_keyframe

        is_key = (self.frame_idx % self.keyframe_rate == 0
                  or self.ref_planes is None or self.quality == 0)
        self.frame_idx += 1
        if self.quality == 0:
            from .wavelet import encode_keyframe_lossless
            pkt = encode_keyframe_lossless(planes, self.info)
            from .wavelet import decode_keyframe_lossless
            rec = decode_keyframe_lossless(pkt, self.info)
            return pkt, True, rec
        if is_key:
            pkt, rec = encode_keyframe(
                planes, self.info, self.quality,
                use_masking=self.use_masking, bs_luma=self.bs_luma,
                use_dering=self.use_dering, return_recon=True)
            self._store_ref(rec)
            return pkt, True, rec
        pkt, rec = self._encode_pframe(planes)
        self._store_ref(rec)
        return pkt, False, rec

    def _store_ref(self, rec):
        self.ref_planes = [
            pad_plane(r, self.info.frame_width >> self.info.xdec[i],
                      self.info.frame_height >> self.info.ydec[i])
            for i, r in enumerate(rec)
        ]

    def _encode_pframe(self, planes):
        info = self.info
        cq = self.quality
        quantizer = codedquantizer_to_quantizer(cq)
        nplanes = info.nplanes
        state = AdaptState.reset(nplanes, False)
        state.qm, state.qm_inv = self.qm, self.qm_inv
        for pli in range(nplanes):
            state.pvq_qm_q4[pli] = interp_pvq_qm(quantizer, pli,
                                                 self.use_masking)
        ec = RangeEncoder()
        for pli in range(nplanes):
            ec.encode_uint(cq, N_CODED_QUANTIZERS)
        # Motion search on luma.
        ref_y = self.ref_planes[0]
        cur_y = pad_plane(planes[0], info.frame_width, info.frame_height)
        grid = motion_search(cur_y, ref_y, MV_BLK_LOG)
        mvctx = _MvCtx()
        _code_mv_grid(ec, mvctx, grid, True)
        pcs, mds = self._predict_and_transform(planes, grid, quantizer)
        _code_inter_frame(ec, state, pcs, mds, info, self.bs_luma,
                          self.use_masking, True)
        _to_spatial(pcs)
        if self.use_dering:
            orig = [to_coeff(pad_plane(planes[pli], pcs[pli].w,
                                       pcs[pli].h), False)
                    for pli in range(nplanes)]
            _dering_pass(ec, state, pcs, orig, True)
        return ec.done(), _crop(pcs, info)

    def _predict_and_transform(self, planes, grid, quantizer,
                               decoder_pcs=None):
        """Shared enc/dec: OBMC predict, pad-with-pred, lap+DCT both."""
        info = self.info
        pcs = []
        mds = []
        for pli in range(info.nplanes):
            pc = _PlaneCtx(info, pli, self.bs_luma, quantizer, False)
            pc.bskip = np.zeros((pc.h >> 2, pc.w >> 2), dtype=np.uint8)
            xd = info.xdec[pli]
            refp = pad_ref(self.ref_planes[pli])
            g = grid if xd == 0 else (grid >> 1)
            mc = obmc_predict(refp, 80, pc.h, pc.w, g, MV_BLK_LOG - xd)
            if planes is not None:
                cur = pad_plane(planes[pli], pc.w, pc.h)
                ph = planes[pli].shape[0]
                pw = planes[pli].shape[1]
                cur = cur.copy()
                cur[ph:, :] = mc[ph:, :]
                cur[:ph, pw:] = mc[:ph, pw:]
                c = prefilter_frame(to_coeff(cur, False), 4 << pc.bs)
                pc.d = _from_blocks(
                    fdct2d(_to_blocks(c, pc.n), pc.n), c.shape, pc.n)
            else:
                pc.d = np.zeros((pc.h, pc.w), dtype=np.int64)
            mcc = prefilter_frame(to_coeff(mc, False), 4 << pc.bs)
            md = _from_blocks(
                fdct2d(_to_blocks(mcc, pc.n), pc.n), mcc.shape, pc.n)
            pcs.append(pc)
            mds.append(md)
        return pcs, mds


class DecoderSession:
    def __init__(self, info: FrameInfo, bs_luma: int = 1,
                 use_masking: bool = False, use_dering: bool = True):
        self.info = info
        self.bs_luma = bs_luma
        self.use_masking = use_masking
        self.use_dering = use_dering
        self.ref_planes = None

    def decode_frame(self, packet: bytes, keyframe: bool,
                     use_haar: bool = False):
        from .intra import decode_keyframe
        from .wavelet import decode_keyframe_lossless

        if use_haar:
            rec = decode_keyframe_lossless(packet, self.info)
            return rec
        if keyframe:
            rec = decode_keyframe(packet, self.info,
                                  use_masking=self.use_masking,
                                  bs_luma=self.bs_luma,
                                  use_dering=self.use_dering)
            self._store_ref(rec)
            return rec
        rec = self._decode_pframe(packet)
        self._store_ref(rec)
        return rec

    def _store_ref(self, rec):
        self.ref_planes = [
            pad_plane(r, self.info.frame_width >> self.info.xdec[i],
                      self.info.frame_height >> self.info.ydec[i])
            for i, r in enumerate(rec)
        ]

    def _decode_pframe(self, packet):
        info = self.info
        ec = RangeDecoder(packet)
        cqs = [ec.decode_uint(N_CODED_QUANTIZERS)
               for _ in range(info.nplanes)]
        quantizer = codedquantizer_to_quantizer(cqs[0])
        state = AdaptState.reset(info.nplanes, False)
        state.qm, state.qm_inv = init_qm(QM8_HVS)
        for pli in range(info.nplanes):
            state.pvq_qm_q4[pli] = interp_pvq_qm(quantizer, pli,
                                                 self.use_masking)
        nvy = (info.frame_height >> MV_BLK_LOG) + 1
        nvx = (info.frame_width >> MV_BLK_LOG) + 1
        mvctx = _MvCtx()
        grid = _code_mv_grid(ec, mvctx,
                             np.zeros((nvy, nvx, 2), dtype=np.int64),
                             False)
        helper = EncoderSession.__new__(EncoderSession)
        helper.info = info
        helper.bs_luma = self.bs_luma
        helper.ref_planes = self.ref_planes
        pcs, mds = EncoderSession._predict_and_transform(
            helper, None, grid, quantizer)
        _code_inter_frame(ec, state, pcs, mds, info, self.bs_luma,
                          self.use_masking, False)
        _to_spatial(pcs)
        if self.use_dering:
            _dering_pass(ec, state, pcs, None, False)
        return _crop(pcs, info)
