"""Haar-wavelet coding mode — the lossless path (and lossy Haar).

PVQ is not lossless, so quality 0 switches the whole frame to a 2D Haar
transform per superblock with zero-tree-style sum coding
(od_wavelet_quantize encode.c:861-960, od_decode_sum_tree /
od_wavelet_unquantize decode.c:368-525).  Coefficient magnitudes are
coded top-down: each tree node's magnitude is split off the subtree sum
with adaptive CDFs (high bits raw), then signs.  With quantizer 1 the
round trip is bit-exact — the check_lossless parity gate
(tools/check_lossless.sh:41-57).
"""

from __future__ import annotations

import numpy as np

from ..core.quant import codedquantizer_to_quantizer
from ..core.state import AdaptState, FrameInfo
from ..entropy import \
    make_decoder, make_encoder, decode_cdf_adapt, \
    encode_cdf_adapt
from ..ops.dct import haar2d, ihaar2d
from .intra import _sb_dc_code, _PlaneCtx, from_coeff, pad_plane, to_coeff

__all__ = ["encode_keyframe_lossless", "decode_keyframe_lossless",
           "encode_keyframe_haar", "decode_keyframe_haar"]

# Per-level Haar band quantization weights (OD_HAAR_QM, state.c).
HAAR_QM = np.array([
    [16, 16, 16, 24, 32],   # horizontal/vertical
    [16, 16, 24, 32, 48],   # diagonal
], dtype=np.int32)


def _ilog(x: int) -> int:
    return int(x).bit_length()


def _div_r0(x: int, q: int) -> int:
    if x < 0:
        return -((-x + (q >> 1)) // q)
    return (x + (q >> 1)) // q


def _enc_unary(ec, x: int) -> None:
    if x:
        ec.encode_bits(0, x)
    ec.encode_bits(1, 1)


def _dec_unary(ec) -> int:
    a = 0
    while ec.decode_bits(1) == 0:
        a += 1
    return a


def _encode_coeff_split(ec, state, a, total, ctx):
    if total == 0:
        return
    shift = max(0, _ilog(total) - 4)
    if shift:
        ec.encode_bits(a & ((1 << shift) - 1), shift)
        a >>= shift
        total >>= shift
    encode_cdf_adapt(ec, a,
                     state.haar_coeff_cdf[15 * ctx + total - 1][:total + 1],
                     state.haar_coeff_increment)


def _decode_coeff_split(ec, state, total, ctx):
    if total == 0:
        return 0
    a = 0
    shift = max(0, _ilog(total) - 4)
    if shift:
        a = ec.decode_bits(shift)
    a += decode_cdf_adapt(
        ec, state.haar_coeff_cdf[15 * ctx + (total >> shift) - 1]
        [:(total >> shift) + 1],
        state.haar_coeff_increment) << shift
    if a > total:
        a = total
        ec.error = 1
    return a


def _encode_tree_split(ec, state, a, total, ctx):
    if total == 0:
        return
    shift = max(0, _ilog(total) - 4)
    if shift:
        ec.encode_bits(a & ((1 << shift) - 1), shift)
        a >>= shift
        total >>= shift
    encode_cdf_adapt(
        ec, a,
        state.haar_split_cdf[15 * (2 * ctx + min(shift, 1)) + total - 1]
        [:total + 1],
        state.haar_split_increment)


def _decode_tree_split(ec, state, total, ctx):
    if total == 0:
        return 0
    a = 0
    shift = max(0, _ilog(total) - 4)
    if shift:
        a = ec.decode_bits(shift)
    a += decode_cdf_adapt(
        ec, state.haar_split_cdf[15 * (2 * ctx + min(shift, 1))
                                 + (total >> shift) - 1]
        [:(total >> shift) + 1],
        state.haar_split_increment) << shift
    if a > total:
        a = total
        ec.error = 1
    return a


def _tree_sums(out: np.ndarray, ln: int) -> np.ndarray:
    """tree_sum[y][x] = |out[y][x]| + sum of children subtree sums
    (od_compute_max_tree, encode.c:756-778), accumulated ring by ring
    bottom-up: nodes with max(x,y) in [r, 2r) have children with
    max in [2r, 4r)."""
    n = 1 << ln
    ts = np.abs(out).astype(np.int64)
    r = n // 4
    while r >= 1:
        c = ts[0:4 * r, 0:4 * r]
        kid = (c[0::2, 0::2] + c[1::2, 0::2] + c[0::2, 1::2]
               + c[1::2, 1::2])
        ts[0:2 * r, 0:2 * r] += kid
        # Nodes inside [0:r)^2 belong to shallower rings; undo their add.
        ts[0:r, 0:r] -= kid[0:r, 0:r]
        r //= 2
    return ts


def _code_sum_tree(ec, state, out, ts, ln, x, y, dir_, tree_sum, encoder):
    """Top-down tree coding (od_encode_sum_tree encode.c:820-860 /
    od_decode_sum_tree decode.c:411-465)."""
    n = 1 << ln
    if tree_sum == 0:
        return
    ctx = dir_ + 3 * (_ilog(max(x, y)) - 1)
    if encoder:
        coeff_mag = abs(int(out[y, x]))
        _encode_coeff_split(ec, state, coeff_mag, tree_sum, ctx)
    else:
        coeff_mag = _decode_coeff_split(ec, state, tree_sum, ctx)
        out[y, x] = coeff_mag
    children_sum = tree_sum - coeff_mag
    ch = np.zeros((2, 2), dtype=np.int64)
    if children_sum:
        if encoder:
            cs = [[int(ts[2 * y, 2 * x]), int(ts[2 * y, 2 * x + 1])],
                  [int(ts[2 * y + 1, 2 * x]), int(ts[2 * y + 1, 2 * x + 1])]]
            if dir_ == 0:
                _encode_tree_split(ec, state, cs[0][0] + cs[0][1],
                                   children_sum, 0)
                _encode_tree_split(ec, state, cs[0][0],
                                   cs[0][0] + cs[0][1], 2)
                _encode_tree_split(ec, state, cs[1][0],
                                   cs[1][0] + cs[1][1], 2)
            else:
                _encode_tree_split(ec, state, cs[0][0] + cs[1][0],
                                   children_sum, 1)
                _encode_tree_split(ec, state, cs[0][0],
                                   cs[0][0] + cs[1][0], 2)
                _encode_tree_split(ec, state, cs[0][1],
                                   cs[0][1] + cs[1][1], 2)
            ch[:] = cs
        else:
            if dir_ == 0:
                sum1 = _decode_tree_split(ec, state, children_sum, 0)
                ch[0, 0] = _decode_tree_split(ec, state, sum1, 2)
                ch[0, 1] = sum1 - ch[0, 0]
                ch[1, 0] = _decode_tree_split(ec, state,
                                              children_sum - sum1, 2)
                ch[1, 1] = children_sum - sum1 - ch[1, 0]
            else:
                sum1 = _decode_tree_split(ec, state, children_sum, 1)
                ch[0, 0] = _decode_tree_split(ec, state, sum1, 2)
                ch[1, 0] = sum1 - ch[0, 0]
                ch[0, 1] = _decode_tree_split(ec, state,
                                              children_sum - sum1, 2)
                ch[1, 1] = children_sum - sum1 - ch[0, 1]
    if 4 * x < n and 4 * y < n:
        for dy in (0, 1):
            for dx in (0, 1):
                t = int(ts[2 * y + dy, 2 * x + dx]) if encoder \
                    else int(ch[dy, dx])
                _code_sum_tree(ec, state, out, ts, ln, 2 * x + dx,
                               2 * y + dy, dir_, t, encoder)
    elif not encoder:
        out[2 * y, 2 * x] = ch[0, 0]
        out[2 * y, 2 * x + 1] = ch[0, 1]
        out[2 * y + 1, 2 * x] = ch[1, 0]
        out[2 * y + 1, 2 * x + 1] = ch[1, 1]


def _band_quant_grid(n: int, ln: int, quant: int) -> np.ndarray:
    """Per-position quantizer for the Mallat layout."""
    q = np.ones((n, n), dtype=np.int64)
    for dir_ in range(3):
        for level in range(ln):
            qq = 1 if quant == 0 else \
                quant * int(HAAR_QM[1 if dir_ == 2 else 0][level]) >> 4
            by = ((dir_ + 1) >> 1) << level
            bx = ((dir_ + 1) & 1) << level
            q[by:by + (1 << level), bx:bx + (1 << level)] = qq
    return q


def _wavelet_code_sb(ec, state, pc, sby, sbx, pli, quant, encoder):
    n = 1 << (5 - pc.xdec)
    ln = 5 - pc.xdec
    y0 = sby * n
    x0 = sbx * n
    d = pc.d
    qgrid = _band_quant_grid(n, ln, quant)
    if encoder:
        blk = np.asarray(d[y0:y0 + n, x0:x0 + n], dtype=np.int64)
        out = np.where(
            blk < 0,
            -((-blk + (qgrid >> 1)) // qgrid),
            (blk + (qgrid >> 1)) // qgrid,
        )
        out[0, 0] = blk[0, 0]  # DC handled by SB DC coding
        ts = _tree_sums(out, ln)
        top = int(ts[0, 1] + ts[1, 0] + ts[1, 1])
        bits = _ilog(top)
        encode_cdf_adapt(ec, min(bits, 15), state.haar_bits_cdf[pli],
                         state.haar_bits_increment)
        if bits >= 15:
            _enc_unary(ec, bits - 15)
        if bits > 1:
            ec.encode_bits(top & ((1 << (bits - 1)) - 1), bits - 1)
        _encode_tree_split(ec, state, int(ts[1, 1]), top, 3)
        _encode_tree_split(ec, state, int(ts[0, 1]),
                           top - int(ts[1, 1]), 4)
        _code_sum_tree(ec, state, out, ts, ln, 1, 0, 0, int(ts[0, 1]), True)
        _code_sum_tree(ec, state, out, ts, ln, 0, 1, 1, int(ts[1, 0]), True)
        _code_sum_tree(ec, state, out, ts, ln, 1, 1, 2, int(ts[1, 1]), True)
        flat = out.ravel()
        for idx in range(1, n * n):
            if flat[idx]:
                ec.encode_bits(int(flat[idx] < 0), 1)
        rec = out * qgrid
        rec[0, 0] = out[0, 0]
        d[y0:y0 + n, x0:x0 + n] = rec
    else:
        out = np.zeros((n, n), dtype=np.int64)
        bits = decode_cdf_adapt(ec, state.haar_bits_cdf[pli],
                                state.haar_bits_increment)
        if bits == 15:
            bits += _dec_unary(ec)
        if bits > 24:
            ec.error = 1
            return
        if bits > 1:
            top = (1 << (bits - 1)) | ec.decode_bits(bits - 1)
        else:
            top = bits
        t11 = _decode_tree_split(ec, state, top, 3)
        t01 = _decode_tree_split(ec, state, top - t11, 4)
        t10 = top - t11 - t01
        _code_sum_tree(ec, state, out, None, ln, 1, 0, 0, t01, False)
        _code_sum_tree(ec, state, out, None, ln, 0, 1, 1, t10, False)
        _code_sum_tree(ec, state, out, None, ln, 1, 1, 2, t11, False)
        flat = out.ravel()
        for idx in range(1, n * n):
            if flat[idx] and ec.decode_bits(1):
                flat[idx] = -flat[idx]
        rec = out * qgrid
        rec[0, 0] = int(d[y0, x0])  # SB-DC reconstructed
        d[y0:y0 + n, x0:x0 + n] = rec


def _run(planes_or_packet, info: FrameInfo, quality: int, encoder: bool):
    nplanes = info.nplanes
    state = AdaptState.reset(nplanes, True)
    lossless = quality == 0
    quantizer = 0 if lossless else codedquantizer_to_quantizer(quality)
    if encoder:
        ec = make_encoder()
    else:
        ec = make_decoder(planes_or_packet)
    pcs = []
    for pli in range(nplanes):
        pc = _PlaneCtx(info, pli, 3, quantizer, lossless)
        if encoder:
            p = pad_plane(planes_or_packet[pli], pc.w, pc.h)
            c = to_coeff(p, lossless, info.bitdepth)
            n = 1 << (5 - pc.xdec)
            blocks = (c.reshape(pc.h // n, n, pc.w // n, n)
                      .transpose(0, 2, 1, 3).reshape(-1, n, n))
            hb = haar2d(blocks, 5 - pc.xdec)
            pc.d = (hb.reshape(pc.h // n, pc.w // n, n, n)
                    .transpose(0, 2, 1, 3).reshape(pc.h, pc.w))
        else:
            pc.d = np.zeros((pc.h, pc.w), dtype=np.int64)
        pcs.append(pc)
    nhsb, nvsb = pcs[0].nhsb, pcs[0].nvsb
    for sby in range(nvsb):
        for sbx in range(nhsb):
            for pli in range(nplanes):
                pc = pcs[pli]
                has_ur = sby > 0 and sbx < nhsb - 1
                _sb_dc_code(ec, state, pc, sbx, sby, has_ur, encoder)
                _wavelet_code_sb(ec, state, pc, sby, sbx, pli, quantizer,
                                 encoder)
    if encoder:
        return ec.done()
    out = []
    for pc in pcs:
        n = 1 << (5 - pc.xdec)
        blocks = (pc.d.astype(np.int32)
                  .reshape(pc.h // n, n, pc.w // n, n)
                  .transpose(0, 2, 1, 3).reshape(-1, n, n))
        sp = ihaar2d(blocks, 5 - pc.xdec)
        c = (sp.reshape(pc.h // n, pc.w // n, n, n)
             .transpose(0, 2, 1, 3).reshape(pc.h, pc.w))
        pix = from_coeff(c, lossless, info.bitdepth)
        out.append(pix[:info.pic_height >> info.ydec[pc.pli],
                       :info.pic_width >> pc.xdec])
    return out


def encode_keyframe_lossless(planes, info: FrameInfo) -> bytes:
    return _run(planes, info, 0, True)


def decode_keyframe_lossless(packet: bytes, info: FrameInfo):
    return _run(packet, info, 0, False)


def encode_keyframe_haar(planes, info: FrameInfo, quality: int) -> bytes:
    return _run(planes, info, quality, True)


def decode_keyframe_haar(packet: bytes, info: FrameInfo, quality: int):
    return _run(packet, info, quality, False)
