"""Keyframe (intra) encode/decode pipeline.

Structure (reference flow: od_encode_coefficients encode.c:2389-2707 /
od_decode_coefficients decode.c:962-1150, restructured into whole-frame
passes):

  1. pixels -> coeff domain ((v-128) << 4, state.c:1209-1249), padded to
     the 64-aligned frame size with edge replication.
  2. whole-frame lapped prefilter across every block edge.
  3. batched forward DCT of all blocks (fixed block size this round).
  4. per-superblock Haar DC tree (bottom-up kernel over block DCs,
     od_compute_dcts encode.c:1286-1351).
  5. sequential coding pass in SB raster order: SB DC with W/NW/N/NE
     prediction (encode.c:1368-1421), per-level Haar AC with gradient
     feed-forward (encode.c:1424-1489), per block: split-symbol
     plumbing, H/V intra pred (intra.c:37-61) or CfL (intra.c:72-109),
     PVQ band coding, decoded coeffs written back for later predictors.
  6. batched inverse DCT, whole-frame postfilter, coeff -> pixels.

The decoder mirrors pass 5 exactly and shares passes 1-4/6 machinery.
Block size is fixed per frame this round (the reference supports forced
uniform splits, state.c:1023); the RDO splitter arrives with the
variable-size grid.
"""

from __future__ import annotations

import numpy as np

from ..core.quant import (
    DC_QM,
    N_CODED_QUANTIZERS,
    QM8_HVS,
    codedquantizer_to_quantizer,
    init_qm,
)
from ..core.state import QM_SIZE, AdaptState, FrameInfo, interp_pvq_qm
from ..entropy import (
    decode_cdf_adapt,
    encode_cdf_adapt,
    generic_decode,
    generic_encode,
    make_decoder,
    make_encoder,
)
from ..pvq.coding import pvq_decode_block, pvq_encode_block
from ..pvq.scan import (
    BAND_OFFSETS,
    coding_to_raster,
    qm_get_index,
    raster_to_coding,
)

__all__ = ["encode_keyframe", "decode_keyframe"]

LOG_BSIZE0 = 2
NBSIZES = 4
BSIZE_MAX = 32

# Activity-masking beta per band (OD_PVQ_BETA, pvq.c:205-255); masking
# off => 1.0 everywhere.
def pvq_betas(use_masking: bool, pli: int, bs: int):
    nb = BAND_OFFSETS[bs][0]
    if use_masking and pli == 0:
        return [1.5] * nb
    return [1.0] * nb


def _loc(ec, label, pli=0, level=0, x=0, y=0):
    a = getattr(ec, "acct", None)
    if a is not None:
        a.set_location(label, pli, level, x, y)


def _use_native_walk(ecs) -> bool:
    """Native keyframe walk gate: C++ lib built, native coders, not
    forced off (DTPU_PY_WALK=1 keeps the Python pass as oracle)."""
    import os

    from ..pvq import native_walk

    return (native_walk.available()
            and not os.environ.get("DTPU_PY_WALK")
            and all(getattr(e, "_h", None) is not None for e in ecs))


def _tdiv(a: int, b: int) -> int:
    """C-style truncating integer division."""
    q = abs(a) // b
    return -q if a < 0 else q


def _div_r0(x: int, q: int) -> int:
    if x < 0:
        return -((-x + (q >> 1)) // q)
    return (x + (q >> 1)) // q


def to_coeff(plane: np.ndarray, lossless: bool,
             bitdepth: int = 8) -> np.ndarray:
    """Pixels -> coeff domain (state.c:1209-1249).  High-depth input
    shifts LESS so the coeff-domain scale — and with it every
    quantizer, threshold and lambda — is depth-independent
    (OD_COEFF_SHIFT - (bitdepth - 8))."""
    ext = bitdepth - 8
    center = 128 << ext
    shift = 0 if lossless else 4 - ext
    return (plane.astype(np.int32) - center) << shift


def from_coeff(c: np.ndarray, lossless: bool,
               bitdepth: int = 8) -> np.ndarray:
    ext = bitdepth - 8
    center = 128 << ext
    shift = 0 if lossless else 4 - ext
    if shift:
        v = ((c + (1 << (shift - 1))) >> shift) + center
    else:
        v = c + center
    maxv = (1 << bitdepth) - 1
    dtype = np.uint8 if bitdepth <= 8 else np.uint16
    return np.clip(v, 0, maxv).astype(dtype)


def pad_plane(plane: np.ndarray, fw: int, fh: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, fh - h), (0, fw - w)), mode="edge")


def haar_dc_tree(d: np.ndarray, blocksize: int) -> np.ndarray:
    """Bottom-up Haar combine of block DCs up to the 32x32 SB level,
    vectorized over the whole plane (od_compute_dcts keyframe path).
    Kernel arg order is (ll, down, right, diag) on this side."""
    from ..ops.dct import _haar_kernel

    d = d.copy()
    step = blocksize
    while step < BSIZE_MAX:
        g = d[::step, ::step]
        a = g[0::2, 0::2].copy()
        right = g[0::2, 1::2].copy()
        down = g[1::2, 0::2].copy()
        diag = g[1::2, 1::2].copy()
        a, down, right, diag = _haar_kernel(a, down, right, diag)
        g[0::2, 0::2] = a
        g[0::2, 1::2] = right
        g[1::2, 0::2] = down
        g[1::2, 1::2] = diag
        step *= 2
    return d


class _PlaneCtx:
    """Per-plane coding context for the sequential pass."""

    def __init__(self, info: FrameInfo, pli: int, bs_luma: int,
                 quantizer: int, lossless: bool):
        self.pli = pli
        self.xdec = info.xdec[pli]
        self.w = info.frame_width >> self.xdec
        self.h = info.frame_height >> info.ydec[pli]
        self.bs = max(bs_luma, self.xdec) - self.xdec  # default plane bs
        self.n = 4 << self.bs
        self.quantizer = quantizer
        self.lossless = lossless
        self.bitdepth = info.bitdepth
        self.nhsb = self.w >> (5 - self.xdec)
        self.nvsb = self.h >> (5 - self.xdec)
        self.sb_dc_mem = np.zeros(self.nhsb * self.nvsb, dtype=np.int64)
        self.d = None        # transform-domain plane
        self.c = None        # spatial (lapped) plane
        self.grid = None     # shared luma-relative bsize grid (h4, w4)
        self.tile_y0 = 0     # tile's first row in plane pixels

    def pg(self):
        """Per-plane-cell block sizes."""
        from .grid import plane_grid

        return plane_grid(self.grid, self.xdec)


def _sb_dc_code(ec, state, pc: _PlaneCtx, sbx, sby, has_ur, encoder: bool,
                row0: int = 0):
    """SB DC with LS-optimized neighbor prediction
    (encode.c:1368-1421 / decode.c:642-695).  Returns (hgrad, vgrad).

    row0 is the tile's first SB row: prediction above it is cut so the
    tile's stream never depends on another tile's symbols."""
    pli = pc.pli
    dc_quant = 1 if pc.lossless else max(
        1, pc.quantizer * int(state.pvq_qm_q4[pli][qm_get_index(3, 0)]) >> 4)
    nhsb = pc.nhsb
    mem = pc.sb_dc_mem
    ln = 5 - pc.xdec
    if sby > row0 and sbx > 0:
        if has_ur:
            pred = (22 * mem[sby * nhsb + sbx - 1]
                    - 9 * mem[(sby - 1) * nhsb + sbx - 1]
                    + 15 * mem[(sby - 1) * nhsb + sbx]
                    + 4 * mem[(sby - 1) * nhsb + sbx + 1] + 16) >> 5
        else:
            pred = (23 * mem[sby * nhsb + sbx - 1]
                    - 10 * mem[(sby - 1) * nhsb + sbx - 1]
                    + 19 * mem[(sby - 1) * nhsb + sbx] + 16) >> 5
    elif sby > row0:
        pred = mem[(sby - 1) * nhsb + sbx]
    elif sbx > 0:
        pred = mem[sby * nhsb + sbx - 1]
    else:
        pred = 0
    pred = int(pred)
    y0 = sby << ln
    x0 = sbx << ln
    if encoder:
        dc0 = int(pc.d[y0, x0]) - pred
        quant = _div_r0(dc0, dc_quant)
        new_ex = generic_encode(ec, state.model_dc[pli], abs(quant), -1,
                                int(state.ex_sb_dc[pli]), 2)
        state.ex_sb_dc[pli] = new_ex
        if quant:
            ec.encode_bits(int(quant < 0), 1)
    else:
        _loc(ec, "haardc:sb", pli, 3, x0, y0)
        quant, new_ex = generic_decode(ec, state.model_dc[pli], -1,
                                       int(state.ex_sb_dc[pli]), 2)
        state.ex_sb_dc[pli] = new_ex
        if quant and ec.decode_bits(1):
            quant = -quant
    sb_dc_curr = quant * dc_quant + pred
    pc.d[y0, x0] = sb_dc_curr
    mem[sby * nhsb + sbx] = sb_dc_curr
    vgrad = hgrad = 0
    if sby > row0:
        vgrad = int(mem[(sby - 1) * nhsb + sbx]) - sb_dc_curr
    if sbx > 0:
        hgrad = int(mem[sby * nhsb + sbx - 1]) - sb_dc_curr
    return hgrad, vgrad


def _haar_dc_level(ec, state, pc: _PlaneCtx, bx, by, bsi, hgrad, vgrad,
                   encoder: bool):
    """Quantize/code the 3 Haar ACs at one split level and reconstruct
    the 4 child DCs (encode.c:1424-1489 / decode.c:697-757).
    bx/by are in units of the child node at bsi."""
    from ..entropy.adapt import generic_encode_cost
    from ..ops.dct import _haar_kernel
    from ..pvq.core import PVQ_LAMBDA

    pli = pc.pli
    xdec = pc.xdec
    dc_quant = 1 if pc.lossless else max(
        1, pc.quantizer * int(state.pvq_qm_q4[pli][qm_get_index(3, 0)]) >> 4)
    if pc.lossless:
        ac_quant = [1, 1]
    else:
        ac_quant = [
            (dc_quant * int(DC_QM[bsi - xdec][0]) + 8) >> 4,
            (dc_quant * int(DC_QM[bsi - xdec][1]) + 8) >> 4,
        ]
    ln = bsi - xdec + 2
    w = pc.w
    d = pc.d
    pos = [
        (by << ln, bx << ln),
        (by << ln, (bx + 1) << ln),
        ((by + 1) << ln, bx << ln),
        ((by + 1) << ln, (bx + 1) << ln),
    ]
    x = [int(d[p]) for p in pos]
    if encoder:
        x[1] -= _tdiv(hgrad, 5)
        x[2] -= _tdiv(vgrad, 5)
        for i in range(1, 4):
            q = ac_quant[1 if i == 3 else 0]
            sign = x[i] < 0
            mag = abs(x[i])
            quant = mag // q
            # RDO: bump quant if the rate of +1 is worth the distortion.
            cost = generic_encode_cost(
                state.model_dc[pli], quant + 1, -1,
                int(state.ex_dc[pli, bsi, i - 1]))
            cost -= generic_encode_cost(
                state.model_dc[pli], quant, -1,
                int(state.ex_dc[pli, bsi, i - 1]))
            if quant == 0:
                cost += 1
            if q * q - 2 * q * (mag - quant * q) \
                    + q * q * PVQ_LAMBDA * cost < 0:
                quant += 1
            new_ex = generic_encode(ec, state.model_dc[pli], quant, -1,
                                    int(state.ex_dc[pli, bsi, i - 1]), 2)
            state.ex_dc[pli, bsi, i - 1] = new_ex
            if quant:
                ec.encode_bits(int(sign), 1)
            x[i] = quant * ac_quant[1 if i == 3 else 0]
            if sign:
                x[i] = -x[i]
    else:
        _loc(ec, "haardc:level", pli, bsi, pos[0][1], pos[0][0])
        for i in range(1, 4):
            quant, new_ex = generic_decode(ec, state.model_dc[pli], -1,
                                           int(state.ex_dc[pli, bsi, i - 1]),
                                           2)
            state.ex_dc[pli, bsi, i - 1] = new_ex
            if quant and ec.decode_bits(1):
                quant = -quant
            x[i] = quant * ac_quant[1 if i == 3 else 0]
    x[1] += _tdiv(hgrad, 5)
    x[2] += _tdiv(vgrad, 5)
    hgrad = x[1]
    vgrad = x[2]
    x0, x1, x2, x3 = _haar_kernel(x[0], x[1], x[2], x[3])
    for p, v in zip(pos, (x0, x1, x2, x3)):
        d[p] = v
    return hgrad, vgrad


def _hv_intra_pred(pc: _PlaneCtx, bx, by, bs) -> np.ndarray:
    """Keyframe luma H/V prediction from coded neighbors
    (od_hv_intra_pred, intra.c:37-61).  bx/by in units of this block's
    size; prediction only from same-size neighbors."""
    n = 4 << bs
    d = pc.d
    y0 = by * n
    x0 = bx * n
    pred = np.zeros((n, n), dtype=np.int32)
    g = pc.grid  # luma plane only (pli == 0)
    c4 = n // 4
    top = y0 > pc.tile_y0 and g[by * c4 - 1, bx * c4] == bs
    left = bx > 0 and g[by * c4, bx * c4 - 1] == bs
    g1 = g2 = 0.0
    if top:
        row = d[y0 - n, x0:x0 + n].astype(np.float64)
        g1 = float((row[1:4] ** 2).sum())
        pred[0, 4:] = d[y0 - n, x0 + 4:x0 + n]
    if left:
        col = d[y0:y0 + n, x0 - n].astype(np.float64)
        g2 = float((col[1:4] ** 2).sum())
        pred[4:, 0] = d[y0 + 4:y0 + n, x0 - n]
    if g1 > g2:
        if top:
            pred[0, 1:4] = d[y0 - n, x0 + 1:x0 + 4]
    else:
        if left:
            pred[1:4, 0] = d[y0 + 1:y0 + 4, x0 - n]
    return pred


# Trained CfL scaling for merged 4x4 luma (OD_CFL_SCALING4,
# intra.c:64-69).
_CFL_SCALING4 = np.array([
    [128, 128, 100, 36],
    [128, 80, 71, 35],
    [100, 71, 35, 31],
    [36, 35, 31, 18],
], dtype=np.int32)


def _cfl_pred(luma_d: np.ndarray, pc: _PlaneCtx, bx, by, bsi,
              bs_c: int, obs: int) -> np.ndarray:
    """Chroma-from-luma: frequency-domain resample of the co-located
    decoded luma coefficients (od_resample_luma_coeffs, intra.c:72-109).

    bx/by: node coords at level bsi; bs_c: chroma block size; obs: the
    co-located luma block size."""
    from ..ops.tf import tf_up_hv_lp

    n = 4 << bs_c
    ly = by << (2 + bsi)
    lx = bx << (2 + bsi)
    if obs == 0 and pc.xdec:
        # Four 4x4 luma blocks merge into the 4x4 chroma reference.
        src = luma_d[ly:ly + 8, lx:lx + 8].astype(np.int32)
        pred = tf_up_hv_lp(src, 4, 4, 4)
        pred = (_CFL_SCALING4.T * pred + 64) >> 7
        return pred.astype(np.int32)
    return luma_d[ly:ly + n, lx:lx + n].astype(np.int32)


def _code_block(ec, state, pc: _PlaneCtx, luma_d, bx, by, bsi, bs,
                use_masking, encoder: bool, skip_in=0, obs=None,
                dres=False):
    """Leaf coding: prediction + PVQ + writeback (od_block_encode
    encode.c:1066-1285 / od_block_decode decode.c:528-636).

    bx/by are node coords at level bsi; bs is the plane block size.

    dres: device keyframe mode — bands are coded noref (no H/V intra
    prediction, no CfL) through the integer synthesis spec, so the
    reconstruction is reproducible bit-exactly on the device."""
    pli = pc.pli
    n = 4 << bs
    y0 = by << (2 + bsi - pc.xdec)
    x0 = bx << (2 + bsi - pc.xdec)
    d = pc.d
    if dres:
        pred = np.zeros((n, n), dtype=np.int32)
    elif pli == 0:
        pred = _hv_intra_pred(pc, bx, by, bs)
    else:
        pred = _cfl_pred(luma_d, pc, bx, by, bsi, bs, obs)
    predt = raster_to_coding(pred).astype(np.int32)
    q0 = max(1, pc.quantizer)
    qm = state.qm[bs]
    qm_inv = state.qm_inv[bs]
    beta = pvq_betas(use_masking, pli, bs)
    if encoder:
        dblock = raster_to_coding(
            np.asarray(d[y0:y0 + n, x0:x0 + n])).astype(np.int32)
        out, skip = pvq_encode_block(
            ec, state, predt, dblock, q0, pli, bs, beta, True, True,
            qm, qm_inv, dres=dres)
        out[0] = dblock[0]
    else:
        _loc(ec, "pvq", pli, bs, x0, y0)
        out = pvq_decode_block(
            ec, state, predt, q0, pli, bs, beta, True, True, skip_in,
            qm, qm_inv, dres=dres)
        out[0] = int(d[y0, x0])  # Haar-DC reconstructed DC
    block = coding_to_raster(out, n)
    block[0, 0] = out[0]
    d[y0:y0 + n, x0:x0 + n] = block


def _code_recursive(ec, state, pc: _PlaneCtx, luma_d, bx, by, bsi,
                    use_masking, hgrad, vgrad, encoder: bool,
                    dres=False):
    """Z-order walk with split signaling and Haar-DC levels
    (od_encode_recursive encode.c:1491-1676 / od_decode_recursive
    decode.c:767-870).  The split decisions live in pc.grid (encoder
    side) and are derived from the luma skip symbols (decoder side)."""
    pli = pc.pli
    xdec = pc.xdec
    g = pc.grid
    cell = (by << bsi, bx << bsi)   # node origin in luma 4x4 cells
    if pli == 0:
        if encoder:
            obs = int(g[cell])
            is_leaf = obs == bsi
        else:
            nsym = 4 + (1 if bsi > 0 else 0)
            _loc(ec, "skip", 0, bsi, cell[1] * 4, cell[0] * 4)
            skip = decode_cdf_adapt(
                ec, state.skip_cdf[2 * bsi][:nsym], state.skip_increment)
            is_leaf = skip < 4
            if is_leaf:
                g[cell[0]:cell[0] + (1 << bsi),
                  cell[1]:cell[1] + (1 << bsi)] = bsi
            obs = bsi
        if is_leaf:
            if encoder:
                _code_block(ec, state, pc, luma_d, bx, by, bsi, bsi,
                            use_masking, True, dres=dres)
            else:
                _code_block(ec, state, pc, luma_d, bx, by, bsi, bsi,
                            use_masking, False, skip, dres=dres)
            return
        # Split: encoder signals 4.
        if encoder:
            encode_cdf_adapt(ec, 4, state.skip_cdf[2 * bsi][:5],
                             state.skip_increment)
    else:
        obs = int(g[cell])
        if max(obs, xdec) == bsi:
            bs = bsi - xdec
            nsym = 4
            if encoder:
                _code_block(ec, state, pc, luma_d, bx, by, bsi, bs,
                            use_masking, True, obs=obs, dres=dres)
            else:
                skip = decode_cdf_adapt(
                    ec, state.skip_cdf[2 * bs + 1][:nsym],
                    state.skip_increment)
                _code_block(ec, state, pc, luma_d, bx, by, bsi, bs,
                            use_masking, False, skip, obs=obs, dres=dres)
            return
    hgrad, vgrad = _haar_dc_level(ec, state, pc, 2 * bx, 2 * by, bsi - 1,
                                  hgrad, vgrad, encoder)
    for dy in (0, 1):
        for dx in (0, 1):
            _code_recursive(ec, state, pc, luma_d, 2 * bx + dx, 2 * by + dy,
                            bsi - 1, use_masking, hgrad, vgrad, encoder,
                            dres)


def _tile_d_rows(pcs, rows):
    """Copy each plane's coeff rows for SB rows [rows[0], rows[1]) —
    the only part of pc.d a tile's symbol pass mutates."""
    out = []
    for pc in pcs:
        ln = 5 - pc.xdec
        out.append(pc.d[rows[0] << ln:rows[1] << ln].copy())
    return out


def _merge_d_rows(pcs, rows, dr):
    for pc, r in zip(pcs, dr):
        ln = 5 - pc.xdec
        pc.d[rows[0] << ln:rows[1] << ln] = r


def _tile_c_rows(pcs, rows):
    out = []
    for pc in pcs:
        ln = 5 - pc.xdec
        out.append(pc.c[rows[0] << ln:rows[1] << ln].copy())
    return out


def _merge_c_rows(pcs, rows, cr):
    for pc, r in zip(pcs, cr):
        ln = 5 - pc.xdec
        pc.c[rows[0] << ln:rows[1] << ln] = r


def _tile_grid_rows(grid, rows):
    """Luma 4x4-cell rows of the shared bsize grid for one tile."""
    return grid[rows[0] * 8:rows[1] * 8].copy()


def _merge_grid_rows(grid, rows, gr):
    grid[rows[0] * 8:rows[1] * 8] = gr


def _tile_states(nplanes, quantizer, use_masking, ntiles,
                 is_keyframe=True, qm_flat=False):
    """One fresh AdaptState per tile — tiles never share adaptation, so
    their symbol streams are fully independent.  qm_flat: flat band
    weights (OD_SET_QM 0; FrameInfo.qm carries the select so the
    derived inter-frame weights agree on both sides)."""
    states = []
    for _ in range(ntiles):
        st = AdaptState.reset(nplanes, is_keyframe)
        st.qm, st.qm_inv = init_qm(QM8_HVS)
        for pli in range(nplanes):
            st.pvq_qm_q4[pli] = interp_pvq_qm(quantizer, pli,
                                              use_masking, flat=qm_flat)
        states.append(st)
    return states


def encode_keyframe(planes, info: FrameInfo, quality: int,
                    use_masking: bool = False, bs_luma: int = 1,
                    use_dering: bool = True,
                    return_recon: bool = False, tiles: int = 1,
                    tile_workers: int = 1, dres: bool = False,
                    rdo_bsize: bool = True):
    """Encode one keyframe.  planes: list of uint8 arrays (pic size).
    quality: coded quantizer index (0 = lossless -> not supported in the
    PVQ path; use the wavelet coder).  Returns the frame packet, and the
    encoder-side reconstruction if return_recon (must be pixel-exact
    equal to the decoder output — the reference's --enable-encoder-check
    invariant, encode.c:3204-3243).

    tiles > 1 splits the frame into independent entropy streams (one
    per group of SB rows, see tiles.py); tile 0 carries the header.
    tile_workers > 1 runs the tile symbol passes in forked worker
    processes — bit-identical to the serial order by construction."""
    from .tiles import pack_tiles, run_tiles, tile_rows

    assert 0 < quality < N_CODED_QUANTIZERS
    cq = max(1, quality - 3)  # keyframe quality boost (encode.c:3059)
    quantizer = codedquantizer_to_quantizer(cq)
    nplanes = info.nplanes
    bounds = tile_rows(info.frame_height >> 5, tiles)
    states = _tile_states(nplanes, quantizer, use_masking, len(bounds),
                          qm_flat=getattr(info, "qm", 1) == 0)
    ecs = [make_encoder() for _ in bounds]
    # Frame header fields (tile 0 only).
    for pli in range(nplanes):
        for v in states[0].pvq_qm_q4[pli]:
            ecs[0].encode_bits(int(v), 8)
    for pli in range(nplanes):
        ecs[0].encode_uint(cq, N_CODED_QUANTIZERS)
    # Block-size grid: fixed uniform, or the RDO splitter.
    from ..search.bsize import rdo_split_superblocks, uniform_grid
    from .grid import fdct_plane_grid, haar_dc_tree_grid, \
        prefilter_plane_grid

    bd = info.bitdepth
    pad_y = pad_plane(planes[0], info.frame_width, info.frame_height)
    if bs_luma < 0 and not rdo_bsize:
        # Open-loop psycho-visual splitter (block_size_enc.c
        # complexity<2 gate): input-variance statistics only.
        from ..search.bsize import split_superblocks

        grid = split_superblocks((pad_y >> (bd - 8)).astype(np.uint8)
                                 if bd > 8 else pad_y, quantizer)
    elif bs_luma < 0:  # auto (RDO trial encode)
        grid = rdo_split_superblocks(
            to_coeff(pad_y, False, bd), quantizer, states[0].qm,
            states[0].qm_inv)
    else:
        grid = uniform_grid(info.frame_height, info.frame_width, bs_luma)
    # Plane setup: pad, to coeff domain, lap, transform, DC tree.
    pcs = []
    for pli in range(nplanes):
        pc = _PlaneCtx(info, pli, max(bs_luma, 0), quantizer, False)
        pc.grid = grid
        pg = pc.pg()
        p = pad_plane(planes[pli], pc.w, pc.h)
        c = prefilter_plane_grid(to_coeff(p, False, bd), pg)
        d = fdct_plane_grid(c, pg)
        pc.d = haar_dc_tree_grid(d, pg, 3 - pc.xdec)
        pc.c = c
        pcs.append(pc)
    # Per-tile symbol pass: native C++ walk when available (serial over
    # tiles — each tile keeps its own stream/adaptation), else the
    # Python pass, forked when tile_workers > 1.
    if _use_native_walk(ecs) and not dres:
        from ..pvq import native_walk as _nw

        kp = _nw.KeyPlanes(pcs)
        for ti, rows in enumerate(bounds):
            _nw.walk_key(ecs[ti], states[ti], pcs, kp, rows,
                         pcs[0].nhsb, use_masking)
        kp.writeback(pcs)
    else:
        def _sb_job(ti):
            rows = bounds[ti]
            _code_frame(ecs[ti], states[ti], pcs, info, bs_luma,
                        use_masking, True, rows, dres)
            return ecs[ti], states[ti], _tile_d_rows(pcs, rows)

        for ti, (ec_t, st_t, dr) in enumerate(
                run_tiles(_sb_job, len(bounds), tile_workers)):
            ecs[ti], states[ti] = ec_t, st_t
            _merge_d_rows(pcs, bounds[ti], dr)
    _to_spatial(pcs)
    if use_dering:
        orig = [to_coeff(pad_plane(planes[pli], pcs[pli].w, pcs[pli].h),
                         False, bd) for pli in range(nplanes)]
        etmp = [pc.c.copy() for pc in pcs]
        bufs = _dering_buffers(pcs, etmp, max(1, pcs[0].quantizer))

        def _dr_job(ti):
            rows = bounds[ti]
            _dering_pass(ecs[ti], states[ti], pcs, orig, True, rows,
                         etmp, bufs)
            return ecs[ti], _tile_c_rows(pcs, rows)

        for ti, (ec_t, cr) in enumerate(
                run_tiles(_dr_job, len(bounds), tile_workers)):
            ecs[ti] = ec_t
            _merge_c_rows(pcs, bounds[ti], cr)
    _smooth_pass(pcs, bs_luma)
    pkt = pack_tiles([ec.done() for ec in ecs])
    if not return_recon:
        return pkt
    return pkt, _crop(pcs, info)


def _to_spatial(pcs):
    """Batched per-size idct + grid postfilter into pc.c."""
    from .grid import idct_plane_grid, postfilter_plane_grid

    for pc in pcs:
        pg = pc.pg()
        c = idct_plane_grid(pc.d, pg)
        pc.c = postfilter_plane_grid(c, pg)


def _crop(pcs, info: FrameInfo):
    out = []
    for pc in pcs:
        pix = from_coeff(pc.c, False, pc.bitdepth)
        out.append(pix[:info.pic_height >> info.ydec[pc.pli],
                       :info.pic_width >> pc.xdec])
    return out


_DERING_JAX_FNS = {}


def _dering_jax_fn(h, w, xdec, is_luma):
    """Cached jit of the bit-exact jax dering for one plane shape
    (threshold is a traced arg so the quantizer never recompiles)."""
    key = (h, w, xdec, is_luma)
    fn = _DERING_JAX_FNS.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    from ..ops.dering import DERING_VERY_LARGE
    from ..ops.dering_jax import dering_padded_jax

    ln = 5 - xdec
    nvsb, nhsb = h >> ln, w >> ln

    def pad(frame):
        P = jnp.full((h + 6, w + 6), DERING_VERY_LARGE, dtype=jnp.int32)
        return P.at[3:3 + h, 3:3 + w].set(frame.astype(jnp.int32))

    if is_luma:
        def f(frame, thr):
            return dering_padded_jax(pad(frame), nhsb, nvsb, thr, 0, 0)
    else:
        def f(frame, thr, dirs):
            return dering_padded_jax(pad(frame), nhsb, nvsb, thr, xdec,
                                     1, dirs)[0]
    fn = jax.jit(f)
    _DERING_JAX_FNS[key] = fn
    return fn


def _dering_buffers(pcs, etmp, q):
    """Batched dering of every SB of every plane in one pass per plane.
    Returns per-plane (nvsb, nhsb, n, n) filtered buffers; the flag
    pass then just selects.

    On larger frames the bit-exact jax twin runs the whole filter as
    one fused jit on the host CPU backend (an order of magnitude over
    the numpy temporaries at 1080p); numpy remains the fallback and
    the oracle."""
    import os
    import sys

    nhsb, nvsb = pcs[0].nhsb, pcs[0].nvsb
    from ..ops.dering import _dering_lib, dering_frame

    # Preference order: native C++ (fastest, no platform concerns) via
    # dering_frame's internal dispatch; else the fused jax twin — only
    # when jax is already (or safely) initializable: the axon TPU
    # plugin hangs on lazy in-process platform selection, so plain host
    # runs opt in via DTPU_JAX_DERING=1 (the CLIs re-exec themselves
    # with the right env); else batched numpy.
    jax_ok = "jax" in sys.modules or os.environ.get("JAX_PLATFORMS")
    if not _dering_lib() and jax_ok and pcs[0].w * pcs[0].h >= 512 * 288:
        try:
            return _dering_buffers_jax(pcs, etmp, q)
        except Exception:
            pass

    bufs = []
    dirs = None
    for pli, pc in enumerate(pcs):
        buf, d = dering_frame(etmp[pli], nhsb, nvsb, q, pc.xdec, pli,
                              dirs=dirs)
        if pli == 0:
            dirs = d
        bufs.append(buf)
    return bufs


def _dering_buffers_jax(pcs, etmp, q):
    import jax

    thr = np.int32(np.power(float(q), 0.84182))
    cpu = jax.devices("cpu")[0]
    bufs = []
    dirs = None
    with jax.default_device(cpu):
        for pli, pc in enumerate(pcs):
            fn = _dering_jax_fn(pc.h, pc.w, pc.xdec, pli == 0)
            if pli == 0:
                buf, dirs = fn(np.asarray(etmp[pli], dtype=np.int32),
                               thr)
            else:
                buf = fn(np.asarray(etmp[pli], dtype=np.int32), thr,
                         dirs)
            bufs.append(np.asarray(buf))
    return bufs


def _dering_pass(ec, state, pcs, orig, encoder, rows=None, etmp=None,
                 bufs=None):
    """Per-32x32 dering with RDO flags (encode.c:2550-2686 /
    decode.c:1050-1121).  rows limits the flag coding to one tile's SB
    rows (flag context cut at the tile top); the filter itself always
    reads the frame-level pre-dering copy (precomputed batched in
    `bufs`), so tiles may run in any order."""
    from ..pvq.core import PVQ_LAMBDA

    nhsb = pcs[0].nhsb
    nvsb = pcs[0].nvsb
    row0, row1 = rows if rows is not None else (0, nvsb)
    flags = np.zeros((nvsb, nhsb), dtype=np.int32)
    if etmp is None:
        etmp = [pc.c.copy() for pc in pcs]
    q = max(1, pcs[0].quantizer)
    if bufs is None:
        bufs = _dering_buffers(pcs, etmp, q)
    for sby in range(row0, row1):
        for sbx in range(nhsb):
            up = int(flags[sby - 1, sbx]) if sby > row0 else 0
            left = int(flags[sby, sbx - 1]) if sbx > 0 else 0
            ctx = (up << 1) + left
            cdf = state.clpf_cdf[ctx]
            buf = bufs[0][sby, sbx]
            if encoder:
                y0, x0 = sby << 5, sbx << 5
                o = orig[0][y0:y0 + 32, x0:x0 + 32].astype(np.float64)
                cur = pcs[0].c[y0:y0 + 32, x0:x0 + 32].astype(np.float64)
                filt_err = float(((o - buf) ** 2).sum())
                unfilt_err = float(((o - cur) ** 2).sum())
                p1 = (int(cdf[1]) - int(cdf[0])) / int(cdf[1])
                p0 = int(cdf[0]) / int(cdf[1])
                filt = (filt_err + PVQ_LAMBDA * q * q * -np.log2(p1)
                        < unfilt_err + PVQ_LAMBDA * q * q * -np.log2(p0))
                filt = int(filt)
                encode_cdf_adapt(ec, filt, cdf, state.clpf_increment)
            else:
                _loc(ec, "dering:flag", 0, 3, sbx * 32, sby * 32)
                filt = decode_cdf_adapt(ec, cdf, state.clpf_increment)
            flags[sby, sbx] = filt
            if filt:
                y0, x0 = sby << 5, sbx << 5
                pcs[0].c[y0:y0 + 32, x0:x0 + 32] = buf
                for pli in range(1, len(pcs)):
                    pc = pcs[pli]
                    ln = 5 - pc.xdec
                    cy, cx = sby << ln, sbx << ln
                    pc.c[cy:cy + (1 << ln), cx:cx + (1 << ln)] = \
                        bufs[pli][sby, sbx]
    return flags


def decode_keyframe(packet: bytes, info: FrameInfo,
                    use_masking: bool = False, bs_luma: int = 1,
                    use_dering: bool = True, acct=None,
                    tile_workers: int = 1, out_info: dict = None,
                    dres: bool = False):
    """Decode a keyframe packet; returns list of uint8 planes.

    Each tile's symbol stream is decoded with its own RangeDecoder and
    AdaptState — no symbol context crosses a tile boundary, so
    tile_workers > 1 decodes the tiles in forked processes."""
    from .tiles import run_tiles, tile_rows, unpack_tiles

    if acct is not None:
        tile_workers = 1  # accounting accumulates in-process

    nplanes = info.nplanes
    streams = unpack_tiles(packet)
    bounds = tile_rows(info.frame_height >> 5, len(streams))
    streams = streams[:len(bounds)]  # corrupt ntiles: clamp

    def _mkdec(data, loc=None):
        if acct is not None:
            from ..entropy.accounting import AccountingDecoder
            d = AccountingDecoder(data, acct)
            if loc:
                acct.set_location(loc)
            return d
        return make_decoder(data)

    ecs = [_mkdec(s, "frame:header" if i == 0 else None)
           for i, s in enumerate(streams)]
    ec0 = ecs[0]
    pvq_qm = []
    for pli in range(nplanes):
        qm = np.zeros(QM_SIZE, dtype=np.int32)
        for i in range(QM_SIZE):
            qm[i] = ec0.decode_bits(8)
        pvq_qm.append(qm)
    cqs = [ec0.decode_uint(N_CODED_QUANTIZERS) for _ in range(nplanes)]
    quantizer = codedquantizer_to_quantizer(cqs[0])
    states = _tile_states(nplanes, quantizer, False, len(streams))
    for st in states:
        for pli in range(nplanes):
            st.pvq_qm_q4[pli] = pvq_qm[pli].copy()
    # Grid is derived from the decoded split symbols.
    grid = np.full((info.frame_height // 4, info.frame_width // 4), -1,
                   dtype=np.int8)
    pcs = []
    for pli in range(nplanes):
        pc = _PlaneCtx(info, pli, max(bs_luma, 0), quantizer, False)
        pc.grid = grid
        pc.d = np.zeros((pc.h, pc.w), dtype=np.int64)
        pcs.append(pc)
    if acct is None and not dres and _use_native_walk(ecs):
        from ..pvq import native_walk as _nw

        kp = _nw.KeyPlanes(pcs)
        for ti, rows in enumerate(bounds):
            _nw.walk_key(ecs[ti], states[ti], pcs, kp, rows,
                         pcs[0].nhsb, use_masking)
        kp.writeback(pcs)
    else:
        def _sb_job(ti):
            rows = bounds[ti]
            _code_frame(ecs[ti], states[ti], pcs, info, bs_luma,
                        use_masking, False, rows, dres)
            return (ecs[ti], states[ti], _tile_d_rows(pcs, rows),
                    _tile_grid_rows(grid, rows))

        for ti, (ec_t, st_t, dr, gr) in enumerate(
                run_tiles(_sb_job, len(bounds), tile_workers)):
            ecs[ti], states[ti] = ec_t, st_t
            _merge_d_rows(pcs, bounds[ti], dr)
            _merge_grid_rows(grid, bounds[ti], gr)
    _to_spatial(pcs)
    dflags = np.zeros((pcs[0].nvsb, pcs[0].nhsb), dtype=np.int32)
    if use_dering:
        etmp = [pc.c.copy() for pc in pcs]
        bufs = _dering_buffers(pcs, etmp, max(1, pcs[0].quantizer))

        def _dr_job(ti):
            rows = bounds[ti]
            fl = _dering_pass(ecs[ti], states[ti], pcs, None, False,
                              rows, etmp, bufs)
            return _tile_c_rows(pcs, rows), fl

        for ti, (cr, fl) in enumerate(
                run_tiles(_dr_job, len(bounds), tile_workers)):
            _merge_c_rows(pcs, bounds[ti], cr)
            r0, r1 = bounds[ti]
            dflags[r0:r1] = fl[r0:r1]
    _smooth_pass(pcs, bs_luma)
    if out_info is not None:
        out_info.update(bsize=grid.copy(), dering=dflags,
                        quantizer=quantizer)
    return _crop(pcs, info)


def _smooth_pass(pcs, bs_luma):
    """Keyframe bilinear smoothing of 32x32 leaves — deterministic from
    the quantizer and the (decoded) bsize grid, applied identically by
    encoder and decoder (od_smooth_recursive, filter.c:2010)."""
    from ..ops.smooth import smooth_frame

    for pc in pcs:
        if pc.quantizer <= 0:
            continue
        # 32x32-leaf mask from the grid (min_bs, encode.c:2694-2698).
        mask = pc.grid[::8, ::8] == 3
        if not mask.any():
            continue
        pc.c = smooth_frame(pc.c, pc.quantizer, pc.pli, 32 >> pc.xdec,
                            leaf_mask=mask)


def _code_frame(ec, state, pcs, info, bs_luma, use_masking, encoder,
                rows=None, dres=False):
    """Sequential symbol pass over SB rows [rows[0], rows[1]) — one tile.
    With rows=None, the whole frame is a single tile."""
    nhsb = pcs[0].nhsb
    nvsb = pcs[0].nvsb
    row0, row1 = rows if rows is not None else (0, nvsb)
    for pc in pcs:
        pc.tile_y0 = row0 << (5 - pc.xdec)
    for sby in range(row0, row1):
        for sbx in range(nhsb):
            for pli in range(len(pcs)):
                pc = pcs[pli]
                has_ur = sby > row0 and sbx < nhsb - 1
                hgrad, vgrad = _sb_dc_code(ec, state, pc, sbx, sby, has_ur,
                                           encoder, row0)
                luma_d = pcs[0].d if pli > 0 else None
                _code_recursive(ec, state, pc, luma_d, sbx, sby, 3,
                                use_masking, hgrad, vgrad, encoder,
                                dres)


def _to_blocks(plane: np.ndarray, n: int) -> np.ndarray:
    h, w = plane.shape
    return (plane.reshape(h // n, n, w // n, n)
            .transpose(0, 2, 1, 3).reshape(-1, n, n))


def _from_blocks(blocks: np.ndarray, shape, n: int) -> np.ndarray:
    h, w = shape
    return (blocks.reshape(h // n, w // n, n, n)
            .transpose(0, 2, 1, 3).reshape(h, w))
