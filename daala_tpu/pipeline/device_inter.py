"""Device (TPU) inter-frame encode compute: a whole GOP chunk per
dispatch.

The encoder's per-frame compute — dense hierarchical motion search,
per-SB subdivision-level RDO, mixed-level OBMC prediction, lapped
residual transform, fast-mode PVQ quantization, reconstruction and the
directional dering filter — expressed as ONE jitted lax.scan over a
chunk of frames, with the reconstructed reference carried on device
between iterations.  No host round trips inside the chunk: frames go
up once, compact decision tensors (MV grids, levels, symbol stats)
come back once.  That shape is what amortizes any host<->device link
(including the high-latency tunneled platform this repo develops on)
and is the deployment design for real chips: device computes chunk
N+1 while the host range-codes chunk N's symbols
(SURVEY.md section 2.11 pipeline-parallel row).

Reference anchors: od_predict_frame (encode.c:2205) for the stage
order, od_mv_est (mcenc.c:6390) for the search role (redesigned
batched — see search/me_jax.py), od_mc_predict (mc.c:2006) for OBMC,
od_pvq_encode (pvq_encoder.c:645) for the fast-mode quantizer role,
od_dering (filter.c:1835) for the in-loop filter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dct import fdct2d, idct2d
from ..ops.mc_jax import obmc_predict_jax
from ..pvq.device_search import pvq_quantize_frame
from ..search.me_jax import motion_search_dense_jax, pad_edge
from .device import _from_blocks, _lap_h_idx, _to_blocks, lap_cols, lap_rows

__all__ = ["inter_chunk", "make_inter_chunk"]

PAD = 80  # reference padding: 60 px search range + subpel apron


def _fwd(c, bs):
    """Lapped forward transform, no Haar-DC tree (inter frames code DC
    as a plain delta)."""
    n = 4 << bs
    h, w = c.shape[-2], c.shape[-1]
    c = lap_rows(c, _lap_h_idx(h, n))
    c = lap_cols(c, _lap_h_idx(w, n))
    return _from_blocks(fdct2d(_to_blocks(c, n), n), h, w, n)


def _inv(d, bs):
    n = 4 << bs
    h, w = d.shape[-2], d.shape[-1]
    c = _from_blocks(idct2d(_to_blocks(d, n), n), h, w, n)
    c = lap_cols(c, _lap_h_idx(w, n), inverse=True)
    return lap_rows(c, _lap_h_idx(h, n), inverse=True)


def _coarse64_jax(grid):
    """32 px-lattice mesh interpolated from the 64 px lattice (twin of
    search/mesh._coarse64_lattice, single-ref)."""
    g8 = grid[::8, ::8]
    ny, nx = g8.shape[:2]
    uy, ux = 2 * ny - 1, 2 * nx - 1
    u = jnp.zeros((uy, ux, 2), dtype=jnp.int32)
    u = u.at[::2, ::2].set(g8)
    u = u.at[::2, 1::2].set((g8[:, :-1] + g8[:, 1:]) >> 1)
    u = u.at[1::2, ::2].set((g8[:-1] + g8[1:]) >> 1)
    u = u.at[1::2, 1::2].set((g8[:-1, :-1] + g8[:-1, 1:]
                              + g8[1:, :-1] + g8[1:, 1:]) >> 2)
    g4t = grid[::4, ::4]
    nvy4, nvx4 = g4t.shape[:2]
    out = jnp.zeros((nvy4, nvx4, 2), dtype=jnp.int32)
    my, mx = min(uy, nvy4), min(ux, nvx4)
    out = out.at[:my, :mx].set(u[:my, :mx])
    if uy < nvy4:
        out = out.at[uy:].set(jnp.broadcast_to(out[uy - 1][None],
                                               (nvy4 - uy, nvx4, 2)))
    if ux < nvx4:
        out = out.at[:, ux:].set(jnp.broadcast_to(
            out[:, ux - 1][:, None], (nvy4, nvx4 - ux, 2)))
    return out


def _level_preds(refp, h, w, grid, fine_log):
    """The four per-level whole-frame OBMC candidates (levels 0..2 +
    coarse64, which blends with level-0 geometry)."""
    preds = []
    for lv in range(3):
        stride = 4 >> lv
        preds.append(obmc_predict_jax(
            [refp], PAD, h, w, grid[::stride, ::stride],
            fine_log + 2 - lv))
    preds.append(obmc_predict_jax([refp], PAD, h, w, _coarse64_jax(grid),
                                  fine_log + 2))
    return preds


def _choose_levels(cur, preds, quantizer):
    """Per-SB subdivision RDO (twin of mesh.choose_levels costs)."""
    h, w = cur.shape
    nsby, nsbx = h >> 5, w >> 5
    c32 = cur.astype(jnp.int32)
    sses = []
    for p in preds:
        e = c32 - p.astype(jnp.int32)
        sses.append((e * e).reshape(nsby, 32, nsbx, 32).sum((1, 3)))
    sse = jnp.stack(sses).astype(jnp.float32)
    lam = min(40.0 * (max(1, quantizer) / 16.0) ** 2, 15000.0)
    bits = np.array([1, 4, 16, 0.3], dtype=np.float32) * 7.0 + 1.6
    cost = sse + (lam * bits)[:, None, None]
    return jnp.argmin(cost, axis=0).astype(jnp.int32)   # (nsby, nsbx)


def _select_by_sb(preds, levels, sb):
    """Per-SB selection among the stacked level predictions."""
    lv_px = jnp.repeat(jnp.repeat(levels, sb, 0), sb, 1)
    stack = jnp.stack(preds)
    return jnp.take_along_axis(stack, lv_px[None], axis=0)[0]


def _plane_code(cur_u8, pred_u8, bs, quantizer, qm, qm_inv, dering):
    """Residual-domain coding of one plane: lapped transform of input
    and prediction, fast-mode PVQ of the coefficient residual, DC
    deadzone delta, reconstruction [+ dering].  Returns
    (recon uint8, pulse count, gain sum)."""
    c = (cur_u8.astype(jnp.int32) - 128) << 4
    p = (pred_u8.astype(jnp.int32) - 128) << 4
    dc_ = _fwd(c, bs)
    dp = _fwd(p, bs)
    dq, ksum, qgsum = pvq_quantize_frame(dc_ - dp, bs, quantizer, qm,
                                         qm_inv, max(1, quantizer))
    rec = _inv(dp + dq, bs)
    if dering:
        from ..ops.dering_jax import dering_frame_jax

        h, w = rec.shape
        bufs, _ = dering_frame_jax(rec, w // 32, h // 32,
                                   max(1, quantizer), 0, 0)
        rec = bufs.transpose(0, 2, 1, 3).reshape(h, w)
    rec8 = jnp.clip(((rec + 8) >> 4) + 128, 0, 255).astype(jnp.uint8)
    return rec8, ksum, qgsum


def _frame_body(carry, xs, h, w, quantizer, qms, qm_invs, dering):
    """One P frame: ME -> level RDO -> OBMC -> residual code, for all
    three 4:2:0 planes, recon carried as the next reference."""
    ry, ru, rv = carry
    cy, cu, cv = xs
    hc, wc = h // 2, w // 2
    # ME wants a 64-px apron: the 80-px carry pad contains it.
    grid = motion_search_dense_jax(cy, ry[16:16 + h + 128,
                                         16:16 + w + 128], h, w)
    preds_y = _level_preds(ry, h, w, grid, 3)
    levels = _choose_levels(cy, preds_y, quantizer)
    pred_y = _select_by_sb(preds_y, levels, 32)
    gc = grid >> 1
    preds_u = _level_preds(ru, hc, wc, gc, 2)
    preds_v = _level_preds(rv, hc, wc, gc, 2)
    pred_u = _select_by_sb(preds_u, levels, 16)
    pred_v = _select_by_sb(preds_v, levels, 16)
    rec_y, k0, g0 = _plane_code(cy, pred_y, 1, quantizer, qms[1],
                                qm_invs[1], dering)
    rec_u, k1, g1 = _plane_code(cu, pred_u, 1, quantizer, qms[1],
                                qm_invs[1], False)
    rec_v, k2, g2 = _plane_code(cv, pred_v, 1, quantizer, qms[1],
                                qm_invs[1], False)
    carry = (pad_edge(rec_y, PAD), pad_edge(rec_u, PAD),
             pad_edge(rec_v, PAD))
    check = (jnp.sum(rec_y.astype(jnp.int32)) & 0xffff) \
        + (jnp.sum(rec_u.astype(jnp.int32)) & 0xffff) \
        + (jnp.sum(rec_v.astype(jnp.int32)) & 0xffff)
    outs = (grid, levels, k0 + k1 + k2, g0 + g1 + g2, check)
    return carry, outs


def make_inter_chunk(h, w, quantizer, qm, qm_inv, dering=True):
    """Jit the chunked inter encode step for one frame geometry.

    Returns fn(ys (T,h,w) u8, us, vs, ref_y (h+160,w+160) u8, ref_u,
    ref_v) -> (grids, levels, ksum, qgsum, checks) — each leading dim
    T.  The reconstruction chain is carried on device; only compact
    decision tensors return to the host."""
    qms = tuple(jnp.asarray(qm[bs], dtype=jnp.int32) for bs in range(4))
    qmis = tuple(jnp.asarray(qm_inv[bs], dtype=jnp.int32)
                 for bs in range(4))
    body = partial(_frame_body, h=h, w=w, quantizer=int(quantizer),
                   qms=qms, qm_invs=qmis, dering=dering)

    @jax.jit
    def fn(ys, us, vs, ref_y, ref_u, ref_v):
        carry0 = (ref_y, ref_u, ref_v)
        _, outs = jax.lax.scan(body, carry0, (ys, us, vs))
        return outs

    return fn


def inter_chunk(frames, ref0, quantizer, qm, qm_inv, dering=True):
    """Convenience host wrapper: frames = (ys, us, vs) uint8 stacks,
    ref0 = (y, u, v) unpadded reference planes."""
    ys, us, vs = frames
    h, w = ys.shape[-2:]
    fn = make_inter_chunk(h, w, quantizer, qm, qm_inv, dering)
    ry = jnp.pad(jnp.asarray(ref0[0]), PAD, mode="edge")
    ru = jnp.pad(jnp.asarray(ref0[1]), PAD, mode="edge")
    rv = jnp.pad(jnp.asarray(ref0[2]), PAD, mode="edge")
    return fn(jnp.asarray(ys), jnp.asarray(us), jnp.asarray(vs),
              ry, ru, rv)
