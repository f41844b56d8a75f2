"""Device (jax) PVQ gain/shape quantization — the fast (non-RDO)
coding mode, batched over every band of every block of a frame.

This is the TPU analogue of the per-band scalar PVQ loop
(od_pvq_encode, pvq_encoder.c:645, at low complexity): gain rounding,
K from the companded gain, greedy pulse allocation, and synthesis —
vectorized so the whole frame's PVQ quantization is a handful of fused
XLA ops per band size.  Encoder-side choices only: whatever this
returns, the host symbol pass codes and the decoder reconstructs
decoder-identically, so float behavior here affects RD, not
correctness.  beta=1 (no activity masking) and the noref path (the
fast mode codes without a predictor reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core import QM_INV_SCALE_1, QM_SCALE_1
from .scan import BAND_OFFSETS, _FLAT

__all__ = ["pvq_quantize_frame", "pvq_symbols_frame"]


def _pulse_alloc(absx, k):
    """K-pulse allocation by proportional fill + largest-remainder
    top-up — a one-shot, loop-free approximation of the greedy
    pvq_search (within ~0.1 dB at normal rates, and the whole frame's
    allocation is one ranked rounding instead of K serial scatters).

    absx: (B, n) float32 magnitudes; k: (B,) int32 pulse budgets.
    Returns y: (B, n) float32 with y.sum(-1) == k."""
    l1 = absx.sum(-1, keepdims=True)
    kf = k.astype(jnp.float32)[:, None]
    prop = kf * absx / jnp.maximum(l1, 1e-9)
    # All-zero bands: park the budget on coefficient 0.
    prop = jnp.where(l1 > 0, prop,
                     jnp.zeros_like(prop).at[:, 0].set(kf[:, 0]))
    y = jnp.floor(prop)
    left = k.astype(jnp.int32) - y.sum(-1).astype(jnp.int32)
    frac = prop - y
    # Give the remaining pulses to the largest fractional parts.
    order = jnp.argsort(-frac, axis=-1)
    rank = jnp.argsort(order, axis=-1)
    y = y + (rank < left[:, None]).astype(y.dtype)
    return y


def _band_quant(vec, q0, qm, qm_inv):
    """Fast-mode PVQ of one band across all blocks.

    vec: (B, n) int32 coding-order coeffs; qm/qm_inv: (n,) Q15/Q12.
    Returns (dequantized coeffs (B, n) int32, qg (B,), k (B,))."""
    n = vec.shape[-1]
    xq = vec.astype(jnp.float32) * (qm.astype(jnp.float32)
                                    * np.float32(QM_SCALE_1))
    g = jnp.sqrt((xq * xq).sum(-1))
    cg = g / q0                                  # beta == 1
    qg = jnp.round(cg).astype(jnp.int32)
    # K from the quantized gain (od_pvq_compute_k noref, beta = 1).
    kf = jnp.floor(0.5 + (qg.astype(jnp.float32) - 0.2)
                   * np.float32(np.sqrt((n + 3) // 2)))
    k = jnp.where(qg > 0, jnp.maximum(1, kf.astype(jnp.int32)), 0)
    if n == 15:
        k = jnp.where((qg == 1), 1, k)
    y = _pulse_alloc(jnp.abs(xq), k)
    yy = (y * y).sum(-1, keepdims=True)
    ghat = qg.astype(jnp.float32) * q0
    scale = jnp.where(yy > 0, ghat[:, None] / jnp.sqrt(
        jnp.maximum(yy, 1e-9)), 0.0)
    x = jnp.sign(vec.astype(jnp.float32)) * y * scale
    out = jnp.floor(0.5 + x * (qm_inv.astype(jnp.float32)
                               * np.float32(QM_INV_SCALE_1)))
    return out.astype(jnp.int32), qg, k


def _icompute_k_jax(n, qg):
    """Integer k rule (isynth.icompute_k, noref) — the decoder derives
    k from qg with this exact rule in the dres stream mode."""
    # C integer division (reference od_pvq_compute_k semantics).
    slope = int(round(np.sqrt((n + 3) // 2) * 65536))
    k = (qg.astype(jnp.int64) * slope - slope // 5 + (1 << 15)) >> 16
    return jnp.where(qg <= 0, 0, jnp.maximum(1, k)).astype(jnp.int32)


def _pulse_search_jax(absx, k, g2, lam):
    """Batched greedy pulse search — jax twin of native dtpu_pvq_search
    (the pvq_search_rdo_double role, pvq_encoder.c:121-310): floor
    proportional fill for k > 2, cos-maximizing greedy pulses, then the
    final 1 + k/4 pulses placed with the position-rate RDO step
    (lam/g2-scaled linear position penalty).  The remaining-pulse count
    after the floor fill is < n, so the loop is bounded by n with
    per-band active masking.

    absx: (B, n) f32 magnitudes; k: (B,) int32; g2: (B,) f32 gain
    product for the lambda normalization.  Returns (y (B, n) f32
    nonneg pulses, cos_dist (B,) f32)."""
    B, n = absx.shape
    # Band reductions accumulate in f64 and cast back to f32: a fresh
    # XLA compile may reassociate f32 sums (fusion-dependent), and the
    # last-bit differences flipped pulse/gain near-ties run to run
    # ACROSS recompiles (round-4 weak #4's residual source — within
    # one binary everything was already bit-stable).  The f64
    # accumulation makes the f32 castback order-independent for any
    # realistic band.
    sum64 = lambda x: x.astype(jnp.float64).sum(-1).astype(jnp.float32)
    xx = sum64(absx * absx)
    norm_1 = 1.0 / jnp.sqrt(1e-30 + xx)
    lamb = lam / (1e-30 + g2)
    kf = k.astype(jnp.float32)
    l1 = sum64(absx)[:, None]
    y0 = jnp.where((k > 2)[:, None],
                   jnp.floor(kf[:, None] * absx
                             / jnp.maximum(l1, np.float32(1e-30))),
                   jnp.float32(0.0))
    xy0 = sum64(absx * y0)
    yy0 = sum64(y0 * y0)
    i0 = y0.sum(-1)
    rdo_p = (1 + k // 4).astype(jnp.float32)
    pos = jnp.arange(n, dtype=jnp.float32)[None, :]
    dr = np.float32(3.0 / n)

    def cond(c):
        _, _, _, i, t = c
        return (t < n) & jnp.any(i < kf)

    def step(c):
        y, xy, yy, i, t = c
        active = i < kf
        in_rdo = (kf - i) <= rdo_p
        txy = xy[:, None] + absx
        tyy = yy[:, None] + 2.0 * y + 1.0
        s1 = (txy * txy) / tyy
        s2 = (2.0 * txy * norm_1[:, None] / jnp.sqrt(tyy)
              - lamb[:, None] * pos * dr)
        score = jnp.where(in_rdo[:, None], s2, s1)
        pick = jnp.argmax(score, axis=-1)
        oh = (jnp.arange(n)[None, :] == pick[:, None])
        ohm = oh & active[:, None]
        y = y + ohm.astype(jnp.float32)
        xy = xy + jnp.where(active, (absx * oh).sum(-1), 0.0)
        yy = yy + jnp.where(active, 2.0 * (y * oh).sum(-1) - 1.0, 0.0)
        return (y, xy, yy, i + active.astype(jnp.float32), t + 1)

    y, xy, yy, _, _ = jax.lax.while_loop(
        cond, step, (y0, xy0, yy0, i0, jnp.int32(0)))
    cos = xy / (np.float32(1e-30) + jnp.sqrt(xx * yy))
    return y, cos


def _band_symbols(vec, q0, qm, qm_inv, rdo=True):
    """Stream-valid device PVQ of one band across all blocks: float
    gain/pulse search (encoder choices), then the INTEGER k rule and
    INTEGER synthesis (pvq/isynth.py) so the reconstruction is the
    same int32s the dres-mode decoder computes.

    rdo: mirror the host native noref search (dtpu_pvq_theta's
    n<=128 noref loop): gain candidates {0, max(1, floor(cg)),
    ceil(cg)} each evaluated with the REAL greedy RDO pulse search
    (_pulse_search_jax) under the companded-domain cost (1.4
    gain-weight distortion + analytic codeword rate at PVQ_LAMBDA,
    ties prefer the later/nonzero candidate exactly like the C++
    `cost <= best_cost`).

    vec: (B, n) int32 coding-order residual coeffs.
    Returns (dequantized (B, n) int32, qg (B,) int32, y (B, n) int32
    signed pulses, skip_diff (B,) f32 = skip_dist - best_dist, the
    walk's block-skip RDO input)."""
    from .core import PVQ_LAMBDA
    from .isynth import isynthesis_noref_jax

    n = vec.shape[-1]
    xq = vec.astype(jnp.float32) * (qm.astype(jnp.float32)
                                    * np.float32(QM_SCALE_1))
    absx = jnp.abs(xq)
    # f64-accumulated gain sum: compile-invariant decisions (see
    # _pulse_search_jax).
    g = jnp.sqrt((xq * xq).astype(jnp.float64).sum(-1)
                 ).astype(jnp.float32)
    cg = g / q0
    gw = np.float32(1.4)
    lam = np.float32(PVQ_LAMBDA)
    ratec = np.float32(np.log(2.0 * n))
    skip_dist = gw * cg * cg
    if not rdo:
        qg = jnp.round(cg).astype(jnp.int32)
        k = _icompute_k_jax(n, qg)
        y = _pulse_alloc(absx, k)
        best_dist = skip_dist
    else:
        # Zero candidate: dist = gw*cg^2, rate 0 (the initial best of
        # the native search with a zero reference).
        best_cost = skip_dist
        best_dist = skip_dist
        qg = jnp.zeros_like(cg, dtype=jnp.int32)
        y = jnp.zeros_like(absx)
        ilo = jnp.maximum(jnp.floor(cg), 1.0).astype(jnp.int32)
        ihi = jnp.ceil(cg).astype(jnp.int32)
        for ci, cand in enumerate((ilo, ihi)):
            # ci == 1 re-evaluates only where ceil(cg) differs.
            live = (ihi > ilo) if ci else jnp.ones_like(cand,
                                                        dtype=bool)
            kc = _icompute_k_jax(n, cand)
            qcg = cand.astype(jnp.float32)
            yc, cos = _pulse_search_jax(absx, kc, qcg * cg, lam)
            dist = gw * (qcg - cg) ** 2 + qcg * cg * (2.0 - 2.0 * cos)
            rate = n * jnp.log2(1.0 + ratec
                                * kc.astype(jnp.float32) / n)
            cost = dist + lam * rate
            pick = (cost <= best_cost) & live
            best_cost = jnp.where(pick, cost, best_cost)
            best_dist = jnp.where(pick, dist, best_dist)
            qg = jnp.where(pick, cand, qg)
            y = jnp.where(pick[:, None], yc, y)
    ys = (jnp.sign(vec.astype(jnp.float32)) * y).astype(jnp.int32)
    # Park any pulses that landed on zero coefficients as positive.
    ys = jnp.where((ys == 0) & (y > 0), y.astype(jnp.int32), ys)
    qg = qg.astype(jnp.int32)
    out = isynthesis_noref_jax(ys, qg, int(q0), qm_inv)
    return out, qg, ys, skip_dist - best_dist


def pvq_symbols_frame(d, bs: int, quantizer: int, qm_coding,
                      qm_inv_coding, pvq_qm_q4):
    """Stream-valid PVQ quantization of every block of a residual plane
    (uniform block size 4 << bs, dres noref mode).

    d: (h, w) int32 transform-domain residual; pvq_qm_q4: the plane's
    per-band Q4 PVQ quant matrix (core.quant.interp_pvq_qm).  Returns
    (recon residual plane int32, dc_idx (B,) int32, qg (B, nbands)
    int32, y (B, clen) int32) with B = number of blocks in row-major
    order — exactly the per-leaf arrays the native symbol walk packs
    (pvq/native_walk.py walk_enc with plain-DC mode)."""
    from .scan import qm_get_index

    n = 4 << bs
    h, w = d.shape[-2], d.shape[-1]
    blocks = (d.reshape(*d.shape[:-2], h // n, n, w // n, n)
              .swapaxes(-3, -2)
              .reshape(-1, n * n))
    vec = blocks[:, _FLAT[n]]                    # coding order
    offs = BAND_OFFSETS[bs]
    nb = offs[0]
    clen = offs[1 + nb] - 1
    import os as _os

    from .core import PVQ_LAMBDA

    out_vec = jnp.zeros_like(vec)
    dc_quant = max(1, (int(quantizer)
                       * int(pvq_qm_q4[qm_get_index(bs, 0)])) >> 4)
    dc = vec[:, 0]
    # DC with the walk's RDO deadzone (rdo_quant_c role): the zero
    # threshold widens by the rate of the nonzero-DC skip variant
    # (approximated by a fixed delta0 — the host uses the live CDF).
    dz = float(_os.environ.get("DTPU_DC_DELTA0", "2.0"))
    thr = 128 + min(max(0, int(256 * PVQ_LAMBDA * dz / 2)), 128)
    dc_idx = (jnp.sign(dc)
              * ((jnp.abs(dc) + (dc_quant >> 1)) // dc_quant)
              ).astype(jnp.int32)
    dc_idx = jnp.where(jnp.abs(dc) < (dc_quant * thr) // 256, 0,
                       dc_idx)
    out_vec = out_vec.at[:, 0].set(dc_idx * dc_quant)
    qm = jnp.asarray(qm_coding, dtype=jnp.int32)
    qmi = jnp.asarray(qm_inv_coding, dtype=jnp.int32)
    qgs = []
    ys = []
    skips = []
    rates = []
    for b in range(nb):
        lo, hi = offs[1 + b], offs[2 + b]
        qb = max(1, (int(quantizer)
                     * int(pvq_qm_q4[qm_get_index(bs, b + 1)])) >> 4)
        deq, qg, ysgn, sdiff = _band_symbols(vec[:, lo:hi], qb,
                                             qm[lo:hi], qmi[lo:hi])
        out_vec = out_vec.at[:, lo:hi].set(deq)
        qgs.append(qg)
        ys.append(ysgn)
        skips.append(sdiff)
        nn = hi - lo
        kb = _icompute_k_jax(nn, qg)
        rates.append(jnp.where(
            kb > 0,
            nn * jnp.log2(1.0 + np.float32(np.log(2.0 * nn))
                          * kb.astype(jnp.float32) / nn)
            + np.float32(2.5),     # + gain symbol estimate
            np.float32(0.0)))
    # Whole-block skip RDO (the walk's skip_diff <= lambda/8 * tell
    # rule, native/ec.cpp:2047, with the analytic-rate tell estimate):
    # zeroing happens ON DEVICE so the carried reconstruction stays
    # decoder-identical — the pack then emits the cheap skip symbol.
    skip_sum = (jnp.stack(skips, -1).astype(jnp.float64).sum(-1)
                .astype(jnp.float32))
    sc = np.float32(_os.environ.get("DTPU_SKIP_BITS_SCALE", "1.0"))
    bits_est = (jnp.stack(rates, -1).astype(jnp.float64).sum(-1)
                .astype(jnp.float32) + np.float32(2.0)) * sc
    bskip = skip_sum <= np.float32(PVQ_LAMBDA) * bits_est
    # AC-skipped blocks re-decide DC under the pricier skip-symbol DC
    # rate (the walk's second rdo_quant_c with dcr2,
    # native/ec.cpp:1991) — a wider zero deadzone exactly where a
    # zero DC upgrades the skip symbol to the cheap all-skip variant.
    dz2 = float(_os.environ.get("DTPU_DC_DELTA0_SKIP", "3.0"))
    thr2 = 128 + min(max(0, int(256 * PVQ_LAMBDA * dz2 / 2)), 128)
    dc_skip = jnp.where(jnp.abs(dc) < (dc_quant * thr2) // 256, 0,
                        dc_idx)
    dc_idx = jnp.where(bskip, dc_skip, dc_idx)
    out_vec = jnp.where(bskip[:, None],
                        jnp.zeros_like(out_vec), out_vec)
    out_vec = out_vec.at[:, 0].set(dc_idx * dc_quant)
    qgs = [jnp.where(bskip, 0, qg) for qg in qgs]
    ys = [jnp.where(bskip[:, None], 0, yv) for yv in ys]
    # Start from ZERO, not the input block: at 32x32 the coding order
    # covers only the first 512 coefficients (the reference's band
    # cap) — the uncoded tail of the residual must reconstruct as 0
    # exactly like the decoder, not leak the raw residual through.
    out = jnp.zeros_like(blocks).at[:, _FLAT[n]].set(out_vec)
    out = (out.reshape(*d.shape[:-2], h // n, w // n, n, n)
           .swapaxes(-3, -2).reshape(d.shape))
    # Symbols travel the host link: int16 halves the transfer (gains
    # bounded by coeff-range/quantizer, pulses by k — both < 2^15).
    return (out, dc_idx, jnp.stack(qgs, axis=-1).astype(jnp.int16),
            jnp.concatenate(ys, axis=-1).astype(jnp.int16))


def pvq_quantize_frame(d, bs: int, quantizer: int, qm_coding,
                       qm_inv_coding, dc_quant: int):
    """PVQ-quantize every block of a transform-domain plane (uniform
    block size 4 << bs) in fast mode.  Returns (recon coeffs plane,
    total pulses, total qg) — the device share of the encode; the gain
    and pulse vectors become host-coded symbols."""
    n = 4 << bs
    h, w = d.shape[-2], d.shape[-1]
    blocks = (d.reshape(*d.shape[:-2], h // n, n, w // n, n)
              .swapaxes(-3, -2)
              .reshape(-1, n * n))
    vec = blocks[:, _FLAT[n]]                    # coding order
    offs = BAND_OFFSETS[bs]
    q0 = jnp.float32(max(1, quantizer))
    out_vec = jnp.zeros_like(vec)
    # DC: plain deadzone quantization at dc_quant.
    dc = vec[:, 0]
    qdc = jnp.sign(dc) * ((jnp.abs(dc) + (dc_quant >> 1)) // dc_quant)
    out_vec = out_vec.at[:, 0].set(qdc * dc_quant)
    ksum = jnp.int32(0)
    qgsum = jnp.int32(0)
    qm = jnp.asarray(qm_coding, dtype=jnp.int32)
    qmi = jnp.asarray(qm_inv_coding, dtype=jnp.int32)
    for b in range(offs[0]):
        lo, hi = offs[1 + b], offs[2 + b]
        deq, qg, k = _band_quant(vec[:, lo:hi], q0, qm[lo:hi],
                                 qmi[lo:hi])
        out_vec = out_vec.at[:, lo:hi].set(deq)
        ksum = ksum + k.sum()
        qgsum = qgsum + qg.sum()
    # Zero base: the 32x32 coding order covers only 512 coefficients.
    out = jnp.zeros_like(blocks).at[:, _FLAT[n]].set(out_vec)
    out = (out.reshape(*d.shape[:-2], h // n, w // n, n, n)
           .swapaxes(-3, -2).reshape(d.shape))
    return out, ksum, qgsum
