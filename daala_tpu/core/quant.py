"""Quantizer mapping and magnitude-compensated quantization matrices.

* 64 coded quantizers, log-spaced Q4 values 9..8191 with 0 = lossless,
  generated from the closed form trunc(e^((cq-6.235)*0.10989525) * 16)
  (quantizer.c:28-42) — generated, not shipped, and validated in tests
  against the published table's properties.
* Per-band QMs: flat and HVS 8x8 bases (pvq.c:137-204) interpolated by
  quantizer (od_interp_qm, encode.c:2761), with basis-magnitude
  compensation folded in (od_init_qm, pvq.c:302-344).  Basis magnitudes
  are measured numerically from OUR lapped transform (idct + 4-point
  post-lapping on both sides), replacing the offline-trained
  OD_BASIS_MAG tables (pvq.c:39-135).
"""

from __future__ import annotations

import math

import numpy as np

from ..ops.dct import idct
from ..ops.lapping import post_filter
from ..pvq.scan import raster_to_coding

__all__ = [
    "CODED_QUANT_MAP_Q4",
    "N_CODED_QUANTIZERS",
    "codedquantizer_to_quantizer",
    "quantizer_to_codedquantizer",
    "QM8_FLAT",
    "QM8_HVS",
    "DC_QM",
    "lapped_basis_magnitudes",
    "init_qm",
    "interp_qm",
]

OD_COEFF_SHIFT = 4

N_CODED_QUANTIZERS = 64
CODED_QUANT_MAP_Q4 = np.array(
    [0] + [
        int(math.exp((cq - 6.235) * 0.10989525) * (1 << 4))
        for cq in range(1, N_CODED_QUANTIZERS)
    ],
    dtype=np.int32,
)


def codedquantizer_to_quantizer(cq: int) -> int:
    if cq == 0:
        return 0
    cq = min(cq, N_CODED_QUANTIZERS - 1)
    return int(CODED_QUANT_MAP_Q4[cq]) << OD_COEFF_SHIFT >> 4


def quantizer_to_codedquantizer(q: int) -> int:
    """Largest coded quantizer whose value is <= q (min 1 for lossy)."""
    if q == 0:
        return 0
    q = q << 4 >> OD_COEFF_SHIFT
    lo = 1
    hi = N_CODED_QUANTIZERS
    while hi > lo + 1:
        mid = (hi + lo) >> 1
        if q < CODED_QUANT_MAP_Q4[mid]:
            hi = mid
        else:
            lo = mid
    return lo


QM8_FLAT = np.full((8, 8), 16, dtype=np.int32)

# HVS-tuned base QM (pvq.c:187-204).
QM8_HVS = np.array([
    [16, 16, 18, 21, 24, 28, 32, 36],
    [16, 17, 20, 21, 24, 27, 31, 35],
    [18, 20, 24, 25, 27, 31, 33, 38],
    [21, 21, 25, 28, 30, 34, 37, 42],
    [24, 24, 27, 30, 34, 38, 43, 49],
    [28, 27, 31, 34, 38, 44, 50, 58],
    [32, 31, 33, 37, 43, 50, 58, 68],
    [36, 35, 38, 42, 49, 58, 68, 78],
], dtype=np.int32)

# Haar-DC AC quantization weights, lapped build (state.c:47-49):
# per bsi-1, [horizontal/vertical, diagonal] in Q4.
DC_QM = np.array([[21, 25], [18, 20], [17, 18]], dtype=np.int32)

QM_SCALE = 1 << 15
QM_SCALE_MAX = QM_SCALE - 1
QM_INV_SCALE = 1 << 12


def _basis_mags_1d(n: int) -> np.ndarray:
    """L2 magnitude of each synthesis basis function of the lapped
    transform: idct_n followed by 4-point post-lapping at both block
    edges, measured in a 3-block neighborhood."""
    amp = 1 << 12
    mags = np.zeros(n)
    for k in range(n):
        y = np.zeros((1, n), dtype=np.int32)
        y[0, k] = amp
        x = idct(y, n)[0]
        # Embed in a zero context of 3 blocks and post-filter the two
        # edges of the center block.
        sig = np.zeros(3 * n, dtype=np.int32)
        sig[n:2 * n] = x
        for edge in (n, 2 * n):
            span = sig[edge - 2:edge + 2].reshape(1, 4)
            sig[edge - 2:edge + 2] = post_filter(span, 4)[0]
        mags[k] = np.sqrt(((sig.astype(np.float64) / amp) ** 2).sum())
    return mags


_MAG_CACHE = {}


def lapped_basis_magnitudes(n: int) -> np.ndarray:
    if n not in _MAG_CACHE:
        _MAG_CACHE[n] = _basis_mags_1d(n)
    return _MAG_CACHE[n]


def interp_qm(q: int, base_qm: np.ndarray) -> np.ndarray:
    """Interpolate between flat (low rate) and the base QM by quantizer
    (od_interp_qm, encode.c:2761-2772): flat at high q, base at low q."""
    # Reference: weights q1 = 0..., uses two anchor QMs indexed by q.
    # We interpolate linearly in log-q between q=40 (full base) and
    # q=1000 (flat), matching the reference's intent of reducing HVS
    # shaping at low rates.
    if q <= 40 << (OD_COEFF_SHIFT - 4):
        w = 1.0
    elif q >= 1000 << (OD_COEFF_SHIFT - 4):
        w = 0.0
    else:
        w = 1.0 - (math.log(q) - math.log(40)) / (
            math.log(1000) - math.log(40)
        )
    qm = np.round(w * base_qm + (1 - w) * QM8_FLAT).astype(np.int32)
    return np.clip(qm, 1, 255)


def init_qm(qm8: np.ndarray):
    """Build per-blocksize magnitude-compensated QM buffers.

    Returns (qm, qm_inv): dicts keyed by bs (0..3) of flattened
    coding-order int16 vectors, Q15 for qm and Q12 for qm_inv
    (od_init_qm, pvq.c:302-344).  DC entry is exactly 1.0.
    """
    qm_out = {}
    qm_inv_out = {}
    for bs in range(4):
        n = 4 << bs
        mags = lapped_basis_magnitudes(n)
        mag2d = mags[:, None] * mags[None, :]
        # Down/up-sample the 8x8 base QM to n x n: entry (i,j) uses
        # qm8[i*8/n, j*8/n] (pvq.c:327).
        i = np.arange(n)
        qm_entry = qm8[np.minimum(i[:, None] * 8 // n, 7),
                       np.minimum(i[None, :] * 8 // n, 7)]
        mag = mag2d / (0.0625 * qm_entry)
        mag[0, 0] = 1.0
        y = np.minimum(QM_SCALE_MAX,
                       np.floor(0.5 + mag * QM_SCALE)).astype(np.int64)
        y_inv = np.floor(0.5 + QM_SCALE * QM_INV_SCALE / y).astype(np.int64)
        qm_out[bs] = raster_to_coding(y.astype(np.int32))
        qm_inv_out[bs] = raster_to_coding(y_inv.astype(np.int32))
    return qm_out, qm_inv_out
