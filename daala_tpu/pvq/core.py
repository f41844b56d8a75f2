"""PVQ gain/shape math: companding, Householder, theta, K, synthesis.

Behavioral spec: /root/reference/src/pvq.c:364-586.  Float64 on host;
the batched device path mirrors these formulas in float32 (encoder and
decoder always use the same precision, which is all consistency needs).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "PVQ_LAMBDA",
    "MAX_PVQ_SIZE",
    "QM_SCALE_1",
    "QM_INV_SCALE_1",
    "compute_householder",
    "apply_householder",
    "gain_compand",
    "gain_expand",
    "compute_gain",
    "compute_max_theta",
    "compute_theta",
    "compute_k",
    "synthesis_partial",
    "SKIP_ZERO",
    "SKIP_COPY",
]

PVQ_LAMBDA = 0.147
MAX_PVQ_SIZE = 128
COMPAND_SCALE = 256 << 4          # 256 << OD_COEFF_SHIFT
COMPAND_SCALE_1 = 1.0 / COMPAND_SCALE
QM_SCALE_1 = 1.0 / ((1 << 15) - 1)
QM_INV_SCALE_1 = 1.0 / (1 << 12)

SKIP_ZERO = 1
SKIP_COPY = 2


def compute_householder(r: np.ndarray, gr: float):
    """Turn r (modified in place) into a reflection vector aligning the
    original r with +-e_m.  Returns (m, sign)."""
    m = int(np.argmax(np.abs(r)))
    s = 1 if r[m] > 0 else -1
    r[m] += gr * s
    return m, s


def apply_householder(x: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Reflect x through the hyperplane orthogonal to r (self-inverse)."""
    l2r = float(r @ r)
    proj = float(r @ x)
    return x - r * (2.0 * proj / (1e-100 + l2r))


def gain_compand(g: float, q0: int, beta: float) -> float:
    if beta == 1:
        return g / q0
    return COMPAND_SCALE * (g * COMPAND_SCALE_1) ** (1.0 / beta) / q0


def gain_expand(cg: float, q0: int, beta: float) -> float:
    if beta == 1:
        return cg * q0
    if beta == 1.5:
        cg *= q0 * COMPAND_SCALE_1
        return COMPAND_SCALE * cg * np.sqrt(cg)
    return COMPAND_SCALE * (cg * q0 * COMPAND_SCALE_1) ** beta


def compute_gain(x: np.ndarray, q0: int, beta: float, qm: np.ndarray):
    """Returns (companded gain, raw gain) of coding-order vector x with
    magnitude compensation qm (Q15)."""
    xq = x.astype(np.float64) * (qm.astype(np.float64) * QM_SCALE_1)
    g = float(np.sqrt((xq * xq).sum()))
    return gain_compand(g, q0, beta), g


def compute_max_theta(qcg: float, beta: float) -> int:
    ts = int(np.floor(0.5 + qcg * np.pi / (2 * beta)))
    return 1 if qcg < 1.4 else ts


def compute_theta(t: int, max_theta: int) -> float:
    if max_theta != 0:
        return min(t, max_theta - 1) * 0.5 * np.pi / max_theta
    return 0.0


def compute_k(qcg: float, itheta: int, theta: float, noref: bool, n: int,
              beta: float, nodesync: bool) -> int:
    if noref:
        if qcg == 0:
            return 0
        if n == 15 and qcg == 1 and beta > 1.25:
            return 1
        # (n + 3) / 2 etc. are C INTEGER divisions in the reference
        # (int operands, od_pvq_compute_k).
        return max(1, int(np.floor(
            0.5 + (qcg - 0.2) * np.sqrt((n + 3) // 2) / beta)))
    if itheta == 0:
        return 0
    if nodesync:
        return max(1, int(np.floor(0.5 + (itheta - 0.2)
                                   * np.sqrt((n + 2) // 2))))
    return max(1, int(np.floor(
        0.5 + (qcg * np.sin(theta) - 0.2) * np.sqrt((n + 2) // 2) / beta)))


def synthesis_partial(ypulse: np.ndarray, r: np.ndarray, n: int, noref: bool,
                      g: float, theta: float, m: int, s: int,
                      qm_inv: np.ndarray) -> np.ndarray:
    """Reconstruct the coefficient vector from the pulse codeword.

    ypulse has n entries when noref, n-1 otherwise (m-th dim excluded).
    """
    yy = float((ypulse.astype(np.int64) ** 2).sum())
    scale = 0.0 if yy == 0 else g / np.sqrt(yy)
    if noref:
        x = ypulse.astype(np.float64) * scale
    else:
        scale *= np.sin(theta)
        x = np.empty(n, dtype=np.float64)
        x[:m] = ypulse[:m] * scale
        x[m] = -s * g * np.cos(theta)
        x[m + 1:] = ypulse[m:] * scale
        x = apply_householder(x, r)
    return np.floor(0.5 + x * (qm_inv.astype(np.float64)
                               * QM_INV_SCALE_1)).astype(np.int32)
