"""Probability-model tables for the entropy layer.

The exponential-decay (Laplace tail) CDF tables are generated at import
time from the same closed-form model the reference's offline generator
uses (/root/reference/tools/gen_laplace_tables.c: 128 decay entries at
shift 7): for decay index i, the per-symbol pmf is the geometric
distribution with ratio r = i/128 truncated to 16 symbols, quantized to
Q15 with a minimum probability of 1 and the residual folded into the
mode.  LAPLACE_OFFSET[i] = floor(32768 * p0 * (1 - sqrt(r)/(1+sqrt(r)))).

Generating (rather than shipping) the tables keeps encoder and decoder
trivially consistent and lets us retune the model later.
"""

from __future__ import annotations

import numpy as np

__all__ = ["EXP_CDF_TABLE", "LAPLACE_OFFSET", "laplace_decay_cdfs"]


def laplace_decay_cdfs(n: int = 128, shift: int = 7):
    """Build (EXP_CDF_TABLE[n,16], LAPLACE_OFFSET[n]) as int32 arrays."""
    cdfs = np.zeros((n, 16), dtype=np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    # Row 0: degenerate distribution; all mass on symbol 0 with the
    # minimum-probability floor on the tail.
    cdfs[0] = 32768 - 15 + np.arange(16)
    offsets[0] = 0
    for i in range(1, n):
        r = i / float(1 << shift)
        p = np.empty(16)
        p[0] = 1.0 - r
        for j in range(1, 15):
            p[j] = (1.0 - r) * r**j
        p[15] = r**15
        sr = np.sqrt(r)
        offsets[i] = int(32768.0 * (p[0] - p[0] * sr / (1.0 + sr)))
        pi = np.floor(0.5 + 32768.0 * p).astype(np.int64)
        pi = np.maximum(pi, 1)
        # Fold the quantization residual into the mode so the pmf sums to
        # exactly 32768.
        pi[np.argmax(p)] += 32768 - pi.sum()
        cdfs[i] = np.cumsum(pi)
    return cdfs.astype(np.int32), offsets.astype(np.int32)


EXP_CDF_TABLE, LAPLACE_OFFSET = laplace_decay_cdfs()
