"""Device (jax) directional dering — the TPU twin of ops/dering.py.

Same semantics as the batched numpy implementation (direction search
over 8 projection fields, 7-tap conditional directional filter +
orthogonal 4-tap pass, q^0.84182 thresholds with variance modulation),
expressed in jit-friendly int32 ops so the whole frame filters as one
fused XLA computation on device.  Bit-exact against dering_frame for
8-bit-range coefficients (tests/test_device.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .dering import (
    DERING_VERY_LARGE,
    DIR_OFFSETS,
    FILT_BORDER,
    THRESH_TABLE_Q8,
    _ONE_HOT,
)

__all__ = ["dering_frame_jax", "dering_padded_jax"]


def _ilog(x):
    """Elementwise integer bit length (OD_ILOG), exact."""
    x = x.astype(jnp.int32)
    out = jnp.zeros_like(x)
    y = x
    for sh in (16, 8, 4, 2, 1):
        m = y > ((1 << sh) - 1)
        out = out + m.astype(jnp.int32) * sh
        y = jnp.where(m, y >> sh, y)
    return out + (y > 0).astype(jnp.int32)


def _dir_find8_jax(blocks):
    """blocks: (N, 8, 8) int32 coeff-domain.  Returns (dirs, var)."""
    x = (blocks >> 4).reshape(-1, 64).astype(jnp.int32)
    # f32 MXU matmul: exact (one-hot weights, |x| <= 2^13 from 12-bit
    # coeff>>4, row sums <= 64*2^13 = 2^19 < 2^24) and ~MXU-speed;
    # the int32 einsum is emulated on TPU.
    one_hot = jnp.asarray(_ONE_HOT.reshape(8 * 15, 64).T,
                          dtype=jnp.float32)
    partial = jnp.dot(x.astype(jnp.float32), one_hot,
                      preferred_element_type=jnp.float32)
    partial = partial.astype(jnp.int32).reshape(-1, 8, 15)
    p = partial
    nblk = x.shape[0]
    cost = jnp.zeros((nblk, 8), dtype=jnp.int32)
    # dtype pinned: under x64 jnp.sum would promote to int64 and then
    # unsafely cast back on the scatter.
    cost = cost.at[:, 2].set((p[:, 2, :8] ** 2 >> 3)
                             .sum(axis=1, dtype=jnp.int32))
    cost = cost.at[:, 6].set((p[:, 6, :8] ** 2 >> 3)
                             .sum(axis=1, dtype=jnp.int32))
    for d in (0, 4):
        c = jnp.zeros(nblk, dtype=jnp.int32)
        for i in range(7):
            c = c + (p[:, d, i] ** 2) // (i + 1) \
                + (p[:, d, 14 - i] ** 2) // (i + 1)
        c = c + ((p[:, d, 7] * p[:, d, 7]) >> 3)
        cost = cost.at[:, d].set(c)
    for d in (1, 3, 5, 7):
        c = jnp.zeros(nblk, dtype=jnp.int32)
        for j in range(5):
            c = c + (p[:, d, 3 + j] ** 2 >> 3)
        for j in range(3):
            c = c + (p[:, d, j] ** 2) // (2 * j + 2) \
                + (p[:, d, 10 - j] ** 2) // (2 * j + 2)
        cost = cost.at[:, d].set(c)
    best = jnp.argmax(cost, axis=1)
    rows = jnp.arange(nblk)
    var = cost[rows, best] - cost[rows, (best + 4) & 7]
    return best.astype(jnp.int32), var


def _shift(padded, dy, dx, n):
    b = FILT_BORDER
    return padded[..., b + dy:b + dy + n, b + dx:b + dx + n]


def dering_frame_jax(frame, nhsb: int, nvsb: int, q: int, xdec: int,
                     pli: int, dirs=None, threshold_scale: float = 1.0):
    """Batched dering of every SB of a plane on device.

    frame: (h, w) int32 coeff-domain plane (pre-dering).  Returns
    (filtered (nvsb, nhsb, n, n) int32, dirs)."""
    b = FILT_BORDER
    h, w = frame.shape
    P = jnp.full((h + 2 * b, w + 2 * b), DERING_VERY_LARGE,
                 dtype=jnp.int32)
    P = P.at[b:b + h, b:b + w].set(frame.astype(jnp.int32))
    thr = np.int32(np.power(float(q), 0.84182) * threshold_scale)
    return dering_padded_jax(P, nhsb, nvsb, thr, xdec, pli, dirs)


def dering_padded_jax(P, nhsb: int, nvsb: int, q, xdec: int,
                      pli: int, dirs=None, threshold_scale: float = 1.0):
    """Dering from a pre-built padded plane (h + 6, w + 6) — the
    sharded path supplies real neighbor-tile halo rows instead of the
    VERY_LARGE frame border.  q may be a traced scalar (the q^0.84182
    threshold is computed with jnp so the jit does not specialize on
    the quantizer)."""
    ln = 5 - xdec
    n = 1 << ln
    bsize = 3 - xdec
    nb = n >> bsize
    b = FILT_BORDER
    # (nvsb*nhsb, n+6, n+6) overlapping SB windows.  Slice-gather, NOT
    # conv_general_dilated_patches: the float conv lowers to bf16
    # multiplies on TPU and silently corrupts coefficient values above
    # 2^8 — the decoder then reconstructs differently than the device
    # (caught by the on-chip encoder-check run, 2026-08).
    k = n + 2 * b
    # STATIC SB lattice: separable static slicing (row bands + column
    # slices) instead of a per-SB dynamic-slice loop (~10 ms/frame at
    # 1080p on a real chip, measured tools/parse_xplane.py).
    from .mc_jax import _static_windows

    padded = _static_windows(P, [sb * n for sb in range(nvsb)],
                             [sb * n for sb in range(nhsb)], k)
    padded = padded.reshape(-1, k, k).astype(jnp.int32)
    N = nvsb * nhsb
    # q may be the PRE-COMPUTED integer threshold (exact host float64
    # q^0.84182, passed traced so the jit never specializes on the
    # quantizer) — decoder and encoder must share the identical value.
    threshold = jnp.asarray(q, dtype=jnp.int32)
    if pli == 0:
        blocks = (padded[:, b:b + n, b:b + n]
                  .reshape(N, nb, 8, nb, 8).transpose(0, 1, 3, 2, 4)
                  .reshape(-1, 8, 8))
        d8, var = _dir_find8_jax(blocks)
        dirs = d8.reshape(N, nb, nb)
        var = var.reshape(N, nb, nb)
        varsum = var.sum(axis=(1, 2))
        v1 = jnp.minimum(32767, var >> 6)
        v2 = jnp.minimum(32767, varsum // (32 * 32))[:, None, None]
        idx = jnp.clip(_ilog(v1 * v2) - 9, 0, 17)
        table = jnp.asarray(THRESH_TABLE_Q8, dtype=jnp.int32)
        thresh = (threshold * table[idx]) >> 8
        out_dirs = dirs.reshape(nvsb, nhsb, nb, nb)
    else:
        assert dirs is not None
        ldirs = dirs.reshape(N, dirs.shape[-2], dirs.shape[-1])
        if ldirs.shape[1] != nb:
            ldirs = ldirs[:, :nb, :nb]
        dirs = ldirs
        thresh = jnp.full((N, nb, nb), threshold, dtype=jnp.int32)
        out_dirs = None
    rep = 1 << bsize
    dirs_grid = jnp.repeat(jnp.repeat(dirs, rep, 1), rep, 2)
    thresh_grid = jnp.repeat(jnp.repeat(thresh, rep, 1), rep, 2)
    # 7-tap directional pass.
    taps = (3, 2, 2)
    x = _shift(padded, 0, 0, n)
    total = jnp.zeros_like(x)
    for d in range(8):
        sum_d = jnp.zeros_like(x)
        for k in range(3):
            dy, dx = (int(DIR_OFFSETS[d, k, 0]),
                      int(DIR_OFFSETS[d, k, 1]))
            for sgn in (1, -1):
                pdiff = _shift(padded, sgn * dy, sgn * dx, n) - x
                sum_d = sum_d + jnp.where(
                    jnp.abs(pdiff) < thresh_grid, taps[k] * pdiff, 0)
        total = jnp.where(dirs_grid == d, sum_d, total)
    y1 = x + ((total + 8) >> 4)
    y1p = jnp.full((N, n + 2 * b, n + 2 * b), DERING_VERY_LARGE,
                   dtype=jnp.int32)
    y1p = y1p.at[:, b:b + n, b:b + n].set(y1)
    # Conservative orthogonal 4-tap pass.
    x1 = _shift(y1p, 0, 0, n)
    athresh = jnp.minimum(thresh_grid,
                          thresh_grid // 3 + jnp.abs(x1 - x))
    total = jnp.zeros_like(x1)
    for vert in (True, False):
        sum_o = jnp.zeros_like(x1)
        for off in (1, 2, -1, -2):
            dy, dx = (off, 0) if vert else (0, off)
            pdiff = _shift(y1p, dy, dx, n) - x1
            sum_o = sum_o + jnp.where(jnp.abs(pdiff) < athresh, pdiff, 0)
        is_vert = dirs_grid <= 4
        total = jnp.where(is_vert == vert, sum_o, total)
    out = x1 + ((3 * total + 8) >> 4)
    return out.reshape(nvsb, nhsb, n, n), out_dirs
