"""TF (time/frequency) resolution conversion.

Frequency-domain up/down-sampling with reversible Haar-like lifts, used
to build CfL luma references at chroma resolution and to merge/split
transform blocks (behavioral spec: src/tf.c:38-277).  Batched over
leading axes.
"""

from __future__ import annotations

import numpy as np

from .dct import _haar_kernel

__all__ = ["tf_up_h_lp", "tf_up_v_lp", "tf_up_hv_lp", "tf_up_hv",
           "tf_down_hv"]


def _hrnd(x):
    return (x + ((x >> 31) & 1)) >> 1


def tf_up_h_lp(src, dx: int, n: int):
    """Double horizontal frequency resolution; return the LF half.
    src: (..., n, >= dx + n/2)."""
    out = np.zeros((*src.shape[:-2], n, n), dtype=src.dtype)
    x = np.arange(n >> 1)
    ll = src[..., :n, x]
    lh = src[..., :n, x + dx]
    lh = ll - lh
    ll = ll - _hrnd(lh)
    hswap = x & 1
    out[..., :, 2 * x + hswap] = ll
    out[..., :, 2 * x + 1 - hswap] = lh
    return out


def tf_up_v_lp(src, dy: int, n: int):
    out = np.zeros((*src.shape[:-2], n, n), dtype=src.dtype)
    y = np.arange(n >> 1)
    ll = src[..., y, :n]
    hl = src[..., y + dy, :n]
    hl = ll - hl
    ll = ll - _hrnd(hl)
    vswap = (y & 1)[:, None]
    yi = y[:, None]
    cols = np.arange(n)[None, :]
    out[..., 2 * yi + vswap, cols] = ll
    out[..., 2 * yi + 1 - vswap, cols] = hl
    return out


def tf_up_hv_lp(src, dx: int, dy: int, n: int):
    """Double both resolutions; return the LF quarter as an n x n block."""
    out = np.zeros((*src.shape[:-2], n, n), dtype=src.dtype)
    y = np.arange(n >> 1)[:, None]
    x = np.arange(n >> 1)[None, :]
    ll = src[..., y, x]
    lh = src[..., y, x + dx]
    hl = src[..., y + dy, x]
    hh = src[..., y + dy, x + dx]
    # lh/hl swapped for compatibility with tf_up_hv (tf.c:99).
    ll, hl, lh, hh = _haar_kernel(ll, hl, lh, hh)
    hswap = x & 1
    vswap = y & 1
    out[..., 2 * y + vswap, 2 * x + hswap] = ll
    out[..., 2 * y + vswap, 2 * x + 1 - hswap] = lh
    out[..., 2 * y + 1 - vswap, 2 * x + hswap] = hl
    out[..., 2 * y + 1 - vswap, 2 * x + 1 - hswap] = hh
    return out


def tf_up_hv(src, n: int):
    """Merge a 2x2 group of n x n blocks (at (0,0),(0,n),(n,0),(n,n) of
    src) into one 2n x 2n block."""
    out = np.zeros((*src.shape[:-2], 2 * n, 2 * n), dtype=src.dtype)
    y = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    ll = src[..., y, x]
    lh = src[..., y, x + n]
    hl = src[..., y + n, x]
    hh = src[..., y + n, x + n]
    ll, hl, lh, hh = _haar_kernel(ll, hl, lh, hh)
    hswap = x & 1
    vswap = y & 1
    out[..., 2 * y + vswap, 2 * x + hswap] = ll
    out[..., 2 * y + vswap, 2 * x + 1 - hswap] = lh
    out[..., 2 * y + 1 - vswap, 2 * x + hswap] = hl
    out[..., 2 * y + 1 - vswap, 2 * x + 1 - hswap] = hh
    return out


def tf_down_hv(src, n: int):
    """Split an n x n block into a 2x2 group of n/2 x n/2 blocks
    (exact inverse of tf_up_hv)."""
    assert n % 2 == 0
    half = n >> 1
    out = np.zeros((*src.shape[:-2], n, n), dtype=src.dtype)
    y = np.arange(half)[:, None]
    x = np.arange(half)[None, :]
    hswap = x & 1
    vswap = y & 1
    ll = src[..., 2 * y + vswap, 2 * x + hswap]
    lh = src[..., 2 * y + vswap, 2 * x + 1 - hswap]
    hl = src[..., 2 * y + 1 - vswap, 2 * x + hswap]
    hh = src[..., 2 * y + 1 - vswap, 2 * x + 1 - hswap]
    ll, lh, hl, hh = _haar_kernel(ll, lh, hl, hh)
    out[..., y, x] = ll
    out[..., y, x + half] = lh
    out[..., y + half, x] = hl
    out[..., y + half, x + half] = hh
    return out
