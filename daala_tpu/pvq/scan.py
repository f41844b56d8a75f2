"""PVQ band layout and coefficient scan order.

Daala codes AC coefficients in per-band vectors laid out in a coding
scan order built ring-by-ring: the low 4x4 (15 ACs after DC), then for
each level L in {8,16,32}: a horizontal strip band {x in [L/2,L), y in
[0,L/4)}, a vertical strip band {x in [0,L/4), y in [L/2,L)}, and a
diagonal band (the rest of the LxL block) — except at L=32 where the
512-coefficient diagonal band is never coded (MAXN, pvq.h:66; the
decoder zeroes/predicts it).  Band boundaries match
OD_BAND_OFFSETS4..32 (partition.c:77-90).

The within-band scan is our own deterministic frequency ordering
(ascending x+y with an axis tie-break); the reference uses offline-
trained zigzags (src/zigzag*.c) — within-band order only affects the
Laplace run-length model's efficiency, not decodability, since each
band is one jointly-coded PVQ vector.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "BAND_OFFSETS",
    "band_structure",
    "scan_table",
    "raster_to_coding",
    "coding_to_raster",
    "qm_get_index",
]

# nb_bands then boundaries, per block-size log (bs = log2(n) - 2).
BAND_OFFSETS = {
    0: [1, 1, 16],
    1: [4, 1, 16, 24, 32, 64],
    2: [7, 1, 16, 24, 32, 64, 96, 128, 256],
    3: [9, 1, 16, 24, 32, 64, 96, 128, 256, 384, 512],
}


def qm_get_index(bs: int, band: int) -> int:
    """Index into the per-plane flattened QM vector (pvq.c:346-351);
    horizontal and vertical strip bands share an entry."""
    return bs * (bs + 1) + band - band // 3


def _order(positions, key):
    return sorted(positions, key=key)


def _low4x4():
    pos = [(x, y) for y in range(4) for x in range(4) if (x, y) != (0, 0)]
    return _order(pos, lambda p: (p[0] + p[1], max(p[0], p[1]), p[1]))


def _ring(level: int):
    """Bands added when growing from level/2 to `level` (8, 16 or 32)."""
    h = [(x, y) for y in range(level // 4) for x in range(level // 2, level)]
    v = [(x, y) for y in range(level // 2, level) for x in range(level // 4)]
    half = level // 2
    # diag: everything in [0,level)^2 not in the lower-level square,
    # not in h, not in v.
    prev = {(x, y) for y in range(half) for x in range(half)}
    hs = set(h)
    vs = set(v)
    diag = [
        (x, y)
        for y in range(level)
        for x in range(level)
        if (x, y) not in prev and (x, y) not in hs and (x, y) not in vs
    ]
    key = lambda p: (p[0] + p[1], max(p[0], p[1]), p[1])
    return _order(h, key), _order(v, key), _order(diag, key)


def scan_table(n: int) -> np.ndarray:
    """(ncoded, 2) array of (y, x) raster positions in coding order for an
    n x n block; position 0 is DC.  For n == 32 only 512 coefficients are
    in coding order."""
    order = [(0, 0)] + _low4x4()
    level = 8
    while level <= n:
        h, v, d = _ring(level)
        if level == 32:
            order += h + v  # 32-level diagonal band is never coded
        else:
            order += h + v + d
        level *= 2
    tab = np.array([(y, x) for (x, y) in order], dtype=np.int32)
    return tab


_SCANS = {n: scan_table(n) for n in (4, 8, 16, 32)}
_FLAT = {n: _SCANS[n][:, 0] * n + _SCANS[n][:, 1] for n in (4, 8, 16, 32)}


def n_coded(n: int) -> int:
    """Number of coefficients in coding order for an n x n block."""
    return len(_FLAT[n])


def raster_to_coding(block):
    """(..., n, n) -> (..., ncoded) coding-order vector."""
    n = block.shape[-1]
    flat = block.reshape(*block.shape[:-2], n * n)
    return flat[..., _FLAT[n]]


def coding_to_raster(vec, n: int, base=None):
    """(..., ncoded) -> (..., n, n).  Positions not in coding order are
    taken from `base` (same shape as output) or zero."""
    shape = (*vec.shape[:-1], n * n)
    if base is None:
        flat = np.zeros(shape, dtype=vec.dtype)
    else:
        flat = base.reshape(shape).copy()
    flat[..., _FLAT[n]] = vec
    return flat.reshape(*vec.shape[:-1], n, n)
