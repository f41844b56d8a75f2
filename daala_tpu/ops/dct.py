"""Reversible integer DCT approximations (4/8/16/32-point) + 2D wrappers.

Each transform is the Daala family of lifting networks — recursive
embeddings of 2-point DCT/DST rotations with half-shift butterflies and
Q11..Q15 lifting constants — expressed as declarative programs for the
engine in `lifting.py`.  Forward-only transcription; inverses are derived
mechanically, so forward/inverse cannot drift apart.

Network structure (behavioral spec in the reference):
  * 4-point:  od_bin_fdct4, /root/reference/src/dct.c:74-112
  * 8-point:  od_bin_fdct8, dct.c:151-269 (sqrt(2)-scaled standalone)
  * 16-point: od_bin_fdct16, dct.c:349-640 (orthonormal)
  * 32-point: OD_FDCT_32 macro tower, dct.c:790-1701 (orthonormal), built
    from FDCT_2/FDST_2 -> FDCT_4_ASYM/FDST_4_ASYM -> FDCT_8/FDST_8 ->
    FDCT_16_ASYM/FDST_16_ASYM.
  * The per-coefficient deviation from true orthonormal scale is
    compensated by numerically-computed basis magnitudes (see
    `basis_magnitudes`), replacing the reference's offline-trained
    OD_BASIS_MAG tables (pvq.c).

All functions operate batched: input (..., n) or (..., n, n) int32 arrays,
numpy or jax.numpy.  On TPU the whole frame's blocks of one size run as a
single vectorized network (the replacement for src/x86 SIMD kernels).
"""

from __future__ import annotations

import numpy as np

from .lifting import (
    LanedTransform,
    add,
    addh,
    inline,
    invert,
    lift,
    liftm,
    neg,
    rsub,
    rsubh,
    run,
    sub,
    subh,
)

__all__ = [
    "fdct", "idct", "fdct2d", "idct2d", "haar2d", "ihaar2d",
    "basis_magnitudes", "TX_SIZES",
]

TX_SIZES = (4, 8, 16, 32)

# -- 2-point kernels ------------------------------------------------------

# Orthonormal 2-point type-II DCT (45-degree rotation via 3 lifts).
FDCT_2 = [
    liftm("t0", "t1", 13573, 16384, 15),  # tan(pi/8)
    lift("t1", "t0", 5793, 4096, 13),     # sin(pi/4)
    liftm("t0", "t1", 3393, 4096, 13),    # tan(pi/8)
]

# Orthonormal 2-point type-IV DST.
FDST_2 = [
    liftm("t0", "t1", 10947, 8192, 14),   # tan(3pi/16)
    lift("t1", "t0", 473, 256, 9),        # sin(3pi/8)
    liftm("t0", "t1", 10947, 8192, 14),
]

# -- 4-point kernels ------------------------------------------------------

# Asymmetric 4-point type-II DCT (inputs carry the caller's butterfly
# scaling; halves computed at use since parents are still unmodified).
FDCT_4_ASYM = (
    [
        addh("t0", "t3"),
        rsub("t3", "t0"),
        rsubh("t1", "t2"),
        rsub("t2", "t1"),
    ]
    + inline(FDCT_2, {"t0": "t0", "t1": "t2"})
    + inline(FDST_2, {"t0": "t3", "t1": "t1"})
)

# Asymmetric 4-point type-IV DST.
FDST_4_ASYM = [
    liftm("t2", "t1", 7489, 4096, 13),   # tan(pi/8) + tan(pi/4)/2
    lift("t1", "t2", 11585, 8192, 14),   # sin(pi/4)
    lift("t2", "t1", 19195, 16384, 15),  # tan(pi/4) - tan(pi/8)
    addh("t3", "t2"),
    sub("t2", "t3"),
    rsubh("t1", "t0"),
    sub("t0", "t1"),
    lift("t3", "t0", 6723, 4096, 13),    # tan(7pi/32)
    liftm("t0", "t3", 8035, 4096, 13),   # sin(7pi/16)
    lift("t3", "t0", 6723, 4096, 13),
    lift("t2", "t1", 8757, 8192, 14),    # tan(5pi/32)
    liftm("t1", "t2", 6811, 4096, 13),   # sin(5pi/16)
    lift("t2", "t1", 8757, 8192, 14),
]

# Standalone orthonormal 4-point type-II DCT (od_bin_fdct4 network).
_FDCT4_PROG = [
    rsub("t3", "t0"),
    add("t2", "t1"),
    rsubh("t1", "t2"),
    subh("t0", "t3"),
    addh("t0", "t2"),
    rsub("t2", "t0"),
    liftm("t3", "t1", 23013, 16384, 15),  # 4sin(pi/8) - 2tan(pi/8)
    lift("t1", "t3", 21407, 16384, 15),   # sqrt(1/2)cos(pi/8)
    liftm("t3", "t1", 18293, 8192, 14),   # 4sin(pi/8) - tan(pi/8)
]

DCT4 = LanedTransform(
    4,
    {"t0": 0, "t2": 1, "t1": 2, "t3": 3},
    _FDCT4_PROG,
    ["t0", "t1", "t2", "t3"],
)

# -- 8-point kernels ------------------------------------------------------

# Orthonormal 8-point type-II DCT macro network (OD_FDCT_8), used embedded
# inside the 16-asym tower.
FDCT_8M = (
    [
        rsub("t7", "t0"),
        subh("t0", "t7"),
        add("t4", "t3"),
        rsubh("t3", "t4"),
        rsub("t5", "t2"),
        subh("t2", "t5"),
        add("t6", "t1"),
        rsubh("t1", "t6"),
    ]
    + inline(FDCT_4_ASYM, {"t0": "t0", "t2": "t4", "t1": "t2", "t3": "t6"})
    + inline(FDST_4_ASYM, {"t0": "t7", "t2": "t3", "t1": "t5", "t3": "t1"})
)

# Orthonormal 8-point type-IV DST macro network (OD_FDST_8).
FDST_8M = [
    liftm("t6", "t1", 13573, 16384, 15),
    lift("t1", "t6", 11585, 8192, 14),
    liftm("t6", "t1", 13573, 16384, 15),
    liftm("t5", "t2", 21895, 16384, 15),
    lift("t2", "t5", 15137, 8192, 14),
    liftm("t5", "t2", 10947, 8192, 14),
    liftm("t4", "t3", 3259, 8192, 14),
    lift("t3", "t4", 3135, 4096, 13),
    liftm("t4", "t3", 3259, 8192, 14),
    add("t7", "t1"),
    subh("t1", "t7"),
    rsub("t2", "t3"),
    subh("t3", "t2"),
    sub("t0", "t6"),
    addh("t6", "t0"),
    rsub("t5", "t4"),
    subh("t4", "t5"),
    addh("t1", "t5"),
    rsub("t5", "t1"),
    addh("t4", "t0"),
    sub("t0", "t4"),
    subh("t6", "t2"),
    add("t2", "t6"),
    subh("t3", "t7"),
    add("t7", "t3"),
    neg("t7"),
    liftm("t0", "t7", 7425, 4096, 13),
    lift("t7", "t0", 8153, 4096, 13),
    liftm("t0", "t7", 7425, 4096, 13),
    liftm("t6", "t1", 4861, 16384, 15),
    lift("t1", "t6", 1189, 2048, 12),
    liftm("t6", "t1", 4861, 16384, 15),
    liftm("t2", "t5", 2455, 2048, 12),
    lift("t5", "t2", 7225, 4096, 13),
    liftm("t2", "t5", 2455, 2048, 12),
    liftm("t4", "t3", 11725, 16384, 15),
    lift("t3", "t4", 5197, 4096, 13),
    liftm("t4", "t3", 11725, 16384, 15),
]

# Standalone 8-point type-II DCT (od_bin_fdct8 network; sqrt(2)-scaled
# relative to orthonormal — absorbed by basis_magnitudes()).
_FDCT8_PROG = [
    rsub("t1", "t0"),
    subh("t0", "t1"),
    add("t4", "t5"),
    subh("t5", "t4"),
    rsub("t3", "t2"),
    subh("t2", "t3"),
    add("t6", "t7"),
    rsubh("t7", "t6"),
    addh("t0", "t6"),
    rsub("t6", "t0"),
    rsubh("t2", "t4"),
    rsub("t4", "t2"),
    liftm("t0", "t4", 13573, 16384, 15),
    lift("t4", "t0", 11585, 8192, 14),
    liftm("t0", "t4", 13573, 16384, 15),
    liftm("t6", "t2", 21895, 16384, 15),
    lift("t2", "t6", 15137, 8192, 14),
    liftm("t6", "t2", 21895, 16384, 15),
    lift("t3", "t5", 19195, 16384, 15),
    lift("t5", "t3", 11585, 8192, 14),
    liftm("t3", "t5", 7489, 4096, 13),
    rsubh("t7", "t5"),
    sub("t5", "t7"),
    rsubh("t3", "t1"),
    sub("t1", "t3"),
    lift("t7", "t1", 3227, 16384, 15),
    liftm("t1", "t7", 6393, 16384, 15),
    lift("t7", "t1", 3227, 16384, 15),
    lift("t5", "t3", 2485, 4096, 13),
    liftm("t3", "t5", 18205, 16384, 15),
    lift("t5", "t3", 2485, 4096, 13),
]

DCT8 = LanedTransform(
    8,
    {"t0": 0, "t4": 1, "t2": 2, "t6": 3, "t7": 4, "t3": 5, "t5": 6, "t1": 7},
    _FDCT8_PROG,
    ["t0", "t1", "t2", "t3", "t4", "t5", "t6", "t7"],
)

# -- 16-point -------------------------------------------------------------

# Standalone orthonormal 16-point type-II DCT (od_bin_fdct16 network).
_FDCT16_PROG = [
    rsub("t5", "t0"),
    add("t8", "tb"),
    rsub("t7", "t4"),
    add("tc", "t1"),
    rsub("tf", "te"),
    add("ta", "t9"),
    rsub("td", "t6"),
    add("t2", "t3"),
    subh("t0", "t5"),
    rsubh("tb", "t8"),
    subh("t4", "t7"),
    rsubh("t1", "tc"),
    subh("te", "tf"),
    rsubh("t9", "ta"),
    subh("t6", "td"),
    rsubh("t3", "t2"),
    addh("t0", "t2"),
    rsubh("t6", "t8"),
    addh("t4", "ta"),
    rsubh("te", "tc"),
    rsub("t2", "t0"),
    sub("t8", "t6"),
    rsub("ta", "t4"),
    sub("tc", "te"),
    rsub("tc", "t0"),
    add("t8", "t4"),
    rsubh("t4", "t8"),
    subh("t0", "tc"),
    addh("t0", "t8"),
    rsub("t8", "t0"),
    liftm("tc", "t4", 23013, 16384, 15),
    lift("t4", "tc", 10703, 8192, 14),
    liftm("tc", "t4", 9147, 4096, 13),
    lift("t6", "ta", 13573, 16384, 15),
    liftm("ta", "t6", 11585, 8192, 14),
    lift("t6", "ta", 13573, 16384, 15),
    add("ta", "te"),
    add("t2", "t6"),
    rsubh("te", "ta"),
    rsubh("t6", "t2"),
    lift("te", "t2", 2275, 1024, 11),
    liftm("t2", "te", 9041, 16384, 15),
    liftm("te", "t2", 2873, 1024, 11),
    liftm("t6", "ta", 8593, 8192, 14),
    lift("ta", "t6", 12873, 8192, 14),
    lift("t6", "ta", 7335, 16384, 15),
    lift("t3", "t5", 1035, 1024, 11),
    liftm("t5", "t3", 14699, 8192, 14),
    liftm("t3", "t5", 851, 4096, 13),
    lift("tb", "td", 17515, 16384, 15),
    liftm("td", "tb", 20435, 8192, 14),
    lift("tb", "td", 4379, 8192, 14),
    lift("t9", "t7", 12905, 8192, 14),
    liftm("t7", "t9", 3363, 4096, 13),
    liftm("t9", "t7", 14101, 8192, 14),
    lift("t1", "tf", 5417, 4096, 13),
    liftm("tf", "t1", 23059, 8192, 14),
    lift("t1", "tf", 20055, 16384, 15),
    rsub("tf", "t3"),
    add("td", "t9"),
    subh("t3", "tf"),
    rsubh("t9", "td"),
    add("t1", "t5"),
    rsub("tb", "t7"),
    rsubh("t5", "t1"),
    subh("t7", "tb"),
    addh("t3", "tb"),
    rsubh("t5", "td"),
    addh("t9", "tf"),
    rsubh("t7", "t1"),
    sub("tb", "t3"),
    sub("td", "t5"),
    rsub("tf", "t9"),
    sub("t1", "t7"),
    liftm("t5", "tb", 10947, 8192, 14),
    lift("tb", "t5", 15137, 8192, 14),
    liftm("t5", "tb", 10947, 8192, 14),
    lift("td", "t3", 21895, 16384, 15),
    liftm("t3", "td", 15137, 8192, 14),
    lift("td", "t3", 10947, 8192, 14),
    liftm("t1", "tf", 13573, 16384, 15),
    lift("tf", "t1", 11585, 8192, 14),
    liftm("t1", "tf", 13573, 16384, 15),
]

_HEX = "0123456789abcdef"

DCT16 = LanedTransform(
    16,
    {
        "t0": 0, "t8": 1, "t4": 2, "tc": 3, "te": 4, "ta": 5, "t6": 6,
        "t2": 7, "t3": 8, "td": 9, "t9": 10, "tf": 11, "t1": 12, "t7": 13,
        "tb": 14, "t5": 15,
    },
    _FDCT16_PROG,
    [f"t{h}" for h in _HEX],
)

# -- 16-asym + 32-point tower --------------------------------------------

# Asymmetric 16-point type-II DCT (OD_FDCT_16_ASYM).
FDCT_16_ASYM = (
    [
        addh("t0", "tf"), rsub("tf", "t0"),
        subh("t1", "te"), add("te", "t1"),
        addh("t2", "td"), rsub("td", "t2"),
        subh("t3", "tc"), add("tc", "t3"),
        addh("t4", "tb"), rsub("tb", "t4"),
        subh("t5", "ta"), add("ta", "t5"),
        addh("t6", "t9"), rsub("t9", "t6"),
        subh("t7", "t8"), add("t8", "t7"),
    ]
    + inline(FDCT_8M, {
        "t0": "t0", "t4": "t8", "t2": "t4", "t6": "tc",
        "t1": "t2", "t5": "ta", "t3": "t6", "t7": "te",
    })
    + inline(FDST_8M, {
        "t0": "tf", "t4": "t7", "t2": "tb", "t6": "t3",
        "t1": "td", "t5": "t5", "t3": "t9", "t7": "t1",
    })
)

# Asymmetric 16-point type-IV DST (OD_FDST_16_ASYM).
FDST_16_ASYM = [
    neg("t8"), neg("t9"), neg("ta"), neg("tb"), neg("td"),
    liftm("t1", "te", 13573, 8192, 14),   # 2tan(pi/8)
    lift("te", "t1", 11585, 16384, 15),   # sin(pi/4)/2
    liftm("t1", "te", 13573, 8192, 14),
    lift("t2", "td", 4161, 8192, 14),     # tan(3pi/16) - tan(pi/8)
    liftm("td", "t2", 15137, 8192, 14),   # sin(3pi/8)
    lift("t2", "td", 14341, 8192, 14),    # tan(3pi/16) + tan(pi/8)/2
    liftm("tc", "t3", 14341, 8192, 14),
    lift("t3", "tc", 15137, 8192, 14),
    liftm("tc", "t3", 4161, 8192, 14),
    rsubh("te", "t0"),
    sub("t0", "te"),
    rsubh("tf", "t1"),
    sub("t1", "tf"),
    neg("tc"),
    rsubh("t2", "tc"),
    sub("tc", "t2"),
    rsubh("t3", "td"),
    rsub("td", "t3"),
    liftm("t9", "t6", 7489, 4096, 13),
    lift("t6", "t9", 11585, 8192, 14),
    lift("t9", "t6", 19195, 16384, 15),
    addh("t8", "t9"),
    sub("t9", "t8"),
    rsubh("t6", "t7"),
    sub("t7", "t6"),
    lift("t8", "t7", 6723, 4096, 13),
    liftm("t7", "t8", 16069, 8192, 14),
    lift("t8", "t7", 6723, 4096, 13),
    lift("t9", "t6", 17515, 16384, 15),
    liftm("t6", "t9", 13623, 8192, 14),
    lift("t9", "t6", 17515, 16384, 15),
    lift("t5", "ta", 13573, 8192, 14),
    liftm("ta", "t5", 11585, 16384, 15),
    lift("t5", "ta", 13573, 8192, 14),
    addh("tb", "t5"),
    rsub("t5", "tb"),
    addh("ta", "t4"),
    sub("t4", "ta"),
    lift("ta", "t5", 2485, 4096, 13),
    liftm("t5", "ta", 18205, 16384, 15),
    lift("ta", "t5", 2485, 4096, 13),
    liftm("tb", "t4", 6723, 4096, 13),
    lift("t4", "tb", 16069, 8192, 14),
    liftm("tb", "t4", 6723, 4096, 13),
    neg("t5"),
    sub("tc", "tf"),
    addh("tf", "tc"),
    add("t3", "t0"),
    subh("t0", "t3"),
    sub("td", "t1"),
    addh("t1", "td"),
    add("t2", "te"),
    subh("te", "t2"),
    add("t8", "t4"),
    rsubh("t4", "t8"),
    rsub("t7", "tb"),
    rsubh("tb", "t7"),
    sub("t6", "ta"),
    addh("ta", "t6"),
    rsub("t9", "t5"),
    subh("t5", "t9"),
    subh("t0", "t7"),
    add("t7", "t0"),
    addh("tf", "t8"),
    sub("t8", "tf"),
    subh("te", "t6"),
    add("t6", "te"),
    addh("t1", "t9"),
    sub("t9", "t1"),
    subh("tb", "tc"),
    add("tc", "tb"),
    addh("t4", "t3"),
    sub("t3", "t4"),
    subh("ta", "td"),
    add("td", "ta"),
    rsubh("t5", "t2"),
    sub("t2", "t5"),
    neg("t8"), neg("t9"), neg("ta"), neg("tb"), neg("tc"), neg("td"),
    neg("tf"),
    liftm("t0", "tf", 7799, 4096, 13),    # tan(31pi/128)
    lift("tf", "t0", 4091, 2048, 12),     # sin(31pi/64)
    liftm("t0", "tf", 7799, 4096, 13),
    lift("t1", "te", 2417, 16384, 15),    # tan(3pi/128)
    liftm("te", "t1", 601, 2048, 12),     # sin(3pi/64)
    lift("t1", "te", 2417, 16384, 15),
    liftm("t7", "t8", 14525, 16384, 15),  # tan(17pi/128)
    lift("t8", "t7", 3035, 2048, 12),     # sin(17pi/64)
    liftm("t7", "t8", 7263, 8192, 14),
    liftm("t2", "td", 6393, 4096, 13),    # tan(27pi/128)
    lift("td", "t2", 3973, 2048, 12),     # sin(27pi/64)
    liftm("t2", "td", 6393, 4096, 13),
    liftm("t5", "ta", 9281, 8192, 14),    # tan(21pi/128)
    lift("ta", "t5", 7027, 4096, 13),     # sin(21pi/64)
    liftm("t5", "ta", 9281, 8192, 14),
    liftm("t3", "tc", 11539, 8192, 14),   # tan(25pi/128)
    lift("tc", "t3", 7713, 4096, 13),     # sin(25pi/64)
    liftm("t3", "tc", 11539, 8192, 14),
    liftm("t4", "tb", 10375, 8192, 14),   # tan(23pi/128)
    lift("tb", "t4", 7405, 4096, 13),     # sin(23pi/64)
    liftm("t4", "tb", 10375, 8192, 14),
    liftm("t6", "t9", 8247, 8192, 14),    # tan(19pi/128)
    lift("t9", "t6", 1645, 1024, 11),     # sin(19pi/64)
    liftm("t6", "t9", 8247, 8192, 14),
]

_B32 = "0123456789abcdefghijklmnopqrstuv"

# Orthonormal 32-point type-II DCT (OD_FDCT_32): half-shift butterflies
# then the two asymmetric 16-point towers.
_FDCT32_BUTTERFLIES = [
    rsub("tv", "t0"), subh("t0", "tv"),
    add("tu", "t1"), rsubh("t1", "tu"),
    rsub("tt", "t2"), subh("t2", "tt"),
    add("ts", "t3"), rsubh("t3", "ts"),
    rsub("tr", "t4"), subh("t4", "tr"),
    add("tq", "t5"), rsubh("t5", "tq"),
    rsub("tp", "t6"), subh("t6", "tp"),
    add("to", "t7"), rsubh("t7", "to"),
    rsub("tn", "t8"), subh("t8", "tn"),
    add("tm", "t9"), rsubh("t9", "tm"),
    rsub("tl", "ta"), subh("ta", "tl"),
    add("tk", "tb"), rsubh("tb", "tk"),
    rsub("tj", "tc"), subh("tc", "tj"),
    add("ti", "td"), rsubh("td", "ti"),
    rsub("th", "te"), subh("te", "th"),
    add("tg", "tf"), rsubh("tf", "tg"),
]

_FDCT32_PROG = (
    _FDCT32_BUTTERFLIES
    + inline(FDCT_16_ASYM, {
        "t0": "t0", "t8": "tg", "t4": "t8", "tc": "to",
        "t2": "t4", "ta": "tk", "t6": "tc", "te": "ts",
        "t1": "t2", "t9": "ti", "t5": "ta", "td": "tq",
        "t3": "t6", "tb": "tm", "t7": "te", "tf": "tu",
    })
    + inline(FDST_16_ASYM, {
        "t0": "tv", "t8": "tf", "t4": "tn", "tc": "t7",
        "t2": "tr", "ta": "tb", "t6": "tj", "te": "t3",
        "t1": "tt", "t9": "td", "t5": "tl", "td": "t5",
        "t3": "tp", "tb": "t9", "t7": "th", "tf": "t1",
    })
)

DCT32 = LanedTransform(
    32,
    {
        "t0": 0, "tg": 1, "t8": 2, "to": 3, "t4": 4, "tk": 5, "tc": 6,
        "ts": 7, "t2": 8, "ti": 9, "ta": 10, "tq": 11, "t6": 12, "tm": 13,
        "te": 14, "tu": 15, "t1": 16, "th": 17, "t9": 18, "tp": 19,
        "t5": 20, "tl": 21, "td": 22, "tt": 23, "t3": 24, "tj": 25,
        "tb": 26, "tr": 27, "t7": 28, "tn": 29, "tf": 30, "tv": 31,
    },
    _FDCT32_PROG,
    [f"t{c}" for c in _B32],
)

_TX = {4: DCT4, 8: DCT8, 16: DCT16, 32: DCT32}


def fdct(x, n: int):
    """Forward 1D reversible DCT along the last axis; x: (..., n) int32."""
    return _TX[n].forward(x)


def idct(y, n: int):
    """Exact inverse of `fdct`."""
    return _TX[n].inverse(y)


def fdct2d(x, n: int):
    """2D DCT on (..., n, n): rows first, then columns (cols = transform
    along axis -2), matching the reference's column-then-row composition
    (dct.c:137-142)."""
    out = _TX[n].apply_2d_native(x, False, False, col_first=False)
    if out is not None:
        return out
    t = fdct(x, n)  # along last axis (rows' entries)
    t = _swap(t)
    t = fdct(t, n)
    return _swap(t)


def idct2d(y, n: int):
    out = _TX[n].apply_2d_native(y, True, True, col_first=True)
    if out is not None:
        return out
    t = _swap(y)
    t = idct(t, n)
    t = _swap(t)
    return idct(t, n)


def _swap(a):
    return a.swapaxes(-1, -2)


# -- 2D Haar --------------------------------------------------------------


def _haar_kernel(ll, lh, hl, hh):
    """Reversible orthonormal 2x2 Haar butterfly (tf.h:34-45 spec).

    7 adds + 1 shift; the map is an exact involution (applying it twice
    returns the inputs), which is what makes the wavelet path lossless.
    """
    ll = ll + hl
    hh = hh - lh
    e = (ll - hh) >> 1
    lh = e - lh
    hl = e - hl
    ll = ll - lh
    hh = hh + hl
    return ll, lh, hl, hh


def haar2d(x, ln: int):
    """Full 2D Haar transform of an (..., n, n) block, n = 1 << ln.

    Level by level: each 2x2 quad maps through the reversible Haar
    kernel; low-pass recursion on the top-left quadrant
    (od_haar, dct.c:1960-1997)."""
    n = 1 << ln
    out = _zeros_like(x)
    lo = x
    for level in range(ln):
        npairs = n >> (level + 1)
        a = lo[..., 0::2, 0::2]
        b = lo[..., 1::2, 0::2]
        c = lo[..., 0::2, 1::2]
        d = lo[..., 1::2, 1::2]
        a, b, c, d = _haar_kernel(a, b, c, d)
        out = _set(out, (slice(0, npairs), slice(npairs, 2 * npairs)), b)
        out = _set(out, (slice(npairs, 2 * npairs), slice(0, npairs)), c)
        out = _set(
            out, (slice(npairs, 2 * npairs), slice(npairs, 2 * npairs)), d
        )
        lo = a
    out = _set(out, (slice(0, 1), slice(0, 1)), lo)
    return out


def ihaar2d(y, ln: int):
    """Exact inverse of haar2d."""
    n = 1 << ln
    lo = y[..., 0:1, 0:1]
    for level in range(ln - 1, -1, -1):
        npairs = 1 << (ln - 1 - level)
        b = y[..., 0:npairs, npairs:2 * npairs]
        c = y[..., npairs:2 * npairs, 0:npairs]
        d = y[..., npairs:2 * npairs, npairs:2 * npairs]
        a, b2, c2, d2 = _haar_kernel(lo, b, c, d)
        m = 2 * npairs
        x = _zeros((*y.shape[:-2], m, m), y)
        x = _set(x, (slice(0, m, 2), slice(0, m, 2)), a)
        x = _set(x, (slice(1, m, 2), slice(0, m, 2)), b2)
        x = _set(x, (slice(0, m, 2), slice(1, m, 2)), c2)
        x = _set(x, (slice(1, m, 2), slice(1, m, 2)), d2)
        lo = x
    return lo


def _zeros_like(x):
    if isinstance(x, np.ndarray):
        return np.zeros_like(x)
    import jax.numpy as jnp

    return jnp.zeros_like(x)


def _zeros(shape, like):
    if isinstance(like, np.ndarray):
        return np.zeros(shape, dtype=like.dtype)
    import jax.numpy as jnp

    return jnp.zeros(shape, dtype=like.dtype)


def _set(arr, idx2, val):
    """Set arr[..., idx2[0], idx2[1]] = val (numpy or jnp)."""
    if isinstance(arr, np.ndarray):
        arr[(Ellipsis,) + idx2] = val
        return arr
    return arr.at[(Ellipsis,) + idx2].set(val)


# -- 64-point DCT ---------------------------------------------------------
#
# The fork implements the 64-point transform as a rounded orthonormal
# DCT matrix rather than a lifting network (od_bin_fdct64,
# dct.c:2111-2140) — it is outside the codec's block-size range
# (OD_NBSIZES == 4) and not reversible.  We use exact Q15 fixed-point
# integer arithmetic so encoder and decoder match cross-platform.

_DCT64_Q15 = None


def _dct64_mat():
    global _DCT64_Q15
    if _DCT64_Q15 is None:
        k = np.arange(64)[:, None]
        j = np.arange(64)[None, :]
        m = np.cos(np.pi * k * (2 * j + 1) / 128) * np.sqrt(2.0 / 64)
        m[0] *= np.sqrt(0.5)
        _DCT64_Q15 = np.round(m * (1 << 15)).astype(np.int64)
    return _DCT64_Q15


def fdct64(x):
    """Forward 64-point DCT along the last axis (non-reversible,
    matrix form like the reference's 64-point path)."""
    m = _dct64_mat()
    acc = x.astype(np.int64) @ m.T
    return ((acc + (1 << 14)) >> 15).astype(np.int32)


def idct64(y):
    m = _dct64_mat()
    acc = y.astype(np.int64) @ m
    return ((acc + (1 << 14)) >> 15).astype(np.int32)


def fdct64x64(x):
    return _swap(fdct64(_swap(fdct64(x))))


def idct64x64(y):
    return idct64(_swap(idct64(_swap(y))))


# -- basis magnitudes -----------------------------------------------------


def basis_magnitudes(n: int) -> np.ndarray:
    """Per-coefficient L2 gain of the n-point forward transform.

    Measured numerically on a float impulse basis (large-amplitude
    integer inputs to wash out rounding), replacing the reference's
    offline OD_BASIS_MAG tables.  Used to fold scale compensation into
    quantization matrices (od_init_qm, pvq.c:302).
    """
    amp = 1 << 12
    eye = np.eye(n, dtype=np.int64) * amp
    y = fdct(eye.astype(np.int32).T, n).astype(np.float64) / amp
    # column k of the forward transform matrix ~ y[k]; magnitude per
    # output coefficient is the L2 norm over input impulses.
    return np.sqrt((y.astype(np.float64) ** 2).sum(axis=0))
