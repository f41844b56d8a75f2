"""Per-frame adaptation state and codec configuration.

Mirrors od_adapt_ctx (state.h:136-170) for the subsystems implemented so
far; everything is reset per frame (od_adapt_ctx_reset, state.c:595-650)
so frames — and later, GOPs across hosts — are entropy-independent.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np

from ..entropy import GenericModel, cdf_init
from ..pvq.coding import PvqAdapt

__all__ = ["AdaptState", "FrameInfo", "LUMA_QM_Q4", "CHROMA_QM_Q4",
           "interp_pvq_qm", "QM_SIZE"]

NBSIZES = 4
QM_SIZE = NBSIZES * (NBSIZES + 1)

# Per-band PVQ quantization weights (Q4), [masking][...] flattened by
# od_qm_get_index (encode.c:62-105).
LUMA_QM_Q4 = {
    0: np.array([21, 16,
                 18, 16, 16, 16,
                 17, 16, 16, 16, 16, 16,
                 16, 16, 16, 16, 16, 16, 16, 16], dtype=np.int32),
    1: np.array([21, 16,
                 18, 18, 28, 32,
                 17, 14, 20, 20, 28, 32,
                 16, 11, 16, 14, 16, 16, 23, 28], dtype=np.int32),
}
# Chroma is flat in both masking modes (no chroma activity masking).
_CHROMA_QM = np.array([21, 16,
                       18, 16, 16, 16,
                       17, 16, 16, 16, 16, 16,
                       16, 16, 16, 16, 16, 16, 16, 16], dtype=np.int32)
CHROMA_QM_Q4 = {0: _CHROMA_QM, 1: _CHROMA_QM}

# (interp_q, scale_q8) anchors per plane (OD_DEFAULT_QMS,
# encode.c:114-137).
_QM_ANCHORS = [
    # plane 0 (luma), 1 (cb), 2 (cr)
    [(4, 256), (318, 256)],
    [(4, 448), (318, 140)],
    [(4, 320), (318, 100)],
]


def interp_pvq_qm(q: int, pli: int, use_masking: bool,
                  flat: bool = False) -> np.ndarray:
    """Per-band Q4 weights interpolated by quantizer
    (od_interp_qm, encode.c:2761-2799).  flat: the OD_QM8_Q4_FLAT
    base (all 16) selected by the OD_SET_QM ctl."""
    if flat:
        return np.full(QM_SIZE, 16, dtype=np.int32)
    base = (LUMA_QM_Q4 if pli == 0 else CHROMA_QM_Q4)[int(use_masking)]
    (q1, s1), (q2, s2) = _QM_ANCHORS[min(pli, 2)]
    q1 <<= 4
    q2 <<= 4
    if q <= q1:
        out = np.minimum(255, base * s1 >> 8)
    elif q >= q2:
        out = np.minimum(255, base * s2 >> 8)
    else:
        x = (np.log(q) - np.log(q1)) / (np.log(q2) - np.log(q1))
        out = np.minimum(255, np.floor(
            0.5 + (1.0 / 256) * np.exp(
                x * np.log(base * s2) + (1 - x) * np.log(base * s1))
        ).astype(np.int64))
    return out.astype(np.int32)


@dataclass
class AdaptState:
    """All per-frame adaptive entropy state."""

    nplanes: int = 3
    pvq: PvqAdapt = None
    skip_cdf: np.ndarray = None          # (2*NBSIZES, 5)
    skip_increment: int = 128
    model_dc: List[GenericModel] = None
    ex_dc: np.ndarray = None             # (nplanes, NBSIZES, 3)
    ex_sb_dc: np.ndarray = None          # (nplanes,)
    # Haar wavelet (lossless) mode contexts (state.h:158-162).
    haar_coeff_cdf: np.ndarray = None    # (15*3*5, 16)
    haar_coeff_increment: int = 128
    haar_split_cdf: np.ndarray = None    # (15*2*5, 16)
    haar_split_increment: int = 128
    haar_bits_cdf: np.ndarray = None     # (3, 16)
    haar_bits_increment: int = 128
    # Dering flag contexts by (up, left) neighbor flags (clpf_cdf).
    clpf_cdf: np.ndarray = None          # (4, 2)
    clpf_increment: int = 128
    pvq_qm_q4: list = None               # per plane, QM_SIZE entries

    @classmethod
    def reset(cls, nplanes: int, is_keyframe: bool) -> "AdaptState":
        a = cls(nplanes=nplanes)
        a.pvq = PvqAdapt.reset(is_keyframe)
        a.skip_cdf = cdf_init(2 * NBSIZES, 5, 32, 32)
        a.model_dc = [GenericModel() for _ in range(nplanes)]
        a.ex_dc = np.empty((nplanes, NBSIZES, 3), dtype=np.int64)
        a.ex_sb_dc = np.empty(nplanes, dtype=np.int64)
        for pli in range(nplanes):
            a.ex_dc[pli] = 8 if pli > 0 else 32768
            a.ex_sb_dc[pli] = 8 if pli > 0 else 32768
        a.haar_coeff_cdf = cdf_init(15 * 3 * 5, 16, 32, 32)
        a.haar_split_cdf = cdf_init(15 * 2 * 5, 16, 32, 32)
        a.haar_bits_cdf = cdf_init(3, 16, 32, 32)
        a.clpf_cdf = cdf_init(4, 2, 32, 32)
        a.pvq_qm_q4 = [np.full(QM_SIZE, 16, dtype=np.int32)
                       for _ in range(nplanes)]
        return a


@dataclass
class FrameInfo:
    """Stream-level config (subset of daala_info, codec.h:146-201)."""

    pic_width: int
    pic_height: int
    nplanes: int = 3
    xdec: tuple = (0, 1, 1)   # per-plane horizontal subsampling (4:2:0)
    ydec: tuple = (0, 1, 1)
    bitdepth: int = 8
    keyframe_rate: int = 256
    timebase_num: int = 30
    timebase_den: int = 1
    pixel_aspect_num: int = 1
    pixel_aspect_den: int = 1
    # QM select (OD_SET_QM, daalaenc.h): 0 = flat band weights, 1 =
    # HVS.  Stream-level — carried in the container's setup header so
    # the inter-frame band weights (derived, not signaled) agree on
    # both sides; keyframes additionally signal the interpolated
    # weights verbatim (encode.c:3052-3058 parity).
    qm: int = 1

    @property
    def frame_width(self) -> int:
        return (self.pic_width + 63) & ~63

    @property
    def frame_height(self) -> int:
        return (self.pic_height + 63) & ~63

    def granule_time(self, display_order: int) -> float:
        """Presentation time in seconds of a frame's display index —
        the daala_granule_time equivalent (state.c:1071-1098; our
        container stores the display order directly, the granulepos
        analogue, so no keyframe-shift unpacking is needed)."""
        if display_order < 0:
            return -1.0
        return ((display_order + 1) * self.timebase_den
                / max(1, self.timebase_num))
