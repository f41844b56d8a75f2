"""Decoder-side bit accounting.

Per-symbol attribution of bits to (technique, plane, level, x, y) —
the reference's --enable-accounting subsystem (accounting.c,
entdec.h:33-53, exported via OD_DECCTL_GET_ACCOUNTING) that feeds the
analyzer's heatmaps.  Wraps a RangeDecoder: every decode call records
the fractional-bit delta (1/8-bit units) under the label set by the
pipeline.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

from .coder import RangeDecoder

__all__ = ["Accounting", "AccountingDecoder"]


@dataclass
class Accounting:
    """Recorded symbols: (label, pli, level, x, y, frac_bits)."""

    records: List[Tuple[str, int, int, int, int, int]] = field(
        default_factory=list)
    _label: str = ""
    _pli: int = 0
    _level: int = 0
    _x: int = 0
    _y: int = 0

    def set_location(self, label: str, pli: int = 0, level: int = 0,
                     x: int = 0, y: int = 0) -> None:
        self._label = label
        self._pli = pli
        self._level = level
        self._x = x
        self._y = y

    def _record(self, frac_bits: int) -> None:
        self.records.append((self._label, self._pli, self._level,
                             self._x, self._y, frac_bits))

    def by_technique(self) -> Dict[str, float]:
        """Total bits per label."""
        out = defaultdict(float)
        for label, _, _, _, _, fb in self.records:
            out[label] += fb / 8.0
        return dict(sorted(out.items(), key=lambda kv: -kv[1]))

    def by_plane(self) -> Dict[int, float]:
        out = defaultdict(float)
        for _, pli, _, _, _, fb in self.records:
            out[pli] += fb / 8.0
        return dict(out)

    def heatmap(self, w4: int, h4: int):
        """Bits per 4x4 luma cell (the analyzer heatmap input)."""
        import numpy as np

        hm = np.zeros((h4, w4))
        for _, pli, _, x, y, fb in self.records:
            cx = min(max(x // 4, 0), w4 - 1)
            cy = min(max(y // 4, 0), h4 - 1)
            hm[cy, cx] += fb / 8.0
        return hm


class AccountingDecoder(RangeDecoder):
    """RangeDecoder recording per-call bit usage into an Accounting."""

    __slots__ = ("acct",)

    def __init__(self, buf: bytes, acct: Accounting):
        super().__init__(buf)
        self.acct = acct

    def _wrap(self, fn, *args):
        before = self.tell_frac()
        ret = fn(*args)
        self.acct._record(self.tell_frac() - before)
        return ret

    def decode_cdf_q15(self, cdf):
        return self._wrap(super().decode_cdf_q15, cdf)

    def decode_cdf_unscaled(self, cdf):
        return self._wrap(super().decode_cdf_unscaled, cdf)

    def decode_cdf_unscaled_dyadic(self, cdf, ftb):
        return self._wrap(super().decode_cdf_unscaled_dyadic, cdf, ftb)

    def decode_bool_q15(self, fz):
        return self._wrap(super().decode_bool_q15, fz)

    def decode_uint(self, ft):
        return self._wrap(super().decode_uint, ft)

    def decode_bits(self, ftb):
        return self._wrap(super().decode_bits, ftb)
