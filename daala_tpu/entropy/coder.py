"""Multisymbol range coder (host/reference implementation).

A from-scratch implementation of the Daala non-binary range coder with the
"reduced overhead" partition function, written against the *behavioral spec*
of the reference coder (see /root/reference/src/entcode.h:31-84 for the
partition-function derivation, entenc.c:63-114 for encoder renormalization,
and entdec.c:109-153 for decoder refill/renormalization).

This module is the serialization spine of the codec:

* 16-bit range, 32-bit window, Q15 CDFs (total frequency <= 32768).
* Division-free "reduced overhead" partition: with d = r - ft and
  e = max(2*d - ft, 0),  y(x) = x + min(x, e) + min(max(x - e, 0) >> 1, d).
* Raw bits are written into a *separate* back-to-front buffer spliced onto
  the end of the packet at `done()` time (entenc.c:437-485), which is what
  lets our TPU pipeline treat raw bits as an order-independent sidechannel.
* Encoder output is staged in a pre-carry buffer of 16-bit values; carry
  propagation is resolved once at `done()` (entenc.c:625-638).  The same
  split is what lets the device-side scan emit pre-carry values in parallel
  with a cheap host/native resolve pass.
* `checkpoint()`/`rollback()` give O(1) trial-encode undo (entenc.c:680-706),
  used by every RDO decision in the encoder.

This host implementation is the oracle for the fast native packer in
`native/ec.cpp` (the default spine; see entropy/native.py) and for the
symbol walks that pack device-emitted symbol tensors.
All arithmetic is exact unsigned integer math (Python ints, masked where the
32-bit window semantics require wraparound).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

__all__ = [
    "RangeEncoder",
    "RangeDecoder",
    "uniform_cdf_q15",
    "tell_frac",
    "OD_BITRES",
    "EC_UINT_BITS",
]

# Number of bits for the range-coded head of raw unsigned integers
# (entcode.h:100).
EC_UINT_BITS = 4
# Fractional bit resolution: 3 -> 1/8th bits (entcode.h:104).
OD_BITRES = 3

_WINDOW_BITS = 32
_WINDOW_MASK = (1 << _WINDOW_BITS) - 1
_LOTS_OF_BITS = 0x4000

# Cache of uniform CDFs for n in [2, 16] (entcode.c:33-54 builds the same
# values; we compute them from the closed form round(32768*(j+1)/n)).
_UNIFORM_CDFS = {
    n: tuple((32768 * (j + 1) + (n >> 1)) // n for j in range(n))
    for n in range(2, 17)
}


def uniform_cdf_q15(n: int) -> Tuple[int, ...]:
    """Q15 CDF of the uniform distribution over n symbols (2 <= n <= 16)."""
    return _UNIFORM_CDFS[n]


def _ilog(x: int) -> int:
    """Index of the highest set bit + 1; 0 for x == 0 (OD_ILOG)."""
    return int(x).bit_length()


def _partition(x: int, d: int, e: int) -> int:
    """Reduced-overhead partition function mapping [0, ft] -> [0, r].

    See entcode.h:70-76: y = x + min(x, e) + min(max(x - e, 0) >> 1, d)
    with e = max(2*d - ft, 0) precomputed by the caller.
    """
    return x + min(x, e) + min(max(x - e, 0) >> 1, d)


def tell_frac(nbits_total: int, rng: int) -> int:
    """Fractional (1/8th bit) bit-usage estimate (entcode.c:65-91)."""
    nbits = nbits_total << OD_BITRES
    l = 0
    for _ in range(OD_BITRES):
        rng = (rng * rng) >> 15
        b = rng >> 16
        l = (l << 1) | b
        rng >>= b
    return nbits - l


class RangeEncoder:
    """Range encoder producing a single packet buffer.

    Symbols go through `encode_cdf_*`; raw bits through `encode_bits`.
    `done()` returns the packed bytes.  The encoder may keep being used
    after `tell()`; `reset()` restarts it.
    """

    __slots__ = (
        "precarry",
        "low",
        "rng",
        "cnt",
        "end_flushed",
        "end_window",
        "nend_bits",
        "error",
    )

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        # Pre-carry buffer: 16-bit values (may exceed 0xFF before carry
        # resolution).
        self.precarry: List[int] = []
        self.low = 0
        self.rng = 0x8000
        # -9 so the count crosses zero after one byte + one carry bit
        # (entenc.c:143-145).
        self.cnt = -9
        # Raw-bit buffer, bytes in flush order (they land reversed at the
        # end of the packet).
        self.end_flushed: List[int] = []
        self.end_window = 0
        self.nend_bits = 0
        self.error = 0

    # -- core ------------------------------------------------------------

    def _normalize(self, low: int, rng: int) -> None:
        """Renormalize so that 32768 <= rng < 65536, flushing bytes."""
        c = self.cnt
        d = 16 - _ilog(rng)
        s = c + d
        if s >= 0:
            c += 16
            m = (1 << c) - 1
            if s >= 8:
                self.precarry.append((low >> c) & 0xFFFF)
                low &= m
                c -= 8
                m >>= 8
            self.precarry.append((low >> c) & 0xFFFF)
            s = c + d - 24
            low &= m
        self.low = (low << d) & _WINDOW_MASK
        self.rng = rng << d
        self.cnt = s

    def encode(self, fl: int, fh: int, ft: int) -> None:
        """Encode a symbol spanning [fl, fh) out of total ft.

        ft must be in [16384, 32768]; for smaller totals use
        `encode_cdf_unscaled`.
        """
        fl = int(fl)
        fh = int(fh)
        ft = int(ft)
        assert 0 <= fl < fh <= ft
        assert 16384 <= ft <= 32768
        l = self.low
        r = self.rng
        s = 1 if r - ft >= ft else 0
        ft <<= s
        fl <<= s
        fh <<= s
        d = r - ft
        e = max(2 * d - ft, 0)
        u = _partition(fl, d, e)
        v = _partition(fh, d, e)
        self._normalize(l + u, v - u)

    def encode_cdf_q15(self, s: int, cdf: Sequence[int]) -> None:
        """Encode symbol index s with a Q15 CDF (last entry == 32768)."""
        self.encode(cdf[s - 1] if s > 0 else 0, cdf[s], cdf[-1])

    def encode_cdf_unscaled(self, s: int, cdf: Sequence[int]) -> None:
        """Encode with a CDF whose total may be as small as 2."""
        ft = cdf[-1]
        sh = 15 - _ilog(ft - 1)
        fl = (cdf[s - 1] << sh) if s > 0 else 0
        self.encode(fl, cdf[s] << sh, ft << sh)

    def encode_cdf_unscaled_dyadic(
        self, s: int, cdf: Sequence[int], ftb: int
    ) -> None:
        """Encode with a CDF whose total is exactly 1 << ftb (ftb <= 15)."""
        sh = 15 - ftb
        self.encode(
            (cdf[s - 1] << sh) if s > 0 else 0, cdf[s] << sh, 1 << 15
        )

    def encode_bool_q15(self, val: int, fz: int) -> None:
        """Encode a bit with probability fz/32768 of being zero."""
        if val:
            self.encode(fz, 32768, 32768)
        else:
            self.encode(0, fz, 32768)

    def encode_uint(self, fl: int, ft: int) -> None:
        """Encode an integer in [0, ft) for arbitrary ft up to 2**29.

        Splits into a range-coded head of EC_UINT_BITS bits plus raw LSBs
        (entenc.c:417-431).
        """
        assert ft >= 2 and fl < ft
        if ft > 1 << EC_UINT_BITS:
            ft -= 1
            ftb = _ilog(ft) - EC_UINT_BITS
            ft1 = (ft >> ftb) + 1
            self.encode_cdf_q15(fl >> ftb, uniform_cdf_q15(ft1))
            self.encode_bits(fl & ((1 << ftb) - 1), ftb)
        else:
            self.encode_cdf_q15(fl, uniform_cdf_q15(ft))

    def encode_bits(self, fl: int, ftb: int) -> None:
        """Append ftb raw bits (0 <= ftb <= 25) to the end buffer."""
        assert 0 <= ftb <= 25 and 0 <= fl < (1 << ftb)
        end_window = self.end_window
        nend_bits = self.nend_bits
        if nend_bits + ftb > _WINDOW_BITS:
            while nend_bits >= 8:
                self.end_flushed.append(end_window & 0xFF)
                end_window >>= 8
                nend_bits -= 8
        self.end_window = end_window | (fl << nend_bits)
        self.nend_bits = nend_bits + ftb

    # -- finalization ----------------------------------------------------

    def done(self) -> bytes:
        """Flush and return the final packet bytes.

        Emits the minimum number of bits that guarantees correct decode
        regardless of trailing bits, resolves pre-carry values, and splices
        the raw-bit buffer onto the end (entenc.c:533-646).
        """
        l = self.low
        r = self.rng
        c = self.cnt
        s = 9
        m = 0x7FFF
        e = (l + m) & ~m
        while (e | m) >= l + r:
            s += 1
            m >>= 1
            e = (l + m) & ~m
        s += c
        precarry = list(self.precarry)
        if s > 0:
            n = (1 << (c + 16)) - 1
            while True:
                precarry.append((e >> (c + 16)) & 0xFFFF)
                e &= n
                s -= 8
                c -= 8
                n >>= 8
                if s <= 0:
                    break
        # Flush raw bits that do not fit in the slack bits of the last EC
        # byte.
        end_flushed = list(self.end_flushed)
        ew = self.end_window
        nb = self.nend_bits
        s = -s
        while nb > s:
            end_flushed.append(ew & 0xFF)
            ew >>= 8
            nb -= 8
        # Carry propagation across the pre-carry values.
        out = bytearray(len(precarry))
        carry = 0
        for i in reversed(range(len(precarry))):
            v = precarry[i] + carry
            out[i] = v & 0xFF
            carry = v >> 8
        # Remaining raw bits fit in the slack of the final EC byte.
        if nb > 0:
            assert len(out) > 0
            out[-1] |= ew & 0xFF
        return bytes(out) + bytes(reversed(end_flushed))

    # -- telemetry / RDO -------------------------------------------------

    def tell(self) -> int:
        """Conservative number of bits used so far (entenc.c:657-661)."""
        return (
            (len(self.precarry) + len(self.end_flushed)) * 8
            + self.cnt
            + self.nend_bits
            + 10
        )

    def tell_frac(self) -> int:
        """tell() in 1/8th-bit units."""
        return tell_frac(self.tell(), self.rng)

    def checkpoint(self) -> tuple:
        """Snapshot for later rollback (cheap: O(1))."""
        return (
            len(self.precarry),
            self.low,
            self.rng,
            self.cnt,
            len(self.end_flushed),
            self.end_window,
            self.nend_bits,
        )

    def rollback(self, state: tuple) -> None:
        """Restore an earlier checkpoint (must be a causal ancestor)."""
        (np_, low, rng, cnt, ne, ew, nb) = state
        del self.precarry[np_:]
        self.low = low
        self.rng = rng
        self.cnt = cnt
        del self.end_flushed[ne:]
        self.end_window = ew
        self.nend_bits = nb


class RangeDecoder:
    """Range decoder mirroring RangeEncoder.

    Reads EC symbols from the front of the buffer and raw bits from the
    back (entdec.c:158-175, 536-568).
    """

    __slots__ = (
        "buf",
        "bpos",
        "epos",
        "dif",
        "rng",
        "cnt",
        "end_window",
        "nend_bits",
        "tell_offs",
        "error",
    )

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.bpos = 0
        self.epos = len(buf)
        self.dif = 0
        self.rng = 0x8000
        self.cnt = -15
        self.end_window = 0
        self.nend_bits = 0
        self.tell_offs = 10 - (_WINDOW_BITS - 8)
        self.error = 0
        self._refill()

    # -- core ------------------------------------------------------------

    def _refill(self) -> None:
        s = _WINDOW_BITS - 9 - (self.cnt + 15)
        buf = self.buf
        n = len(buf)
        while s >= 0 and self.bpos < n:
            self.dif |= buf[self.bpos] << s
            self.cnt += 8
            self.bpos += 1
            s -= 8
        if self.bpos >= n:
            self.tell_offs += _LOTS_OF_BITS - self.cnt
            self.cnt = _LOTS_OF_BITS

    def _normalize(self, dif: int, rng: int) -> None:
        d = 16 - _ilog(rng)
        self.cnt -= d
        self.dif = (dif << d) & _WINDOW_MASK
        self.rng = rng << d
        if self.cnt < 0:
            self._refill()

    def _decode(self, cdf: Sequence[int], ft: int, sh: int) -> int:
        """Shared decode body; cdf entries are pre-shift, sh the scaling."""
        dif = self.dif
        r = self.rng
        fts = int(ft) << sh
        if r - fts >= fts:
            fts <<= 1
            sh += 1
        d = r - fts
        c = dif >> (_WINDOW_BITS - 16)
        q = max(c >> 1, c - d)
        e = max(2 * d - fts, 0)
        # Inverse partition; negative results never win the max
        # (entdec.c:292-299).
        q = max(q, (2 * c + 1 - e) // 3)
        q >>= sh
        fl = 0
        ret = 0
        fh = int(cdf[0])
        while fh <= q:
            fl = fh
            ret += 1
            fh = int(cdf[ret])
        fl <<= sh
        fh <<= sh
        u = _partition(fl, d, e)
        v = _partition(fh, d, e)
        self._normalize(dif - (u << (_WINDOW_BITS - 16)), v - u)
        return ret

    def decode_cdf_q15(self, cdf: Sequence[int]) -> int:
        """Decode a symbol with a Q15 CDF (last entry == 32768)."""
        return self._decode(cdf, 32768, 0)

    def decode_cdf_unscaled(self, cdf: Sequence[int]) -> int:
        ft = cdf[-1]
        return self._decode(cdf, ft, 15 - _ilog(ft - 1))

    def decode_cdf_unscaled_dyadic(self, cdf: Sequence[int], ftb: int) -> int:
        return self._decode(cdf, 1 << ftb, 15 - ftb)

    def decode_bool_q15(self, fz: int) -> int:
        return self._decode((fz, 32768), 32768, 0)

    def decode_uint(self, ft: int) -> int:
        assert ft >= 2
        if ft > 1 << EC_UINT_BITS:
            ft -= 1
            ftb = _ilog(ft) - EC_UINT_BITS
            ft1 = (ft >> ftb) + 1
            t = self.decode_cdf_q15(uniform_cdf_q15(ft1))
            t = (t << ftb) | self.decode_bits(ftb)
            if t <= ft:
                return t
            self.error = 1
            return ft
        return self.decode_cdf_q15(uniform_cdf_q15(ft))

    def decode_bits(self, ftb: int) -> int:
        """Read ftb raw bits from the back of the buffer."""
        assert 0 <= ftb <= 25
        window = self.end_window
        available = self.nend_bits
        if available < ftb:
            while available <= _WINDOW_BITS - 8:
                if self.epos <= 0:
                    self.tell_offs += _LOTS_OF_BITS - available
                    available = _LOTS_OF_BITS
                    break
                self.epos -= 1
                window |= self.buf[self.epos] << available
                available += 8
        ret = window & ((1 << ftb) - 1)
        window >>= ftb
        available -= ftb
        self.end_window = window
        self.nend_bits = available
        return ret

    # -- telemetry -------------------------------------------------------

    def tell(self) -> int:
        """Bits used so far; matches the encoder's tell() stream position."""
        return (
            (len(self.buf) - self.epos + self.bpos) * 8
            - self.cnt
            - self.nend_bits
            + self.tell_offs
        )

    def tell_frac(self) -> int:
        return tell_frac(self.tell(), self.rng)
