"""Adaptive probability models layered on the range coder.

Three models, mirroring the reference behavior exactly (so rate/adaptation
characteristics are preserved) while being written for array-state reuse on
device later:

* **Adaptive CDF coding** — per-symbol CDF adaptation: add `increment` to
  every CDF entry at/after the coded symbol, halving (with a non-null floor)
  on saturation (generic_encoder.c:47-58).
* **Generic (model) coder** — unbounded non-negative ints coded through an
  adaptive expectation Ex (Q16): 12 CDFs indexed by log-expectation
  half-octave, 16-symbol head, Laplace tail past 15, raw LSBs when the
  expectation is large (generic_encoder.c:72-124, generic_decoder.c:76-125).
* **Laplace coders** — exponential-decay tail coder plus the K-pulse
  vector coder used for PVQ codewords (laplace_encoder.c:48-260,
  laplace_decoder.c:46-285).

State lives in plain numpy arrays so it can be checkpointed/rolled back by
value and mirrored into device-side adaptation buffers.
"""

from __future__ import annotations

import numpy as np

from .coder import RangeDecoder, RangeEncoder
from .tables import EXP_CDF_TABLE, LAPLACE_OFFSET

__all__ = [
    "GENERIC_TABLES",
    "OD_ADAPT_K_Q8",
    "OD_ADAPT_SUM_EX_Q8",
    "OD_ADAPT_COUNT_Q8",
    "OD_ADAPT_COUNT_EX_Q8",
    "OD_ADAPT_NO_VALUE",
    "cdf_init",
    "encode_cdf_adapt",
    "decode_cdf_adapt",
    "GenericModel",
    "log_ex",
    "generic_encode",
    "generic_decode",
    "laplace_encode_special",
    "laplace_decode_special",
    "laplace_encode",
    "laplace_decode",
    "laplace_encode_vector",
    "laplace_decode_vector",
]

GENERIC_TABLES = 12

# Indices into the 4-entry PVQ adaptation vectors (pvq.h:79-84).
OD_ADAPT_K_Q8 = 0
OD_ADAPT_SUM_EX_Q8 = 1
OD_ADAPT_COUNT_Q8 = 2
OD_ADAPT_COUNT_EX_Q8 = 3
OD_ADAPT_NO_VALUE = -(2**31)


def _ilog(x: int) -> int:
    return int(x).bit_length()


def cdf_init(ncdfs: int, nsyms: int, val: int, first: int) -> np.ndarray:
    """Linear-init an array of CDFs: cdf[i][j] = val*j + first."""
    j = np.arange(nsyms, dtype=np.int32)
    return np.tile(val * j + first, (ncdfs, 1)).astype(np.int32)


def _adapt_cdf(cdf: np.ndarray, val: int, increment: int) -> None:
    """In-place CDF adaptation shared by encoder and decoder."""
    n = len(cdf)
    if int(cdf[n - 1]) + increment > 32767:
        for i in range(n):
            cdf[i] = (int(cdf[i]) >> 1) + i + 1
    cdf[val:] += increment


def encode_cdf_adapt(
    enc: RangeEncoder, val: int, cdf: np.ndarray, increment: int
) -> None:
    enc.encode_cdf_unscaled(val, cdf)
    _adapt_cdf(cdf, val, increment)


def decode_cdf_adapt(
    dec: RangeDecoder, cdf: np.ndarray, increment: int
) -> int:
    val = dec.decode_cdf_unscaled(cdf)
    _adapt_cdf(cdf, val, increment)
    return val


class GenericModel:
    """Adaptive model for one-sided, single-mode, exp-decay integers."""

    __slots__ = ("cdf", "increment")

    def __init__(self) -> None:
        self.increment = 64
        # Flat init: one count per bin (generic_code.c:45-55).
        self.cdf = np.tile(
            (np.arange(16, dtype=np.int32) + 1) * 64, (GENERIC_TABLES, 1)
        )

    def copy(self) -> "GenericModel":
        m = GenericModel.__new__(GenericModel)
        m.increment = self.increment
        m.cdf = self.cdf.copy()
        return m


def log_ex(ex_q16: int) -> int:
    """2*log2(ex_q16 / 2**16) in Q1 (generic_code.c:63-78)."""
    lg = _ilog(ex_q16)
    if lg < 15:
        odd = int(ex_q16 * ex_q16 > 2 << (2 * lg))
    else:
        tmp = ex_q16 >> (lg - 8)
        odd = int(tmp * tmp > (1 << 15))
    return max(0, 2 * lg - 33 + odd)


def _model_update(
    model: GenericModel, ex_q16: int, x: int, xs: int, mid: int,
    integration: int,
) -> int:
    """Adapt the CDF and the expectation; returns the new ex_q16."""
    cdf = model.cdf[mid]
    if int(cdf[15]) + model.increment > 32767:
        for i in range(16):
            cdf[i] = (int(cdf[i]) >> 1) + i + 1
    cdf[min(15, xs):] += model.increment
    x = min(x, 32767)
    # Leaky integration over 1 << integration samples (OD_IIR_DIADIC).
    return ex_q16 + (((x << 16) - ex_q16) >> integration)


def generic_encode(
    enc: RangeEncoder,
    model: GenericModel,
    x: int,
    maxval: int,
    ex_q16: int,
    integration: int,
) -> int:
    """Encode x in [0, maxval] (maxval == -1 for unbounded); returns new ex."""
    if maxval == 0:
        return ex_q16
    lg_q1 = log_ex(ex_q16)
    shift = max(0, (lg_q1 - 5) >> 1)
    mid = min(GENERIC_TABLES - 1, lg_q1)
    cdf = model.cdf[mid]
    xs = (x + (1 << shift >> 1)) >> shift
    ms = (maxval + (1 << shift >> 1)) >> shift
    if maxval == -1:
        enc.encode_cdf_unscaled(min(15, xs), cdf)
    else:
        enc.encode_cdf_unscaled(min(15, xs), cdf[: min(ms + 1, 16)])
    if xs >= 15:
        e = ((2 * ex_q16 >> 8) + (1 << shift >> 1)) >> shift
        decay = max(2, min(254, 256 * e // (e + 256)))
        laplace_encode_special(enc, xs - 15, decay, -1 if maxval == -1 else ms - 15)
    if shift != 0:
        special = int(xs == 0)
        if shift - special > 0:
            enc.encode_bits(
                x - (xs << shift) + ((1 - special) << (shift - 1)),
                shift - special,
            )
    return _model_update(model, ex_q16, x, xs, mid, integration)


def generic_decode(
    dec: RangeDecoder,
    model: GenericModel,
    maxval: int,
    ex_q16: int,
    integration: int,
) -> tuple:
    """Returns (x, new_ex_q16)."""
    if maxval == 0:
        return 0, ex_q16
    lg_q1 = log_ex(ex_q16)
    shift = max(0, (lg_q1 - 5) >> 1)
    mid = min(GENERIC_TABLES - 1, lg_q1)
    cdf = model.cdf[mid]
    ms = (maxval + (1 << shift >> 1)) >> shift
    if maxval == -1:
        xs = dec.decode_cdf_unscaled(cdf)
    else:
        xs = dec.decode_cdf_unscaled(cdf[: min(ms + 1, 16)])
    if xs == 15:
        e = ((2 * ex_q16 >> 8) + (1 << shift >> 1)) >> shift
        decay = max(2, min(254, 256 * e // (e + 256)))
        xs += laplace_decode_special(dec, decay, -1 if maxval == -1 else ms - 15)
    lsb = 0
    if shift != 0:
        special = int(xs == 0)
        if shift - special > 0:
            lsb = dec.decode_bits(shift - special)
        lsb -= (1 - special) << (shift - 1)
    x = (xs << shift) + lsb
    return x, _model_update(model, ex_q16, x, xs, mid, integration)


def generic_encode_cost(model: GenericModel, x: int, maxval: int,
                        ex_q16: int) -> float:
    """Approximate bit cost of generic_encode (generic_encoder.c:134-168)."""
    if maxval == 0:
        return 0.0
    lg_q1 = log_ex(ex_q16)
    shift = max(0, (lg_q1 - 5) >> 1)
    mid = min(GENERIC_TABLES - 1, lg_q1)
    cdf = model.cdf[mid]
    xs = (x + (1 << shift >> 1)) >> shift
    ms = (maxval + (1 << shift >> 1)) >> shift
    extra = 0
    if shift:
        extra = shift - int(xs == 0)
    xs = min(15, xs)
    if xs == 15:
        extra += 2
    denom = int(cdf[15]) if maxval == -1 else int(cdf[min(ms, 15)])
    p = (int(cdf[xs]) - (0 if xs == 0 else int(cdf[xs - 1]))) / denom
    return extra - np.log2(p)


# -- Laplace tail / vector coders ---------------------------------------


def laplace_encode_special(
    enc: RangeEncoder, x: int, decay: int, maxval: int
) -> None:
    """Encode the tail of a Laplace variable; pdf ~= decay^x (Q8 decay)."""
    shift = 0
    if maxval == 0:
        return
    while ((maxval >> shift) >= 15 or maxval == -1) and decay > 235:
        decay = (decay * decay + 128) >> 8
        shift += 1
    decay = max(2, min(254, decay))
    xs = x >> shift
    ms = maxval >> shift
    cdf = EXP_CDF_TABLE[(decay + 1) >> 1]
    while True:
        sym = min(xs, 15)
        if 0 < ms < 15:
            enc.encode_cdf_unscaled(sym, cdf[: ms + 1])
        else:
            enc.encode_cdf_q15(sym, cdf)
        xs -= 15
        ms -= 15
        if not (sym >= 15 and ms != 0):
            break
    if shift:
        enc.encode_bits(x & ((1 << shift) - 1), shift)


def laplace_decode_special(dec: RangeDecoder, decay: int, maxval: int) -> int:
    shift = 0
    if maxval == 0:
        return 0
    while ((maxval >> shift) >= 15 or maxval == -1) and decay > 235:
        decay = (decay * decay + 128) >> 8
        shift += 1
    decay = max(2, min(254, decay))
    ms = maxval >> shift
    cdf = EXP_CDF_TABLE[(decay + 1) >> 1]
    xs = 0
    while True:
        if 0 < ms < 15:
            sym = dec.decode_cdf_unscaled(cdf[: ms + 1])
        else:
            sym = dec.decode_cdf_q15(cdf)
        xs += sym
        ms -= 15
        if not (sym >= 15 and ms != 0):
            break
    pos = (xs << shift) + dec.decode_bits(shift) if shift else xs
    if maxval != -1 and pos > maxval:
        pos = maxval
        dec.error = 1
    return pos


def laplace_encode(enc: RangeEncoder, x: int, ex_q8: int, k: int) -> None:
    """Encode signed x with |x| <= k given E(|x|) in Q8."""
    shift = max(0, _ilog(ex_q8) - 11)
    ex_q8 = (ex_q8 + (1 << shift >> 1)) >> shift
    k = (k + (1 << shift >> 1)) >> shift
    xs = (x + (1 << shift >> 1)) >> shift
    decay = min(254, 256 * ex_q8 // (ex_q8 + 256))
    idx = (decay + 1) >> 1
    offset = int(LAPLACE_OFFSET[idx])
    cdf = EXP_CDF_TABLE[idx] - offset
    sym = min(xs, 15)
    if k != 0:
        enc.encode_cdf_unscaled(sym, cdf[: min(k + 1, 16)])
    if shift:
        special = int(xs == 0)
        if shift - special > 0:
            enc.encode_bits(
                x - (xs << shift) + ((1 - special) << (shift - 1)),
                shift - special,
            )
    if xs >= 15:
        laplace_encode_special(enc, xs - 15, decay, k - 15)


def laplace_decode(dec: RangeDecoder, ex_q8: int, k: int) -> int:
    shift = max(0, _ilog(ex_q8) - 11)
    ex_q8 = (ex_q8 + (1 << shift >> 1)) >> shift
    k = (k + (1 << shift >> 1)) >> shift
    decay = min(254, 256 * ex_q8 // (ex_q8 + 256))
    idx = (decay + 1) >> 1
    offset = int(LAPLACE_OFFSET[idx])
    cdf = EXP_CDF_TABLE[idx] - offset
    sym = 0 if k == 0 else dec.decode_cdf_unscaled(cdf[: min(k + 1, 16)])
    lsb = 0
    if shift:
        special = int(sym == 0)
        if shift - special > 0:
            lsb = dec.decode_bits(shift - special)
        lsb -= (1 - special) << (shift - 1)
    if sym == 15:
        sym += laplace_decode_special(dec, decay, k - 15)
    return (sym << shift) + lsb


def _delta_decay(coef: int, n: int, prev: int, k_left: int) -> int:
    ex = coef * (n - prev) // k_left
    if ex > 65280:
        return 255
    return min(
        255,
        256 * ex // (ex + 256)
        + (ex >> 5) * ex // ((n + 1) * (n - 1) * (n - 1)),
    )


def _encode_vector_delta(
    enc: RangeEncoder, y, n: int, k: int, curr, means
) -> None:
    """Position-delta coding for sparse vectors (k <= 1 pulse runs)."""
    prev = 0
    sum_ex = 0
    sum_c = 0
    first = True
    k_left = k
    coef = max(
        1,
        256 * int(means[OD_ADAPT_COUNT_Q8])
        // (1 + int(means[OD_ADAPT_COUNT_EX_Q8])),
    )
    for i in range(n):
        if y[i] != 0:
            mag = abs(int(y[i]))
            count = i - prev
            if first:
                decay = _delta_decay(coef, n, prev, k_left)
                laplace_encode_special(enc, count, decay, n - 1)
                first = False
            else:
                laplace_encode(
                    enc, count, coef * (n - prev) // k_left, n - prev - 1
                )
            sum_ex += 256 * (n - prev)
            sum_c += count * k_left
            enc.encode_bits(int(y[i] < 0), 1)
            for j in range(mag - 1):
                laplace_encode(
                    enc, 0, coef * (n - i) // (k_left - 1 - j), n - i - 1
                )
                sum_ex += 256 * (n - i)
            k_left -= mag
            prev = i
            if k_left == 0:
                break
    if k > 0:
        curr[OD_ADAPT_COUNT_Q8] = 256 * sum_c
        curr[OD_ADAPT_COUNT_EX_Q8] = sum_ex
    else:
        curr[OD_ADAPT_COUNT_Q8] = OD_ADAPT_NO_VALUE
        curr[OD_ADAPT_COUNT_EX_Q8] = OD_ADAPT_NO_VALUE
    curr[OD_ADAPT_K_Q8] = 0
    curr[OD_ADAPT_SUM_EX_Q8] = 0


def laplace_encode_vector(
    enc: RangeEncoder, y, n: int, k: int, curr, means
) -> None:
    """Encode an integer pulse vector with sum(|y|) == k.

    `curr`/`means` are 4-entry adaptation vectors (may alias).
    """
    if k <= 1:
        _encode_vector_delta(enc, y, n, k, curr, means)
        return
    sum_ex = 0
    kn = k
    mean_k_q8 = int(means[OD_ADAPT_K_Q8])
    mean_sum_ex_q8 = int(means[OD_ADAPT_SUM_EX_Q8])
    if mean_k_q8 < 1 << 23:
        exp_q8 = 256 * mean_k_q8 // (1 + mean_sum_ex_q8)
    else:
        exp_q8 = mean_k_q8 // (1 + (mean_sum_ex_q8 >> 8))
    ran_delta = False
    for i in range(n):
        if kn == 0:
            break
        if kn <= 1 and i != n - 1:
            _encode_vector_delta(enc, y[i:], n - i, kn, curr, means)
            ran_delta = True
            break
        x = abs(int(y[i]))
        ex = (2 * exp_q8 * kn + (n - i)) // (2 * (n - i))
        ex = min(ex, kn * 256)
        sum_ex += (2 * 256 * kn + (n - i)) // (2 * (n - i))
        if i != n - 1:
            laplace_encode(enc, x, ex, kn)
        if x != 0:
            enc.encode_bits(int(y[i] < 0), 1)
        kn -= x
    if not ran_delta:
        curr[OD_ADAPT_COUNT_Q8] = OD_ADAPT_NO_VALUE
        curr[OD_ADAPT_COUNT_EX_Q8] = OD_ADAPT_NO_VALUE
    curr[OD_ADAPT_K_Q8] = k - kn
    curr[OD_ADAPT_SUM_EX_Q8] = sum_ex


def _decode_vector_delta(
    dec: RangeDecoder, y, n: int, k: int, curr, means
) -> None:
    prev = 0
    sum_ex = 0
    sum_c = 0
    coef = max(
        1,
        256 * int(means[OD_ADAPT_COUNT_Q8])
        // (1 + int(means[OD_ADAPT_COUNT_EX_Q8])),
    )
    pos = 0
    sign = 0
    first = True
    k_left = k
    y[:n] = 0
    for _ in range(k_left):
        if first:
            decay = _delta_decay(coef, n, prev, k_left)
            count = laplace_decode_special(dec, decay, n - 1)
            first = False
        else:
            count = laplace_decode(
                dec, coef * (n - prev) // k_left, n - prev - 1
            )
        sum_ex += 256 * (n - prev)
        sum_c += count * k_left
        pos += count
        if y[pos] == 0:
            sign = dec.decode_bits(1)
        y[pos] += -1 if sign else 1
        prev = pos
        k_left -= 1
        if k_left == 0:
            break
    if k > 0:
        curr[OD_ADAPT_COUNT_Q8] = 256 * sum_c
        curr[OD_ADAPT_COUNT_EX_Q8] = sum_ex
    else:
        curr[OD_ADAPT_COUNT_Q8] = OD_ADAPT_NO_VALUE
        curr[OD_ADAPT_COUNT_EX_Q8] = OD_ADAPT_NO_VALUE
    curr[OD_ADAPT_K_Q8] = 0
    curr[OD_ADAPT_SUM_EX_Q8] = 0


def laplace_decode_vector(
    dec: RangeDecoder, y, n: int, k: int, curr, means
) -> None:
    if k <= 1:
        _decode_vector_delta(dec, y, n, k, curr, means)
        return
    sum_ex = 0
    kn = k
    mean_k_q8 = int(means[OD_ADAPT_K_Q8])
    mean_sum_ex_q8 = int(means[OD_ADAPT_SUM_EX_Q8])
    if mean_k_q8 < 1 << 23:
        exp_q8 = 256 * mean_k_q8 // (1 + mean_sum_ex_q8)
    else:
        exp_q8 = mean_k_q8 // (1 + (mean_sum_ex_q8 >> 8))
    ran_delta = False
    i = 0
    while i < n:
        if kn == 0:
            break
        if kn <= 1 and i != n - 1:
            _decode_vector_delta(dec, y[i:], n - i, kn, curr, means)
            ran_delta = True
            i = n
            break
        ex = (2 * exp_q8 * kn + (n - i)) // (2 * (n - i))
        ex = min(ex, kn * 256)
        sum_ex += (2 * 256 * kn + (n - i)) // (2 * (n - i))
        if i != n - 1:
            x = laplace_decode(dec, ex, kn)
        else:
            x = kn
        if x != 0 and dec.decode_bits(1):
            x = -x
        y[i] = x
        kn -= abs(x)
        i += 1
    if not ran_delta:
        curr[OD_ADAPT_COUNT_Q8] = OD_ADAPT_NO_VALUE
        curr[OD_ADAPT_COUNT_EX_Q8] = OD_ADAPT_NO_VALUE
    curr[OD_ADAPT_K_Q8] = k - kn
    curr[OD_ADAPT_SUM_EX_Q8] = sum_ex
    y[i:n] = 0
