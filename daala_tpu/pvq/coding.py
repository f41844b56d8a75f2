"""PVQ block encode/decode: RDO search + band coding protocol.

Behavioral spec: pvq_encoder.c (search: 121-310, band driver: 645-815)
and pvq_decoder.c (152-387).  The protocol per block:

  skip symbol (with joint block-skip/split signaling) -> per band:
  jointly-coded (gain>0, theta-class, skip-rest) id -> adaptively-coded
  gain tail and theta tail through the generic model -> pulse codeword
  (k=1 positional CDF or Laplace K-tokens) -> CfL flip bit (chroma
  keyframes).

Per-direction band skipping (skip_dir), whole-block skip with EC
rollback, and the decoder-mirrored synthesis all match the reference's
semantics; the bitstream layout itself is ours.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..entropy import (
    GenericModel,
    RangeDecoder,
    RangeEncoder,
    cdf_init,
    decode_cdf_adapt,
    encode_cdf_adapt,
    generic_decode,
    generic_encode,
    laplace_decode_vector,
    laplace_encode_vector,
)
from . import core
from .core import PVQ_LAMBDA, SKIP_COPY, SKIP_ZERO
from .scan import BAND_OFFSETS, qm_get_index

__all__ = ["PvqAdapt", "pvq_encode_block", "pvq_decode_block",
           "pvq_search", "NPLANES_MAX"]

NPLANES_MAX = 4
NBSIZES = 4
PVQ_MAX_PARTITIONS = 9


@dataclass
class PvqAdapt:
    """PVQ adaptation state (od_pvq_adapt_ctx + codeword ctx,
    pvq.h:96-105), reset per frame (od_adapt_pvq_ctx_reset,
    pvq.c:257-289)."""

    param_model: list = field(default_factory=lambda: [
        GenericModel(), GenericModel(), GenericModel()])
    pvq_adapt: np.ndarray = field(default_factory=lambda: np.tile(
        np.array([384, 256, 104, 128], dtype=np.int64), (2 * NBSIZES, 1)))
    k1_cdf: np.ndarray = field(
        default_factory=lambda: cdf_init(4, 16, 128, 128))
    k1_increment: int = 128
    gaintheta_cdf: np.ndarray = field(default_factory=lambda: cdf_init(
        2 * NBSIZES * PVQ_MAX_PARTITIONS, 16, 32, 32))
    gaintheta_increment: int = 128
    skip_dir_cdf: np.ndarray = field(default_factory=lambda: cdf_init(
        2 * (NBSIZES - 1), 7, 32, 32))
    skip_dir_increment: int = 128
    exg: np.ndarray = field(default_factory=lambda: np.full(
        (NPLANES_MAX, NBSIZES, PVQ_MAX_PARTITIONS), 2 << 16, dtype=np.int64))
    ext: np.ndarray = field(default_factory=lambda: np.full(
        NBSIZES * PVQ_MAX_PARTITIONS, 24576, dtype=np.int64))

    @classmethod
    def reset(cls, is_keyframe: bool) -> "PvqAdapt":
        a = cls()
        if not is_keyframe:
            a.ext[:] = 2 << 16
        return a

    def copy(self) -> "PvqAdapt":
        a = PvqAdapt(
            param_model=[m.copy() for m in self.param_model],
            pvq_adapt=self.pvq_adapt.copy(),
            k1_cdf=self.k1_cdf.copy(),
            gaintheta_cdf=self.gaintheta_cdf.copy(),
            skip_dir_cdf=self.skip_dir_cdf.copy(),
            exg=self.exg.copy(),
            ext=self.ext.copy(),
        )
        return a

    def restore(self, other: "PvqAdapt") -> None:
        self.param_model = [m.copy() for m in other.param_model]
        self.pvq_adapt = other.pvq_adapt.copy()
        self.k1_cdf = other.k1_cdf.copy()
        self.gaintheta_cdf = other.gaintheta_cdf.copy()
        self.skip_dir_cdf = other.skip_dir_cdf.copy()
        self.exg = other.exg.copy()
        self.ext = other.ext.copy()


# -- codeword coding ------------------------------------------------------


def _encode_codeword(enc: RangeEncoder, adapt: PvqAdapt, y: np.ndarray,
                     n: int, k: int, noref: bool, bs: int) -> None:
    if k == 1 and n < 16:
        cdf_id = 2 * (n == 15) + (not noref)
        nn = n - (not noref)
        pos = int(np.flatnonzero(y[:nn])[0])
        encode_cdf_adapt(enc, pos, adapt.k1_cdf[cdf_id][:nn],
                         adapt.k1_increment)
        enc.encode_bits(int(y[pos] < 0), 1)
    else:
        speed = 5
        row = adapt.pvq_adapt[2 * bs + (1 if noref else 0)]
        curr = np.zeros(4, dtype=np.int64)
        laplace_encode_vector(enc, y, n - (not noref), k, curr, row)
        _merge_adapt(row, curr, speed)


def _decode_codeword(dec: RangeDecoder, adapt: PvqAdapt, n: int, k: int,
                     noref: bool, bs: int) -> np.ndarray:
    y = np.zeros(n, dtype=np.int64)
    if k == 1 and n < 16:
        cdf_id = 2 * (n == 15) + (not noref)
        nn = n - (not noref)
        pos = decode_cdf_adapt(dec, adapt.k1_cdf[cdf_id][:nn],
                               adapt.k1_increment)
        y[pos] = 1
        if dec.decode_bits(1):
            y[pos] = -1
    else:
        speed = 5
        row = adapt.pvq_adapt[2 * bs + (1 if noref else 0)]
        curr = np.zeros(4, dtype=np.int64)
        laplace_decode_vector(dec, y, n - (not noref), k, curr, row)
        _merge_adapt(row, curr, speed)
    return y


def _merge_adapt(row, curr, speed):
    from ..entropy.adapt import (
        OD_ADAPT_COUNT_EX_Q8,
        OD_ADAPT_COUNT_Q8,
        OD_ADAPT_K_Q8,
        OD_ADAPT_SUM_EX_Q8,
    )
    if curr[OD_ADAPT_K_Q8] > 0:
        row[OD_ADAPT_K_Q8] += (256 * curr[OD_ADAPT_K_Q8]
                               - row[OD_ADAPT_K_Q8]) >> speed
        row[OD_ADAPT_SUM_EX_Q8] += (curr[OD_ADAPT_SUM_EX_Q8]
                                    - row[OD_ADAPT_SUM_EX_Q8]) >> speed
    if curr[OD_ADAPT_COUNT_Q8] > 0:
        row[OD_ADAPT_COUNT_Q8] += (curr[OD_ADAPT_COUNT_Q8]
                                   - row[OD_ADAPT_COUNT_Q8]) >> speed
        row[OD_ADAPT_COUNT_EX_Q8] += (curr[OD_ADAPT_COUNT_EX_Q8]
                                      - row[OD_ADAPT_COUNT_EX_Q8]) >> speed


def _isynth_band(y, qg, itheta, noref, r0, n, q0, qm, qm_inv):
    """Integer-spec synthesis of one band (pvq/isynth.py): the dres-mode
    replacement of core.synthesis_partial, identical on every backend."""
    from .isynth import isynthesis_noref, isynthesis_ref, pred_gain_q8

    y = np.asarray(y, dtype=np.int64)
    if noref:
        return isynthesis_noref(y[None, :n], np.asarray([qg]), q0,
                                qm_inv)[0]
    rq_q4, gr_q8, _, _, goff_q8 = pred_gain_q8(r0[None], qm, q0)
    m = int(np.argmax(np.abs(rq_q4[0])))
    yf = np.zeros((1, n), dtype=np.int64)
    yf[0, :m] = y[:m]
    yf[0, m + 1:] = y[m:n - 1]
    return isynthesis_ref(yf, rq_q4, gr_q8, goff_q8,
                          np.asarray([qg]), np.asarray([itheta]), q0,
                          qm_inv)[0]


# -- pulse search ---------------------------------------------------------


_NATIVE_SEARCH = None


def _native_search():
    global _NATIVE_SEARCH
    if _NATIVE_SEARCH is None:
        try:
            import ctypes

            from ..entropy.native import _load

            lib = _load()
            if lib:
                lib.dtpu_pvq_search.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                    ctypes.c_double, ctypes.c_double, ctypes.c_void_p,
                    ctypes.c_void_p]
                _NATIVE_SEARCH = lib
            else:
                _NATIVE_SEARCH = False
        except Exception:
            _NATIVE_SEARCH = False
    return _NATIVE_SEARCH


def pvq_search(x: np.ndarray, k: int, g2: float) -> tuple:
    """Greedy pulse allocation with RDO on the last pulses
    (pvq_search_rdo_double, pvq_encoder.c:121-225).

    Returns (ypulse int64 array, cos_dist).  Uses the native C++ search
    when available (bit-identical; tests compare both)."""
    lib = _native_search()
    if lib:
        import ctypes

        xv = np.ascontiguousarray(x, dtype=np.float64)
        y = np.empty(len(x), dtype=np.int32)
        cd = ctypes.c_double()
        lib.dtpu_pvq_search(
            xv.ctypes.data_as(ctypes.c_void_p), len(x), int(k),
            float(g2), PVQ_LAMBDA,
            y.ctypes.data_as(ctypes.c_void_p), ctypes.byref(cd))
        return y.astype(np.int64), cd.value
    return _pvq_search_py(x, k, g2)


def _pvq_search_py(x: np.ndarray, k: int, g2: float) -> tuple:
    n = len(x)
    ax = np.abs(x)
    xx = float(ax @ ax)
    norm_1 = 1.0 / np.sqrt(1e-30 + xx)
    lam = PVQ_LAMBDA / (1e-30 + g2)
    y = np.zeros(n, dtype=np.int64)
    xy = 0.0
    yy = 0.0
    i = 0
    if k > 2:
        l1 = float(ax.sum())
        y = np.floor(k * ax / max(l1, 1e-100)).astype(np.int64)
        y = np.maximum(y, 0)
        xy = float(ax @ y)
        yy = float(y @ y)
        i = int(y.sum())
    rdo_pulses = 1 + k // 4
    delta_rate = 3.0 / n
    # Greedy phase: maximize (xy + x_j)^2 / (yy + 2 y_j + 1).
    while i < k - rdo_pulses:
        txy = (xy + ax) ** 2
        tyy = yy + 2 * y + 1
        pos = int(np.argmax(txy / tyy))
        xy += ax[pos]
        yy += 2 * y[pos] + 1
        y[pos] += 1
        i += 1
    # RDO phase: maximize 2*xy/sqrt(xx*yy) - lambda * position-rate.
    j = np.arange(n)
    while i < k:
        txy = 2 * (xy + ax) * norm_1 / np.sqrt(yy + 2 * y + 1) \
            - lam * j * delta_rate
        pos = int(np.argmax(txy))
        xy += ax[pos]
        yy += 2 * y[pos] + 1
        y[pos] += 1
        i += 1
    y = np.where(x < 0, -y, y)
    return y, xy / (1e-100 + np.sqrt(xx * yy))


def _neg_interleave(x: int, ref: int) -> int:
    if x < ref:
        return -2 * (x - ref) - 1
    if x < 2 * ref:
        return 2 * (x - ref)
    return x - 1


def _neg_deinterleave(x: int, ref: int) -> int:
    if x < 2 * ref - 1:
        if x & 1:
            return ref - 1 - (x >> 1)
        return ref + (x >> 1)
    return x + 1


def _codeword_rate(adapt: PvqAdapt, y, n, k, noref, bs) -> float:
    """Trial-encode the codeword into a scratch coder to estimate its
    rate in bits (od_pvq_rate, pvq_encoder.c:249-268)."""
    if k <= 0:
        return 0.0
    enc = RangeEncoder()
    scratch = PvqAdapt(
        param_model=adapt.param_model,       # unused by codeword coding
        pvq_adapt=adapt.pvq_adapt.copy(),
        k1_cdf=adapt.k1_cdf.copy(),
        gaintheta_cdf=adapt.gaintheta_cdf,   # unused
        skip_dir_cdf=adapt.skip_dir_cdf,     # unused
        exg=adapt.exg, ext=adapt.ext,
    )
    tell = enc.tell_frac()
    _encode_codeword(enc, scratch, y, n, k, noref, bs)
    return (enc.tell_frac() - tell) / 8.0


# This PYTHON fallback keeps the analytic codeword-rate model (the
# reference's OD_PVQ_RATE_APPROX branch, pvq_encoder.c:254-259).  The
# NATIVE search — the path every real encode takes — charges the
# ACTUAL codeword bits per candidate since round 4 (trial-encode at
# the reset adaptation state, native/ec.cpp cw_rate; opt-out
# DTPU_APPROX_CW_RATE=1), matching the reference's default
# OD_PVQ_RATE_APPROX=0 behavior.  EXACT_RATE=True makes the Python
# path trial-encode too (with the LIVE adaptation — slower but used
# by parity experiments).
EXACT_RATE = False


def _pvq_rate(qg, icgr, theta, ts, adapt, y, k, n, is_keyframe, pli,
              bs) -> float:
    if EXACT_RATE:
        rate = _codeword_rate(adapt, y, n, k, theta == -1, bs)
    elif k > 0:
        rate = n * np.log2(1 + np.log(n * 2) * k / n)
    else:
        rate = 0.0
    if qg > 0 and theta >= 0:
        rate += 0.9 * np.log2(max(ts, 1))
        if is_keyframe and pli == 0:
            rate += 6
        if qg == icgr:
            rate -= 0.5
    return rate


def pvq_theta(x0: np.ndarray, r0: np.ndarray, n: int, q0: int,
              beta: float, robust: bool, is_keyframe: bool, pli: int,
              adapt: PvqAdapt, bs: int, qm: np.ndarray,
              qm_inv: np.ndarray, dres: bool = False):
    """Per-band RDO quantization (pvq_theta, pvq_encoder.c:311-533).

    Returns dict with out, y, qg_coded, itheta, max_theta, k, skip_diff.
    Dispatches the candidate search to the native library when possible;
    synthesis always runs through the same Python path the decoder uses
    so reconstruction cannot diverge.

    dres: device-residual mode — the band is a noref residual (caller
    passes r0 == 0) and reconstruction uses the INTEGER synthesis spec
    (pvq/isynth.py) with integer k, so the decoder's reconstruction is
    reproducible bit-exactly on every backend, including the TPU."""
    lib = _native_search()
    if lib and not EXACT_RATE and n > 1:
        res = _pvq_theta_native(lib, x0, r0, n, q0, beta, robust,
                                is_keyframe, pli, qm, qm_inv, dres)
        if res is not None:
            return res
    return _pvq_theta_py(x0, r0, n, q0, beta, robust, is_keyframe, pli,
                         adapt, bs, qm, qm_inv, dres)


def _pvq_theta_native(lib, x0, r0, n, q0, beta, robust, is_keyframe,
                      pli, qm, qm_inv, dres=False):
    import ctypes

    if not hasattr(lib, "_theta_ready"):
        lib.dtpu_pvq_theta.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_double, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        lib._theta_ready = True
    xv = np.ascontiguousarray(x0, dtype=np.int32)
    rv = np.ascontiguousarray(r0, dtype=np.int32)
    qv = np.ascontiguousarray(qm, dtype=np.int32)
    y = np.zeros(n, dtype=np.int32)
    qg = ctypes.c_int()
    itheta = ctypes.c_int()
    max_theta = ctypes.c_int()
    k = ctypes.c_int()
    noref = ctypes.c_int()
    skip_diff = ctypes.c_double()
    extras = np.zeros(6, dtype=np.float64)
    nodesync = 1 if (robust or is_keyframe) else 0
    lib.dtpu_pvq_theta(
        xv.ctypes.data_as(ctypes.c_void_p),
        rv.ctypes.data_as(ctypes.c_void_p), n, int(q0), float(beta),
        nodesync, 1 if is_keyframe else 0, pli,
        qv.ctypes.data_as(ctypes.c_void_p), PVQ_LAMBDA,
        y.ctypes.data_as(ctypes.c_void_p), ctypes.byref(qg),
        ctypes.byref(itheta), ctypes.byref(max_theta), ctypes.byref(k),
        ctypes.byref(noref), ctypes.byref(skip_diff),
        extras.ctypes.data_as(ctypes.c_void_p))
    return _finish_band(x0, r0, n, q0, beta, robust, is_keyframe, pli,
                        qm, qm_inv, int(qg.value), int(itheta.value),
                        bool(noref.value), int(k.value), y,
                        float(skip_diff.value), dres)


def _finish_band(x0, r0, n, q0, beta, robust, is_keyframe, pli, qm,
                 qm_inv, qgv, ithetav, norefv, kv, y, skip_diff_v,
                 dres=False):
    """Decoder-identical post-processing of native search choices:
    k re-check, skip decisions, synthesis, gain interleave."""
    # Recompute everything the decoder recomputes, in Python floats.
    qmf = qm.astype(np.float64) * core.QM_SCALE_1
    cgr_py, gr = core.compute_gain(r0, q0, beta, qm)
    cfl_enabled = is_keyframe and pli != 0
    if cfl_enabled:
        cgr_py = 1.0
    icgr = int(np.floor(0.5 + cgr_py))
    gain_offset = cgr_py - icgr
    if norefv:
        qcg = float(qgv)
        theta = 0.0
        ts = 0
    else:
        qcg = qgv + gain_offset
        ts = core.compute_max_theta(qcg, beta)
        theta = core.compute_theta(ithetav, ts)
    if dres:
        from .isynth import icompute_k

        k_py = int(icompute_k(n, norefv, qgv if norefv else ithetav))
    elif (norefv and qgv != 0) or (not norefv and ithetav != 0):
        k_py = core.compute_k(qcg, ithetav, theta, norefv, n, beta,
                              robust or is_keyframe)
    else:
        k_py = 0
    if k_py != kv:
        # Float-edge disagreement with the decoder's k: redo the pulse
        # search with the decoder-consistent k.
        if norefv:
            xs = x0.astype(np.float64) * qmf
            yv, _ = pvq_search(xs, k_py, max(qcg * 1.0, 1e-3))
            y = np.zeros(n, dtype=np.int64)
            y[:n] = yv
        else:
            rr = r0.astype(np.float64) * qmf
            m0, s0 = core.compute_householder(rr, gr)
            xs = core.apply_householder(
                x0.astype(np.float64) * qmf, rr)
            xs = np.delete(xs, m0)
            yv, _ = pvq_search(xs, k_py, max(qcg, 1e-3))
            y = np.zeros(n, dtype=np.int64)
            y[:n - 1] = yv
        kv = k_py
    y = y.astype(np.int64)
    # Skip decisions + synthesis (identical to _pvq_theta_py tail).
    skip = 0
    if norefv:
        if qgv == 0:
            skip = SKIP_ZERO
    else:
        if not is_keyframe and qgv == 0:
            skip = SKIP_ZERO if icgr else SKIP_COPY
        if qgv == icgr and ithetav == 0 and not cfl_enabled:
            skip = SKIP_COPY
    if skip:
        out = r0.copy() if skip == SKIP_COPY else np.zeros(n,
                                                           dtype=np.int32)
    elif dres:
        out = _isynth_band(y, qgv, ithetav, norefv, r0, n, q0, qm,
                           qm_inv)
    else:
        rr = r0.astype(np.float64) * qmf
        if norefv:
            m0, s0 = 0, 1
        else:
            m0, s0 = core.compute_householder(rr, gr)
        go = 0.0 if norefv else gain_offset
        g_out = core.gain_expand(qgv + go, q0, beta)
        yv = y[:n] if norefv else y[:n - 1]
        out = core.synthesis_partial(yv, rr, n, norefv, g_out, theta,
                                     m0, s0, qm_inv)
    if is_keyframe:
        qg_coded = qgv if norefv else _neg_interleave(qgv, icgr)
    else:
        qg_coded = qgv - 1 if norefv else _neg_interleave(qgv + 1,
                                                          icgr + 1)
    return {
        "out": out, "y": y, "qg": qg_coded, "itheta": ithetav,
        # max_theta from the Python floats — what the decoder computes.
        "max_theta": ts if not norefv else 0,
        "k": kv, "skip_diff": skip_diff_v,
    }


def batch_band_search(bands, robust, is_keyframe, dres=False):
    """Search many independent bands in ONE native call
    (dtpu_pvq_theta_batch), then finish each decoder-identically.

    bands: list of dicts with x0, r0, q0, beta, pli, qm, qm_inv.
    Returns a list of pvq_theta result dicts."""
    import ctypes

    lib = _native_search()
    if not lib or EXACT_RATE:
        return [
            pvq_theta(b["x0"], b["r0"], len(b["x0"]), b["q0"], b["beta"],
                      robust, is_keyframe, b["pli"], None, 0, b["qm"],
                      b["qm_inv"], dres)
            for b in bands
        ]
    if not hasattr(lib, "_batch_ready"):
        lib.dtpu_pvq_theta_batch.argtypes = [ctypes.c_int] + \
            [ctypes.c_void_p] * 5 + [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_void_p,
                                     ctypes.c_double] + \
            [ctypes.c_void_p] * 8
        lib._batch_ready = True
    nb = len(bands)
    offs = np.zeros(nb + 1, dtype=np.int32)
    for i, b in enumerate(bands):
        offs[i + 1] = offs[i] + len(b["x0"])
    total = int(offs[-1])
    x0s = np.empty(total, dtype=np.int32)
    r0s = np.empty(total, dtype=np.int32)
    qms = np.empty(total, dtype=np.int32)
    q0s = np.empty(nb, dtype=np.int32)
    betas = np.empty(nb, dtype=np.float64)
    plis = np.empty(nb, dtype=np.int32)
    for i, b in enumerate(bands):
        lo, hi = offs[i], offs[i + 1]
        x0s[lo:hi] = b["x0"]
        r0s[lo:hi] = b["r0"]
        qms[lo:hi] = b["qm"]
        q0s[i] = b["q0"]
        betas[i] = b["beta"]
        plis[i] = b["pli"]
    ys = np.zeros(total, dtype=np.int32)
    qg = np.zeros(nb, dtype=np.int32)
    itheta = np.zeros(nb, dtype=np.int32)
    mtheta = np.zeros(nb, dtype=np.int32)
    ks = np.zeros(nb, dtype=np.int32)
    norefs = np.zeros(nb, dtype=np.int32)
    sds = np.zeros(nb, dtype=np.float64)
    extras = np.zeros(nb * 6, dtype=np.float64)
    vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    lib.dtpu_pvq_theta_batch(
        nb, vp(offs), vp(x0s), vp(r0s), vp(qms), vp(q0s), vp(betas),
        1 if (robust or is_keyframe) else 0, 1 if is_keyframe else 0,
        vp(plis), PVQ_LAMBDA, vp(ys), vp(qg), vp(itheta), vp(mtheta),
        vp(ks), vp(norefs), vp(sds), vp(extras))
    out = []
    for i, b in enumerate(bands):
        lo, hi = offs[i], offs[i + 1]
        out.append(_finish_band(
            b["x0"], b["r0"], hi - lo, b["q0"], b["beta"], robust,
            is_keyframe, b["pli"], b["qm"], b["qm_inv"], int(qg[i]),
            int(itheta[i]), bool(norefs[i]), int(ks[i]),
            ys[lo:hi].copy(), float(sds[i]), dres))
    return out


def _pvq_theta_py(x0: np.ndarray, r0: np.ndarray, n: int, q0: int,
                  beta: float, robust: bool, is_keyframe: bool, pli: int,
                  adapt: PvqAdapt, bs: int, qm: np.ndarray,
                  qm_inv: np.ndarray, dres: bool = False):
    if dres:
        from .isynth import icompute_k

        def _k_of(qcg, j, qt, noref, nn, b, nd):
            return int(icompute_k(nn, noref, int(qcg) if noref else j))
    else:
        _k_of = core.compute_k
    lam = PVQ_LAMBDA
    gain_weight = 1.4
    qmf = qm.astype(np.float64) * core.QM_SCALE_1
    x = x0.astype(np.float64) * qmf
    r = r0.astype(np.float64) * qmf
    corr = float(x @ r)
    cfl_enabled = is_keyframe and pli != 0
    cg, g = core.compute_gain(x0, q0, beta, qm)
    cgr, gr = core.compute_gain(r0, q0, beta, qm)
    if cfl_enabled:
        cgr = 1.0
    icgr = int(np.floor(0.5 + cgr))
    gain_offset = cgr - icgr
    qg = 0
    best_dist = gain_weight * cg * cg
    best_cost = best_dist + lam * _pvq_rate(0, 0, -1, 0, adapt, None, 0, n,
                                            is_keyframe, pli, bs)
    noref = True
    best_k = 0
    itheta = -1
    max_theta = 0
    y = np.zeros(n, dtype=np.int64)
    best_qtheta = 0.0
    m = 0
    s = 1
    corr = corr / (1e-100 + g * gr)
    corr = max(min(corr, 1.0), -1.0)
    if is_keyframe:
        skip_dist = gain_weight * cg * cg
    else:
        skip_dist = (gain_weight * (cg - cgr) * (cg - cgr)
                     + cgr * cg * (2 - 2 * corr))
        # noref gain=0 not allowed inter; skip is.
        scgr = max(0.0, gain_offset)
        if icgr == 0:
            best_dist = (gain_weight * (cg - scgr) * (cg - scgr)
                         + scgr * cg * (2 - 2 * corr))
        best_cost = best_dist + lam * _pvq_rate(0, icgr, 0, 0, adapt, None,
                                                0, n, is_keyframe, pli, bs)
        best_qtheta = 0.0
        itheta = 0
        max_theta = 0
        noref = False
    if n <= core.MAX_PVQ_SIZE and np.any(r0) and corr > 0:
        theta = float(np.arccos(corr))
        m, s = core.compute_householder(r, gr)
        x = core.apply_householder(x, r)
        x = np.delete(x, m)
        for i in range(max(1, int(np.floor(cg - gain_offset)) - 1),
                       int(np.ceil(cg - gain_offset)) + 1):
            qcg = i + gain_offset
            ts = core.compute_max_theta(qcg, beta)
            for j in range(max(0, int(np.floor(0.5 + theta * 2 / np.pi * ts))
                               - 2),
                           min(ts - 1,
                               int(np.ceil(theta * 2 / np.pi * ts))) + 1):
                qtheta = core.compute_theta(j, ts)
                k = _k_of(qcg, j, qtheta, False, n, beta,
                          robust or is_keyframe)
                y_tmp, cos_dist = pvq_search(
                    x, k, qcg * cg * np.sin(theta) * np.sin(qtheta))
                dist_theta = (2 - 2 * np.cos(theta - qtheta)
                              + np.sin(theta) * np.sin(qtheta)
                              * (2 - 2 * cos_dist))
                dist = (gain_weight * (qcg - cg) * (qcg - cg)
                        + qcg * cg * dist_theta)
                cost = dist + lam * _pvq_rate(i, icgr, j, ts, adapt, y_tmp,
                                              k, n, is_keyframe, pli, bs)
                if cost < best_cost:
                    best_cost = cost
                    best_dist = dist
                    qg = i
                    best_k = k
                    best_qtheta = qtheta
                    itheta = j
                    max_theta = ts
                    noref = False
                    y = np.zeros(n, dtype=np.int64)
                    y[:n - 1] = y_tmp
    if n <= core.MAX_PVQ_SIZE and ((is_keyframe and pli == 0)
                                   or corr < 0.5 or cg < 2.0):
        x1 = x0.astype(np.float64) * qmf
        for i in range(max(1, int(np.floor(cg))), int(np.ceil(cg)) + 1):
            qcg = float(i)
            k = _k_of(qcg, -1, -1, True, n, beta,
                      robust or is_keyframe)
            y_tmp, cos_dist = pvq_search(x1, k, qcg * cg)
            dist = (gain_weight * (qcg - cg) * (qcg - cg)
                    + qcg * cg * (2 - 2 * cos_dist))
            cost = dist + lam * _pvq_rate(i, 0, -1, 0, adapt, y_tmp, k, n,
                                          is_keyframe, pli, bs)
            if cost <= best_cost:
                best_cost = cost
                best_dist = dist
                qg = i
                noref = True
                best_k = k
                itheta = -1
                max_theta = 0
                y = y_tmp.copy()
    k = best_k
    theta = best_qtheta
    skip = 0
    if noref:
        if qg == 0:
            skip = SKIP_ZERO
    else:
        if not is_keyframe and qg == 0:
            skip = SKIP_ZERO if icgr else SKIP_COPY
        if qg == icgr and itheta == 0 and not cfl_enabled:
            skip = SKIP_COPY
    if skip:
        out = r0.copy() if skip == SKIP_COPY else np.zeros(n, dtype=np.int32)
    elif dres:
        out = _isynth_band(y, qg, itheta, noref, r0, n, q0, qm, qm_inv)
    else:
        go = 0.0 if noref else gain_offset
        g_out = core.gain_expand(qg + go, q0, beta)
        yv = y[:n] if noref else y[:n - 1]
        out = core.synthesis_partial(yv, r, n, noref, g_out, theta, m, s,
                                     qm_inv)
    skip_diff = skip_dist - best_dist
    if is_keyframe:
        qg_coded = qg if noref else _neg_interleave(qg, icgr)
    else:
        qg_coded = qg - 1 if noref else _neg_interleave(qg + 1, icgr + 1)
    return {
        "out": out, "y": y, "qg": qg_coded, "itheta": itheta,
        "max_theta": max_theta, "k": k, "skip_diff": skip_diff,
    }


# -- band stream coding ---------------------------------------------------




# -- native band-symbol dispatch ------------------------------------------

_PLIB = None


def _partition_lib():
    """The C++ band symbol coder (native/ec.cpp) — used when the range
    coder spine is native (the handle is shared)."""
    global _PLIB
    if _PLIB is not None:
        return _PLIB
    import ctypes

    from ..entropy import native as _n

    lib = _n._load()
    if not lib or not hasattr(lib, "dtpu_encode_partition"):
        _PLIB = False
        return False
    from ..entropy.tables import EXP_CDF_TABLE, LAPLACE_OFFSET

    p = ctypes.c_void_p
    lib.dtpu_set_tables.argtypes = [p, p]
    lib.dtpu_encode_partition.argtypes = [
        p, p, ctypes.c_int, ctypes.c_int, p, ctypes.c_int, p, p, p, p,
        ctypes.c_int, p, p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.dtpu_decode_partition_symbols1.argtypes = [
        p, p, ctypes.c_int, ctypes.c_int, p]
    lib.dtpu_decode_generic.argtypes = [
        p, p, ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int]
    lib.dtpu_decode_generic.restype = ctypes.c_int
    lib.dtpu_decode_codeword.argtypes = [
        p, p, ctypes.c_int, p, p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    _partition_lib._exp = np.ascontiguousarray(EXP_CDF_TABLE,
                                               dtype=np.int32)
    _partition_lib._off = np.ascontiguousarray(LAPLACE_OFFSET,
                                               dtype=np.int32)
    lib.dtpu_set_tables(
        _partition_lib._exp.ctypes.data_as(p),
        _partition_lib._off.ctypes.data_as(p))
    _PLIB = lib
    return lib


def _ptr(a):
    import ctypes
    return a.ctypes.data_as(ctypes.c_void_p)


def _encode_partition(enc: RangeEncoder, adapt: PvqAdapt, qg, theta,
                      max_theta, y, n, k, pli, band, nodesync,
                      cdf_ctx, is_keyframe, code_skip, skip_rest,
                      bs) -> None:
    h = getattr(enc, "_h", None)
    lib = _partition_lib() if h is not None else False
    if lib:
        import ctypes
        noref = theta == -1
        model = adapt.param_model[0 if noref else 1]
        y64 = np.ascontiguousarray(y, dtype=np.int64)
        cdf_id = 2 * (n == 15) + (0 if noref else 1)
        exg_off = ((pli * NBSIZES + bs) * PVQ_MAX_PARTITIONS + band) * 8
        ext_off = (bs * PVQ_MAX_PARTITIONS + band) * 8
        lib.dtpu_encode_partition(
            h, _ptr(adapt.gaintheta_cdf[cdf_ctx]),
            8 + 7 * code_skip, adapt.gaintheta_increment,
            _ptr(model.cdf), model.increment,
            ctypes.c_void_p(adapt.exg.ctypes.data + exg_off),
            ctypes.c_void_p(adapt.ext.ctypes.data + ext_off),
            _ptr(adapt.param_model[2].cdf),
            _ptr(adapt.k1_cdf[cdf_id]), adapt.k1_increment,
            _ptr(adapt.pvq_adapt[2 * bs + (1 if noref else 0)]),
            _ptr(y64), n, k, int(qg), int(theta), int(max_theta),
            int(bool(nodesync)), int(bool(is_keyframe)),
            int(code_skip), int(skip_rest), bs)
        return
    noref = theta == -1
    pid = (1 if qg > 0 else 0) + 2 * min(theta + 1, 3) \
        + 8 * code_skip * skip_rest
    if is_keyframe:
        assert pid != 8
        if pid >= 8:
            pid -= 1
    else:
        assert pid != 10
        if pid >= 10:
            pid -= 1
    encode_cdf_adapt(enc, pid,
                     adapt.gaintheta_cdf[cdf_ctx][:8 + 7 * code_skip],
                     adapt.gaintheta_increment)
    if qg > 0:
        # The generic model's internal expectation update is discarded;
        # exg is leaky-integrated separately (pvq_encoder.c:568-572).
        generic_encode(enc, adapt.param_model[0 if noref else 1],
                       qg - 1, -1, int(adapt.exg[pli, bs, band]), 2)
        adapt.exg[pli, bs, band] += ((qg << 16)
                                     - adapt.exg[pli, bs, band]) >> 2
    if theta > 1 and (nodesync or max_theta > 3):
        ei = bs * PVQ_MAX_PARTITIONS + band
        generic_encode(enc, adapt.param_model[2], theta - 2,
                       -1 if nodesync else max_theta - 3,
                       int(adapt.ext[ei]), 2)
        adapt.ext[ei] += ((theta << 16) - adapt.ext[ei]) >> 2
    _encode_codeword(enc, adapt, y, n, k, noref, bs)


def _decode_partition(dec: RangeDecoder, adapt: PvqAdapt, q0, n,
                      ref, beta, robust, is_keyframe, pli,
                      cdf_ctx, cfl, has_skip, skip_rest, band, bs,
                      qm, qm_inv, dres=False):
    """Returns (out, noref, skip)."""
    h = getattr(dec, "_h", None)
    lib = _partition_lib() if h is not None else False

    def _al(label):
        # Sub-symbol bit-accounting label (keeps the block coords the
        # caller set) — only live on the AccountingDecoder path.
        a = getattr(dec, "acct", None)
        if a is not None:
            a._label = label
    nodesync = robust or is_keyframe
    theta = 0.0
    gr = 0.0
    gain_offset = 0.0
    if skip_rest[(band + 2) % 3]:
        qg = 0
        if is_keyframe:
            itheta = -1
            noref = True
        else:
            itheta = 0
            noref = False
    else:
        if lib:
            import ctypes
            _pid = ctypes.c_int()
            lib.dtpu_decode_partition_symbols1(
                h, _ptr(adapt.gaintheta_cdf[cdf_ctx]),
                8 + 7 * has_skip, adapt.gaintheta_increment,
                ctypes.byref(_pid))
            pid = _pid.value
        else:
            _al("pvq:pid")
            pid = decode_cdf_adapt(
                dec, adapt.gaintheta_cdf[cdf_ctx][:8 + 7 * has_skip],
                adapt.gaintheta_increment)
        if not is_keyframe and pid >= 10:
            pid += 1
        if is_keyframe and pid >= 8:
            pid += 1
        if pid >= 8:
            pid -= 8
            skip_rest[0] = skip_rest[1] = skip_rest[2] = 1
        qg = pid & 1
        itheta = (pid >> 1) - 1
        noref = itheta == -1
    if qg > 0:
        model = adapt.param_model[0 if noref else 1]
        if lib:
            v = lib.dtpu_decode_generic(
                h, _ptr(model.cdf), model.increment, -1,
                int(adapt.exg[pli, bs, band]), 2)
        else:
            _al("pvq:gain")
            v, _ = generic_decode(dec, model, -1,
                                  int(adapt.exg[pli, bs, band]), 2)
        qg = 1 + v
        adapt.exg[pli, bs, band] += ((qg << 16)
                                     - adapt.exg[pli, bs, band]) >> 2
    skip = 0
    if not noref:
        cfl_enabled = pli != 0 and is_keyframe
        cgr, gr = core.compute_gain(ref, q0, beta, qm)
        if cfl_enabled:
            cgr = 1.0
        icgr = int(np.floor(0.5 + cgr))
        if is_keyframe:
            qg = _neg_deinterleave(qg, icgr)
        else:
            qg = _neg_deinterleave(qg, icgr + 1) - 1
            if qg == 0:
                skip = SKIP_ZERO if icgr else SKIP_COPY
        if qg == icgr and itheta == 0 and not cfl_enabled:
            skip = SKIP_COPY
        gain_offset = cgr - icgr
        qcg = qg + gain_offset
        max_theta = core.compute_max_theta(qcg, beta)
        if itheta > 1 and (nodesync or max_theta > 3):
            ei = bs * PVQ_MAX_PARTITIONS + band
            if lib:
                v = lib.dtpu_decode_generic(
                    h, _ptr(adapt.param_model[2].cdf),
                    adapt.param_model[2].increment,
                    -1 if nodesync else max_theta - 3,
                    int(adapt.ext[ei]), 2)
            else:
                _al("pvq:theta")
                v, _ = generic_decode(dec, adapt.param_model[2],
                                      -1 if nodesync else max_theta - 3,
                                      int(adapt.ext[ei]), 2)
            itheta = 2 + v
            adapt.ext[ei] += ((itheta << 16) - adapt.ext[ei]) >> 2
        theta = core.compute_theta(itheta, max_theta)
    else:
        itheta = 0
        if not is_keyframe:
            qg += 1
        qcg = float(qg)
        if qg == 0:
            skip = SKIP_ZERO
    if dres:
        from .isynth import icompute_k

        k = int(icompute_k(n, noref, qg if noref else itheta))
    else:
        k = core.compute_k(qcg, itheta, theta, noref, n, beta, nodesync)
    if k != 0:
        if lib:
            y = np.zeros(n, dtype=np.int64)
            cdf_id = 2 * (n == 15) + (0 if noref else 1)
            lib.dtpu_decode_codeword(
                h, _ptr(adapt.k1_cdf[cdf_id]), adapt.k1_increment,
                _ptr(adapt.pvq_adapt[2 * bs + (1 if noref else 0)]),
                _ptr(y), n, int(k), int(bool(noref)), bs)
        else:
            _al("pvq:codeword")
            y = _decode_codeword(dec, adapt, n, k, noref, bs)
    else:
        y = np.zeros(n, dtype=np.int64)
    if cfl["allow_flip"] and not noref:
        _al("pvq:cfl-flip")
        flip = dec.decode_bits(1)
        if flip:
            # ref is a view into cfl["ref"]; negating the parent flips
            # this band's slice too.
            cfl["ref"][:cfl["nb_coeffs"]] = -cfl["ref"][:cfl["nb_coeffs"]]
        cfl["allow_flip"] = False
    if skip:
        out = ref.copy() if skip == SKIP_COPY else np.zeros(n, dtype=np.int32)
    elif dres:
        out = _isynth_band(y, qg, itheta, noref, ref, n, q0, qm, qm_inv)
    else:
        rf = ref.astype(np.float64) * (qm.astype(np.float64)
                                       * core.QM_SCALE_1)
        if noref:
            m, s = 0, 0
        else:
            m, s = core.compute_householder(rf, gr)
        g = core.gain_expand(qg + gain_offset, q0, beta)
        yv = y[:n] if noref else y[:n - 1]
        out = core.synthesis_partial(yv, rf, n, noref, g, theta, m, s,
                                     qm_inv)
    return out, noref, int(bool(skip))


def pvq_encode_block(enc: RangeEncoder, state, ref: np.ndarray,
                     dblock: np.ndarray, q0: int, pli: int, bs: int,
                     beta, robust: bool, is_keyframe: bool,
                     qm: np.ndarray, qm_inv: np.ndarray,
                     precomputed=None, dres: bool = False) -> tuple:
    """Encode one block's AC bands (od_pvq_encode, pvq_encoder.c:645-815).

    `state` carries .pvq (PvqAdapt), .skip_cdf, .skip_increment,
    .model_dc/.ex_dc (for inter DC), and .pvq_qm_q4[pli].
    Returns (out coding-order int32 vector, skip_flag).
    """
    adapt = state.pvq
    offs = BAND_OFFSETS[bs]
    nb_bands = offs[0]
    off = offs[1:]
    pvq_qm = state.pvq_qm_q4[pli]
    skip_cdf = state.skip_cdf[2 * bs + (1 if pli != 0 else 0)]
    out = np.zeros(len(dblock), dtype=np.int32)
    flip = 0
    ref = ref.copy()
    if pli != 0 and is_keyframe:
        qmf = qm[off[0]:off[1]].astype(np.float64) * core.QM_SCALE_1
        xy = float((ref[off[0]:off[1]] * qmf)
                   @ (dblock[off[0]:off[1]] * qmf))
        if xy < 0:
            flip = 1
            ref[off[0]:off[nb_bands]] = -ref[off[0]:off[nb_bands]]
    results = []
    skip_diff = 0.0
    for i in range(nb_bands):
        if precomputed is not None:
            res = precomputed[i]
        else:
            q = max(1, q0 * int(pvq_qm[qm_get_index(bs, i + 1)]) >> 4)
            res = pvq_theta(dblock[off[i]:off[i + 1]],
                            ref[off[i]:off[i + 1]],
                            off[i + 1] - off[i], q, beta[i], robust,
                            is_keyframe, pli, adapt, bs,
                            qm[off[i]:off[i + 1]],
                            qm_inv[off[i]:off[i + 1]], dres)
        out[off[i]:off[i + 1]] = res["out"]
        results.append(res)
        skip_diff += res["skip_diff"]
    # Checkpoint for whole-block skip rollback.
    chk = enc.checkpoint()
    chk_adapt = _snapshot_block_state(state)
    if is_keyframe:
        out[0] = 0
    else:
        dc_quant = max(1, q0 * int(pvq_qm[qm_get_index(bs, 0)]) >> 4)
        dc_rate = -np.log2((int(skip_cdf[1]) - int(skip_cdf[0]))
                           / int(skip_cdf[0]))
        out[0] = _rdo_quant(int(dblock[0]) - int(ref[0]), dc_quant, dc_rate)
    tell = enc.tell_frac()
    nsym = 4 + (1 if (pli == 0 and bs > 0) else 0)
    encode_cdf_adapt(enc, int(out[0] != 0), skip_cdf[:nsym],
                     state.skip_increment)
    skip_theta_value = -1 if is_keyframe else 0
    skip_rest = 1
    for i in range(1, nb_bands):
        if results[i]["itheta"] != skip_theta_value or results[i]["qg"]:
            skip_rest = 0
    skip_dir = 0
    if nb_bands > 1:
        for i in range(3):
            tmp = 1
            for j in range(i + 1, nb_bands, 3):
                if (results[j]["itheta"] != skip_theta_value
                        or results[j]["qg"]):
                    tmp = 0
            skip_dir |= tmp << i
    nb = nb_bands
    if (results[0]["itheta"] == skip_theta_value and results[0]["qg"] == 0
            and skip_rest):
        nb = 0
    cfl_encoded = False
    for i in range(nb):
        if i == 0 or (not skip_rest and not (skip_dir & (1 << ((i - 1) % 3)))):
            res = results[i]
            _encode_partition(
                enc, adapt, res["qg"], res["itheta"], res["max_theta"],
                res["y"], off[i + 1] - off[i], res["k"], pli, i,
                robust or is_keyframe,
                (1 if pli != 0 else 0) * NBSIZES * PVQ_MAX_PARTITIONS
                + bs * PVQ_MAX_PARTITIONS + i,
                is_keyframe, 1 if (i == 0 and i < nb - 1) else 0,
                skip_rest, bs)
        if i == 0 and not skip_rest and bs > 0:
            encode_cdf_adapt(
                enc, skip_dir,
                adapt.skip_dir_cdf[(1 if pli != 0 else 0) + 2 * (bs - 1)],
                adapt.skip_dir_increment)
        if pli != 0 and is_keyframe and results[i]["itheta"] != -1 \
                and not cfl_encoded:
            enc.encode_bits(flip, 1)
            cfl_encoded = True
    tell = enc.tell_frac() - tell
    # Rate of the would-be skip symbol under the same DC decision.
    skip_flag_sym = 2 + (1 if out[0] != 0 else 0)
    skip_rate = -np.log2(
        (int(skip_cdf[skip_flag_sym]) - int(skip_cdf[skip_flag_sym - 1]))
        / int(skip_cdf[nsym - 1]))
    tell -= int(np.floor(0.5 + 8 * skip_rate))
    if nb == 0 or skip_diff <= PVQ_LAMBDA / 8 * tell:
        if is_keyframe:
            out[0] = 0
        else:
            dc_quant = max(1, q0 * int(pvq_qm[qm_get_index(bs, 0)]) >> 4)
            dc_rate = -np.log2((int(skip_cdf[3]) - int(skip_cdf[2]))
                               / (int(skip_cdf[2]) - int(skip_cdf[1])))
            out[0] = _rdo_quant(int(dblock[0]) - int(ref[0]), dc_quant,
                                dc_rate)
        enc.rollback(chk)
        _restore_block_state(state, chk_adapt)
        skip_cdf = state.skip_cdf[2 * bs + (1 if pli != 0 else 0)]
        encode_cdf_adapt(enc, 2 + int(out[0] != 0), skip_cdf[:nsym],
                         state.skip_increment)
        n2 = off[nb_bands]
        if is_keyframe:
            out[1:n2] = 0
        else:
            out[1:n2] = ref[1:n2]
        if out[0] == 0:
            return out, 1
    return out, 0


def pvq_decode_block(dec: RangeDecoder, state, ref: np.ndarray, q0: int,
                     pli: int, bs: int, beta, robust: bool,
                     is_keyframe: bool, block_skip: int,
                     qm: np.ndarray, qm_inv: np.ndarray,
                     dres: bool = False) -> np.ndarray:
    """Decode one block's AC bands (od_pvq_decode, pvq_decoder.c:311-387).

    Returns the coding-order output vector with out[0] = DC-nonzero flag
    (the DC value itself is handled by the caller)."""
    adapt = state.pvq
    offs = BAND_OFFSETS[bs]
    nb_bands = offs[0]
    off = offs[1:]
    pvq_qm = state.pvq_qm_q4[pli]
    n2 = off[nb_bands]
    out = np.zeros(max(n2, 1), dtype=np.int32)
    skip = block_skip
    out[0] = skip & 1
    skip >>= 1
    ref = ref.copy()
    if skip:
        if is_keyframe:
            out[1:n2] = 0
        else:
            out[1:n2] = ref[1:n2]
        return out
    skip_rest = [0, 0, 0]
    cfl = {
        "allow_flip": pli != 0 and is_keyframe,
        "ref": ref,
        "nb_coeffs": n2,
    }
    for i in range(nb_bands):
        q = max(1, q0 * int(pvq_qm[qm_get_index(bs, i + 1)]) >> 4)
        band_ref = ref[off[i]:off[i + 1]]
        o, noref, skip_b = _decode_partition(
            dec, adapt, q, off[i + 1] - off[i], band_ref, beta[i], robust,
            is_keyframe, pli,
            (1 if pli != 0 else 0) * NBSIZES * PVQ_MAX_PARTITIONS
            + bs * PVQ_MAX_PARTITIONS + i,
            cfl, 1 if (i == 0 and i < nb_bands - 1) else 0, skip_rest, i,
            bs, qm[off[i]:off[i + 1]], qm_inv[off[i]:off[i + 1]], dres)
        out[off[i]:off[i + 1]] = o
        if i == 0 and not skip_rest[0] and bs > 0:
            a = getattr(dec, "acct", None)
            if a is not None:
                a._label = "pvq:skip-dir"
            skip_dir = decode_cdf_adapt(
                dec,
                adapt.skip_dir_cdf[(1 if pli != 0 else 0) + 2 * (bs - 1)],
                adapt.skip_dir_increment)
            for j in range(3):
                skip_rest[j] = 1 if (skip_dir & (1 << j)) else 0
    return out


def _rdo_quant(x: int, q: int, delta0: float) -> int:
    threshold = 128 + min(max(0, int(256 * PVQ_LAMBDA * delta0 / 2)), 128)
    if abs(x) < q * threshold // 256:
        return 0
    return _div_round0(x, q)


def _div_round0(x: int, q: int) -> int:
    """Divide with rounding to nearest, ties away... OD_DIV_R0: round to
    nearest with 0.5 offset toward zero symmetric."""
    if x < 0:
        return -((-x + (q >> 1)) // q)
    return (x + (q >> 1)) // q


def _snapshot_block_state(state):
    return (state.pvq.copy(), state.skip_cdf.copy())


def _restore_block_state(state, snap):
    state.pvq.restore(snap[0])
    state.skip_cdf[:] = snap[1]
