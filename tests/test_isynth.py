"""Integer PVQ synthesis spec (pvq/isynth.py): cross-backend
exactness (numpy == jax) and fidelity to the float synthesis it will
replace in the integer-stream mode."""

import numpy as np
import pytest


def test_isqrt64_exact():
    import math

    from daala_tpu.pvq.isynth import isqrt64

    rng = np.random.default_rng(0)
    vs = np.concatenate([
        np.arange(0, 1000, dtype=np.int64),
        rng.integers(0, 1 << 62, 20000, dtype=np.int64),
        np.array([0, 1, 2, 3, 4, (1 << 62) - 1], dtype=np.int64),
    ])
    got = isqrt64(vs)
    exp = np.array([math.isqrt(int(v)) for v in vs], dtype=np.int64)
    assert np.array_equal(got, exp)


def test_sin_lut_format_constants():
    from daala_tpu.pvq.isynth import SIN_Q15, sin_q15

    # Frozen spot values: the LUT is a format constant, not a libm
    # output — drift here means the build environment changed the
    # format and must be caught.
    assert SIN_Q15[0] == 0 and SIN_Q15[256] == 32767
    assert SIN_Q15[128] == 23170       # sin(pi/4) * 32767
    assert SIN_Q15[64] == 12539    # round(32767*sin(pi/8))
    assert int(sin_q15(65536)) == 32767
    assert int(sin_q15(0)) == 0


def _rand_bands(rng, B, n):
    y = rng.integers(-40, 41, (B, n)).astype(np.int64)
    k = np.abs(y).sum(-1)
    qg = rng.integers(0, 60, B).astype(np.int64)
    y[qg == 0] = 0
    del k
    return y, qg


def test_noref_numpy_vs_jax():
    import jax

    from daala_tpu.pvq.isynth import isynthesis_noref, isynthesis_noref_jax

    rng = np.random.default_rng(1)
    B, n = 512, 15
    y, qg = _rand_bands(rng, B, n)
    qm_inv = rng.integers(2048, 8192, n).astype(np.int64)
    q0 = 117
    host = isynthesis_noref(y, qg, q0, qm_inv)
    with jax.enable_x64(True):
        dev = np.asarray(jax.jit(
            lambda a, b: isynthesis_noref_jax(a, b, q0, qm_inv)
        )(y, qg))
    assert np.array_equal(host, dev)


def test_ref_numpy_vs_jax():
    import jax

    from daala_tpu.pvq.isynth import (
        isynthesis_ref,
        isynthesis_ref_jax,
        pred_gain_q8,
    )

    rng = np.random.default_rng(2)
    B, n = 512, 32
    r0 = rng.integers(-5000, 5001, (B, n)).astype(np.int64)
    qm = rng.integers(16384, 32768, n).astype(np.int64)
    qm_inv = rng.integers(2048, 8192, n).astype(np.int64)
    q0 = 233
    rq, gr, cgr, icgr, goff = pred_gain_q8(r0, qm, q0)
    y, qg = _rand_bands(rng, B, n)
    # zero the reflection-axis position (the spec's y layout)
    m = np.argmax(np.abs(rq), axis=-1)
    np.put_along_axis(y, m[:, None], 0, axis=-1)
    itheta = rng.integers(0, 30, B).astype(np.int64)
    host = isynthesis_ref(y, rq, gr, goff, qg, itheta, q0, qm_inv)
    with jax.enable_x64(True):
        dev = np.asarray(jax.jit(
            lambda *a: isynthesis_ref_jax(*a, q0, qm_inv)
        )(y, rq, gr, goff, qg, itheta))
    assert np.array_equal(host, dev)


def test_numpy_vs_native_cpp():
    from daala_tpu.pvq.isynth import (
        isynthesis_noref,
        isynthesis_noref_native,
        isynthesis_ref,
        isynthesis_ref_native,
        pred_gain_q8,
    )

    rng = np.random.default_rng(6)
    B, n = 1024, 24
    r0 = rng.integers(-30000, 30001, (B, n)).astype(np.int64)
    qm = rng.integers(16384, 32768, n).astype(np.int64)
    qm_inv = rng.integers(2048, 8192, n).astype(np.int64)
    q0 = 501
    rq, gr, cgr, icgr, goff = pred_gain_q8(r0, qm, q0)
    y = rng.integers(-100, 101, (B, n)).astype(np.int64)
    qg = rng.integers(0, 300, B).astype(np.int64)
    m = np.argmax(np.abs(rq), axis=-1)
    np.put_along_axis(y, m[:, None], 0, axis=-1)
    itheta = rng.integers(0, 100, B).astype(np.int64)
    nat1 = isynthesis_noref_native(y, qg, q0, qm_inv)
    nat2 = isynthesis_ref_native(y, rq, gr, goff, qg, itheta, q0,
                                 qm_inv)
    if nat1 is None:
        pytest.skip("native lib not built")
    assert np.array_equal(nat1, isynthesis_noref(y, qg, q0, qm_inv))
    assert np.array_equal(
        nat2, isynthesis_ref(y, rq, gr, goff, qg, itheta, q0, qm_inv))


def test_noref_matches_float_synthesis():
    """The integer spec must land within +-1 of the float synthesis it
    re-specifies (RD-neutrality evidence)."""
    from daala_tpu.pvq import core
    from daala_tpu.pvq.isynth import isynthesis_noref

    rng = np.random.default_rng(3)
    B, n = 256, 24
    y, qg = _rand_bands(rng, B, n)
    qm_inv = rng.integers(3500, 4700, n).astype(np.int64)
    q0 = 89
    out_i = isynthesis_noref(y, qg, q0, qm_inv)
    bad = 0
    for b in range(B):
        g = core.gain_expand(float(qg[b]), q0, 1.0)
        out_f = core.synthesis_partial(
            y[b], None, n, True, g, 0.0, 0, 1, qm_inv)
        d = np.abs(out_i[b].astype(np.int64) - out_f.astype(np.int64))
        bad += int((d > 1).sum())
    assert bad == 0


def test_ref_matches_float_synthesis():
    from daala_tpu.pvq import core
    from daala_tpu.pvq.isynth import isynthesis_ref, pred_gain_q8

    rng = np.random.default_rng(4)
    B, n = 256, 16
    r0 = rng.integers(-3000, 3001, (B, n)).astype(np.int64)
    qm = np.full(n, 32767, dtype=np.int64)
    qm_inv = np.full(n, 4096, dtype=np.int64)
    q0 = 150
    rq, gr, cgr, icgr, goff = pred_gain_q8(r0, qm, q0)
    y, qg = _rand_bands(rng, B, n)
    qg = np.maximum(qg, 1)
    m = np.argmax(np.abs(rq), axis=-1)
    np.put_along_axis(y, m[:, None], 0, axis=-1)
    itheta = rng.integers(1, 12, B).astype(np.int64)
    out_i = isynthesis_ref(y, rq, gr, goff, qg, itheta, q0, qm_inv)
    worst = 0
    for b in range(B):
        # Float chain with the float-path conventions.
        rf = r0[b].astype(np.float64) * (qm.astype(np.float64)
                                         * core.QM_SCALE_1)
        cgr_f = core.gain_compand(float(np.sqrt((rf * rf).sum())), q0,
                                  1.0)
        goff_f = cgr_f - np.floor(0.5 + cgr_f)
        qcg = max(0.0, qg[b] + goff_f)
        g = core.gain_expand(qcg, q0, 1.0)
        ts = core.compute_max_theta(qcg, 1.0)
        theta = core.compute_theta(int(itheta[b]), ts)
        rr = rf.copy()
        mm, ss = core.compute_householder(rr, float(np.sqrt(
            (rf * rf).sum())))
        ypk = np.concatenate([y[b][:mm], y[b][mm + 1:]])
        out_f = core.synthesis_partial(ypk, rr, n, False, g, theta, mm,
                                       ss, qm_inv)
        d = np.abs(out_i[b].astype(np.int64) - out_f.astype(np.int64))
        worst = max(worst, int(d.max()))
    # Q4/Q8 fixed point + LUT sine: small bounded deviation from the
    # float chain is expected; it must stay tiny relative to the
    # quantizer step (q0 = 150 here).
    assert worst <= 3, worst
