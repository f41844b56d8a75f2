"""TF conversion + bilinear smoothing tests."""

import numpy as np

from daala_tpu.ops.tf import (tf_down_hv, tf_up_h_lp, tf_up_hv,
                              tf_up_hv_lp, tf_up_v_lp)
from daala_tpu.ops.smooth import bilinear_smooth


def test_tf_up_down_exact_inverse():
    rng = np.random.default_rng(0)
    for n in (4, 8, 16):
        x = rng.integers(-(1 << 12), 1 << 12, (7, n, n), dtype=np.int32)
        up = tf_up_hv(tf_down_hv(x, n), n // 2)
        assert np.array_equal(up, x), n
        g = rng.integers(-(1 << 12), 1 << 12, (7, n, n), dtype=np.int32)
        assert np.array_equal(tf_down_hv(tf_up_hv(g, n // 2), n), g), n


def test_tf_up_lp_shapes():
    rng = np.random.default_rng(1)
    n = 8
    src = rng.integers(-2048, 2048, (n, 2 * n), dtype=np.int32)
    out = tf_up_h_lp(src, n, n)
    assert out.shape == (n, n)
    src2 = rng.integers(-2048, 2048, (2 * n, n), dtype=np.int32)
    assert tf_up_v_lp(src2, n, n).shape == (n, n)
    src3 = rng.integers(-2048, 2048, (2 * n, 2 * n), dtype=np.int32)
    assert tf_up_hv_lp(src3, n, n, n).shape == (n, n)


def test_tf_dc_preserved():
    # A flat 2x2 block group concentrates into TF-interleaved sum
    # coefficients with 2x gain; total energy-sum is preserved.
    x = np.full((8, 8), 100, dtype=np.int32)
    out = tf_up_hv_lp(x, 4, 4, 4)
    assert out.sum() == 4 * 200  # 4 quad sums at 2x gain
    assert out.max() == 200 and out.min() == 0


def test_bilinear_smooth_flattens_noise():
    rng = np.random.default_rng(2)
    i = np.arange(32)[:, None]
    j = np.arange(32)[None, :]
    clean = (i * 40 + j * 24).astype(np.int32)
    noisy = clean + rng.integers(-60, 61, clean.shape)
    sm = bilinear_smooth(noisy.astype(np.int32), q=3000, pli=0)
    assert ((sm - clean) ** 2).mean() < ((noisy - clean) ** 2).mean()
    # High-variance content must be left nearly untouched.
    tex = rng.integers(-2000, 2000, (32, 32)).astype(np.int32)
    sm2 = bilinear_smooth(tex, q=100, pli=0)
    assert np.abs(sm2 - tex).max() <= 2
