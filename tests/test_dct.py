"""Transform tests: exact reversibility + basis accuracy (the dcttest
strategy from the reference's unit suite)."""

import numpy as np
import pytest

from daala_tpu.ops.dct import (
    TX_SIZES,
    basis_magnitudes,
    fdct,
    fdct2d,
    haar2d,
    idct,
    idct2d,
    ihaar2d,
)


def _float_dct_mat(n):
    """Orthonormal type-II DCT matrix."""
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * j + 1) / (2 * n)) * np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


@pytest.mark.parametrize("n", TX_SIZES)
def test_fdct_exact_inverse_1d(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-(1 << 14), 1 << 14, size=(4096, n), dtype=np.int32)
    y = fdct(x, n)
    x2 = idct(y, n)
    assert np.array_equal(x, x2)


@pytest.mark.parametrize("n", TX_SIZES)
def test_fdct_exact_inverse_2d(n):
    rng = np.random.default_rng(n + 100)
    x = rng.integers(-(1 << 12), 1 << 12, size=(64, n, n), dtype=np.int32)
    y = fdct2d(x, n)
    x2 = idct2d(y, n)
    assert np.array_equal(x, x2)


@pytest.mark.parametrize("n", TX_SIZES)
def test_fdct_matches_float_dct(n):
    """The integer transform must approximate the orthonormal DCT after
    per-coefficient magnitude normalization."""
    mags = basis_magnitudes(n)
    # Magnitudes must be positive and bounded (the 8-point network is
    # sqrt(2)-scaled; others are ~1).
    assert np.all(mags > 0.5) and np.all(mags < 2.1)
    amp = 1 << 12
    rng = np.random.default_rng(7)
    x = rng.integers(-amp, amp, size=(256, n), dtype=np.int32)
    y = fdct(x, n).astype(np.float64) / mags
    ref = x @ _float_dct_mat(n).T
    err = np.abs(y - ref)
    # Small absolute error relative to the input amplitude.
    assert err.max() / amp < 0.03, err.max() / amp


@pytest.mark.parametrize("n", TX_SIZES)
def test_fdct_dc_gain(n):
    """DC response: constant block -> energy concentrated in coefficient
    0 with orthonormal gain sqrt(n) (x magnitude compensation)."""
    mags = basis_magnitudes(n)
    x = np.full((1, n), 1024, dtype=np.int32)
    y = fdct(x, n).astype(np.float64) / mags
    assert abs(y[0, 0] - 1024 * np.sqrt(n)) < 0.02 * 1024 * np.sqrt(n)
    assert np.abs(y[0, 1:]).max() < 0.02 * 1024


@pytest.mark.parametrize("ln", [1, 2, 3, 4, 5])
def test_haar_exact_inverse(ln):
    n = 1 << ln
    rng = np.random.default_rng(ln)
    x = rng.integers(-(1 << 14), 1 << 14, size=(32, n, n), dtype=np.int32)
    y = haar2d(x, ln)
    x2 = ihaar2d(y, ln)
    assert np.array_equal(x, x2)


def test_haar_dc():
    # DC of the Haar transform of a constant block is n*value
    # (orthonormal 2x2 kernel preserves sums up to scaling 2 per level).
    x = np.full((1, 4, 4), 100, dtype=np.int32)
    y = haar2d(x, 2)
    assert y[0, 0, 0] == 100 * 4
    assert np.abs(y[0][np.unravel_index(np.arange(1, 16), (4, 4))]).max() == 0


def test_jax_matches_numpy():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    for n in TX_SIZES:
        x = rng.integers(-(1 << 12), 1 << 12, size=(16, n, n),
                         dtype=np.int32)
        yn = fdct2d(x, n)
        yj = np.asarray(jax.jit(lambda b, n=n: fdct2d(b, n))(jnp.asarray(x)))
        assert np.array_equal(yn, yj), n
        xj = np.asarray(jax.jit(lambda b, n=n: idct2d(b, n))(jnp.asarray(yj)))
        assert np.array_equal(x, xj), n


def test_dct64_accuracy():
    """64-point matrix DCT: near-exact round trip and float-DCT match
    (the fork's od_bin_fdct64 is a rounded matrix, not lifting)."""
    from daala_tpu.ops.dct import fdct64, fdct64x64, idct64, idct64x64

    rng = np.random.default_rng(0)
    x = rng.integers(-2048, 2048, (16, 64), dtype=np.int32)
    y = fdct64(x)
    back = idct64(y)
    assert np.abs(back - x).max() <= 2  # rounding only
    ref = x @ _float_dct_mat(64).T
    assert np.abs(y - ref).max() < 2.0
    x2 = rng.integers(-2048, 2048, (2, 64, 64), dtype=np.int32)
    assert np.abs(idct64x64(fdct64x64(x2)) - x2).max() <= 4


def test_device_sharded_step():
    """Multi-chip sharded encode step on the virtual CPU mesh (the
    dryrun path must keep compiling/executing)."""
    import __graft_entry__ as g

    g.dryrun_multichip(4)
