"""Lapped filter tests: exact invertibility (incl. the scaling trick),
whole-frame edge application round trip, and smoothing behavior."""

import numpy as np
import pytest

from daala_tpu.ops.lapping import (
    FILTER_PARAMS,
    post_filter,
    postfilter_frame,
    pre_filter,
    prefilter_frame,
)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_filter_exact_inverse(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-(1 << 15), 1 << 15, size=(8192, n), dtype=np.int32)
    y = pre_filter(x, n)
    x2 = post_filter(y, n)
    assert np.array_equal(x, x2)


def test_scale_trick_exhaustive():
    """The scale-then-increment step must invert exactly by truncating
    division for every scale factor used, over a wide value range."""
    from daala_tpu.ops.lifting import run, scale6, invert

    scales = sorted({abs(p) for ps in FILTER_PARAMS.values()
                     for p in ps[:len(ps) // 4 + 1] if p > 64})
    v = np.arange(-(1 << 18), 1 << 18, dtype=np.int32)
    for s in scales:
        prog = [scale6(0, s)]
        t = {0: v.copy()}
        run(prog, t)
        t2 = {0: t[0]}
        run(invert(prog), t2)
        assert np.array_equal(t2[0], v), s


def test_frame_round_trip():
    rng = np.random.default_rng(1)
    plane = rng.integers(-2048, 2048, size=(128, 192), dtype=np.int32)
    for block in (4, 8, 16, 32):
        y = prefilter_frame(plane, block)
        x2 = postfilter_frame(y, block)
        assert np.array_equal(plane, x2), block
        assert not np.array_equal(plane, y)  # it actually did something


def test_frame_round_trip_jax():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    plane = rng.integers(-2048, 2048, size=(64, 64), dtype=np.int32)
    yn = prefilter_frame(plane, 8)
    yj = np.asarray(jax.jit(lambda p: prefilter_frame(p, 8))(jnp.asarray(plane)))
    assert np.array_equal(yn, yj)
    xj = np.asarray(jax.jit(lambda p: postfilter_frame(p, 8))(jnp.asarray(yj)))
    assert np.array_equal(plane, xj)


def test_postfilter_smooths_step():
    """A quantization step discontinuity at a block edge must be spread
    (smoothed) by the postfilter — the deblocking property."""
    x = np.zeros((1, 8), dtype=np.int32)
    x[:, 4:] = 64  # step exactly at the 4-pt filter center
    y = post_filter(x[:, 2:6], 4)
    # After postfiltering the jump between positions 1 and 2 of the span
    # is smaller than the raw step.
    jump = abs(int(y[0, 2]) - int(y[0, 1]))
    assert jump < 64
