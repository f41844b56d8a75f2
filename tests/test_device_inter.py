"""Device inter-chunk pipeline: a whole GOP chunk of P frames encoded
in one jitted lax.scan (pipeline/device_inter.py)."""

import numpy as np
import pytest


def _seq(rng, t, h, w):
    """4:2:0 sequence with global motion: plane stacks (ys, us, vs)."""
    base = rng.integers(0, 256, (h + 4 * t + 8, w + 4 * t + 8),
                        dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 4 * t + 8, 0:w + 4 * t + 8]
    base = ((base // 4) + (yy + 2 * xx) % 192).astype(np.uint8)
    ys = np.stack([base[2 * i:2 * i + h, 4 * i:4 * i + w]
                   for i in range(t)])
    us = ys[:, ::2, ::2] // 2 + 64
    vs = 255 - us
    return ys, us, vs


def test_inter_chunk_smoke():
    from daala_tpu.core.quant import QM8_HVS, init_qm
    from daala_tpu.pipeline.device_inter import inter_chunk

    rng = np.random.default_rng(7)
    t, h, w = 3, 64, 64
    ys, us, vs = _seq(rng, t + 1, h, w)
    ref0 = (ys[0], us[0], vs[0])
    qm, qm_inv = init_qm(QM8_HVS)
    grids, levels, ksum, qgsum, checks = inter_chunk(
        (ys[1:], us[1:], vs[1:]), ref0, 60, qm, qm_inv, dering=True)
    assert grids.shape == (t, h // 8 + 1, w // 8 + 1, 2)
    assert levels.shape == (t, h // 32, w // 32)
    assert ksum.shape == (t,) and qgsum.shape == (t,)
    assert checks.shape == (t,)
    # Global motion of (+2, +4) px per frame: the searched field should
    # be near (16, 32) eighth-pel on most vertices of frame 0.
    g0 = np.asarray(grids[0])
    medy = np.median(g0[..., 0])
    medx = np.median(g0[..., 1])
    assert abs(medy - 16) <= 8 and abs(medx - 32) <= 8
    # Deterministic re-run.
    grids2, _, ksum2, _, checks2 = inter_chunk(
        (ys[1:], us[1:], vs[1:]), ref0, 60, qm, qm_inv, dering=True)
    assert np.array_equal(np.asarray(grids), np.asarray(grids2))
    assert np.array_equal(np.asarray(checks), np.asarray(checks2))


def test_inter_chunk_static_scene_skips():
    """A static scene needs (near-)zero MVs and few pulses."""
    from daala_tpu.core.quant import QM8_HVS, init_qm
    from daala_tpu.pipeline.device_inter import inter_chunk

    rng = np.random.default_rng(3)
    h = w = 64
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    u = y[::2, ::2]
    v = 255 - u
    ys = np.stack([y, y])
    us = np.stack([u, u])
    vs = np.stack([v, v])
    qm, qm_inv = init_qm(QM8_HVS)
    grids, _, ksum, _, _ = inter_chunk(
        (ys, us, vs), (y, u, v), 60, qm, qm_inv, dering=False)
    assert np.all(np.abs(np.asarray(grids)) <= 8)
    # After the first frame the carried recon is the quantized version
    # of the same static image: residual pulses collapse.
    k = np.asarray(ksum)
    assert k[1] <= k[0]
