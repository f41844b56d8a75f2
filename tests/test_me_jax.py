"""Device ME twin: search/me_jax.py must reproduce search/me.py MVs
bit for bit (same candidate order, same integer arithmetic)."""

import numpy as np
import pytest


def _clip_pair(rng, h, w):
    base = rng.integers(0, 256, (h + 32, w + 32), dtype=np.uint8)
    # Structured content: gradient + blocks + noise, with global motion.
    yy, xx = np.mgrid[0:h + 32, 0:w + 32]
    base = ((base // 3) + (yy * 2 + xx) % 160).astype(np.uint8)
    ref = base[8:8 + h, 8:8 + w]
    cur = base[5:5 + h, 11:11 + w]
    return cur, ref


@pytest.mark.parametrize("h,w", [(64, 128), (128, 192)])
def test_dense_grid_twin(h, w):
    from daala_tpu.ops.mc import pad_ref
    from daala_tpu.search.me import motion_search_dense
    from daala_tpu.search.me_jax import motion_search_dense_jax

    import jax

    rng = np.random.default_rng(11)
    cur, ref = _clip_pair(rng, h, w)
    host = motion_search_dense(cur, ref)
    refp8 = pad_ref(ref, 64)
    fn = jax.jit(lambda c, r: motion_search_dense_jax(c, r, h, w))
    dev = np.asarray(fn(cur, refp8))
    assert host.shape == dev.shape
    assert np.array_equal(host.astype(np.int64), dev.astype(np.int64))


@pytest.mark.parametrize("lam_env,res", [("0", 0), (None, 0), (None, 1)])
def test_refine_lattice_twin(lam_env, res, monkeypatch):
    """refine_lattice_jax must reproduce the native dtpu_obmc_refine
    lattice bit for bit (both are Jacobi-within-color with snapshot
    rate reads; all-integer costs, so parity needs no float mode)."""
    from daala_tpu.ops.mc import pad_ref
    from daala_tpu.search.me import refine_mesh_lattice
    from daala_tpu.search.me_jax import refine_lattice_jax

    import jax

    if lam_env is not None:
        monkeypatch.setenv("DTPU_REFINE_LAM", lam_env)
    monkeypatch.delenv("DTPU_REFINE_ITERS", raising=False)
    h, w = 128, 192
    rng = np.random.default_rng(23)
    cur, ref = _clip_pair(rng, h, w)
    nvy, nvx = (h >> 5) + 1, (w >> 5) + 1
    quantizer = 140
    # Random lattice, multiples of 1 << res, within +-56 px.
    g32 = ((rng.integers(-440, 441, (nvy, nvx, 2)) >> res) << res)
    dense = np.zeros((4 * (nvy - 1) + 1, 4 * (nvx - 1) + 1, 2),
                     dtype=np.int64)
    dense[::4, ::4] = g32
    rids = np.zeros(dense.shape[:2], dtype=np.int32)
    host_g = refine_mesh_lattice(
        cur, [pad_ref(ref, 80)], 80, dense.copy(), rids, quantizer,
        iters=1, mv_res=res)[::4, ::4]
    fn = jax.jit(lambda c, r, g: refine_lattice_jax(
        c, r, g, h, w, quantizer, mv_res=res, iters=1))
    dev = np.asarray(fn(cur, pad_ref(ref, 64),
                        g32.astype(np.int32)))
    assert np.array_equal(host_g.astype(np.int64), dev.astype(np.int64))
