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
