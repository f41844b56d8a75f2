"""Device (jax) compute path vs the host implementation."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_dering_jax_bit_exact():
    """dering_frame_jax must match the numpy dering_frame exactly for
    both luma (with direction search) and chroma (reusing luma dirs)."""
    from daala_tpu.ops.dering import dering_frame
    from daala_tpu.ops.dering_jax import dering_frame_jax

    rng = np.random.default_rng(0)
    h, w = 96, 128
    frame = rng.integers(-2000, 2000, (h, w)).astype(np.int32)
    nvsb, nhsb = h // 32, w // 32
    q = 45
    nb, nd = dering_frame(frame, nhsb, nvsb, q, 0, 0)
    jb, jd = jax.jit(
        lambda f: dering_frame_jax(f, nhsb, nvsb, q, 0, 0))(frame)
    assert np.array_equal(nb, np.asarray(jb))
    assert np.array_equal(nd, np.asarray(jd))
    cf = rng.integers(-2000, 2000, (h // 2, w // 2)).astype(np.int32)
    cb, _ = dering_frame(cf, nhsb, nvsb, q, 1, 1, dirs=nd)
    jc, _ = jax.jit(
        lambda f, d: dering_frame_jax(f, nhsb, nvsb, q, 1, 1,
                                      dirs=d))(cf, jd)
    assert np.array_equal(cb, np.asarray(jc))


def test_encode_step_dering_runs():
    import jax.numpy as jnp

    from daala_tpu.core.quant import QM8_HVS, init_qm
    from daala_tpu.pipeline.device import encode_step

    qm, qm_inv = init_qm(QM8_HVS)
    rng = np.random.default_rng(1)
    plane = jnp.asarray(rng.integers(0, 256, (64, 96), dtype=np.uint8))
    q1, r1 = jax.jit(
        lambda p: encode_step(p, 1, 90, qm[1], qm_inv[1], dering=True)
    )(plane)
    assert r1.shape == (64, 96) and r1.dtype == np.uint8


def test_device_pvq_quantize():
    """Fast-mode PVQ quantization on device: energy-preserving, rate
    responds to the quantizer, and pulse budgets are exact."""
    import jax.numpy as jnp

    from daala_tpu.core.quant import QM8_HVS, init_qm
    from daala_tpu.pvq.device_search import pvq_quantize_frame

    qm, qm_inv = init_qm(QM8_HVS)
    rng = np.random.default_rng(0)
    d = rng.integers(-1500, 1500, (64, 96)).astype(np.int32)
    out, ks, qgs = jax.jit(
        lambda x: pvq_quantize_frame(x, 1, 90, qm[1], qm_inv[1], 80))(d)
    out = np.asarray(out)
    rel = ((d.astype(np.float64) - out) ** 2).mean() \
        / (d.astype(np.float64) ** 2).mean()
    assert rel < 0.02
    out2, ks2, _ = jax.jit(
        lambda x: pvq_quantize_frame(x, 1, 300, qm[1], qm_inv[1],
                                     260))(d)
    rel2 = ((d.astype(np.float64) - np.asarray(out2)) ** 2).mean() \
        / (d.astype(np.float64) ** 2).mean()
    assert int(ks2) < int(ks) and rel2 > rel


def test_mc_jax_bit_exact():
    """The jax MC twin (round-2 device-encode building block) must
    match the numpy OBMC bit for bit across block sizes, multi-ref and
    bit depths."""
    from daala_tpu.ops.mc import obmc_predict, pad_ref
    from daala_tpu.ops.mc_jax import obmc_predict_jax

    rng = np.random.default_rng(0)
    h, w = 64, 96
    refs = [pad_ref(rng.integers(0, 256, (h, w)).astype(np.uint8))
            for _ in range(2)]
    jrefs = [jax.numpy.asarray(r) for r in refs]
    for bl in (3, 4, 5):
        g = rng.integers(-200, 200,
                         ((h >> bl) + 1, (w >> bl) + 1, 2)
                         ).astype(np.int64)
        rid = rng.integers(0, 2, g.shape[:2]).astype(np.int32)
        a = obmc_predict(refs, 80, h, w, g, bl, ref_ids=rid)
        b = obmc_predict_jax(jrefs, 80, h, w, g, bl, ref_ids=rid)
        assert np.array_equal(a, np.asarray(b))
