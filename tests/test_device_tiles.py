"""Spatially-tiled device keyframe: sharded == single-chip, and the
per-tile stream decodes to the tiled reconstruction exactly."""

import numpy as np
import pytest


def _clip(h, w, seed=3):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin(xx / 17) * np.cos(yy / 13)
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)
    u = (y[::2, ::2] // 2 + 64).astype(np.uint8)
    v = (200 - y[::2, ::2] // 2).astype(np.uint8)
    return [y, u, v]


@pytest.mark.parametrize("use_dering", [True, False])
def test_sharded_key_tiled_matches_single(use_dering):
    import jax
    from jax.sharding import Mesh

    from daala_tpu.pipeline.device_tiles import (
        key_tiled_single, sharded_key_tiled)

    h, w, nt = 256, 192, 4
    planes = _clip(h, w)
    r8s, syms_s = key_tiled_single(planes, 30, nt,
                                   use_dering=use_dering)
    devs = np.array(jax.devices()[:nt])
    mesh = Mesh(devs, ("tile",))
    import jax.numpy as jnp

    out = sharded_key_tiled(mesh, jnp.asarray(planes[0]),
                            jnp.asarray(planes[1]),
                            jnp.asarray(planes[2]), 30,
                            use_dering=use_dering)
    for k in ("sbdc", "acA", "acB", "qg", "y"):
        for pli in range(3):
            a = np.asarray(syms_s[k][pli])
            b = np.asarray(out[k][pli])
            assert a.shape == b.shape, (k, pli, a.shape, b.shape)
            assert np.array_equal(a, b), (k, pli)
    assert np.array_equal(np.asarray(syms_s["dflags"]),
                          np.asarray(out["dflags"]))
    for pli in range(3):
        assert np.array_equal(np.asarray(r8s[pli]),
                              np.asarray(out["r8"][pli])), pli


def test_tiled_key_stream_decodes():
    from daala_tpu.core.state import FrameInfo
    from daala_tpu.pipeline.device_tiles import (
        key_tiled_single, pack_device_keyframe_tiled)
    from daala_tpu.pipeline.inter import DecoderSession

    h, w, nt = 256, 192, 4
    planes = _clip(h, w, seed=5)
    info = FrameInfo(pic_width=w, pic_height=h, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1))
    r8, syms = key_tiled_single(planes, 30, nt)
    syms_np = {k: [np.asarray(a) for a in syms[k]]
               for k in ("sbdc", "acA", "acB", "qg", "y")}
    syms_np["dflags"] = np.asarray(syms["dflags"])
    data = pack_device_keyframe_tiled(info, 30, syms_np, tiles=nt)
    dec = DecoderSession(info)
    rec = dec.decode_frame(data, True, dres=True)
    for pli in range(3):
        assert np.array_equal(rec[pli], np.asarray(r8[pli])), pli
