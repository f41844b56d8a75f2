"""Spatial tile-axis stream production for P frames: the sharded
banded computation must reproduce the single-chip device frame body
SYMBOL FOR SYMBOL (and so pack byte-identical per-tile streams)."""

import numpy as np
import pytest


def _frames(h, w, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 64, 0:w + 64]
    base = ((base // 4) + (yy + 2 * xx) % 180).astype(np.uint8)
    out = []
    for i in range(2):
        y = base[2 * i:2 * i + h, 3 * i:3 * i + w]
        u = y[::2, ::2] // 2 + 60
        v = 220 - u
        out.append([y, u, v])
    return out


def test_sharded_p_matches_single_chip():
    import jax
    import jax.numpy as jnp

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh

    from daala_tpu.pipeline.device_encode import (PAD,
                                                  make_device_chunk_fn)
    from daala_tpu.pipeline.device_tiles_p import sharded_inter_tiled

    h, w = 256, 192
    quantizer = 90
    ref, cur = _frames(h, w)

    # Single-chip truth: one P frame through the real frame body.
    fn = make_device_chunk_fn(h, w, quantizer, use_dering=True,
                              emit_recon=True, multiref=False)
    ry = jnp.pad(jnp.asarray(ref[0]), PAD, mode="edge")
    ru = jnp.pad(jnp.asarray(ref[1]), PAD, mode="edge")
    rv = jnp.pad(jnp.asarray(ref[2]), PAD, mode="edge")
    with jax.enable_x64(True):
        _, single = fn(jnp.asarray(cur[0])[None],
                       jnp.asarray(cur[1])[None],
                       jnp.asarray(cur[2])[None], ry, ru, rv)

    mesh = Mesh(np.array(jax.devices()[:8]), ("tile",))
    res = sharded_inter_tiled(mesh, cur, ref, quantizer)

    assert np.array_equal(res["grid"],
                          np.asarray(single["grid"])[0])
    assert np.array_equal(res["levels"],
                          np.asarray(single["levels"])[0])
    assert np.array_equal(res["dflags"],
                          np.asarray(single["dflags"])[0])
    for pli in range(3):
        assert np.array_equal(res["dc"][pli],
                              np.asarray(single["dc"][pli])[0]), pli
        assert np.array_equal(res["qg"][pli],
                              np.asarray(single["qg"][pli])[0]), pli
        assert np.array_equal(res["y"][pli],
                              np.asarray(single["y"][pli])[0]), pli
        assert np.array_equal(res["recon"][pli],
                              np.asarray(single["recon"][pli])[0]), pli


def test_sharded_p_packs_byte_identical():
    """End to end: the sharded symbols range-code into the very bytes
    the single-chip tiles=N pack emits, and the stock decoder
    reconstructs them bit-identically."""
    import jax
    import jax.numpy as jnp

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh

    from daala_tpu.core.state import FrameInfo
    from daala_tpu.pipeline.device_encode import (PAD,
                                                  make_device_chunk_fn,
                                                  pack_device_frame)
    from daala_tpu.pipeline.device_tiles_p import sharded_inter_tiled
    from daala_tpu.pvq import native_walk

    if not native_walk.available():
        pytest.skip("native walk unavailable")

    h, w = 256, 192
    quality = 30
    from daala_tpu.core.quant import codedquantizer_to_quantizer

    quantizer = codedquantizer_to_quantizer(quality)
    ref, cur = _frames(h, w)
    info = FrameInfo(pic_width=w, pic_height=h, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1), bitdepth=8,
                     keyframe_rate=100)

    fn = make_device_chunk_fn(h, w, quantizer, use_dering=True,
                              emit_recon=True, multiref=False)
    ry = jnp.pad(jnp.asarray(ref[0]), PAD, mode="edge")
    ru = jnp.pad(jnp.asarray(ref[1]), PAD, mode="edge")
    rv = jnp.pad(jnp.asarray(ref[2]), PAD, mode="edge")
    with jax.enable_x64(True):
        _, single = fn(jnp.asarray(cur[0])[None],
                       jnp.asarray(cur[1])[None],
                       jnp.asarray(cur[2])[None], ry, ru, rv)
    ssyms = {"dc": [np.asarray(a)[0] for a in single["dc"]],
             "qg": [np.asarray(a)[0] for a in single["qg"]],
             "y": [np.asarray(a)[0] for a in single["y"]]}
    pkt_single = pack_device_frame(
        info, quality, np.asarray(single["grid"])[0],
        np.asarray(single["levels"])[0], ssyms,
        np.asarray(single["dflags"])[0], True, tiles=8)

    mesh = Mesh(np.array(jax.devices()[:8]), ("tile",))
    res = sharded_inter_tiled(mesh, cur, ref, quantizer)
    pkt_sharded = pack_device_frame(
        info, quality, res["grid"], res["levels"],
        {"dc": res["dc"], "qg": res["qg"], "y": res["y"]},
        res["dflags"], True, tiles=8)
    assert pkt_sharded == pkt_single

    # The standard decoder reconstructs the sharded stream exactly to
    # the sharded recon (encoder-check across the tiling boundary).
    from daala_tpu.pipeline.inter import DecoderSession

    dec = DecoderSession(info)
    dec.ref_prev = None
    # Seed the decoder's reference with the true previous recon: use
    # a keyframe-free check by decoding with an explicit gray... the
    # packet predicts from `ref`, so inject it as ref_prev.
    from daala_tpu.pipeline.inter import _pad_refs

    dec.ref_prev = _pad_refs(info, [np.asarray(p) for p in ref])
    rec = dec.decode_frame(pkt_sharded, False, ftype=1, dres=True)
    for pli in range(3):
        assert np.array_equal(np.asarray(rec[pli]),
                              res["recon"][pli]), pli
