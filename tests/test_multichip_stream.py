"""Multi-chip STREAM production (VERDICT round-1 item 3): the full
stream-valid device encoder sharded over an 8-virtual-device mesh must
pack packets BYTE-IDENTICAL to the single-device pipeline, and those
packets must decode bit-exactly — the multi-host GOP determinism test
SURVEY.md section 4 calls for, run on the CPU fake cluster
(xla_force_host_platform_device_count=8 via conftest)."""

import numpy as np
import pytest

from daala_tpu.core.state import FrameInfo

H, W, T, QUALITY = 64, 128, 2, 30


def _native_or_skip():
    from daala_tpu.pvq import native_walk

    if not native_walk.available():
        pytest.skip("native walk unavailable")


def _gop_frames(ng, t=T, h=H, w=W, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 64, w + 128), dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 64, 0:w + 128]
    base = ((base // 4) + (yy + 2 * xx) % 170).astype(np.uint8)
    gops = []
    for g in range(ng):
        frames = []
        for i in range(t):
            k = 3 * g + i
            y = base[2 * k:2 * k + h, 3 * k:3 * k + w]
            u = y[::2, ::2] // 2 + 60
            v = 220 - u
            frames.append([y, u, v])
        gops.append(frames)
    return gops


def test_sharded_gop_stream_byte_identical_and_decodes():
    _native_or_skip()
    import jax
    import jax.numpy as jnp

    from daala_tpu.core.quant import codedquantizer_to_quantizer
    from daala_tpu.pipeline.device import (make_mesh, pack_gop_sharded,
                                           sharded_gop_stream_encode)
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession
    from daala_tpu.pipeline.inter import DecoderSession

    ndev = len(jax.devices())
    assert ndev == 8, "conftest must provide the 8-device CPU mesh"
    mesh = make_mesh(ndev)
    gops = _gop_frames(ndev)
    info = FrameInfo(pic_width=W, pic_height=H, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1), bitdepth=8,
                     keyframe_rate=T)
    quantizer = codedquantizer_to_quantizer(QUALITY)
    ys = jnp.asarray(np.stack([[f[0] for f in g] for g in gops]))
    us = jnp.asarray(np.stack([[f[1] for f in g] for g in gops]))
    vs = jnp.asarray(np.stack([[f[2] for f in g] for g in gops]))
    with jax.enable_x64(True):
        outs = sharded_gop_stream_encode(mesh, ys, us, vs, quantizer)
    gop_pkts = pack_gop_sharded(info, QUALITY, outs)
    assert len(gop_pkts) == ndev

    # Single-device oracle: the same frames through the gray-start
    # DeviceEncoderSession must give byte-identical packets.
    flat = [f for g in gops for f in g]
    enc = DeviceEncoderSession(info, quality=QUALITY, chunk=T,
                               keyframe_rate=T, gray_start=True,
                               pack_tiles=1, bs_luma=1,
                               multiref=False)
    ser = enc.encode_clip(flat)
    assert len(ser) == ndev * T
    for g in range(ndev):
        for i in range(T):
            a = gop_pkts[g][i]
            b = ser[g * T + i]
            assert a["data"] == b["data"], (g, i)
            assert a["gray_ref"] == bool(b.get("gray_ref", False))

    # And the sharded packets decode cleanly (stream validity).
    dec = DecoderSession(info)
    n_ok = 0
    for g in range(2):
        for p in gop_pkts[g]:
            rec = dec.decode_frame(p["data"], False, ftype=p["ftype"],
                                   dres=True,
                                   gray_ref=p["gray_ref"])
            assert rec[0].shape == (H, W)
            n_ok += 1
    assert n_ok == 2 * T


def test_sharded_keyframe_led_stream():
    """quality=... sharded mode: every GOP chain opens with a DEVICE
    KEYFRAME — the sharded path emits a standard keyframe-led stream,
    byte-identical to the single-device key="device" session, and it
    decodes (VERDICT round-2 item 5's keyframe-opener requirement)."""
    _native_or_skip()
    import jax
    import jax.numpy as jnp

    from daala_tpu.core.quant import codedquantizer_to_quantizer
    from daala_tpu.pipeline.device import (make_mesh, pack_gop_sharded,
                                           sharded_gop_stream_encode)
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession
    from daala_tpu.pipeline.inter import DecoderSession

    ndev = len(jax.devices())
    assert ndev == 8
    mesh = make_mesh(ndev)
    t = 2                      # keyframe + 1 P per GOP
    gops = _gop_frames(ndev, t=t)
    info = FrameInfo(pic_width=W, pic_height=H, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1), bitdepth=8,
                     keyframe_rate=t)
    quantizer = codedquantizer_to_quantizer(QUALITY)
    ys = jnp.asarray(np.stack([[f[0] for f in g] for g in gops]))
    us = jnp.asarray(np.stack([[f[1] for f in g] for g in gops]))
    vs = jnp.asarray(np.stack([[f[2] for f in g] for g in gops]))
    with jax.enable_x64(True):
        outs = sharded_gop_stream_encode(mesh, ys, us, vs, quantizer,
                                         quality=QUALITY)
    gop_pkts = pack_gop_sharded(info, QUALITY, outs)
    assert len(gop_pkts) == ndev
    assert all(p[0]["ftype"] == 0 for p in gop_pkts)

    # Single-device oracle: key="device" session on the same frames.
    flat = [f for g in gops for f in g]
    enc = DeviceEncoderSession(info, quality=QUALITY, chunk=t - 1,
                               keyframe_rate=t, key="device",
                               pack_tiles=1, bs_luma=1,
                               multiref=False)
    ser = enc.encode_clip(flat)
    assert len(ser) == ndev * t
    for g in range(ndev):
        for i in range(t):
            assert gop_pkts[g][i]["data"] == ser[g * t + i]["data"], \
                (g, i)

    # The sharded keyframe-led packets decode cleanly.
    dec = DecoderSession(info)
    for g in range(2):
        for p in gop_pkts[g]:
            rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                                   ftype=p["ftype"], dres=True)
            assert rec[0].shape == (H, W)
