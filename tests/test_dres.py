"""Device-residual (dres) inter stream mode: noref residual bands with
the INTEGER synthesis spec (pvq/isynth.py), so encoder, decoder, native
C++ and the TPU device path reconstruct identical integers.

The mode is signaled per frame (container flag bit 6) and is the stream
format the device encode pipeline (pipeline/device_inter.py) emits."""

import os

import numpy as np
import pytest

from daala_tpu.core.state import FrameInfo


def _clip(nframes=4, h=96, w=128, seed=1):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 40, w + 40), dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 40, 0:w + 40]
    base = ((base // 4) + (yy + 2 * xx) % 180).astype(np.uint8)
    frames = []
    for i in range(nframes):
        y = base[2 * i:2 * i + h, 3 * i:3 * i + w]
        u = y[::2, ::2] // 2 + 60
        v = 220 - u
        frames.append([y, u, v])
    return frames


def _info(h=96, w=128):
    return FrameInfo(pic_width=w, pic_height=h, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1), bitdepth=8,
                     keyframe_rate=100)


def _roundtrip(frames, info, quality=30, **kw):
    from daala_tpu.pipeline.inter import DecoderSession, EncoderSession

    enc = EncoderSession(info, quality=quality, dres=True, **kw)
    dec = DecoderSession(info)
    pkts, recs = [], []
    for f in frames:
        for p in enc.push_frame(f):
            pkts.append(p["data"])
            rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                                   ftype=p["ftype"],
                                   dres=p["ftype"] != 0)
            # encoder-check invariant (encode.c:3204-3243): decoder
            # recon must equal the encoder's carried recon exactly.
            for pl in range(3):
                assert np.array_equal(rec[pl], p["recon"][pl])
            recs.append(rec)
    return pkts, recs


def test_dres_roundtrip_native():
    frames = _clip()
    pkts, _ = _roundtrip(frames, _info())
    assert len(pkts) == len(frames)


def test_dres_python_walk_matches_native():
    """The pure-Python symbol pass is the oracle: identical streams and
    reconstructions to the native C++ walk."""
    frames = _clip(3)
    info = _info()
    p1, r1 = _roundtrip(frames, info)
    os.environ["DTPU_PY_WALK"] = "1"
    try:
        p2, r2 = _roundtrip(frames, info)
    finally:
        os.environ.pop("DTPU_PY_WALK", None)
    assert [bytes(a) for a in p1] == [bytes(a) for a in p2]
    for a, b in zip(r1, r2):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_dres_rate_sane():
    """dres (residual noref) pays a bounded rate premium over the
    Householder-ref inter mode at equal quantizer."""
    from daala_tpu.pipeline.inter import EncoderSession

    frames = _clip(4)
    info = _info()

    def total(**kw):
        enc = EncoderSession(info, quality=30, **kw)
        return sum(len(p["data"]) for f in frames
                   for p in enc.push_frame(f))

    t_dres = total(dres=True)
    t_norm = total()
    assert t_dres < 1.35 * t_norm


def test_dres_masking_rejected():
    from daala_tpu.pipeline.inter import EncoderSession

    with pytest.raises(ValueError):
        EncoderSession(_info(), quality=30, dres=True, use_masking=True)


def test_dres_container_flag():
    from daala_tpu.io.container import (
        FramePacket,
        read_stream,
        write_stream,
    )

    info = _info()
    pkts = [FramePacket(data=b"xx", keyframe=True, ftype=0),
            FramePacket(data=b"yy", keyframe=False, ftype=1, dres=True,
                        display_order=1)]
    path = "/tmp/dres_flag_test.dtp"
    write_stream(path, info, pkts)
    _, _, rd = read_stream(path)
    assert rd[0].dres is False and rd[1].dres is True
    assert rd[1].ftype == 1


def test_icompute_k_matches_float_on_band_sizes():
    """The integer k rule tracks the float rule on every real band size
    (the redo path in the prepass covers any residual divergence)."""
    from daala_tpu.pvq.core import compute_k
    from daala_tpu.pvq.isynth import icompute_k

    for n in (15, 8, 32, 128):
        qgs = np.arange(0, 512)
        ki = icompute_k(n, True, qgs)
        for qg in range(0, 512):
            kf = compute_k(float(qg), -1, -1, True, n, 1.0, True)
            if qg == 0:
                kf = 0
            assert abs(int(ki[qg]) - kf) <= 1
