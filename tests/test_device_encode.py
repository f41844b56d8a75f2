"""Device-side encode end to end: the device chunk emits stream-valid
symbol tensors (dres mode, integer synthesis), the host packs them with
the native walk, and the standard decoder reconstructs BIT-IDENTICALLY
to the reconstruction the device carried as its reference — the
encoder-check invariant (encode.c:3204-3243) across the host/device
boundary."""

import numpy as np
import pytest

from daala_tpu.core.state import FrameInfo


def _clip(nframes=5, h=128, w=192, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 64, 0:w + 64]
    base = ((base // 4) + (yy + 2 * xx) % 180).astype(np.uint8)
    frames = []
    for i in range(nframes):
        y = base[2 * i:2 * i + h, 3 * i:3 * i + w]
        u = y[::2, ::2] // 2 + 60
        v = 220 - u
        frames.append([y, u, v])
    return frames


def _info(h=128, w=192, kf=100):
    return FrameInfo(pic_width=w, pic_height=h, nplanes=3,
                     xdec=(0, 1, 1), ydec=(0, 1, 1), bitdepth=8,
                     keyframe_rate=kf)


def _native_or_skip():
    from daala_tpu.pvq import native_walk

    if not native_walk.available():
        pytest.skip("native walk unavailable")


def test_device_encode_decoder_exact():
    """Decoder recon == device-carried recon for every packet."""
    _native_or_skip()
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession
    from daala_tpu.pipeline.inter import DecoderSession

    frames = _clip()
    info = _info()
    enc = DeviceEncoderSession(info, quality=30, chunk=2,
                               emit_recon=True)
    pkts = enc.encode_clip(frames)
    assert len(pkts) == len(frames)
    dec = DecoderSession(info)
    for p in pkts:
        rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                               ftype=p["ftype"], dres=p["dres"])
        if "recon" in p:
            for pl in range(3):
                assert np.array_equal(np.asarray(rec[pl]),
                                      np.asarray(p["recon"][pl])), \
                    (p["display_order"], pl)


@pytest.mark.parametrize("bs", [1, 2, 3])
def test_device_encode_block_sizes_exact(bs):
    """Device P frames at every uniform block size (8/16/32 px luma)
    hold the encoder-check invariant through the host pack."""
    _native_or_skip()
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession
    from daala_tpu.pipeline.inter import DecoderSession

    frames = _clip(3)
    info = _info()
    enc = DeviceEncoderSession(info, quality=30, chunk=3,
                               emit_recon=True, bs_luma=bs)
    pkts = enc.encode_clip(frames)
    dec = DecoderSession(info)
    for p in pkts:
        rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                               ftype=p["ftype"], dres=p["dres"])
        if "recon" in p:
            for pl in range(3):
                assert np.array_equal(np.asarray(rec[pl]),
                                      np.asarray(p["recon"][pl])), \
                    (bs, p["display_order"], pl)


def test_device_encode_tiled_pack_exact():
    """Tiled + threaded host pack (per-tile entropy streams) decodes
    bit-identically to the device-carried recon."""
    _native_or_skip()
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession
    from daala_tpu.pipeline.inter import DecoderSession

    frames = _clip()
    info = _info()
    enc = DeviceEncoderSession(info, quality=30, chunk=2,
                               emit_recon=True, pack_tiles=2,
                               pack_workers=2)
    pkts = enc.encode_clip(frames)
    assert len(pkts) == len(frames)
    dec = DecoderSession(info)
    for p in pkts:
        rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                               ftype=p["ftype"], dres=p["dres"])
        if "recon" in p:
            for pl in range(3):
                assert np.array_equal(np.asarray(rec[pl]),
                                      np.asarray(p["recon"][pl])), \
                    (p["display_order"], pl)


def test_device_encode_quality_and_rate():
    """The device-encoded stream is a real encode: better PSNR than the
    input noise floor and a plausible rate."""
    _native_or_skip()
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession
    from daala_tpu.pipeline.inter import DecoderSession

    frames = _clip(4)
    info = _info()
    enc = DeviceEncoderSession(info, quality=28, chunk=4)
    pkts = enc.encode_clip(frames)
    dec = DecoderSession(info)
    psnrs = []
    for p, f in zip(pkts, frames):
        rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                               ftype=p["ftype"], dres=p["dres"])
        e = (np.asarray(rec[0], np.float64)
             - np.asarray(f[0], np.float64))
        psnrs.append(10 * np.log10(255.0 ** 2 / max((e * e).mean(),
                                                    1e-9)))
    assert min(psnrs) > 28.0, psnrs
    total = sum(len(p["data"]) for p in pkts)
    assert total < len(frames) * info.pic_width * info.pic_height


def test_device_keyframe_exact():
    """Device keyframes (wavefront Haar-DC + noref integer-synthesis
    bands): decoder recon == device recon, and a following device P
    chain stays exact off the device-carried keyframe reference."""
    _native_or_skip()
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession
    from daala_tpu.pipeline.inter import DecoderSession

    frames = _clip(3, h=64, w=64)
    info = _info(h=64, w=64)
    enc = DeviceEncoderSession(info, quality=30, chunk=2,
                               emit_recon=True, key="device")
    pkts = enc.encode_clip(frames)
    assert pkts[0]["ftype"] == 0 and pkts[0]["dres"]
    dec = DecoderSession(info)
    for p in pkts:
        rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                               ftype=p["ftype"], dres=p["dres"])
        for pl in range(3):
            assert np.array_equal(np.asarray(rec[pl]),
                                  np.asarray(p["recon"][pl])), \
                (p["display_order"], pl)


def test_dres_keyframe_host_roundtrip():
    """Host-side dres keyframe mode (the device keyframe's stream
    format): encoder-check + bounded rate premium vs normal intra."""
    from daala_tpu.pipeline.intra import decode_keyframe, \
        encode_keyframe

    f = _clip(1, h=64, w=64)[0]
    info = _info(h=64, w=64)
    pkt, rec = encode_keyframe(f, info, 30, return_recon=True,
                               dres=True)
    out = decode_keyframe(pkt, info, dres=True)
    for pl in range(3):
        assert np.array_equal(rec[pl], out[pl])
    pkt_norm = encode_keyframe(f, info, 30)
    assert len(pkt) < 1.4 * len(pkt_norm)


def test_device_encode_gray_start_exact():
    """gray_start: every frame (including GOP openers predicting from
    the synthesized gray reference) is device-encoded; the decoder
    reconstructs bit-identically across GOP restarts."""
    _native_or_skip()
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession
    from daala_tpu.pipeline.inter import DecoderSession

    frames = _clip(6)
    info = _info(kf=3)
    enc = DeviceEncoderSession(info, quality=30, chunk=2,
                               emit_recon=True, gray_start=True)
    pkts = enc.encode_clip(frames)
    assert len(pkts) == len(frames)
    assert [bool(p.get("gray_ref")) for p in pkts] == \
        [True, False, False, True, False, False]
    # multiref cadence: P frames until the first FT_GOLDEN refresh
    # (gray GOPs open with no golden anchor).
    assert all(p["ftype"] in (1, 3) for p in pkts)
    dec = DecoderSession(info)
    for p in pkts:
        rec = dec.decode_frame(p["data"], False, ftype=p["ftype"],
                               dres=p["dres"],
                               gray_ref=bool(p.get("gray_ref")))
        for pl in range(3):
            assert np.array_equal(np.asarray(rec[pl]),
                                  np.asarray(p["recon"][pl])), \
                (p["display_order"], pl)


def test_device_encode_adaptive_bs_exact():
    """Per-SB 2-size grid (adaptive_bs): the mixed-size stream decodes
    bit-identically to the device-carried recon (encoder-check across
    the quadtree grid), and at least one frame actually mixes sizes."""
    _native_or_skip()
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession
    from daala_tpu.pipeline.inter import DecoderSession

    # Mixed content: smooth half + textured half so the split RDO has
    # something to disagree about.
    rng = np.random.default_rng(9)
    h, w = 128, 192
    base = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 64, 0:w + 64]
    smooth = (96 + (yy // 3 + xx // 4) % 64).astype(np.uint8)
    base = np.where(xx < (w + 64) // 2, smooth, base)
    frames = []
    for i in range(3):
        y = base[2 * i:2 * i + h, 3 * i:3 * i + w]
        u = y[::2, ::2] // 2 + 60
        v = 220 - u
        frames.append([y, u, v])
    info = _info(h, w)
    enc = DeviceEncoderSession(info, quality=38, chunk=3,
                               emit_recon=True, bs_luma=3,
                               adaptive_bs=True)
    assert enc.adaptive_bs
    pkts = enc.encode_clip(frames)
    dec = DecoderSession(info)
    for p in pkts:
        rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                               ftype=p["ftype"], dres=p["dres"])
        if "recon" in p:
            for pl in range(3):
                assert np.array_equal(np.asarray(rec[pl]),
                                      np.asarray(p["recon"][pl])), \
                    (p["display_order"], pl)


def test_gray_multigop_golden_survives():
    """A golden anchor from a previous GOP SURVIVES a gray RAP: the
    decoder's ref_gold only rotates at FT_INTRA/FT_GOLDEN, so gray
    GOPs after the first FT_GOLDEN are two-ref from their second
    frame.  The encoder must mirror that persistent state or the
    nrefs desync corrupts every later ref-id symbol (round-4 advisor
    high finding; needs keyframe_rate > GOLDEN_INTERVAL)."""
    _native_or_skip()
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession
    from daala_tpu.pipeline.inter import DecoderSession, GOLDEN_INTERVAL

    kf = GOLDEN_INTERVAL + 2
    frames = _clip(2 * kf + 3)
    info = _info(kf=kf)
    enc = DeviceEncoderSession(info, quality=30, chunk=4,
                               emit_recon=True, gray_start=True,
                               multiref=True)
    pkts = enc.encode_clip(frames)
    assert len(pkts) == len(frames)
    # One FT_GOLDEN inside each full GOP (cadence restarts per GOP).
    assert [p["ftype"] for p in pkts[:kf]].count(3) == 1
    dec = DecoderSession(info)
    for p in pkts:
        rec = dec.decode_frame(p["data"], False, ftype=p["ftype"],
                               dres=p["dres"],
                               gray_ref=bool(p.get("gray_ref")))
        for pl in range(3):
            assert np.array_equal(np.asarray(rec[pl]),
                                  np.asarray(p["recon"][pl])), \
                (p["display_order"], pl)


def test_gray_ref_resilience():
    """A stream that opens with a P frame (no decoded reference yet)
    must decode against the synthesized gray frame, not crash."""
    _native_or_skip()
    from daala_tpu.pipeline.inter import DecoderSession, EncoderSession

    info = _info()
    frames = _clip(3)
    enc = EncoderSession(info, quality=30)
    outs = []
    for f in frames:
        outs += enc.push_frame(f)
    dec = DecoderSession(info)
    # Drop the keyframe: decode the P packets only.
    for o in outs[1:]:
        dec.decode_frame(o["data"], False, ftype=o["ftype"])


def test_device_encode_keyframe_cadence():
    _native_or_skip()
    from daala_tpu.pipeline.device_encode import DeviceEncoderSession

    frames = _clip(6)
    info = _info(kf=3)
    enc = DeviceEncoderSession(info, quality=30, chunk=2)
    pkts = enc.encode_clip(frames)
    # multiref cadence: keyframe anchors, then FT_P until a golden
    # refresh would fall due (GOLDEN_INTERVAL=10 > this GOP length).
    assert [p["ftype"] for p in pkts] == [0, 1, 1, 0, 1, 1]
