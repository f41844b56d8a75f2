"""Unified config / ctl surface (VERDICT round-1 items 6+7):
complexity ladder, SATD stage, QM select, MV res/level bounds, env
overrides, and the reference ctl-name mapping (daalaenc.h:157-215)."""

import numpy as np
import pytest

from daala_tpu.core.config import (CTL_NAMES, EncoderConfig,
                                   complexity_params)
from daala_tpu.core.state import FrameInfo
from daala_tpu.pipeline.inter import DecoderSession, EncoderSession


def _synth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 3 + yy * 2) % 160 + rng.integers(0, 24, (h, w))
         ).astype(np.uint8)
    u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
    v = (200 - y[::2, ::2] // 2).astype(np.uint8)
    return [y, u, v]


def _shift(planes, d):
    return [np.roll(p, d >> (0 if i == 0 else 1), axis=1)
            for i, p in enumerate(planes)]


def test_ctl_names_cover_reference_surface():
    cfg = EncoderConfig()
    for name in CTL_NAMES:
        assert name.startswith("OD_SET_")
    cfg.ctl("OD_SET_COMPLEXITY", 9)
    assert cfg.complexity == 9
    cfg.ctl("OD_SET_QM", 0)
    assert cfg.qm == 0
    cfg.ctl("OD_SET_MC_SATD", 1)
    assert cfg.mc_use_satd == 1
    cfg.ctl("OD_SET_MV_LEVEL_MAX", 2)
    assert cfg.mv_level_max == 2
    with pytest.raises(ValueError):
        cfg.ctl("OD_SET_NOPE", 1)
    with pytest.raises(ValueError):
        EncoderConfig(complexity=11)
    # Reference ctl contract (daalaenc.h + encode.c:560-583): min > max
    # resolves to max AT USE TIME; the stored ctl values read back as
    # set, and raising max later restores the requested min.
    cfg2 = EncoderConfig(mv_level_min=3, mv_level_max=1)
    assert (cfg2.mv_level_min, cfg2.mv_level_max) == (3, 1)
    assert cfg2.effective_mv_levels() == (1, 1)
    cfg2.ctl("OD_SET_MV_LEVEL_MAX", 4)
    assert cfg2.effective_mv_levels() == (3, 3)
    cfg3 = EncoderConfig(mv_level_min=4, mv_level_max=4)
    assert cfg3.effective_mv_levels() == (3, 3)
    with pytest.raises(ValueError):
        EncoderConfig(mv_level_max=5)


def test_complexity_ladder_monotone():
    prev = -1
    for c in range(11):
        p = complexity_params(c)
        assert p["refine_iters"] >= prev
        prev = p["refine_iters"]
    assert not complexity_params(0)["rdo_bsize"]
    assert complexity_params(2)["rdo_bsize"]
    assert not complexity_params(7)["use_satd"]
    assert complexity_params(8)["use_satd"]
    # Explicit ctl overrides the ladder in either direction.
    assert EncoderConfig(complexity=3,
                         mc_use_satd=1).search_params()["use_satd"]
    assert not EncoderConfig(complexity=10,
                             mc_use_satd=0).search_params()["use_satd"]


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("DTPU_COMPLEXITY", "4")
    monkeypatch.setenv("DTPU_USE_DERING", "0")
    cfg = EncoderConfig.from_env(quality=30)
    assert cfg.complexity == 4 and not cfg.use_dering
    assert cfg.quality == 30


def _roundtrip(cfg, nframes=3):
    info = FrameInfo(pic_width=64, pic_height=64, qm=cfg.qm)
    enc = EncoderSession(info, config=cfg)
    dec = DecoderSession(info)
    frames = [_synth(64, 64)] + [_shift(_synth(64, 64), 2 * i)
                                 for i in range(1, nframes)]
    for f in frames:
        for o in enc.push_frame(f):
            rec = dec.decode_frame(o["data"], o["ftype"] == 0,
                                   ftype=o["ftype"],
                                   dres=o.get("dres", False))
            for a, b in zip(o["recon"], rec):
                assert np.array_equal(a, b)


@pytest.mark.parametrize("kw", [
    dict(qm=0),
    dict(complexity=1),
    dict(complexity=9, mc_use_satd=1),
    dict(mv_level_min=1, mv_level_max=2),
    dict(mv_res_min=2),
])
def test_ctl_round_trips(kw):
    """Every ctl combination keeps the encoder-check invariant: the
    decoder reconstructs the encoder's recon exactly."""
    _roundtrip(EncoderConfig(quality=28, **kw))


def test_qm_select_in_container(tmp_path):
    from daala_tpu.io.container import (FramePacket, read_stream,
                                        write_stream)

    info = FrameInfo(pic_width=64, pic_height=64, qm=0)
    enc = EncoderSession(info, config=EncoderConfig(quality=30, qm=0))
    pkts = [FramePacket(o["data"], keyframe=o["ftype"] == 0,
                        ftype=o["ftype"], display_order=o["display_order"])
            for o in enc.push_frame(_synth(64, 64))]
    path = str(tmp_path / "t.dtp")
    write_stream(path, info, pkts)
    info2, _, pkts2 = read_stream(path)
    assert info2.qm == 0
    # Default-qm streams keep an empty setup header (back-compat).
    info3 = FrameInfo(pic_width=64, pic_height=64)
    write_stream(path, info3, pkts)
    assert read_stream(path)[0].qm == 1


def test_satd_kernel_matches_reference_shape():
    from daala_tpu.ops.satd import hadamard, satd_blocks

    H = hadamard(8)
    assert np.array_equal(H @ H.T, 8 * np.eye(8, dtype=np.int32))
    rng = np.random.default_rng(3)
    d = rng.integers(-255, 256, (17, 8, 8))
    s = satd_blocks(d)
    assert s.shape == (17,) and (s >= 0).all()
    # A constant difference c concentrates into one WHT coefficient
    # c*n^2; after the >>lg(n) renorm the score is c*n — the same
    # scale as SAD/sqrt(n), matching the reference's downshift.
    flat = np.full((1, 8, 8), 7)
    assert satd_blocks(flat)[0] == 7 * 8


def test_satd_jax_twin_bitexact():
    import jax

    from daala_tpu.ops.satd import satd_blocks, satd_blocks_jax

    rng = np.random.default_rng(4)
    d = rng.integers(-255, 256, (9, 16, 16))
    with jax.default_device(jax.devices("cpu")[0]):
        j = np.asarray(satd_blocks_jax(d))
    assert np.array_equal(j, satd_blocks(d))
