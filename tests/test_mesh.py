"""Adaptive MV mesh (search/mesh.py + pipeline mesh coding)."""

import numpy as np

from daala_tpu.search.mesh import (
    fill_stride,
    pass_mask,
    required_stride,
    vertex_spans,
)


def test_required_stride_ownership():
    # 2 SB rows x 3 SB cols; second row finer.
    levels = np.array([[0, 0, 0], [2, 0, 0]], dtype=np.int32)
    nvy, nvx = 9, 13
    bounds = [(0, 2)]
    req = required_stride(levels, nvy, nvx, bounds)
    # Top rows only need the coarse lattice.
    assert (req[:4] == 4).all()
    # Shared boundary row adopts the finer need below-left.
    assert req[4, 0] == 1
    assert req[4, 8] == 4
    # With a tile split at row 1, the boundary row (owned by tile 1)
    # consults only tile 1's SBs — value unchanged here — while tile
    # 0's last interior row must NOT see tile 1's fine level.
    req2 = required_stride(levels, nvy, nvx, [(0, 1), (1, 2)])
    assert req2[3, 0] == 4       # tile 0 interior: coarse
    assert req2[4, 0] == 1       # tile 1's first row: fine


def test_pass_masks_partition():
    rng = np.random.default_rng(0)
    levels = rng.integers(0, 3, (4, 5)).astype(np.int32)
    nvy, nvx = 17, 21
    req = required_stride(levels, nvy, nvx, [(0, 4)])
    m8 = pass_mask(req, 8, nvy, nvx)
    m4 = pass_mask(req, 4, nvy, nvx)
    m2 = pass_mask(req, 2, nvy, nvx)
    m1 = pass_mask(req, 1, nvy, nvx)
    # Disjoint.
    masks = [m8, m4, m2, m1]
    for i in range(4):
        for j in range(i + 1, 4):
            assert not (masks[i] & masks[j]).any()
    # The 64 px lattice is always coded; with no coarse64 SBs the two
    # coarse passes together cover the whole 32 px lattice.
    assert m8.sum() == 3 * 3
    assert (m8 | m4).sum() == 5 * 6
    # Everything req==1 is coded by one of the passes.
    coded = m8 | m4 | m2 | m1
    assert coded[req == 1].all()


def test_pass_masks_coarse64():
    from daala_tpu.search.mesh import LEVEL_COARSE64, level_to_stride

    levels = np.full((4, 5), LEVEL_COARSE64, dtype=np.int32)
    assert (level_to_stride(levels) == 8).all()
    nvy, nvx = 17, 21
    req = required_stride(levels, nvy, nvx, [(0, 4)])
    assert (req == 8).all()
    m8 = pass_mask(req, 8, nvy, nvx)
    m4 = pass_mask(req, 4, nvy, nvx)
    # Only the 64 px lattice is coded; stride-4 positions interpolate.
    assert m8.sum() == 3 * 3
    assert m4.sum() == 0


def test_fill_stride_dyadic():
    """With all lattice-4 vertices set, two fills reproduce exact
    dyadic refinement (floor averages)."""
    rng = np.random.default_rng(1)
    nvy, nvx = 9, 13
    g = np.zeros((nvy, nvx, 2), dtype=np.int64)
    r = np.zeros((nvy, nvx), dtype=np.int32)
    g[::4, ::4] = rng.integers(-64, 64, (3, 4, 2))
    spans = vertex_spans([(0, 2)], 2)
    fill_stride(g, r, 2, spans)
    fill_stride(g, r, 1, spans)
    base = g[::4, ::4]
    assert np.array_equal(g[::4, 2::4], (base[:, :-1] + base[:, 1:]) >> 1)
    assert np.array_equal(g[2::4, ::4], (base[:-1] + base[1:]) >> 1)
    assert np.array_equal(
        g[2::4, 2::4],
        (base[:-1, :-1] + base[:-1, 1:] + base[1:, :-1]
         + base[1:, 1:]) >> 2)


def test_fill_stride_tile_clamped():
    """A tile's fill must not read rows owned by another tile."""
    nvy, nvx = 9, 13
    g = np.zeros((nvy, nvx, 2), dtype=np.int64)
    r = np.zeros((nvy, nvx), dtype=np.int32)
    g[0, :] = 0
    g[4, :] = 100          # tile 1's first row
    g[8, :] = 100
    spans = vertex_spans([(0, 1), (1, 2)], 2)
    fill_stride(g, r, 2, spans)
    # Tile 0's offset row 2 may only see row 0 (clamped copy), never
    # the 100s in row 4.
    assert (g[2, ::4] == 0).all()
    # Tile 1's offset row 6 averages rows 4 and 8 normally.
    assert (g[6, ::4] == 100).all()


def test_mixed_obmc_matches_uniform_on_uniform_levels():
    from daala_tpu.ops.mc import obmc_predict, obmc_predict_mixed, pad_ref

    rng = np.random.default_rng(2)
    h = w = 64
    ref = rng.integers(0, 255, (h, w)).astype(np.uint8)
    grid = rng.integers(-16, 16, ((h >> 3) + 1, (w >> 3) + 1, 2)
                        ).astype(np.int64)
    refp = pad_ref(ref)
    for lv in range(3):
        levels = np.full((2, 2), lv, dtype=np.int32)
        mixed = obmc_predict_mixed([refp], 80, h, w, grid, levels, 3)
        stride = 4 >> lv
        uni = obmc_predict([refp], 80, h, w, grid[::stride, ::stride],
                           3 + 2 - lv)
        assert np.array_equal(mixed, uni)


def test_mesh_session_roundtrip_multilevel():
    """Force a mixed level map through the full session and check the
    encoder-check invariant."""
    import daala_tpu.pipeline.inter as I
    from daala_tpu.core.state import FrameInfo

    rng = np.random.default_rng(3)
    w, h = 96, 64
    base = (128 + 50 * np.sin(np.arange(w) / 13)[None, :]
            + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
    frames = [
        [base, (base[::2, ::2] // 2).astype(np.uint8),
         (base[::2, ::2] // 3).astype(np.uint8)],
        [np.roll(base, 5, 1), (base[::2, ::2] // 2).astype(np.uint8),
         (base[::2, ::2] // 3).astype(np.uint8)],
    ]
    orig = I.choose_levels
    forced = np.array([[0, 2, 1, 2], [2, 1, 0, 1]], dtype=np.int32)
    I.choose_levels = lambda *a, **k: forced.copy()  # (fh/32, fw/32)
    try:
        info = FrameInfo(w, h, 3, (0, 1, 1), (0, 1, 1))
        enc = I.EncoderSession(info, quality=24)
        dec = I.DecoderSession(info)
        for f in frames:
            for p in enc.push_frame(f):
                rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                                       p.get("use_haar", False),
                                       p["ftype"])
                for a, b in zip(p["recon"], rec):
                    assert np.array_equal(a, b)
    finally:
        I.choose_levels = orig
