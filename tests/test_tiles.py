"""Per-tile entropy streams (pipeline/tiles.py).

The tile contract: every tile's symbol stream decodes with only its
own RangeDecoder + AdaptState (no cross-tile symbol context), while
the data passes stay frame-level.  These tests check the packet
format, the encoder-check invariant across tile counts, order
independence of tile decode, and that forked tile workers are
bit-identical to serial coding.
"""

import hashlib

import numpy as np
import pytest

from daala_tpu.core.state import FrameInfo
from daala_tpu.pipeline.tiles import pack_tiles, tile_rows, unpack_tiles


def _planes(w, h, seed=11):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin(xx / 31) * np.cos(yy / 23)
         + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
    u = (y[::2, ::2] // 2 + 50).astype(np.uint8)
    v = (220 - y[::2, ::2] // 2).astype(np.uint8)
    return [y, u, v]


def test_tile_rows_partition():
    assert tile_rows(4, 1) == [(0, 4)]
    assert tile_rows(4, 2) == [(0, 2), (2, 4)]
    assert tile_rows(4, 3) == [(0, 1), (1, 3), (3, 4)]
    # More tiles than SB rows clamps; rows stay contiguous + disjoint.
    for nvsb in (1, 3, 7):
        for t in range(1, 10):
            b = tile_rows(nvsb, t)
            assert b[0][0] == 0 and b[-1][1] == nvsb
            for (a0, a1), (b0, b1) in zip(b, b[1:]):
                assert a1 == b0 and a0 < a1


def test_pack_unpack_roundtrip():
    streams = [b"header+tile0", b"", b"x" * 300, b"last"]
    assert unpack_tiles(pack_tiles(streams)) == streams
    assert unpack_tiles(pack_tiles([b"only"])) == [b"only"]


@pytest.mark.parametrize("tiles", [1, 2, 3, 4])
def test_keyframe_tiles_encoder_check(tiles):
    from daala_tpu.pipeline.intra import decode_keyframe, encode_keyframe

    info = FrameInfo(96, 128, 3, (0, 1, 1), (0, 1, 1))
    planes = _planes(96, 128)
    pkt, rec = encode_keyframe(planes, info, 25, bs_luma=-1,
                               return_recon=True, tiles=tiles)
    assert pkt[0] == min(tiles, 4)  # ntiles byte (4 SB rows max)
    dec = decode_keyframe(pkt, info, bs_luma=-1)
    for a, b in zip(rec, dec):
        assert np.array_equal(a, b)


def test_inter_tiles_encoder_check():
    from daala_tpu.pipeline.inter import DecoderSession, EncoderSession

    info = FrameInfo(96, 128, 3, (0, 1, 1), (0, 1, 1))
    rng = np.random.default_rng(5)
    frames = []
    base = _planes(96, 128)
    for t in range(4):
        y = np.roll(base[0], (2 * t, 3 * t), (0, 1))
        y = (y.astype(np.int32)
             + rng.integers(-2, 3, y.shape)).clip(0, 255).astype(np.uint8)
        frames.append([y, base[1], base[2]])
    enc = EncoderSession(info, quality=22, b_frames=1, tiles=2,
                         bs_luma=-1)
    dec = DecoderSession(info, bs_luma=-1)
    pkts = []
    for f in frames:
        pkts += enc.push_frame(f)
    pkts += enc.flush()
    for p in pkts:
        rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                               p.get("use_haar", False), p["ftype"])
        for a, b in zip(p["recon"], rec):
            assert np.array_equal(a, b)


def test_tiles_decode_order_independent():
    """Decoding tile symbol passes in REVERSE order must give the same
    frame — the proof that no symbol context crosses a tile boundary."""
    import daala_tpu.pipeline.tiles as T
    from daala_tpu.pipeline.intra import decode_keyframe, encode_keyframe

    info = FrameInfo(96, 128, 3, (0, 1, 1), (0, 1, 1))
    planes = _planes(96, 128, seed=3)
    pkt, rec = encode_keyframe(planes, info, 25, bs_luma=-1,
                               return_recon=True, tiles=4)

    orig = T.run_tiles

    def reversed_run(fn, n, processes=1):
        out = [None] * n
        for i in reversed(range(n)):
            out[i] = fn(i)
        return out

    T.run_tiles = reversed_run
    try:
        dec = decode_keyframe(pkt, info, bs_luma=-1)
    finally:
        T.run_tiles = orig
    for a, b in zip(rec, dec):
        assert np.array_equal(a, b)


def test_tile_workers_bit_identical():
    """Forked tile coding must produce byte-identical streams and
    pixel-identical decodes."""
    from daala_tpu.pipeline.inter import DecoderSession, EncoderSession

    info = FrameInfo(96, 64, 3, (0, 1, 1), (0, 1, 1))
    base = _planes(96, 64, seed=9)
    frames = [base,
              [np.roll(base[0], 3, 1), base[1], base[2]]]

    def run(workers):
        enc = EncoderSession(info, quality=24, tiles=2,
                             tile_workers=workers)
        dec = DecoderSession(info, tile_workers=workers)
        blob = b""
        out = []
        for f in frames:
            for p in enc.push_frame(f):
                blob += p["data"]
                out.append(dec.decode_frame(
                    p["data"], p["ftype"] == 0,
                    p.get("use_haar", False), p["ftype"]))
        return hashlib.md5(blob).hexdigest(), out

    h1, d1 = run(1)
    h2, d2 = run(2)
    assert h1 == h2
    for fa, fb in zip(d1, d2):
        for a, b in zip(fa, fb):
            assert np.array_equal(a, b)
