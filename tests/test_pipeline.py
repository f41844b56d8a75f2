"""End-to-end pipeline tests.

The standing invariants from the reference test strategy:
* encoder-check: encoder reconstruction == decoder output pixel-exact
  (encode.c:3204-3243).
* check_lossless: md5(decoded y4m payload) == md5(input) at quality 0
  (tools/check_lossless.sh:41-57).
"""

import hashlib
import io
import os
import tempfile

import numpy as np
import pytest

from daala_tpu.core.state import FrameInfo
from daala_tpu.io.container import FramePacket, read_stream, write_stream
from daala_tpu.io.y4m import Y4MHeader, read_y4m, write_y4m
from daala_tpu.pipeline.intra import decode_keyframe, encode_keyframe
from daala_tpu.pipeline.wavelet import (
    decode_keyframe_lossless,
    encode_keyframe_lossless,
)


def _synth_planes(W, H, fmt, seed=0):
    rng = np.random.default_rng(seed)
    planes = []
    for pli in range(3):
        xd = fmt[pli]
        h, w = H >> xd, W >> xd
        p = (128 + 45 * np.sin(np.arange(h)[:, None] / (5 + pli))
             + 35 * np.cos(np.arange(w)[None, :] / (7 - pli))
             + rng.normal(0, 5, (h, w)))
        planes.append(np.clip(p, 0, 255).astype(np.uint8))
    return planes


@pytest.mark.parametrize("fmt", [(0, 1, 1), (0, 0, 0)])
@pytest.mark.parametrize("q", [10, 35])
def test_encoder_check_invariant(fmt, q):
    W, H = 64, 64
    planes = _synth_planes(W, H, fmt, seed=q)
    info = FrameInfo(pic_width=W, pic_height=H,
                     xdec=(0, fmt[1], fmt[1]), ydec=(0, fmt[2], fmt[2]))
    pkt, recon = encode_keyframe(planes, info, quality=q, return_recon=True)
    out = decode_keyframe(pkt, info)
    for a, b in zip(recon, out):
        assert np.array_equal(a, b)


def test_quality_scales_rate_and_distortion():
    W, H = 64, 64
    planes = _synth_planes(W, H, (0, 1, 1), seed=3)
    info = FrameInfo(pic_width=W, pic_height=H)
    sizes = []
    psnrs = []
    for q in (5, 20, 40):
        pkt = encode_keyframe(planes, info, quality=q)
        out = decode_keyframe(pkt, info)
        mse = ((planes[0].astype(float) - out[0]) ** 2).mean()
        sizes.append(len(pkt))
        psnrs.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
    assert sizes[0] > sizes[1] > sizes[2]
    assert psnrs[0] > psnrs[1] > psnrs[2]
    assert psnrs[0] > 45


def test_block_sizes():
    W, H = 64, 64
    planes = _synth_planes(W, H, (0, 1, 1), seed=5)
    info = FrameInfo(pic_width=W, pic_height=H)
    for bs in (0, 1, 2, 3):
        pkt, recon = encode_keyframe(planes, info, quality=20, bs_luma=bs,
                                     return_recon=True)
        out = decode_keyframe(pkt, info, bs_luma=bs)
        for a, b in zip(recon, out):
            assert np.array_equal(a, b), bs


def test_activity_masking_round_trip():
    W, H = 64, 64
    planes = _synth_planes(W, H, (0, 1, 1), seed=6)
    info = FrameInfo(pic_width=W, pic_height=H)
    pkt, recon = encode_keyframe(planes, info, quality=20,
                                 use_masking=True, return_recon=True)
    out = decode_keyframe(pkt, info, use_masking=True)
    for a, b in zip(recon, out):
        assert np.array_equal(a, b)


def test_lossless_parity():
    """check_lossless: decoded frame must hash identically to input."""
    W, H = 64, 96
    planes = _synth_planes(W, H, (0, 1, 1), seed=7)
    info = FrameInfo(pic_width=W, pic_height=H)
    pkt = encode_keyframe_lossless(planes, info)
    out = decode_keyframe_lossless(pkt, info)
    md5_in = hashlib.md5(b"".join(p.tobytes() for p in planes)).hexdigest()
    md5_out = hashlib.md5(b"".join(p.tobytes() for p in out)).hexdigest()
    assert md5_in == md5_out


def test_container_round_trip(tmp_path):
    info = FrameInfo(pic_width=352, pic_height=288, keyframe_rate=12)
    pkts = [FramePacket(b"hello", keyframe=True, bs_luma=2),
            FramePacket(b"\x00" * 1000, keyframe=False, use_haar=True)]
    path = str(tmp_path / "t.dtp")
    write_stream(path, info, pkts, comment="test")
    info2, comment, pkts2 = read_stream(path)
    assert info2.pic_width == 352 and info2.keyframe_rate == 12
    assert comment == "test"
    assert pkts2[0].data == b"hello" and pkts2[0].bs_luma == 2
    assert pkts2[1].use_haar and not pkts2[1].keyframe


def test_y4m_round_trip(tmp_path):
    hdr = Y4MHeader(width=32, height=16, colorspace="420")
    frames = [_synth_planes(32, 16, (0, 1, 1), seed=i) for i in range(3)]
    path = str(tmp_path / "t.y4m")
    write_y4m(path, hdr, frames)
    hdr2, frames2 = read_y4m(path)
    assert hdr2.width == 32 and hdr2.colorspace.startswith("420")
    for fa, fb in zip(frames, frames2):
        for a, b in zip(fa, fb):
            assert np.array_equal(a, b)


def test_cli_end_to_end(tmp_path):
    """Full encoder_example / dump_video flow through the CLIs."""
    from daala_tpu.cli.decode import main as dec_main
    from daala_tpu.cli.encode import main as enc_main

    W, H = 64, 64
    hdr = Y4MHeader(width=W, height=H, colorspace="420")
    frames = [_synth_planes(W, H, (0, 1, 1), seed=i) for i in range(2)]
    src = str(tmp_path / "in.y4m")
    stream = str(tmp_path / "s.dtp")
    dst = str(tmp_path / "out.y4m")
    write_y4m(src, hdr, frames)
    enc_main([src, "-o", stream, "-v", "20"])
    dec_main([stream, "-o", dst])
    hdr2, out = read_y4m(dst)
    assert len(out) == 2
    mse = ((frames[0][0].astype(float) - out[0][0]) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 30


def test_cli_lossless_end_to_end(tmp_path):
    from daala_tpu.cli.decode import main as dec_main
    from daala_tpu.cli.encode import main as enc_main

    W, H = 64, 64
    hdr = Y4MHeader(width=W, height=H, colorspace="420")
    frames = [_synth_planes(W, H, (0, 1, 1), seed=9)]
    src = str(tmp_path / "in.y4m")
    stream = str(tmp_path / "s.dtp")
    dst = str(tmp_path / "out.y4m")
    write_y4m(src, hdr, frames)
    enc_main([src, "-o", stream, "-v", "0"])
    dec_main([stream, "-o", dst])
    # md5 of the decoded y4m payload equals the input payload.
    _, out = read_y4m(dst)
    a = b"".join(p.tobytes() for p in frames[0])
    b = b"".join(p.tobytes() for p in out[0])
    assert hashlib.md5(a).hexdigest() == hashlib.md5(b).hexdigest()


def test_dering_invariant_and_gain():
    """Dering must keep the encoder-check invariant and help on sharp
    edges at moderate rates."""
    rng = np.random.default_rng(4)
    W = H = 64
    y = np.full((H, W), 80, np.uint8)
    y[:, 32:] = 200
    y[20:40, 10:50] = 30
    y = np.clip(y.astype(float) + rng.normal(0, 2, (H, W)), 0,
                255).astype(np.uint8)
    u = np.full((H // 2, W // 2), 100, np.uint8)
    v = np.full((H // 2, W // 2), 150, np.uint8)
    info = FrameInfo(pic_width=W, pic_height=H)
    pkt, recon = encode_keyframe([y, u, v], info, quality=40,
                                 return_recon=True)
    out = decode_keyframe(pkt, info)
    for a, b in zip(recon, out):
        assert np.array_equal(a, b)
    out_nd = decode_keyframe(
        encode_keyframe([y, u, v], info, quality=40, use_dering=False),
        info, use_dering=False)
    def psnr(o):
        return 10 * np.log10(255 ** 2 / ((y.astype(float) - o[0]) ** 2).mean())
    assert psnr(out) >= psnr(out_nd) - 0.05


def test_inter_pframes():
    """P-frame round trip with global motion: encoder-check holds and
    P-frames are much cheaper than keyframes."""
    from daala_tpu.pipeline.inter import DecoderSession, EncoderSession

    rng = np.random.default_rng(0)
    W = H = 64
    base = np.clip(
        128 + 60 * np.sin(np.arange(H + 32)[:, None] / 9)
        + 40 * np.cos(np.arange(W + 32)[None, :] / 7)
        + rng.normal(0, 4, (H + 32, W + 32)), 0, 255).astype(np.uint8)
    bu = np.full(((H + 32) // 2, (W + 32) // 2), 110, np.uint8)
    bv = np.full(((H + 32) // 2, (W + 32) // 2), 140, np.uint8)
    frames = []
    for t in range(3):
        dy, dx = 2 * t, 3 * t
        frames.append([
            base[dy:dy + H, dx:dx + W],
            bu[dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2],
            bv[dy // 2:dy // 2 + H // 2, dx // 2:dx // 2 + W // 2],
        ])
    info = FrameInfo(pic_width=W, pic_height=H)
    enc = EncoderSession(info, quality=25, keyframe_rate=100)
    dec = DecoderSession(info)
    sizes = []
    for t, fr in enumerate(frames):
        pkt, is_key, rec = enc.encode_frame(fr)
        out = dec.decode_frame(pkt, is_key)
        for a, b in zip(rec, out):
            assert np.array_equal(a, b), t
        assert is_key == (t == 0)
        sizes.append(len(pkt))
        mse = ((fr[0].astype(float) - out[0]) ** 2).mean()
        assert 10 * np.log10(255 ** 2 / mse) > 33, t
    assert sizes[1] < sizes[0] // 2 and sizes[2] < sizes[0] // 2


def test_b_frames_and_reorder(tmp_path):
    """B-frame streams: coding-order packets, display reorder, golden
    multiref path, encoder-check per frame."""
    from daala_tpu.cli.decode import main as dec_main
    from daala_tpu.cli.encode import main as enc_main

    rng = np.random.default_rng(2)
    W = H = 64
    bg = np.clip(128 + 55 * np.sin(np.arange(H + 64)[:, None] / 10)
                 + 45 * np.cos(np.arange(W + 64)[None, :] / 8)
                 + rng.normal(0, 4, (H + 64, W + 64)),
                 0, 255).astype(np.uint8)
    frames = []
    for t in range(6):
        dy, dx = 2 * t, 3 * t
        frames.append([bg[dy:dy + H, dx:dx + W],
                       np.full((H // 2, W // 2), 100, np.uint8),
                       np.full((H // 2, W // 2), 150, np.uint8)])
    hdr = Y4MHeader(width=W, height=H, colorspace="420")
    src = str(tmp_path / "in.y4m")
    stream = str(tmp_path / "s.dtp")
    dst = str(tmp_path / "out.y4m")
    write_y4m(src, hdr, frames)
    enc_main([src, "-o", stream, "-v", "25", "-b", "1"])
    dec_main([stream, "-o", dst])
    _, out = read_y4m(dst)
    assert len(out) == 6
    # Display order restored: each decoded frame tracks its source.
    for t in range(6):
        mse = ((frames[t][0].astype(float) - out[t][0]) ** 2).mean()
        assert 10 * np.log10(255 ** 2 / mse) > 30, t
    info, _, pkts = read_stream(stream)
    assert any(p.ftype == 2 for p in pkts)  # B packets present
    assert sorted(p.display_order for p in pkts) == list(range(6))


def test_bit_accounting():
    """Decoder accounting must attribute ~all packet bits to symbols
    (the --enable-accounting subsystem)."""
    from daala_tpu.entropy.accounting import Accounting

    planes = _synth_planes(64, 64, (0, 1, 1), seed=11)
    info = FrameInfo(pic_width=64, pic_height=64)
    pkt, recon = encode_keyframe(planes, info, quality=25,
                                 return_recon=True)
    acct = Accounting()
    out = decode_keyframe(pkt, info, acct=acct)
    for a, b in zip(recon, out):
        assert np.array_equal(a, b)  # accounting must not perturb decode
    total_bits = sum(fb for *_, fb in acct.records) / 8.0
    assert abs(total_bits - len(pkt) * 8) < 64  # tell() slack only
    tech = acct.by_technique()
    assert "pvq" in tech and "haardc:sb" in tech
    hm = acct.heatmap(16, 16)
    assert hm.sum() > 0


def test_gop_parallel_bit_identical():
    """GOP-sharded parallel encoding must be bit-identical to serial
    (keyframes are clean entropy cut points)."""
    from daala_tpu.dist.gop import encode_gops_parallel
    from daala_tpu.pipeline.inter import EncoderSession

    # Long enough that the GLOBAL golden-frame cadence (every 10th P,
    # the reference's ip_frame_count modulo, encode.c:2958) crosses GOP
    # boundaries — the parallel workers must seed that phase.
    frames = [_synth_planes(64, 64, (0, 1, 1), seed=i) for i in range(26)]
    info = FrameInfo(pic_width=64, pic_height=64)
    sess = EncoderSession(info, 25, keyframe_rate=4)
    serial = []
    for fr in frames:
        serial += sess.push_frame(fr)
    serial += sess.flush()
    pkts = encode_gops_parallel(frames, info, 25, gop_len=4, workers=2)
    assert len(pkts) == len(serial)
    assert any(a["ftype"] == 3 for a in serial)  # a golden P occurred
    for a, b in zip(serial, pkts):
        assert a["ftype"] == b.ftype
        assert a["data"] == b.data
        assert a["display_order"] == b.display_order


def test_decoder_fuzz_robustness():
    """Corrupted/truncated/garbage packets must never raise (stream
    resilience: entdec error-flag semantics + MV clamps)."""
    from daala_tpu.pipeline.inter import DecoderSession, EncoderSession

    rng = np.random.default_rng(0)
    planes = _synth_planes(64, 64, (0, 1, 1), seed=0)
    info = FrameInfo(pic_width=64, pic_height=64)
    enc = EncoderSession(info, 25)
    outs = enc.push_frame(planes) + enc.push_frame(planes)
    key, pfr = outs
    for trial in range(30):
        dec = DecoderSession(info)
        for pkt, is_key in ((key, True), (pfr, False)):
            data = bytearray(pkt["data"])
            mode = trial % 3
            if mode == 0 and len(data) > 2:
                for _ in range(3):
                    data[rng.integers(0, len(data))] ^= int(
                        rng.integers(1, 256))
            elif mode == 1:
                data = data[:rng.integers(0, len(data))]
            elif len(data) > 9:
                # Target the tile table (ntiles byte + u32 lengths).
                for i in range(min(9, len(data))):
                    if rng.random() < 0.5:
                        data[i] = int(rng.integers(0, 256))
            dec.decode_frame(bytes(data), is_key)  # must not raise


def test_mono_plane():
    planes = _synth_planes(64, 64, (0, 1, 1), seed=1)[:1]
    info = FrameInfo(pic_width=64, pic_height=64, nplanes=1,
                     xdec=(0,), ydec=(0,))
    pkt, rec = encode_keyframe(planes, info, quality=25,
                               return_recon=True)
    out = decode_keyframe(pkt, info)
    assert np.array_equal(rec[0], out[0])


def test_422_rejected():
    from daala_tpu.pipeline.inter import EncoderSession

    info = FrameInfo(pic_width=64, pic_height=64,
                     xdec=(0, 1, 1), ydec=(0, 0, 0))
    with pytest.raises(ValueError):
        EncoderSession(info, 25)


def test_chroma_fidelity_420():
    """Chroma must track the input, not just stay self-consistent: the
    chroma Haar-DC tree once combined DCs ACROSS chroma superblocks (a
    level the coder never undoes), which kept enc-check green while
    chroma quality saturated at ~22 dB.  Guard reconstruction PSNR of
    BOTH chroma planes on structured 4:2:0 content."""
    import numpy as np

    from daala_tpu.core.state import FrameInfo
    from daala_tpu.pipeline.intra import encode_keyframe

    rng = np.random.default_rng(6)
    w, h = 96, 128
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin(xx / 19) * np.cos(yy / 17)
         + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.uint8)
    u = (y[::2, ::2] // 2 + 50).astype(np.uint8)
    v = (220 - y[::2, ::2] // 2).astype(np.uint8)
    info = FrameInfo(w, h, 3, (0, 1, 1), (0, 1, 1))
    _, rec = encode_keyframe([y, u, v], info, 18, bs_luma=-1,
                             return_recon=True)
    for pli, src in ((1, u), (2, v)):
        mse = ((src.astype(np.int64) - rec[pli]) ** 2).mean()
        psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-12))
        assert psnr > 38.0, f"plane {pli} chroma psnr {psnr:.1f}"


def test_long_session_stress():
    """40 frames through keyframe cadence, golden rotation, B-frames
    and tiles: the encoder-check invariant must hold at every frame
    (catches long-session adaptation/reference-rotation bugs)."""
    import numpy as np

    from daala_tpu.core.state import FrameInfo
    from daala_tpu.pipeline.inter import DecoderSession, EncoderSession

    rng = np.random.default_rng(12)
    w, h = 96, 64
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    info = FrameInfo(w, h, 3, (0, 1, 1), (0, 1, 1))
    enc = EncoderSession(info, quality=30, b_frames=2, bs_luma=-1,
                         keyframe_rate=10, tiles=2)
    dec = DecoderSession(info, bs_luma=-1)
    n = 0
    pkts = []
    for t in range(40):
        y = (128 + 50 * np.sin(xx / 13 + t * 0.2) * np.cos(yy / 11)
             + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.uint8)
        u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
        v = (210 - y[::2, ::2] // 2).astype(np.uint8)
        pkts += enc.push_frame([y, u, v])
    pkts += enc.flush()
    ftypes = set()
    for p in pkts:
        rec = dec.decode_frame(p["data"], p["ftype"] == 0,
                               p.get("use_haar", False), p["ftype"])
        ftypes.add(p["ftype"])
        for a, b in zip(p["recon"], rec):
            assert np.array_equal(a, b), f"frame {p['display_order']}"
        n += 1
    assert n == 40
    # The cadence must actually exercise I, P, B and golden frames.
    assert ftypes >= {0, 1, 2, 3}


def test_rate_control_converges():
    """The leaky-bucket rate controller must steer the coded quantizer
    toward the bits/s target (steady state within ~25%) while keeping
    the encoder-check invariant."""
    import numpy as np

    from daala_tpu.core.state import FrameInfo
    from daala_tpu.pipeline.inter import DecoderSession, EncoderSession

    rng = np.random.default_rng(3)
    w, h = 96, 64
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    frames = []
    for t in range(24):
        y = (128 + 50 * np.sin(xx / 13 + t * 0.2) * np.cos(yy / 11)
             + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.uint8)
        frames.append([y, (y[::2, ::2] // 2 + 40).astype(np.uint8),
                       (210 - y[::2, ::2] // 2).astype(np.uint8)])
    info = FrameInfo(w, h, 3, (0, 1, 1), (0, 1, 1))
    target_kbps = 80
    enc = EncoderSession(info, quality=20, bs_luma=-1,
                         keyframe_rate=256, bitrate=target_kbps * 1000)
    dec = DecoderSession(info, bs_luma=-1)
    sizes = []
    for f in frames:
        for p in enc.push_frame(f):
            r = dec.decode_frame(p["data"], p["ftype"] == 0,
                                 p.get("use_haar", False), p["ftype"])
            for a, b in zip(p["recon"], r):
                assert np.array_equal(a, b)
            sizes.append(len(p["data"]))
    steady = sum(sizes[12:]) * 8 * 30 / len(sizes[12:]) / 1000
    assert 0.5 * target_kbps < steady < 1.6 * target_kbps, steady
