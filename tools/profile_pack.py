"""Host-side pack profiling: where do the 0.14-0.16 s/f of
pack_device_frame go at 1080p?  (mesh coding vs native walk vs dering
flags vs Pre construction).  Pure CPU; run anywhere:

    JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu python tools/profile_pack.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from daala_tpu.core.quant import N_CODED_QUANTIZERS, \
        codedquantizer_to_quantizer
    from daala_tpu.entropy import make_encoder
    from daala_tpu.entropy.adapt import encode_cdf_adapt
    from daala_tpu.core.state import FrameInfo
    from daala_tpu.pipeline.device_encode import _device_pre, \
        _pack_planes, pack_device_frame
    from daala_tpu.pipeline.inter import _MvCtx, _code_mesh
    from daala_tpu.pipeline.intra import _tile_states
    from daala_tpu.pvq import native_walk as _nw
    from daala_tpu.pvq.isynth import icompute_k
    from daala_tpu.pvq.scan import BAND_OFFSETS

    h, w = 1088, 1920
    cq = 30
    info = FrameInfo(pic_width=w, pic_height=h, bitdepth=8,
                     xdec=(0, 1, 1), ydec=(0, 1, 1), nplanes=3,
                     keyframe_rate=256)
    rng = np.random.default_rng(0)
    nvy, nvx = (h >> 3) + 1, (w >> 3) + 1
    grid = (rng.integers(-40, 41, (nvy, nvx, 2)) & ~1).astype(np.int32)
    # Smooth the grid so mesh coding sees realistic deltas.
    grid[:, :, 0] = np.clip(np.cumsum(grid[:, :, 0] // 16, axis=1), -60,
                            60) * 2
    grid[:, :, 1] = np.clip(np.cumsum(grid[:, :, 1] // 16, axis=0), -60,
                            60) * 2
    levels = rng.integers(0, 4, (h >> 5, w >> 5)).astype(np.int32)
    dflags = rng.integers(0, 2, (h >> 5, w >> 5)).astype(np.int32)
    syms = {"dc": [], "qg": [], "y": []}
    for pli in range(3):
        xd = info.xdec[pli]
        bs = max(1 - xd, 0)
        n = 4 << bs
        ph, pw = h >> info.ydec[pli], w >> xd
        nb = BAND_OFFSETS[bs][0]
        clen = BAND_OFFSETS[bs][1 + nb] - 1
        B = (ph // n) * (pw // n)
        dc = rng.integers(-3, 4, B).astype(np.int32)
        qg = np.maximum(rng.integers(-2, 3, (B, nb)), 0).astype(np.int16)
        y = np.zeros((B, clen), dtype=np.int16)
        # scatter k pulses per band
        for b in range(nb):
            lo, hi = BAND_OFFSETS[bs][1 + b] - 1, BAND_OFFSETS[bs][2 + b] - 1
            k = icompute_k(hi - lo, True, qg[:, b].astype(np.int64))
            y[:, lo] = k  # all pulses on first coeff (valid stream)
        syms["dc"].append(dc)
        syms["qg"].append(qg)
        syms["y"].append(y)

    def t(name, fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name:30s} {sorted(ts)[1] * 1000:9.2f} ms")
        return out

    quantizer = codedquantizer_to_quantizer(cq)
    t("pack_device_frame total", lambda: pack_device_frame(
        info, cq, grid, levels, syms, dflags, True))
    t("pack 2 tiles x 2 workers", lambda: pack_device_frame(
        info, cq, grid, levels, syms, dflags, True, tiles=2,
        tile_workers=2))
    t("pack 4 tiles x 2 workers", lambda: pack_device_frame(
        info, cq, grid, levels, syms, dflags, True, tiles=4,
        tile_workers=2))

    # components
    def mesh():
        ec = make_encoder()
        for _ in range(3):
            ec.encode_uint(cq, N_CODED_QUANTIZERS)
        _code_mesh([ec], [_MvCtx()], [(0, h >> 5)], info, 1, True,
                   truth=grid.astype(np.int64),
                   truth_rids=np.zeros((nvy, nvx), np.int32),
                   levels=levels, quantizer=quantizer)
        return ec

    ec = t("  mesh coding", mesh)

    pre = t("  _device_pre", lambda: _device_pre(info, syms))
    states = _tile_states(3, quantizer, False, 1, is_keyframe=False)
    pcs = _pack_planes(info, quantizer)

    def walk():
        st = _tile_states(3, quantizer, False, 1, is_keyframe=False)[0]
        ec2 = make_encoder()
        dummy = np.zeros(pre.nslots, dtype=np.int32)
        du8 = np.zeros(pre.nslots, dtype=np.uint8)
        _nw.walk_enc(ec2, st, pcs, pre, (0, h >> 5), w >> 5, False,
                     dummy, du8, du8.copy(), dres=True, plain_dc=True)
        return ec2

    t("  walk_enc (native)", walk)

    st = states[0]

    def der():
        ec3 = make_encoder()
        for sby in range(h >> 5):
            for sbx in range(w >> 5):
                up = int(dflags[sby - 1, sbx]) if sby > 0 else 0
                left = int(dflags[sby, sbx - 1]) if sbx > 0 else 0
                encode_cdf_adapt(ec3, int(dflags[sby, sbx]),
                                 st.clpf_cdf[(up << 1) + left],
                                 st.clpf_increment)

    t("  dering flags", der)


if __name__ == "__main__":
    main()
