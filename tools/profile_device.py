"""Per-stage timing of the device encode frame body on the real chip.

Times each stage of pipeline/device_encode._frame_body as a standalone
jit at 1080p so the 30 fps optimization work (VERDICT round-1 item 1)
attacks the real hot spots instead of guesses.  Run on the TPU:

    python tools/profile_device.py [--stages me,obmc,...]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _sync(out):
    """Hard sync: fetch one scalar to the host (block_until_ready is
    unreliable over tunneled platforms — see bench.py)."""
    import jax
    import numpy as _np

    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    return int(_np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x))


def timeit(fn, args, n=3, name=""):
    _sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:34s} {med * 1000:9.2f} ms")
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="all")
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--w", type=int, default=1920)
    args = ap.parse_args()
    stages = args.stages.split(",")

    import jax
    import jax.numpy as jnp

    from daala_tpu.pipeline.device_encode import (
        PAD, _choose_levels, _dering_select, _fwd_input, _fwd_pred,
        _interp_stride4, _inv, _plane_code, _sim_stride4, _select_by_sb)
    from daala_tpu.core.quant import QM8_HVS, init_qm
    from daala_tpu.core.state import interp_pvq_qm
    from daala_tpu.ops.mc_jax import obmc_predict_jax
    from daala_tpu.search.me_jax import (
        motion_search_dense_jax, motion_search_jax, pad_edge,
        _refine_midpoints_jax, _upsample_grid)

    h, w = args.h, args.w
    hc, wc = h // 2, w // 2
    quantizer = 90
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h + 16, w + 16), dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 16, 0:w + 16]
    base = ((base // 4) + (yy + 2 * xx) % 180).astype(np.uint8)
    cy = jnp.asarray(base[:h, :w])
    cu = jnp.asarray(np.ascontiguousarray(base[:hc, :wc] // 2 + 60))
    cv = 220 - cu
    ry = jnp.asarray(np.pad(base[2:2 + h, 4:4 + w], PAD, mode="edge"))
    ru = pad_edge(cu, PAD)
    rv = pad_edge(cv, PAD)

    qm, qm_inv = init_qm(QM8_HVS)
    qms = tuple(np.asarray(qm[bs], dtype=np.int32) for bs in range(4))
    qmis = tuple(np.asarray(qm_inv[bs], dtype=np.int32) for bs in range(4))
    pvq_qms = tuple(interp_pvq_qm(quantizer, pli, False) for pli in range(3))

    with jax.enable_x64(True):
        # --- calibration: tunnel round-trip latency ------------------------
        nul = jax.jit(lambda a: a.sum())
        timeit(nul, (cy,), name="(null: dispatch+fetch latency)")

        # --- ME -----------------------------------------------------------
        me_fn = jax.jit(lambda c, r: motion_search_dense_jax(
            c, r[16:16 + h + 128, 16:16 + w + 128], h, w))
        grid = me_fn(cy, ry)
        if "me" in stages or "all" in stages:
            timeit(me_fn, (cy, ry), name="ME total (dense grid)")
            coarse_fn = jax.jit(lambda c, r: motion_search_jax(
                c, r[64:64 + h, 64:64 + w], r, h, w, 5))
            g32 = coarse_fn(cy, ry)
            timeit(coarse_fn, (cy, ry), name="  ME stage 32px (coarse+sub)")
            up_fn = jax.jit(lambda c, r, g: _refine_midpoints_jax(
                c, r, _upsample_grid(g), 4, h, w))
            g16 = up_fn(cy, ry, g32)
            timeit(up_fn, (cy, ry, g32), name="  ME refine 16px midpoints")
            up8_fn = jax.jit(lambda c, r, g: _refine_midpoints_jax(
                c, r, _upsample_grid(g), 3, h, w))
            timeit(up8_fn, (cy, ry, g16), name="  ME refine 8px midpoints")

        mv_res = 1
        g_res = (grid >> mv_res).astype(jnp.int32)
        g = (g_res << mv_res).astype(jnp.int32)

        # --- rate-aware lattice refinement (RD path) ------------------------
        if "refine" in stages or "all" in stages:
            from daala_tpu.search.me_jax import refine_lattice_jax

            refp8 = ry[16:16 + h + 128, 16:16 + w + 128]
            g32 = jax.jit(lambda c, r: motion_search_jax(
                c, r[64:64 + h, 64:64 + w], r, h, w, 5))(cy, ry)
            g32 = ((g32 >> mv_res) << mv_res).astype(jnp.int32)
            rf_fn = jax.jit(lambda c, r, gg: refine_lattice_jax(
                c, r, gg, h, w, quantizer, mv_res=mv_res))
            timeit(rf_fn, (cy, refp8, g32), name="refine_lattice (32px RD)")

        # --- OBMC candidates ----------------------------------------------
        ob1 = jax.jit(lambda r, gg: obmc_predict_jax([r], PAD, h, w,
                                                     gg, 4))
        ob2 = jax.jit(lambda r, gg: obmc_predict_jax([r], PAD, h, w,
                                                     gg, 3))
        ob0 = jax.jit(lambda r, gg: obmc_predict_jax([r], PAD, h, w,
                                                     gg, 5))
        p_lv1 = ob1(ry, g[::2, ::2])
        p_lv2 = ob2(ry, g)
        p_lv0 = ob0(ry, g[::4, ::4])
        if "obmc" in stages or "all" in stages:
            timeit(ob0, (ry, g[::4, ::4]), name="OBMC luma 32px (lv0)")
            timeit(ob1, (ry, g[::2, ::2]), name="OBMC luma 16px (lv1)")
            timeit(ob2, (ry, g), name="OBMC luma 8px  (lv2)")
            obc0 = jax.jit(lambda r, gg: obmc_predict_jax(
                [r], PAD, hc, wc, gg, 4))
            obc2 = jax.jit(lambda r, gg: obmc_predict_jax(
                [r], PAD, hc, wc, gg, 2))
            timeit(obc0, (ru, g[::4, ::4] >> 1), name="OBMC chroma 16px")
            timeit(obc2, (ru, g >> 1), name="OBMC chroma 4px")

        # --- level choice ---------------------------------------------------
        if "levels" in stages or "all" in stages:
            lv_fn = jax.jit(lambda c, a, b, d: _choose_levels(
                c, [a, b, d, a], quantizer))
            timeit(lv_fn, (cy, p_lv0, p_lv1, p_lv2), name="level RDO (SSE)")
        levels = _choose_levels(cy, [p_lv0, p_lv1, p_lv2, p_lv0],
                                quantizer)

        # --- plane code (fwd + PVQ + isynth) --------------------------------
        pc_y = jax.jit(lambda c, p: _plane_code(c, p, 1, 0, quantizer,
                                                qms[1], qmis[1],
                                                pvq_qms[0]))
        pc_c = jax.jit(lambda c, p: _plane_code(c, p, 0, 1, quantizer,
                                                qms[0], qmis[0],
                                                pvq_qms[1]))
        ry_d = pc_y(cy, p_lv1)[0]
        ru_d = pc_c(cu, cu)[0]
        rv_d = pc_c(cv, cv)[0]
        if "code" in stages or "all" in stages:
            timeit(pc_y, (cy, p_lv1), name="plane_code luma (fwd+pvq)")
            timeit(pc_c, (cu, cu), name="plane_code chroma")
            f_fn = jax.jit(lambda c: _fwd_input(
                (c.astype(jnp.int32) - 128) << 4, 1))
            timeit(f_fn, (cy,), name="  fwd_input luma")
            fp_fn = jax.jit(lambda c: _fwd_pred(
                (c.astype(jnp.int32) - 128) << 4, 1, 0))
            timeit(fp_fn, (p_lv1,), name="  fwd_pred luma")
            from daala_tpu.pvq.device_search import pvq_symbols_frame
            dd = f_fn(cy)
            pv_fn = jax.jit(lambda d: pvq_symbols_frame(
                d, 1, quantizer, qms[1], qmis[1], pvq_qms[0]))
            timeit(pv_fn, (dd,), name="  pvq_symbols luma")

        # --- inverse + dering ------------------------------------------------
        if "post" in stages or "all" in stages:
            iv_fn = jax.jit(lambda d: _inv(d, 1))
            timeit(iv_fn, (ry_d,), name="inv transform luma")
            dr_fn = jax.jit(lambda a, b, c2, o: _dering_select(
                [a, b, c2], o, None, quantizer, (0, 1, 1)))
            oy = (cy.astype(jnp.int32) - 128) << 4
            timeit(dr_fn, (ry_d, ru_d, rv_d, oy), name="dering select")


if __name__ == "__main__":
    main()
