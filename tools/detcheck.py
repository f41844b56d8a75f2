"""Run-to-run determinism isolator: runs each device-encode stage
repeatedly on identical inputs on the real chip and reports which
stage's outputs vary across runs of ONE compiled program.

    python tools/detcheck.py [--h 1088 --w 1920] [--runs 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def check(fn, args, runs, name):
    import jax

    outs = []
    for _ in range(runs):
        o = fn(*args)
        outs.append([np.asarray(x) for x in jax.tree_util.tree_leaves(o)])
    ok = all(
        all(np.array_equal(a, b) for a, b in zip(outs[0], o))
        for o in outs[1:])
    ndiff = 0
    if not ok:
        for o in outs[1:]:
            for a, b in zip(outs[0], o):
                if not np.array_equal(a, b):
                    ndiff += int((np.asarray(a) != np.asarray(b)).sum())
    print(f"{name:32s} {'STABLE' if ok else 'VARIES (%d el)' % ndiff}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from daala_tpu.core.quant import QM8_HVS, init_qm
    from daala_tpu.core.state import interp_pvq_qm
    from daala_tpu.pipeline.device_encode import PAD, _fwd_input
    from daala_tpu.search.me_jax import (motion_search_jax, pad_edge,
                                         refine_lattice_jax)

    h, w = args.h, args.w
    quantizer = 90
    rng = np.random.default_rng(7)
    # Busy-style content (dense residuals, near-ties everywhere).
    base = rng.integers(0, 256, (h + 32, w + 32), dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 32, 0:w + 32]
    base = ((base // 4) + (yy + 2 * xx) % 180).astype(np.uint8)
    cy = jnp.asarray(base[:h, :w])
    ry = pad_edge(jnp.asarray(base[7:7 + h, 3:3 + w]), PAD)
    qm, qm_inv = init_qm(QM8_HVS)
    qms = np.asarray(qm[1], dtype=np.int32)
    qmis = np.asarray(qm_inv[1], dtype=np.int32)
    pvq_qm = interp_pvq_qm(quantizer, 0, False)
    stages = args.stages.split(",")

    with jax.enable_x64(True):
        refp8 = ry[16:16 + h + 128, 16:16 + w + 128]
        if "me" in stages or "all" in stages:
            me = jax.jit(lambda c, r: motion_search_jax(
                c, r[64:64 + h, 64:64 + w], r, h, w, 5))
            check(me, (cy, refp8), args.runs, "ME 32px lattice")
            g32 = me(cy, refp8)
        else:
            g32 = jax.jit(lambda c, r: motion_search_jax(
                c, r[64:64 + h, 64:64 + w], r, h, w, 5))(cy, refp8)
        if "refine" in stages or "all" in stages:
            rf = jax.jit(lambda c, r, g: refine_lattice_jax(
                c, r, g, h, w, quantizer, mv_res=1))
            g32q = ((g32 >> 1) << 1).astype(jnp.int32)
            check(rf, (cy, refp8, g32q), args.runs, "refine_lattice")
        if "pvq" in stages or "all" in stages:
            from daala_tpu.pvq.device_search import pvq_symbols_frame

            d = jax.jit(lambda c: _fwd_input(
                (c.astype(jnp.int32) - 128) << 4, 1))(cy)
            pv = jax.jit(lambda dd: pvq_symbols_frame(
                dd, 1, quantizer, qms, qmis, pvq_qm))
            check(pv, (d,), args.runs, "pvq_symbols_frame")
        if "fwd" in stages or "all" in stages:
            fw = jax.jit(lambda c: _fwd_input(
                (c.astype(jnp.int32) - 128) << 4, 1))
            check(fw, (cy,), args.runs, "fwd lapped transform")
        if "down" in stages or "all" in stages:
            from daala_tpu.search.me_jax import _down2

            dn = jax.jit(_down2)
            check(dn, (cy,), args.runs, "_down2 matmul")


if __name__ == "__main__":
    main()
