"""XLA op-level profile of one device-encode stage on the real chip.

Captures a jax.profiler trace of the requested stage and prints the
top HLO ops by device self-time, so optimization targets the real
bottleneck ops instead of stage-level guesses.

    python tools/profile_xla.py --stage me32   # me32|me8|obmc2|frame
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="me32")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from daala_tpu.pipeline.device_encode import PAD
    from daala_tpu.search.me_jax import (
        motion_search_jax, _refine_midpoints_jax, _upsample_grid,
        motion_search_dense_jax, pad_edge)
    from daala_tpu.ops.mc_jax import obmc_predict_jax

    h, w = 1088, 1920
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h + 16, w + 16), dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 16, 0:w + 16]
    base = ((base // 4) + (yy + 2 * xx) % 180).astype(np.uint8)
    cy = jnp.asarray(base[:h, :w])
    ry = jnp.asarray(np.pad(base[2:2 + h, 4:4 + w], PAD, mode="edge"))

    with jax.enable_x64(True):
        if args.stage == "me32":
            fn = jax.jit(lambda c, r: motion_search_jax(
                c, r[64:64 + h, 64:64 + w], r[16:16 + h + 128,
                                              16:16 + w + 128], h, w, 5))
            fa = (cy, ry)
        elif args.stage == "me8":
            cfn = jax.jit(lambda c, r: motion_search_jax(
                c, r[64:64 + h, 64:64 + w], r[16:16 + h + 128,
                                              16:16 + w + 128], h, w, 5))
            g32 = cfn(cy, ry)
            g16 = jax.jit(lambda c, r, g: _refine_midpoints_jax(
                c, r[16:16 + h + 128, 16:16 + w + 128],
                _upsample_grid(g), 4, h, w))(cy, ry, g32)
            fn = jax.jit(lambda c, r, g: _refine_midpoints_jax(
                c, r[16:16 + h + 128, 16:16 + w + 128],
                _upsample_grid(g), 3, h, w))
            fa = (cy, ry, g16)
        elif args.stage == "obmc2":
            nvy, nvx = (h >> 3) + 1, (w >> 3) + 1
            g = jnp.asarray(rng.integers(-58 * 4, 58 * 4,
                                         (nvy, nvx, 2), dtype=np.int64)
                            .astype(np.int32) * 2)
            fn = jax.jit(lambda r, gg: obmc_predict_jax(
                [r], PAD, h, w, gg, 3))
            fa = (ry, g)
        elif args.stage == "frame":
            # The FULL fused P-frame body (what bench.py scans over):
            # op-level attribution of the 136 ms frame.
            from functools import partial

            from daala_tpu.core.quant import QM8_HVS, init_qm
            from daala_tpu.core.state import interp_pvq_qm
            from daala_tpu.pipeline.device_encode import _frame_body

            quantizer = 90
            qm, qm_inv = init_qm(QM8_HVS)
            qms = tuple(np.asarray(qm[b], dtype=np.int32)
                        for b in range(4))
            qmis = tuple(np.asarray(qm_inv[b], dtype=np.int32)
                         for b in range(4))
            pvq_qms = tuple(interp_pvq_qm(quantizer, pli, False)
                            for pli in range(3))
            body = partial(_frame_body, h=h, w=w, quantizer=quantizer,
                           mv_res=1, qms=qms, qm_invs=qmis,
                           pvq_qms=pvq_qms, use_dering=True,
                           emit_recon=False)
            cu = jnp.asarray(np.ascontiguousarray(
                base[:h // 2, :w // 2] // 2 + 60))
            cv = 220 - cu
            ru = pad_edge(cu, PAD)
            rv = pad_edge(cv, PAD)
            fn = jax.jit(lambda a, b_, c, d, e, f:
                         body((d, e, f), (a, b_, c))[1]["check"])
            fa = (cy, cu, cv, ry, ru, rv)
        else:
            raise SystemExit(f"unknown stage {args.stage}")

        def sync(o):
            le = jax.tree_util.tree_leaves(o)
            x = le[0]
            return int(np.asarray(x.ravel()[0] if hasattr(x, "ravel")
                                  else x))

        sync(fn(*fa))          # compile
        tdir = "/tmp/jaxtrace"
        os.system(f"rm -rf {tdir}")
        jax.profiler.start_trace(tdir)
        for _ in range(3):
            sync(fn(*fa))
        jax.profiler.stop_trace()

    xp = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    if not xp:
        raise SystemExit("no xplane captured")
    # The tensorboard-plugin-profile converter is broken in this image
    # (protobuf/pywrap drift); analysis lives in tools/parse_xplane.py
    # which reads the XSpace proto directly.
    print(f"trace captured: {xp[0]}")
    print(f"analyze with: python tools/parse_xplane.py {tdir} "
          f"--top {args.top} --group")


if __name__ == "__main__":
    main()
