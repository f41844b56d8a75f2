"""Determinism of the FULL fused chunk program vs scan length.

Runs the bench busy clip through make_device_chunk_fn at T=1 and T=8
several times and reports which outputs vary across runs of one
compiled program — distinguishing arithmetic nondeterminism (none:
every stage is bit-stable standalone, tools/detcheck.py) from a
backend bug tied to the long fused scan.

    python tools/detcheck_scan.py [--t 8] [--runs 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--w", type=int, default=1920)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as B
    from daala_tpu.pipeline.device_encode import (PAD,
                                                  make_device_chunk_fn)

    h, w, t = args.h, args.w, args.t
    ys, us, vs = B.busy_clip(h, w, t)
    fn = make_device_chunk_fn(h, w, 90, use_dering=True, multiref=True)
    ry = jnp.pad(jnp.asarray(ys[0]), PAD, mode="edge")
    ru = jnp.pad(jnp.asarray(us[0]), PAD, mode="edge")
    rv = jnp.pad(jnp.asarray(vs[0]), PAD, mode="edge")
    fa = (jnp.asarray(ys[1:]), jnp.asarray(us[1:]),
          jnp.asarray(vs[1:]), ry, ru, rv, ry, ru, rv,
          jnp.zeros(t, dtype=jnp.int32),
          jnp.asarray([0] + [1] * (t - 1), dtype=jnp.int32))
    keys = ("grid", "levels", "dflags", "check")
    with jax.enable_x64(True):
        runs = []
        for _ in range(args.runs):
            _, outs = fn(*fa)
            got = {k: np.asarray(outs[k]) for k in keys}
            for lab in ("dc", "qg", "y"):
                for pli in range(3):
                    got[f"{lab}{pli}"] = np.asarray(outs[lab][pli])
            runs.append(got)
    for k in runs[0]:
        vals = [r[k] for r in runs]
        ok = all(np.array_equal(vals[0], v) for v in vals[1:])
        if ok:
            print(f"T={t} {k:10s} STABLE")
        else:
            # which frame indices differ?
            fr = set()
            for v in vals[1:]:
                d = (vals[0] != v)
                if d.ndim:
                    fr |= set(np.nonzero(
                        d.reshape(d.shape[0], -1).any(1))[0].tolist())
            print(f"T={t} {k:10s} VARIES frames={sorted(fr)}")


if __name__ == "__main__":
    main()
