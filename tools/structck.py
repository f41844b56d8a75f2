"""Decision-level checksum of the busy bench clip: sums the INTEGER
decision outputs (mesh, levels, dering flags, DCs, gains) that the
all-integer cost refactor makes reproducible — compare across compile
caches to separate decision determinism from the residual f32 pulse
near-ties.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache_a python tools/structck.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench as B
    from daala_tpu.pipeline.device_encode import (PAD,
                                                  make_device_chunk_fn)

    h, w, t = 1088, 1920, 8
    ys, us, vs = B.busy_clip(h, w, t)
    fn = make_device_chunk_fn(h, w, 90, use_dering=True, multiref=True)
    if os.environ.get("STRUCTCK_COHERENT_FIRST"):
        # Reproduce bench.py's call history: the coherent clip runs
        # through the same compiled program first (tests whether the
        # busy result depends on prior calls — a backend memory bug
        # would show exactly that).
        cys, cus, cvs = B.coherent_clip(h, w, t)
        import jax as _j
        import jax.numpy as _jnp

        with _j.enable_x64(True):
            _, o0 = fn(_jnp.asarray(cys[1:]), _jnp.asarray(cus[1:]),
                       _jnp.asarray(cvs[1:]),
                       _jnp.pad(_jnp.asarray(cys[0]), PAD, mode="edge"),
                       _jnp.pad(_jnp.asarray(cus[0]), PAD, mode="edge"),
                       _jnp.pad(_jnp.asarray(cvs[0]), PAD, mode="edge"),
                       _jnp.pad(_jnp.asarray(cys[0]), PAD, mode="edge"),
                       _jnp.pad(_jnp.asarray(cus[0]), PAD, mode="edge"),
                       _jnp.pad(_jnp.asarray(cvs[0]), PAD, mode="edge"),
                       _jnp.zeros(t, dtype=_jnp.int32),
                       _jnp.asarray([0] + [1] * (t - 1),
                                    dtype=_jnp.int32))
            print("coherent full:", int(np.asarray(o0["check"]).sum()))
    ry = jnp.pad(jnp.asarray(ys[0]), PAD, mode="edge")
    ru = jnp.pad(jnp.asarray(us[0]), PAD, mode="edge")
    rv = jnp.pad(jnp.asarray(vs[0]), PAD, mode="edge")
    with jax.enable_x64(True):
        _, outs = fn(jnp.asarray(ys[1:]), jnp.asarray(us[1:]),
                     jnp.asarray(vs[1:]), ry, ru, rv, ry, ru, rv,
                     jnp.zeros(t, dtype=jnp.int32),
                     jnp.asarray([0] + [1] * (t - 1), dtype=jnp.int32))
        parts = {
            "grid": int(np.abs(np.asarray(outs["grid"],
                                          dtype=np.int64)).sum()),
            "levels": int(np.asarray(outs["levels"],
                                     dtype=np.int64).sum()),
            "dflags": int(np.asarray(outs["dflags"],
                                     dtype=np.int64).sum()),
            "rid4": int(np.asarray(outs["rid4"], dtype=np.int64).sum()),
            "dc": sum(int(np.abs(np.asarray(d, dtype=np.int64)).sum())
                      for d in outs["dc"]),
            "qg": sum(int(np.abs(np.asarray(q, dtype=np.int64)).sum())
                      for q in outs["qg"]),
            "full": int(np.asarray(outs["check"]).sum()),
        }
    print(parts)


if __name__ == "__main__":
    main()
