"""Reproduce the gated-hybrid (DTPU_DEV_LEVELS=half) TPU kernel fault.

Usage: DTPU_DEV_LEVELS=half python tools/repro_gated.py [h w t]
"""

import os
import sys
import time

import numpy as np


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1088
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from daala_tpu.pipeline.device_encode import PAD, make_device_chunk_fn

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h + 64, w + 64), dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 64, 0:w + 64]
    base = ((base // 4) + (yy + 2 * xx) % 180).astype(np.uint8)
    ys = np.stack([base[2 * i:2 * i + h, 4 * i:4 * i + w]
                   for i in range(t + 1)])
    us = ys[:, ::2, ::2] // 2 + 60
    vs = 220 - us

    multiref = os.environ.get("REPRO_MULTIREF", "1") != "0"
    fn = make_device_chunk_fn(h, w, 90, use_dering=True,
                              multiref=multiref)
    ry = jnp.pad(jnp.asarray(ys[0]), PAD, mode="edge")
    ru = jnp.pad(jnp.asarray(us[0]), PAD, mode="edge")
    rv = jnp.pad(jnp.asarray(vs[0]), PAD, mode="edge")
    args = [jnp.asarray(ys[1:]), jnp.asarray(us[1:]),
            jnp.asarray(vs[1:]), ry, ru, rv]
    if multiref:
        args += [ry, ru, rv,
                 jnp.zeros(t, dtype=jnp.int32),
                 jnp.asarray([0] + [1] * (t - 1), dtype=jnp.int32)]
    with jax.enable_x64(True):
        t0 = time.perf_counter()
        _, outs = fn(*args)
        ck = int(np.asarray(outs["check"]).sum())
        print("compiled+ran in %.1fs, check=%d"
              % (time.perf_counter() - t0, ck))
        t0 = time.perf_counter()
        _, outs = fn(*args)
        int(np.asarray(outs["check"]).sum())
        dt = time.perf_counter() - t0
        print("steady: %.3fs for %d frames = %.2f fps" % (dt, t, t / dt))


if __name__ == "__main__":
    main()
