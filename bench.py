"""Benchmark: 1080p INTER encode device throughput on one chip.

Measures the STREAM-VALID chunked device encode pipeline
(pipeline/device_encode.py): dense hierarchical motion estimation,
per-SB mesh-level RDO, decoder-exact mixed OBMC prediction, lapped
forward transforms, PVQ through the integer-synthesis spec emitting
the actual stream symbols (dres mode), DC quantization, reconstruction
and the directional dering filter with per-SB flags — for all three
4:2:0 planes of a chunk of P frames, as ONE jitted lax.scan with the
reconstructed reference carried on device.  The symbols this pipeline
emits pack into packets the stock decoder reconstructs BIT-IDENTICALLY
to the device's carried reference (tests/test_device_encode.py) — this
is the real encoder's per-chip compute path, not a proxy.  Host entropy
packing (0.14 s/f, native C++) is excluded: it overlaps device compute
in the pipelined session (SURVEY.md section 2.11 pipeline-parallel
row).

Prints one JSON line: frames/s vs the 30 fps north-star target
(BASELINE.md).  An on-device checksum scalar is fetched per run to
hard-sync (block_until_ready is unreliable over tunneled platforms);
the checksum also pins bit-exactness of the whole pipeline across
kernel rewrites (expected value printed on mismatch).
"""

import json
import sys
import time

import numpy as np

# Round-3 value: the level-RDO scoring moved to half-res blends of the
# UNREFINED fine lattices (so the fine midpoint refinement and the
# level-1/2 OBMC passes can be lax.cond-gated on actual level use) —
# encoder-choice changes only; decoder exactness re-held by
# tests/test_device_encode.py on the new choices.
EXPECT_CK = 122467628


def main():
    import jax
    import jax.numpy as jnp

    from daala_tpu.pipeline.device_encode import PAD, \
        make_device_chunk_fn

    h, w, t = 1088, 1920, 8
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h + 2 * t + 8, w + 4 * t + 8),
                        dtype=np.uint8)
    yy, xx = np.mgrid[0:h + 2 * t + 8, 0:w + 4 * t + 8]
    base = ((base // 4) + (yy + 2 * xx) % 180).astype(np.uint8)
    ys = np.stack([base[2 * i:2 * i + h, 4 * i:4 * i + w]
                   for i in range(t + 1)])
    us = ys[:, ::2, ::2] // 2 + 60
    vs = 220 - us
    fn = make_device_chunk_fn(h, w, 90, use_dering=True)
    ry = jnp.pad(jnp.asarray(ys[0]), PAD, mode="edge")
    ru = jnp.pad(jnp.asarray(us[0]), PAD, mode="edge")
    rv = jnp.pad(jnp.asarray(vs[0]), PAD, mode="edge")
    dy = jnp.asarray(ys[1:])
    du = jnp.asarray(us[1:])
    dv = jnp.asarray(vs[1:])

    with jax.enable_x64(True):
        _, outs = fn(dy, du, dv, ry, ru, rv)   # warm up / compile
        ck = int(np.asarray(outs["check"]).sum())
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _, outs = fn(dy, du, dv, ry, ru, rv)
            int(np.asarray(outs["check"]).sum())  # scalar = hard sync
            times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    fps = t / med

    if ck != EXPECT_CK:
        print("checksum drift: %d (expected %d)" % (ck, EXPECT_CK),
              file=sys.stderr)

    print(json.dumps({
        "metric": "inter_1080p_device_encode_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
