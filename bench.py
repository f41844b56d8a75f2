"""Benchmark: 1080p intra encode compute throughput on one chip.

Measures the jitted device encode step (coeff conversion, lapped
prefilter over every block edge, batched 8x8 DCTs, Haar-DC tree,
the batched fast-mode PVQ gain/shape quantization (gain rounding, K,
greedy pulse allocation, synthesis), reconstruction, and the batched
directional dering filter on luma) over all three 4:2:0 planes of a
1080p frame — the per-chip compute path of the encoder, with host
entropy packing excluded (it overlaps device compute in the pipelined
design).

Prints one JSON line: frames/s vs the 30 fps north-star target
(BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from daala_tpu.core.quant import QM8_HVS, init_qm
    from daala_tpu.pipeline.device import encode_step

    bs = 1
    qm, qm_inv = init_qm(QM8_HVS)
    quantizer = 90

    h, w = 1088, 1920
    batch = 16
    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.integers(0, 256, (batch, h, w), dtype=np.uint8))
    us = jnp.asarray(
        rng.integers(0, 256, (batch, h // 2, w // 2), dtype=np.uint8))
    vs = jnp.asarray(
        rng.integers(0, 256, (batch, h // 2, w // 2), dtype=np.uint8))

    @jax.jit
    def frame_step(y, u, v):
        ystep = lambda p: encode_step(p, bs, quantizer, qm[bs],
                                      qm_inv[bs], dering=True, pvq=True)
        step = lambda p: encode_step(p, bs, quantizer, qm[bs],
                                     qm_inv[bs], pvq=True)
        qy, ry = jax.vmap(ystep)(y)
        qu, ru = jax.vmap(step)(u)
        qv, rv = jax.vmap(step)(v)
        # On-device checksum: the returned scalar forces full
        # materialization (block_until_ready alone is unreliable over
        # the tunneled platform).
        return (jnp.sum(jnp.abs(qy)) + jnp.sum(jnp.abs(qu))
                + jnp.sum(jnp.abs(qv)) + jnp.sum(ry.astype(jnp.int32)))

    int(frame_step(ys, us, vs))  # warm up / compile

    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        int(frame_step(ys, us, vs))  # scalar fetch = hard sync
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    fps = batch / med

    print(json.dumps({
        "metric": "intra_1080p_compute_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
