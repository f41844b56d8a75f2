"""Benchmark: 1080p INTER encode compute throughput on one chip.

Measures the chunked device encode pipeline (pipeline/device_inter.py):
dense hierarchical motion estimation, per-SB subdivision-level RDO,
4-level OBMC prediction, lapped forward transforms, fast-mode PVQ
gain/shape quantization, reconstruction and the directional dering
filter — for all three 4:2:0 planes of a chunk of P frames, as ONE
jitted lax.scan with the reconstructed reference carried on device.
This is the per-chip compute path of the encoder (SURVEY.md section
2.11 pipeline-parallel row); host entropy packing is excluded (it
overlaps device compute in the pipelined design).

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


def main():
    import jax.numpy as jnp

    from daala_tpu.core.quant import QM8_HVS, init_qm
    from daala_tpu.pipeline.device_inter import PAD, make_inter_chunk

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
    qm, qm_inv = init_qm(QM8_HVS)
    fn = make_inter_chunk(h, w, 90, qm, qm_inv, dering=True)
    ry = jnp.pad(jnp.asarray(ys[0]), PAD, mode="edge")
    ru = jnp.pad(jnp.asarray(us[0]), PAD, mode="edge")
    rv = jnp.pad(jnp.asarray(vs[0]), PAD, mode="edge")
    dy = jnp.asarray(ys[1:])
    du = jnp.asarray(us[1:])
    dv = jnp.asarray(vs[1:])

    outs = fn(dy, du, dv, ry, ru, rv)       # warm up / compile
    ck = int(np.asarray(outs[4]).sum())

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        outs = fn(dy, du, dv, ry, ru, rv)
        int(np.asarray(outs[4]).sum())      # scalar fetch = hard sync
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    fps = t / med

    if ck != 882303:
        print("checksum drift: %d (expected 882303)" % ck,
              file=sys.stderr)

    print(json.dumps({
        "metric": "inter_1080p_device_pipeline_fps_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
