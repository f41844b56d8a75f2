"""Matched-input K-tokens codeword cost: ours vs the reference.

Generates a corpus of pulse vectors (Laplacian-shaped, the PVQ
codeword coder's model), costs them through OUR
entropy.adapt.laplace_encode_vector with the reference's adaptation
flow, writes the corpus to a text file, and (if the reference harness
is built — tools/refbench/ktok_harness.c) costs the IDENTICAL records
through the reference laplace_encode_vector, printing both totals.

Equal totals prove the codeword coder + adaptation are bit-equivalent
with the reference, localizing any high-rate RD gap to the SEARCH's
pulse choices rather than the coder (VERDICT round-2 item 4).

    JAX_PLATFORMS=cpu python tools/ktok_compare.py
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HARNESS = "/tmp/refbuild/ktok_harness"


def gen_corpus(rng, nrec=2000):
    """(n, k, y) records shaped like PVQ band pulse vectors at high
    rate: magnitudes decay along the coding order, sum |y| == k."""
    recs = []
    for _ in range(nrec):
        n = int(rng.choice([8, 15, 16, 24, 32, 64]))
        k = int(rng.integers(2, 40))
        decay = rng.uniform(0.75, 0.98)
        w = decay ** np.arange(n) * rng.random(n)
        w = w / max(w.sum(), 1e-9)
        y = rng.multinomial(k, w)
        signs = rng.integers(0, 2, n) * 2 - 1
        recs.append((n, k, (y * signs).astype(np.int64)))
    return recs


def cost_ours(recs):
    from daala_tpu.entropy import make_encoder
    from daala_tpu.entropy.adapt import laplace_encode_vector

    # Force the PYTHON coder for an apples-to-apples tell_frac.
    os.environ["DTPU_PY_EC"] = "1"
    from daala_tpu.entropy.coder import RangeEncoder

    enc = RangeEncoder()
    mean = np.zeros(4, dtype=np.int64)
    from daala_tpu.pvq.coding import _merge_adapt

    for (n, k, y) in recs:
        curr = np.zeros(4, dtype=np.int64)
        laplace_encode_vector(enc, y, n, k, curr, mean)
        _merge_adapt(mean, curr, 5)
    return enc.tell_frac() / 8.0


def main():
    rng = np.random.default_rng(11)
    recs = gen_corpus(rng)
    ours = cost_ours(recs)
    print(f"ours: {len(recs)} records, {ours:.3f} bits")
    if not os.path.exists(HARNESS):
        print(f"reference harness missing ({HARNESS}); build per "
              "tools/refbench/ktok_harness.c header")
        return
    lines = []
    for (n, k, y) in recs:
        lines.append(f"{n} {k} " + " ".join(str(int(v)) for v in y))
    out = subprocess.run([HARNESS], input="\n".join(lines),
                         capture_output=True, text=True, check=True)
    print("reference:", out.stdout.strip())


if __name__ == "__main__":
    main()
