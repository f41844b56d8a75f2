"""AR(1) coding-gain evaluation and lapping-parameter search.

Runnable counterpart of the reference's offline transform-training
tools (/root/reference/tools/trans.c, trans_gain.c, int_search role):
measures the coding gain of THIS framework's actual integer transform
pipeline (4-pt lapped pre-filter + lifting DCT, ops/lapping.py +
ops/dct.py) against the AR(1) rho=0.95 image model, and can hill-climb
the integer lapping parameters for maximum gain.

The operator is built by linearizing the real integer code path on
scaled impulses (the lifting roundings are O(1), so at scale 2^10 the
linearization error is ~1e-3), so the number printed is the gain of
the shipped bit-exact transform, not of an idealized float model.
doc/design.tex:565-569 records 9.6005-9.6151 dB for the reference's
8-pt lapped transform under the same model — the evaluation mode
reproduces that ballpark for ours.

Usage:
    python -m tools.coding_gain                # evaluate n=4,8,16,32
    python -m tools.coding_gain --search 4     # hill-climb 4-pt params
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCALE = 1 << 10


def _pipeline(sig, n, lap4):
    """Forward integer pipeline on an int signal of nblk*n samples:
    4-pt lapping across internal block edges, then per-block DCT."""
    from daala_tpu.ops.dct import fdct

    x = sig.astype(np.int64).copy()
    L = len(x)
    for e in range(n, L, n):
        x[e - 2:e + 2] = lap4.forward(x[e - 2:e + 2])
    blocks = x.reshape(-1, n)
    return fdct(blocks, n).reshape(-1)


def _build_ops(n, nblk, lap4):
    """(analysis A, synthesis B) as float (L, L): columns from scaled
    impulses through the real integer forward path; synthesis from the
    inverse path (post-filter after idct)."""
    from daala_tpu.ops.dct import idct

    L = nblk * n
    A = np.zeros((L, L))
    B = np.zeros((L, L))
    for i in range(L):
        e = np.zeros(L, dtype=np.int64)
        e[i] = SCALE
        A[:, i] = _pipeline(e, n, lap4) / SCALE
        y = idct(e.reshape(-1, n), n).reshape(-1).astype(np.int64)
        for ed in range(n, L, n):
            y[ed - 2:ed + 2] = lap4.inverse(y[ed - 2:ed + 2])
        B[:, i] = y / SCALE
    return A, B


def coding_gain(n, params4=None, nblk=8, rho=0.95):
    """Coding gain (dB) of the n-pt lapped DCT with 4-pt lap params
    `params4` (defaults to the shipped FILTER_PARAMS[4])."""
    from daala_tpu.ops.lapping import FILTER_PARAMS, _build_filter
    import daala_tpu.ops.lapping as lapping

    if params4 is None:
        params4 = FILTER_PARAMS[4]
    old = FILTER_PARAMS[4]
    try:
        FILTER_PARAMS[4] = tuple(params4)
        lap4 = _build_filter(4)
    finally:
        FILTER_PARAMS[4] = old
    del lapping
    A, B = _build_ops(n, nblk, lap4)
    L = nblk * n
    idx = np.arange(L)
    R = rho ** np.abs(idx[:, None] - idx[None, :])
    Y = A @ R @ A.T
    # Interior coefficients only (central blocks) to exclude the
    # unlapped signal boundary.
    inner = np.arange(2 * n, (nblk - 2) * n)
    var = np.diag(Y)[inner]
    g2 = (B[:, inner] ** 2).sum(axis=0)
    return -10.0 / len(inner) * np.log10(var * g2).sum()


def search4(n_eval=8, iters=200, seed=0):
    """Greedy +-1 hill-climb over the 4 integer parameters of the 4-pt
    lapping filter, maximizing AR(1) coding gain of the n_eval-pt
    lapped DCT (the reference's int_search/trans.c role)."""
    from daala_tpu.ops.lapping import FILTER_PARAMS

    cur = list(FILTER_PARAMS[4])
    best = coding_gain(n_eval, cur)
    print(f"shipped params {tuple(cur)}: {best:.4f} dB")
    rng = np.random.default_rng(seed)
    improved = True
    it = 0
    while improved and it < iters:
        improved = False
        for k in rng.permutation(len(cur)):
            for d in (1, -1):
                cand = list(cur)
                cand[k] += d
                # p0 (scale) must stay positive; 6-bit-ish ranges.
                if not (1 <= cand[0] <= 127):
                    continue
                g = coding_gain(n_eval, cand)
                it += 1
                if g > best + 1e-6:
                    best, cur = g, cand
                    improved = True
                    print(f"  -> {tuple(cur)}: {g:.4f} dB")
                    break
            else:
                continue
            break
    print(f"best params {tuple(cur)}: {best:.4f} dB")
    return cur, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--search", type=int, default=0, metavar="N",
                    help="hill-climb 4-pt lap params for the N-pt DCT")
    ap.add_argument("--rho", type=float, default=0.95)
    args = ap.parse_args()
    if args.search:
        search4(args.search)
        return
    for n in (4, 8, 16, 32):
        g = coding_gain(n, rho=args.rho)
        print(f"lapped {n:2d}-pt DCT, AR(1) rho={args.rho}: "
              f"{g:.4f} dB coding gain")


if __name__ == "__main__":
    main()
