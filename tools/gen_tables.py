"""Entropy-model table generator (runnable).

Counterpart of the reference's offline table generators
(/root/reference/tools/gen_laplace_tables.c, gen_cdf.c): regenerates
every probability-model table the codec ships — the Laplace
exponential-decay CDFs + offsets (entropy/tables.py), the flat
adaptive-CDF initializers (entropy/adapt.cdf_init), and the
model-derived MV rate table (search/mvcost.py) — from their generating
models, writes them to an .npz, and verifies each against what the
running codec actually uses, so the generators and the shipped tables
can never drift apart silently.

    python -m tools.gen_tables [-o /tmp/tables.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="/tmp/dtpu_tables.npz")
    args = ap.parse_args()

    from daala_tpu.entropy.adapt import GENERIC_TABLES, GenericModel
    from daala_tpu.entropy.tables import EXP_CDF_TABLE, LAPLACE_OFFSET, \
        laplace_decay_cdfs
    from daala_tpu.entropy import cdf_init
    from daala_tpu.search.mvcost import mv_cost_table

    out = {}
    ok = True

    cdfs, offs = laplace_decay_cdfs()
    same = (np.array_equal(cdfs, EXP_CDF_TABLE)
            and np.array_equal(offs, LAPLACE_OFFSET))
    ok &= same
    print(f"laplace decay CDFs: {cdfs.shape}, offsets {offs.shape} "
          f"[{'match' if same else 'DRIFT'} vs shipped]")
    out["exp_cdf"] = cdfs
    out["laplace_offset"] = offs

    m = GenericModel()
    flat = cdf_init(GENERIC_TABLES, 16, m.increment, m.increment)
    same = np.array_equal(flat, m.cdf)
    ok &= same
    print(f"generic-model init CDFs: {flat.shape} "
          f"[{'match' if same else 'DRIFT'} vs GenericModel()]")
    out["generic_init"] = flat

    tab = mv_cost_table()
    print(f"MV rate table: {tab.shape}, T[0..4] = "
          f"{[round(float(t), 3) for t in tab[:5]]}")
    out["mv_cost"] = tab

    np.savez(args.out, **out)
    print(f"wrote {args.out}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
