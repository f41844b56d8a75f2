"""Model-derived MV rate table for the rate-aware mesh refinements.

The mesh coder codes each res-domain MV delta magnitude with the
adaptive generic coder (pipeline/inter._code_mesh_pass:
``generic_encode(model, |d|, -1, ex, 2)``) plus one raw sign bit when
the delta is nonzero.  The refinement passes (native
``dtpu_obmc_refine`` and its jax twin
``search.me_jax.refine_lattice_jax``) run BEFORE the mesh is coded, so
the exact per-vertex adaptation state does not exist yet; what they
can honestly charge is the REAL generic-coder cost function
(``entropy.adapt.generic_encode_cost`` — the generic_encoder.c:71-120
role) evaluated at a model state produced by the REAL adaptation rule.

This module builds that table: a ``GenericModel`` is adapted — through
``generic_encode`` itself, symbol by symbol — on a deterministic
canonical mesh-delta sample (two-sided geometric magnitudes, the
shape mesh deltas actually have; scale tunable via
``DTPU_MVCOST_MEAN``), and the cost of every magnitude is then read
off ``generic_encode_cost`` at the settled state, +1 bit for the raw
sign of nonzero deltas.  It replaces the round-3 fitted log-curve
(``1.9 + 1.35*log2(1+|d|)``): every entry now comes from the coder's
own probability model — including the 16-symbol head, the shifted
raw-LSB region and the Laplace-tail surcharge at large magnitudes,
none of which a smooth fit reproduces.

The table is the single source of truth for the native and jax rate
models (bit-identical refinement decisions by construction): me.py
passes it to the C++ walk, me_jax.py embeds it as a constant.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["mv_cost_table", "mv_cost_table8", "MV_COST_N"]

MV_COST_N = 1024

_CACHE = {}
_CACHE8 = {}


def _canonical_magnitudes(mean: float, n: int = 4096,
                          seed: int = 7) -> np.ndarray:
    """Deterministic magnitude sample with the two-sided-geometric
    shape of refined mesh deltas: P(a) ~ p^a with mean p/(1-p)."""
    p = mean / (1.0 + mean)
    rng = np.random.default_rng(seed)
    # Inverse-CDF draws from fixed uniforms: geometric on {0, 1, ...}.
    u = rng.random(n)
    a = np.floor(np.log(1.0 - u) / np.log(p)).astype(np.int64)
    return np.minimum(a, 64)


def mv_cost_table8(mean: float = None, n: int = MV_COST_N) -> np.ndarray:
    """(n,) int32 cost of coding a res-domain delta of magnitude i, in
    1/8-bit (tell_frac) units, sign bit included — the INTEGER primitive
    both refinement twins consume.  Integer rate terms make every
    refinement decision order-independent and therefore reproducible
    run to run and across recompiles (the round-4 f32 near-tie
    nondeterminism lived exactly here)."""
    if mean is None:
        mean = float(os.environ.get("DTPU_MVCOST_MEAN", "1.2"))
    key = (round(mean, 6), n)
    tab = _CACHE8.get(key)
    if tab is not None:
        return tab
    from ..entropy import make_encoder
    from ..entropy.adapt import GenericModel, generic_encode

    model = GenericModel()
    ex = 24 << 16
    enc = make_encoder()
    for a in _canonical_magnitudes(mean):
        ex = generic_encode(enc, model, int(a), -1, ex, 2)
    # Actual 1/8-bits at the settled state, measured through the coder
    # itself (tell_frac deltas) so the Laplace tail and raw-LSB
    # regions are exact — generic_encode_cost's flat "+2" tail
    # approximation loses the rate gradient at large magnitudes.
    tab = np.empty(n, dtype=np.int32)
    for a in range(n):
        m = model.copy()
        t0 = enc.tell_frac()
        generic_encode(enc, m, a, -1, ex, 2)
        tab[a] = (enc.tell_frac() - t0) + (8 if a else 0)
    _CACHE8[key] = tab
    return tab


def mv_cost_table(mean: float = None, n: int = MV_COST_N) -> np.ndarray:
    """(n,) float64 bits of coding a res-domain delta of magnitude i
    (sign bit included) — exactly mv_cost_table8 / 8 (1/8-bit entries
    are dyadic, so the float view is lossless)."""
    key = (round(mean if mean is not None
                 else float(os.environ.get("DTPU_MVCOST_MEAN", "1.2")),
                 6), n)
    tab = _CACHE.get(key)
    if tab is None:
        tab = mv_cost_table8(mean, n).astype(np.float64) / 8.0
        _CACHE[key] = tab
    return tab
