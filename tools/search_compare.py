"""Matched-input PVQ SEARCH diff vs the reference (VERDICT round-4
item 7): identical band records run through OUR band search
(pvq/coding.batch_band_search — the RD-path search) and through the
reference's pvq_theta (tools/refbench/search_harness, built from the
reference's own pvq_encoder.c), then BOTH chosen codepoints are
charged through our bit-equal K-tokens/gain coders and scored with
the same distortion — the per-record diff names the search defect
behind the texture small-K isolator gap.

    JAX_PLATFORMS=cpu python tools/search_compare.py [--nrec 400]
"""

import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HARNESS = "/tmp/refbuild/search_harness"


def gen_records(nrec, rng):
    """Small-K texture-intra-shaped band records: 1/f magnitude decay
    with noise, scaled so the companded gain lands in the 1..4 range
    (the isolator regime), noref (r0 = 0)."""
    recs = []
    for _ in range(nrec):
        n = int(rng.choice([15, 24, 32]))
        q0 = int(rng.choice([110, 160, 220]))
        decay = rng.uniform(0.85, 0.97)
        mag = decay ** np.arange(n) * rng.lognormal(0, 0.7, n)
        target_g = q0 * rng.uniform(0.8, 4.0)
        x = mag / max(np.sqrt((mag * mag).sum()), 1e-9) * target_g
        x0 = np.round(x * (rng.integers(0, 2, n) * 2 - 1)).astype(
            np.int64)
        if rng.random() < 0.5:
            # Correlated nonzero reference (the H/V-intra case).
            r = x0 * rng.uniform(0.3, 0.9) + rng.normal(
                0, 0.3 * q0, n)
            r0 = np.round(r).astype(np.int64)
        else:
            r0 = np.zeros(n, dtype=np.int64)
        recs.append({"n": n, "q0": q0, "x0": x0, "r0": r0})
    return recs


def run_reference(recs):
    lines = ["%d" % len(recs)]
    for r in recs:
        lines.append("%d %d 1.0 1 0 1" % (r["n"], r["q0"]))
        lines.append(" ".join(str(int(v)) for v in r["x0"]))
        lines.append(" ".join(str(int(v)) for v in r["r0"]))
    out = subprocess.run([HARNESS], input="\n".join(lines) + "\n",
                         capture_output=True, text=True, check=True)
    res = []
    for ln in out.stdout.strip().splitlines():
        v = [int(t) for t in ln.split()]
        res.append({"qg": v[0], "itheta": v[1], "max_theta": v[2],
                    "k": v[3], "y": np.asarray(v[4:], dtype=np.int64)})
    return res


def run_ours(recs):
    from daala_tpu.pipeline.intra import _tile_states
    from daala_tpu.pvq import coding

    # The Python pvq_theta path (bit-twin of the native batch search;
    # the ctypes batch packer expects the encoder's own array
    # layouts, not this tool's), with the exact codeword-rate charge
    # at a reset adaptation state (OD_PVQ_RATE_APPROX=0 behavior).
    coding.EXACT_RATE = True
    adapt = _tile_states(3, 110, False, 1)[0].pvq
    out = []
    for r in recs:
        n = r["n"]
        out.append(coding.pvq_theta(
            r["x0"], r["r0"], n, r["q0"], 1.0, True, True, 0, adapt,
            1, np.full(n, 32767, dtype=np.int64),
            np.full(n, 4096, dtype=np.int64)))
    return out


def charge(rec, qg, y, q0):
    """(rate_bits, distortion) of a chosen codepoint through the
    bit-equal coders + float synthesis (gain-companded domain
    distortion, beta=1)."""
    from daala_tpu.entropy import make_encoder
    from daala_tpu.entropy.adapt import (GenericModel, generic_encode,
                                         laplace_encode_vector)

    n = rec["n"]
    x = rec["x0"].astype(np.float64)
    g = np.sqrt((x * x).sum())
    cg = g / q0
    k = int(np.abs(y).sum())
    enc = make_encoder()
    t0 = enc.tell_frac()
    m = GenericModel()
    generic_encode(enc, m, int(qg), -1, 24 << 16, 2)
    if k:
        curr = np.zeros(4, dtype=np.int64)
        means = np.zeros(4, dtype=np.int64)
        laplace_encode_vector(enc, np.abs(y).astype(np.int64), n, k,
                              curr, means)
        nz = int((y != 0).sum())
    else:
        nz = 0
    bits = (enc.tell_frac() - t0) / 8.0 + nz
    yy = float((y.astype(np.float64) ** 2).sum())
    if yy > 0 and g > 0:
        xy = float((np.abs(x) * np.abs(y)).sum())
        cos = min(1.0, xy / max(np.sqrt((x * x).sum() * yy), 1e-30))
    else:
        cos = 1.0 if qg == 0 else 0.0
    gw = 1.4
    dist = gw * (qg - cg) ** 2 + qg * cg * (2 - 2 * cos)
    return bits, dist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nrec", type=int, default=400)
    args = ap.parse_args()
    if not os.path.exists(HARNESS):
        print("reference harness not built; run tools/refbench/"
              "build.sh then the gcc line in search_harness.c")
        return 1
    rng = np.random.default_rng(17)
    recs = gen_records(args.nrec, rng)
    ref = run_reference(recs)
    ours = run_ours(recs)
    from daala_tpu.pvq.core import PVQ_LAMBDA

    tot = {"ref": [0.0, 0.0], "ours": [0.0, 0.0]}
    worst = []
    paths = {"both_noref": 0, "ref_theta_ours_noref": 0,
             "ref_noref_ours_theta": 0, "both_theta": 0}
    for i, (rc, rr, ro) in enumerate(zip(recs, ref, ours)):
        rt = rr["itheta"] >= 0
        ot = int(ro.get("itheta", -1)) >= 0
        paths[("both_theta" if rt and ot
               else "ref_theta_ours_noref" if rt
               else "ref_noref_ours_theta" if ot
               else "both_noref")] += 1
        if rt or ot:
            # The scoring below assumes noref synthesis; theta-path
            # codepoints are counted in the path stats instead.
            continue
        rb, rd = charge(rc, rr["qg"], rr["y"], rc["q0"])
        ob, od = charge(rc, int(ro["qg"]),
                        np.asarray(ro["y"], dtype=np.int64), rc["q0"])
        tot["ref"][0] += rb
        tot["ref"][1] += rd
        tot["ours"][0] += ob
        tot["ours"][1] += od
        dcost = (od + PVQ_LAMBDA * ob) - (rd + PVQ_LAMBDA * rb)
        worst.append((dcost, i, rr, ro))
    worst.sort(reverse=True)
    lam = PVQ_LAMBDA
    jref = tot["ref"][1] + lam * tot["ref"][0]
    jours = tot["ours"][1] + lam * tot["ours"][0]
    print("path choices:", paths)
    print("reference: bits=%.1f dist=%.2f J=%.2f"
          % (tot["ref"][0], tot["ref"][1], jref))
    print("ours:      bits=%.1f dist=%.2f J=%.2f  (%+.2f%% J)"
          % (tot["ours"][0], tot["ours"][1], jours,
             100 * (jours - jref) / max(jref, 1e-9)))
    print("worst 6 records (our cost - ref cost, lambda-weighted):")
    for dcost, i, rr, ro in worst[:6]:
        rc = recs[i]
        print("  #%d n=%d q=%d dJ=%+.3f ref(qg=%d k=%d) "
              "ours(qg=%d k=%d)"
              % (i, rc["n"], rc["q0"], dcost, rr["qg"], rr["k"],
                 int(ro["qg"]), int(np.abs(ro["y"]).sum())))
    return 0


if __name__ == "__main__":
    sys.exit(main())
