"""Spatially-tiled device keyframe encode: one frame split into SB-row
bands across chips, per-tile entropy streams.

This is the tile-axis STREAM-PRODUCTION path the GOP-sharded encoder
lacks (SURVEY.md section 2.11 tile/spatial row): a frame larger than
one chip — or a latency-bound intra encode — is computed as bands on
separate devices, and the packed result is byte-identical to the
single-chip `tiles=N` device keyframe stream (pipeline/tiles.py
format: per-tile streams with symbol contexts cut at tile tops).

Exactness decomposition (the reference's cross-tile couplings are
filter.c:1556's frame-wide lapping and the 3 px dering apron,
filter.c:1861-1867):

  * lapped transform: bands carry one-block-row input aprons; row laps
    apply at every interior edge, and edges landing on the FRAME
    boundary are reverted (`_masked_lap_rows`) — the true frame has no
    lap there, so band-local transforms match the whole-frame ones bit
    for bit;
  * Haar-DC tree + wavefront SB-DC: per-band with the tile-top
    prediction cut — exactly the per-tile row0 semantics the host pack
    and decoder already implement (intra.py _tile_states);
  * reconstruction: the post-filter reads one block row of the
    NEIGHBOR band's dequantized coefficients — exchanged once per
    frame (ppermute over the tile axis; the single-chip twin slices
    them directly);
  * dering: 3 px reconstruction aprons ride the same exchange, and the
    device flag decision's mean-field probability is a GLOBAL count —
    psum'd so the sharded decision equals the single-chip one exactly
    (integer counts, one float division).
"""

from __future__ import annotations

import numpy as np

__all__ = ["key_tiled_single", "sharded_key_tiled",
           "pack_device_keyframe_tiled"]


# ---------------------------------------------------------------------------
# masked boundary laps
# ---------------------------------------------------------------------------


def _masked_lap_rows(c, n, gy0, H, inverse=False):
    """Row laps at every local n-px edge of an extended band; edges at
    global position 0 or H (the frame boundary) revert to unlapped —
    band-local transforms then equal the whole-frame ones exactly."""
    import jax.numpy as jnp

    from .device import lap_rows

    h_ext = c.shape[-2]
    edges = np.arange(n, h_ext, n)
    if len(edges) == 0:
        return c
    idx = edges[:, None] + np.arange(-2, 2)
    lapped = lap_rows(c, idx, inverse=inverse)
    gpos = gy0 + jnp.asarray(edges, jnp.int32)
    ok = (gpos > 0) & (gpos < H)
    m = jnp.zeros((h_ext,), dtype=bool)
    m = m.at[jnp.asarray(idx.reshape(-1))].set(jnp.repeat(ok, 4))
    return jnp.where(m[:, None], lapped, c)


def _fwd_band(c_ext, bs, gy0, H):
    """Uniform lapped forward transform of an extended band — the
    _fwd_input twin with frame-boundary-aware row laps."""
    import jax.numpy as jnp

    from ..ops.dct import fdct2d
    from .device import _lap_h_idx, _to_blocks, _from_blocks, lap_cols

    n = 4 << bs
    h, w = c_ext.shape[-2], c_ext.shape[-1]
    c = _masked_lap_rows(c_ext, n, gy0, H)
    c = lap_cols(c, _lap_h_idx(w, n))
    return _from_blocks(fdct2d(_to_blocks(c, n), n), h, w, n)


def _inv_band(dq_ext, bs, gy0, H):
    """Batched idct + postfilter of an extended band (the _inv twin;
    masked inverse row laps)."""
    from ..ops.dct import idct2d
    from .device import _lap_h_idx, _to_blocks, _from_blocks, lap_cols

    n = 4 << bs
    h, w = dq_ext.shape[-2], dq_ext.shape[-1]
    c = _from_blocks(idct2d(_to_blocks(dq_ext, n), n), h, w, n)
    c = lap_cols(c, _lap_h_idx(w, n), inverse=True)
    return _masked_lap_rows(c, n, gy0, H, inverse=True)


# ---------------------------------------------------------------------------
# per-band phases
# ---------------------------------------------------------------------------


def _band_syms(cur_ext, bs, gy0, H, quantizer, qm, qm_inv, pvq_qm,
               dcq, acq, apron):
    """Phase A: one plane band -> (symbols, own-band dq)."""
    import jax.numpy as jnp

    from ..pvq.device_search import pvq_symbols_frame
    from .device_encode import _plane_key_dc

    n = 4 << bs
    c = (cur_ext.astype(jnp.int32) - 128) << 4
    d_ext = _fwd_band(c, bs, gy0, H)
    d = d_ext[apron:d_ext.shape[0] - apron]
    d, sb_idx, iA, iB = _plane_key_dc(d, n, dcq, acq)
    dq, _, qg, y = pvq_symbols_frame(d, bs, quantizer, qm, qm_inv,
                                     pvq_qm)
    dq = dq.at[::n, ::n].set(d[::n, ::n])
    return {"sbdc": sb_idx, "acA": iA, "acB": iB, "qg": qg, "y": y}, dq


def _band_recon(dq_ext, bs, gy0, H):
    """Phase B: extended dq (aprons = the neighbors' true boundary
    block rows) -> extended reconstruction."""
    return _inv_band(dq_ext, bs, gy0, H)


def _dering_band(recs_ext, oy_band, quantizer, aprons, is_top, is_bot):
    """Phase C1: banded dering — filtered candidates + per-SB
    filtered/unfiltered SSE (the global flag decision runs in C2)."""
    import jax.numpy as jnp

    from ..ops.dering import DERING_VERY_LARGE
    from ..ops.dering_jax import dering_padded_jax

    thr = np.int32(np.power(float(max(1, quantizer)), 0.84182))
    a0 = aprons[0]
    hb, w = recs_ext[0].shape[0] - 2 * a0, recs_ext[0].shape[1]
    nvsb, nhsb = hb >> 5, w >> 5

    def _pad(plane_ext, a):
        hh = plane_ext.shape[0] - 2 * a
        ww = plane_ext.shape[1]
        P = jnp.full((hh + 6, ww + 6), DERING_VERY_LARGE,
                     dtype=jnp.int32)
        P = P.at[3:3 + hh, 3:3 + ww].set(plane_ext[a:a + hh])
        top = jnp.where(is_top, jnp.int32(DERING_VERY_LARGE),
                        plane_ext[a - 3:a])
        bot = jnp.where(is_bot, jnp.int32(DERING_VERY_LARGE),
                        plane_ext[a + hh:a + hh + 3])
        P = P.at[0:3, 3:3 + ww].set(top)
        P = P.at[3 + hh:6 + hh, 3:3 + ww].set(bot)
        return P

    bufs0, dirs = dering_padded_jax(_pad(recs_ext[0], a0), nhsb, nvsb,
                                    thr, 0, 0)
    o = oy_band.reshape(nvsb, 32, nhsb, 32).transpose(0, 2, 1, 3)
    r = (recs_ext[0][a0:a0 + hb].reshape(nvsb, 32, nhsb, 32)
         .transpose(0, 2, 1, 3))
    # int64 SSE (deterministic; see device_encode._dering_select).
    d_f = (o - bufs0).astype(jnp.int64)
    d_u = (o - r).astype(jnp.int64)
    fe = (d_f * d_f).sum((2, 3))
    ue = (d_u * d_u).sum((2, 3))
    bufs = [bufs0]
    for pli in range(1, len(recs_ext)):
        a = aprons[pli]
        xd = 1
        b, _ = dering_padded_jax(_pad(recs_ext[pli], a), nhsb, nvsb,
                                 thr, xd, 1, dirs)
        bufs.append(b)
    return bufs, fe, ue


def _dering_flags(fe, ue, quantizer, total, gsum):
    """Phase C2: the mean-field flag decision with GLOBAL counts —
    gsum(x) sums an int32 scalar over every band (psum on the mesh,
    plain sum on the single-chip twin)."""
    import jax.numpy as jnp

    from ..pvq.core import PVQ_LAMBDA

    qf = float(max(1, quantizer))
    lamq = np.float64(PVQ_LAMBDA * qf * qf)
    flags = (fe < ue)
    for _ in range(3):
        cnt = gsum(flags.sum(dtype=jnp.int32))
        p1 = jnp.clip(cnt.astype(jnp.float32) / total,
                      1.0 / 64, 1 - 1.0 / 64)
        # Integer-rounded rate terms on int64 SSEs: deterministic and
        # identical to device_encode._dering_select's decision.
        r1 = jnp.round(lamq * -jnp.log2(p1)).astype(jnp.int64)
        r0 = jnp.round(lamq * -jnp.log2(1 - p1)).astype(jnp.int64)
        flags = fe + r1 < ue + r0
    return flags.astype(jnp.int32)


def _apply_flags(recs_ext, bufs, flags, aprons):
    """Select filtered/unfiltered per SB and clamp to uint8 planes."""
    import jax.numpy as jnp

    out = []
    for pli, (rext, buf) in enumerate(zip(recs_ext, bufs)):
        a = aprons[pli]
        hb = rext.shape[0] - 2 * a
        w = rext.shape[1]
        ln = 5 - (0 if pli == 0 else 1)
        n = 1 << ln
        nvsb = hb >> ln
        nhsb = w >> ln
        if flags is None:
            rec = rext[a:a + hb]
        else:
            rp = (rext[a:a + hb].reshape(nvsb, n, nhsb, n)
                  .transpose(0, 2, 1, 3))
            sel = jnp.where((flags > 0)[:, :, None, None], buf, rp)
            rec = sel.transpose(0, 2, 1, 3).reshape(hb, w)
        out.append(jnp.clip(((rec + 8) >> 4) + 128, 0,
                            255).astype(jnp.uint8))
    return out


def _plane_geoms(h, w, nt):
    """(band height, apron, plane H) per plane for 4:2:0 8-bit.

    Aprons are 8 px (two chroma block rows): the extended array's
    outermost interior edge cannot be lapped (no data beyond it), so
    only apron rows >= 2 reconstruct bit-correctly — dering reads 3,
    hence one extra block row of margin."""
    hbs = (h // nt, h // 2 // nt, h // 2 // nt)
    aprons = (8, 8, 8)
    Hs = (h, h // 2, h // 2)
    return hbs, aprons, Hs


# ---------------------------------------------------------------------------
# single-chip twin
# ---------------------------------------------------------------------------


def key_tiled_single(planes, quality, nt, use_dering=True,
                     qm_flat=False):
    """Single-chip spatially-tiled device keyframe: identical banded
    computation to sharded_key_tiled with the exchanges done by
    slicing.  Returns (r8 planes, per-band-stacked symbol dict)."""
    import jax
    import jax.numpy as jnp

    from .device_encode import _key_quants

    h, w = planes[0].shape
    if h % (32 * nt):
        raise ValueError("spatial tiling needs 32*ntiles | height")
    (_, quantizer, qms, qmis, pvq_qms, dc_quants,
     acq) = _key_quants(quality, qm_flat=qm_flat)
    hbs, aprons, Hs = _plane_geoms(h, w, nt)

    syms = {k: [[] for _ in range(3)]
            for k in ("sbdc", "acA", "acB", "qg", "y")}
    dqs = [[] for _ in range(3)]
    with jax.enable_x64(True):
        for pli in range(3):
            bs = 1 if pli == 0 else 0
            hb, a, H = hbs[pli], aprons[pli], Hs[pli]
            p = jnp.asarray(planes[pli])
            pe = jnp.pad(p, ((a, a), (0, 0)))
            for b in range(nt):
                r0 = b * hb
                ext = pe[r0:r0 + hb + 2 * a]
                s, dq = _band_syms(ext, bs, r0 - a, H, quantizer,
                                   qms[bs], qmis[bs], pvq_qms[pli],
                                   dc_quants[pli], acq[pli], a)
                for k in ("sbdc", "acA", "acB", "qg", "y"):
                    syms[k][pli].append(s[k])
                dqs[pli].append(dq)
        # phase B: recon with true neighbor dq aprons.
        recs = [[] for _ in range(3)]
        for pli in range(3):
            bs = 1 if pli == 0 else 0
            hb, a, H = hbs[pli], aprons[pli], Hs[pli]
            zt = jnp.zeros((a, w >> (0 if pli == 0 else 1)),
                           dtype=dqs[pli][0].dtype)
            for b in range(nt):
                top = dqs[pli][b - 1][-a:] if b > 0 else zt
                bot = dqs[pli][b + 1][:a] if b + 1 < nt else zt
                dq_ext = jnp.concatenate([top, dqs[pli][b], bot])
                recs[pli].append(_band_recon(dq_ext, bs, b * hb - a, H))
        # phase C: dering with global flag counts.
        if use_dering:
            fes, ues, bufs_b = [], [], []
            for b in range(nt):
                oy = ((jnp.asarray(planes[0][b * hbs[0]:(b + 1)
                                             * hbs[0]]).astype(jnp.int32)
                       - 128) << 4)
                bufs, fe, ue = _dering_band(
                    [recs[p][b] for p in range(3)], oy, quantizer,
                    aprons, jnp.asarray(b == 0), jnp.asarray(b == nt - 1))
                fes.append(fe)
                ues.append(ue)
                bufs_b.append(bufs)
            fe_all = jnp.concatenate(fes)
            ue_all = jnp.concatenate(ues)
            total = fe_all.size
            flags = _dering_flags(fe_all, ue_all, quantizer, total,
                                  lambda x: x)
            nb = fes[0].shape[0]
            r8b = [_apply_flags([recs[p][b] for p in range(3)],
                                bufs_b[b], flags[b * nb:(b + 1) * nb],
                                aprons)
                   for b in range(nt)]
            dflags = flags
        else:
            r8b = [_apply_flags([recs[p][b] for p in range(3)],
                                [None] * 3, None, aprons)
                   for b in range(nt)]
            dflags = jnp.zeros((h >> 5, w >> 5), dtype=jnp.int32)
        r8 = [jnp.concatenate([r8b[b][p] for b in range(nt)])
              for p in range(3)]
        out = {k: [jnp.concatenate(syms[k][pli])
                   for pli in range(3)]
               for k in ("sbdc", "acA", "acB", "qg", "y")}
        out["dflags"] = dflags
    return r8, out


# ---------------------------------------------------------------------------
# sharded runner
# ---------------------------------------------------------------------------


def sharded_key_tiled(mesh, y, u, v, quality, use_dering=True,
                      qm_flat=False, axis="tile"):
    """Spatially-sharded device keyframe over the mesh's `axis`: each
    device computes one SB-row band; ppermute exchanges the dq
    boundary block rows and psum globalizes the dering flag counts.
    Byte-identical to key_tiled_single (tests/test_device_tiles.py)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from .device_encode import _key_quants

    nt = mesh.shape[axis]
    h, w = int(y.shape[0]), int(y.shape[1])
    if h % (32 * nt):
        raise ValueError("spatial tiling needs 32*ntiles | height")
    (_, quantizer, qms, qmis, pvq_qms, dc_quants,
     acq) = _key_quants(quality, qm_flat=qm_flat)
    hbs, aprons, Hs = _plane_geoms(h, w, nt)
    perm_dn = [(i, (i + 1) % nt) for i in range(nt)]
    perm_up = [(i, (i - 1) % nt) for i in range(nt)]

    def member(yb, ub, vb):
        idx = jax.lax.axis_index(axis)
        is_top = idx == 0
        is_bot = idx == nt - 1

        def exch(top_rows, bot_rows):
            recv_top = jax.lax.ppermute(bot_rows, axis, perm_dn)
            recv_bot = jax.lax.ppermute(top_rows, axis, perm_up)
            return recv_top, recv_bot

        planes = (yb, ub, vb)
        sd = {}
        dqs = []
        recs = []
        for pli in range(3):
            bs = 1 if pli == 0 else 0
            hb, a, H = hbs[pli], aprons[pli], Hs[pli]
            gy0 = idx * hb - a
            # input aprons ride the same neighbor exchange.
            tin, bin_ = exch(planes[pli][:a], planes[pli][-a:])
            ext = jnp.concatenate([tin, planes[pli], bin_])
            s, dq = _band_syms(ext, bs, gy0, H, quantizer, qms[bs],
                               qmis[bs], pvq_qms[pli], dc_quants[pli],
                               acq[pli], a)
            for k, vv in s.items():
                sd.setdefault(k, []).append(vv)
            dqs.append(dq)
        for pli in range(3):
            bs = 1 if pli == 0 else 0
            hb, a, H = hbs[pli], aprons[pli], Hs[pli]
            tdq, bdq = exch(dqs[pli][:a], dqs[pli][-a:])
            dq_ext = jnp.concatenate([tdq, dqs[pli], bdq])
            recs.append(_band_recon(dq_ext, bs, idx * hb - a, H))
        if use_dering:
            oy = (yb.astype(jnp.int32) - 128) << 4
            bufs, fe, ue = _dering_band(recs, oy, quantizer, aprons,
                                        is_top, is_bot)
            total = (h >> 5) * (w >> 5)
            flags = _dering_flags(fe, ue, quantizer, total,
                                  lambda x: jax.lax.psum(x, axis))
            r8 = _apply_flags(recs, bufs, flags, aprons)
        else:
            flags = jnp.zeros((hbs[0] >> 5, w >> 5), dtype=jnp.int32)
            r8 = _apply_flags(recs, [None] * 3, None, aprons)
        outs = {k: tuple(vv) for k, vv in sd.items()}
        outs["dflags"] = flags
        outs["r8"] = tuple(r8)
        return outs

    spec = P(axis)
    skel = {"sbdc": (0,) * 3, "acA": (0,) * 3, "acB": (0,) * 3,
            "qg": (0,) * 3, "y": (0,) * 3, "dflags": 0, "r8": (0,) * 3}
    fn = shard_map(member, mesh=mesh,
                   in_specs=(spec, spec, spec),
                   out_specs=jax.tree.map(lambda _: spec, skel))
    with jax.enable_x64(True):
        return jax.jit(fn)(y, u, v)


def pack_device_keyframe_tiled(info, quality, syms, use_dering=True,
                               tiles=1):
    """Per-tile-stream pack of a spatially-tiled device keyframe —
    the tiles.py stream format with symbol contexts cut at tile tops
    (byte-compatible with decode_keyframe's tiled dres path)."""
    from ..core.quant import N_CODED_QUANTIZERS
    from ..entropy import make_encoder
    from ..entropy.adapt import encode_cdf_adapt
    from .device_encode import _pack_key_sb
    from .intra import _tile_states
    from .tiles import pack_tiles, tile_rows

    cq = max(1, int(quality) - 3)
    from ..core.quant import codedquantizer_to_quantizer

    quantizer = codedquantizer_to_quantizer(cq)
    nplanes = info.nplanes
    nvsb = info.frame_height >> 5
    nhsb = info.frame_width >> 5
    bounds = tile_rows(nvsb, tiles)
    states = _tile_states(nplanes, quantizer, False, len(bounds),
                          qm_flat=getattr(info, "qm", 1) == 0)
    ecs = [make_encoder() for _ in bounds]
    for pli in range(nplanes):
        for v in states[0].pvq_qm_q4[pli]:
            ecs[0].encode_bits(int(v), 8)
    for _ in range(nplanes):
        ecs[0].encode_uint(cq, N_CODED_QUANTIZERS)
    syms = dict(syms)
    syms["nbx"] = [info.frame_width >> 3] * nplanes
    fl = (np.asarray(syms["dflags"], dtype=np.int32)
          if use_dering else None)
    for ti, (r0, r1) in enumerate(bounds):
        ec, st = ecs[ti], states[ti]
        for sby in range(r0, r1):
            for sbx in range(nhsb):
                for pli in range(nplanes):
                    _pack_key_sb(ec, st, pli, info.xdec[pli], sby, sbx,
                                 syms)
        if use_dering:
            for sby in range(r0, r1):
                for sbx in range(nhsb):
                    up = int(fl[sby - 1, sbx]) if sby > r0 else 0
                    left = int(fl[sby, sbx - 1]) if sbx > 0 else 0
                    encode_cdf_adapt(ec, int(fl[sby, sbx]),
                                     st.clpf_cdf[(up << 1) + left],
                                     st.clpf_increment)
    return pack_tiles([ec.done() for ec in ecs])
