"""Device (TPU) compute path: jittable whole-frame transform pipeline
and the multi-chip sharded step.

The encoder splits into:
  * device compute — lapping, batched DCT, Haar-DC tree, quantization,
    PVQ gain/shape preparation: everything batched over all blocks of a
    frame (this module; pure jax, jit-compiled once per frame shape).
  * host serialization — the sequential adaptive range coding of the
    prepared symbols (pipeline/intra.py).

Multi-chip: the frame is sharded in SB-row bands over a `tile` mesh
axis; the 4-point lapped pre/post filters straddling band boundaries
exchange 2-row halos with jax.lax.ppermute (each device filters its
own half of every boundary span), and the directional dering filter
exchanges its 3-row apron the same way — the ICI replacement for the
reference's single-threaded od_apply_*filter_frame_sbs and od_dering
(SURVEY.md section 2.11).  A `gop` axis shards independent frames
(data parallel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dct import fdct2d, idct2d
from ..ops.lapping import post_filter, pre_filter

__all__ = [
    "transform_frame",
    "inverse_transform_frame",
    "encode_step",
    "sharded_encode_step",
    "sharded_gop_stream_encode",
    "pack_gop_sharded",
    "make_mesh",
]


def _to_blocks(plane, n):
    h, w = plane.shape[-2], plane.shape[-1]
    return (plane.reshape(*plane.shape[:-2], h // n, n, w // n, n)
            .swapaxes(-3, -2)
            .reshape(*plane.shape[:-2], (h // n) * (w // n), n, n))


def _from_blocks(blocks, h, w, n):
    lead = blocks.shape[:-3]
    return (blocks.reshape(*lead, h // n, w // n, n, n)
            .swapaxes(-3, -2)
            .reshape(*lead, h, w))


def _lap_h_idx(h, block):
    rows = np.arange(block, h, block, dtype=np.int32)
    return rows[:, None] + np.arange(-2, 2)


def lap_rows(plane, idx, inverse=False):
    """Filter the given 4-row spans (vertically) of (..., h, w)."""
    spans = plane[..., idx, :]            # (..., nedges, 4, w)
    spans = spans.swapaxes(-1, -2)        # (..., nedges, w, 4)
    out = post_filter(spans, 4) if inverse else pre_filter(spans, 4)
    return plane.at[..., idx, :].set(out.swapaxes(-1, -2))


def lap_cols(plane, idx, inverse=False):
    spans = plane[..., :, idx]            # (..., h, nedges, 4)
    out = post_filter(spans, 4) if inverse else pre_filter(spans, 4)
    return plane.at[..., :, idx].set(out)


def haar_dc_tree_fwd(d, n):
    """Vectorized bottom-up Haar combine of block DCs (jit-friendly
    version of pipeline.intra.haar_dc_tree)."""
    from ..ops.dct import _haar_kernel

    step = n
    while step < 32:
        g = d[..., ::step, ::step]
        a = g[..., 0::2, 0::2]
        right = g[..., 0::2, 1::2]
        down = g[..., 1::2, 0::2]
        diag = g[..., 1::2, 1::2]
        a, down, right, diag = _haar_kernel(a, down, right, diag)
        h2, w2 = a.shape[-2], a.shape[-1]
        quad = jnp.stack([
            jnp.stack([a, right], axis=-1),
            jnp.stack([down, diag], axis=-1),
        ], axis=-2)  # (..., h2, w2, 2, 2)
        merged = (quad.swapaxes(-3, -2)
                  .reshape(*a.shape[:-2], h2 * 2, w2 * 2))
        d = d.at[..., ::step, ::step].set(merged)
        step *= 2
    return d


def transform_frame(coeffs, bs: int):
    """Lapped forward transform of one plane: prefilter every interior
    block edge, batched 2D DCT, Haar-DC tree.  coeffs: (h, w) int32.
    Returns the transform-domain plane."""
    n = 4 << bs
    h, w = coeffs.shape[-2], coeffs.shape[-1]
    coeffs = lap_rows(coeffs, _lap_h_idx(h, n))
    coeffs = lap_cols(coeffs, _lap_h_idx(w, n))
    d = fdct2d(_to_blocks(coeffs, n), n)
    d = _from_blocks(d, h, w, n)
    return haar_dc_tree_fwd(d, n)


def inverse_transform_frame(d, bs: int):
    """Batched inverse DCT + postfilter (decoder-side reconstruction;
    the Haar DC tree is undone during symbol decoding)."""
    n = 4 << bs
    h, w = d.shape[-2], d.shape[-1]
    c = _from_blocks(idct2d(_to_blocks(d, n), n), h, w, n)
    c = lap_cols(c, _lap_h_idx(w, n), inverse=True)
    return lap_rows(c, _lap_h_idx(h, n), inverse=True)


def quantize_blocks(d, bs: int, quantizer: int, qm_coding, qm_inv_coding):
    """Uniform deadzone quantization in the magnitude-compensated
    domain — the device-side approximation used for throughput
    measurement and for the fast (non-RDO) coding mode."""
    from ..pvq.scan import _FLAT

    n = 4 << bs
    h, w = d.shape[-2], d.shape[-1]
    blocks = _to_blocks(d, n).reshape(-1, n * n)
    vec = blocks[:, _FLAT[n]]
    qmv = jnp.asarray(qm_coding, dtype=jnp.int32)
    qmiv = jnp.asarray(qm_inv_coding, dtype=jnp.int32)
    # x * qm in Q15 -> quantize -> dequantize -> / qm (Q12 inverse).
    scaled = (vec * qmv) >> 15
    q = jnp.int32(max(1, quantizer))
    quant = jnp.sign(scaled) * ((jnp.abs(scaled) + (q >> 1)) // q)
    deq = (quant * q * qmiv) >> 12
    out = blocks.at[:, _FLAT[n]].set(deq)
    return quant, _from_blocks(out.reshape(-1, n, n), h, w, n)


def encode_step(plane, bs: int, quantizer: int, qm, qm_inv,
                dering: bool = False, pvq: bool = False):
    """One full single-chip encode compute step on a plane of pixels:
    coeff conversion -> lapped transform -> quantize (deadzone, or the
    batched fast-mode PVQ gain/shape quantizer) -> reconstruct
    [-> batched directional dering].  Returns (quantized symbols,
    reconstructed pixels) — everything but the host entropy pack."""
    c = (plane.astype(jnp.int32) - 128) << 4
    d = transform_frame(c, bs)
    if pvq:
        from ..pvq.device_search import pvq_quantize_frame

        dc_quant = max(1, quantizer)
        dq, ksum, qgsum = pvq_quantize_frame(d, bs, quantizer, qm,
                                             qm_inv, dc_quant)
        quant = jnp.stack([ksum, qgsum])
    else:
        quant, dq = quantize_blocks(d, bs, quantizer, qm, qm_inv)
    rec = inverse_transform_frame(dq, bs)
    if dering:
        from ..ops.dering_jax import dering_frame_jax

        h, w = rec.shape[-2], rec.shape[-1]
        nvsb, nhsb = h // 32, w // 32
        bufs, _ = dering_frame_jax(rec, nhsb, nvsb, max(1, quantizer),
                                   0, 0)
        rec = (bufs.transpose(0, 2, 1, 3).reshape(h, w))
    rec = jnp.clip(((rec + 8) >> 4) + 128, 0, 255).astype(jnp.uint8)
    return quant, rec


# -- multi-chip -----------------------------------------------------------


def make_mesh(n_devices: int):
    """Build a (gop, tile) mesh: frames data-parallel over `gop`,
    SB-row bands over `tile`."""
    devs = np.array(jax.devices()[:n_devices])
    gop = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    tile = n_devices // gop
    return jax.sharding.Mesh(devs.reshape(gop, tile), ("gop", "tile"))


def _band_encode(band, bs, quantizer, qm, qm_inv, ntiles):
    """Per-device body: halo exchange for boundary lapping, then the
    local transform+quantize pipeline.

    band: (frames_local, band_h, w) pixel rows owned by this device.
    """
    n = 4 << bs
    c = (band.astype(jnp.int32) - 128) << 4
    # -- vertical (row-edge) lapping with halo exchange ------------------
    # Interior edges within the band.
    h = c.shape[-2]
    w = c.shape[-1]
    inner = np.arange(n, h, n, dtype=np.int32)
    c = lap_rows(c, inner[:, None] + np.arange(-2, 2))
    # Boundary edge between tile t and t+1: rows [h-2, h) of t and
    # [0, 2) of t+1.  Each device builds the full 4-row span from its
    # neighbor's halo and keeps its half.
    top2 = c[..., :2, :]
    bot2 = c[..., -2:, :]
    # from_next: neighbor below sends its top rows; from_prev: neighbor
    # above sends its bottom rows.
    perm_up = [(i, (i - 1) % ntiles) for i in range(ntiles)]
    perm_dn = [(i, (i + 1) % ntiles) for i in range(ntiles)]
    from_next = jax.lax.ppermute(top2, "tile", perm_up)
    from_prev = jax.lax.ppermute(bot2, "tile", perm_dn)
    t = jax.lax.axis_index("tile")
    # Span at my bottom boundary: [my bot2 ; next top2].
    span_b = jnp.concatenate([bot2, from_next], axis=-2).swapaxes(-1, -2)
    fb = pre_filter(span_b, 4).swapaxes(-1, -2)
    c = jnp.where((t < ntiles - 1),
                  c.at[..., -2:, :].set(fb[..., :2, :]), c)
    # Span at my top boundary: [prev bot2 ; my top2].
    span_t = jnp.concatenate([from_prev, top2], axis=-2).swapaxes(-1, -2)
    ft = pre_filter(span_t, 4).swapaxes(-1, -2)
    c = jnp.where((t > 0), c.at[..., :2, :].set(ft[..., 2:, :]), c)
    # -- horizontal (column-edge) lapping is tile-local ------------------
    cols = np.arange(n, w, n, dtype=np.int32)
    c = lap_cols(c, cols[:, None] + np.arange(-2, 2))
    # -- batched DCT + quantize ------------------------------------------
    d = fdct2d(_to_blocks(c, n), n)
    from ..pvq.scan import _FLAT
    blocks = d.reshape(*d.shape[:-2], n * n)
    vec = blocks[..., _FLAT[n]]
    scaled = (vec * qm) >> 15
    q = jnp.int32(quantizer)
    quant = jnp.sign(scaled) * ((jnp.abs(scaled) + (q >> 1)) // q)
    deq = (quant * q * qm_inv) >> 12
    out = blocks.at[..., _FLAT[n]].set(deq).reshape(d.shape)
    recb = idct2d(out, n)
    # -- inverse lapping (mirror of the forward halo exchange) -----------
    rec = _from_blocks(recb, h, w, n)
    rec = lap_cols(rec, cols[:, None] + np.arange(-2, 2), inverse=True)
    rtop2 = rec[..., :2, :]
    rbot2 = rec[..., -2:, :]
    rfrom_next = jax.lax.ppermute(rtop2, "tile", perm_up)
    rfrom_prev = jax.lax.ppermute(rbot2, "tile", perm_dn)
    span_b = jnp.concatenate([rbot2, rfrom_next], axis=-2).swapaxes(-1, -2)
    fb = post_filter(span_b, 4).swapaxes(-1, -2)
    rec = jnp.where((t < ntiles - 1),
                    rec.at[..., -2:, :].set(fb[..., :2, :]), rec)
    span_t = jnp.concatenate([rfrom_prev, rtop2], axis=-2).swapaxes(-1, -2)
    ft = post_filter(span_t, 4).swapaxes(-1, -2)
    rec = jnp.where((t > 0), rec.at[..., :2, :].set(ft[..., 2:, :]), rec)
    rec = lap_rows(rec, inner[:, None] + np.arange(-2, 2), inverse=True)
    # -- directional dering with a 3-row halo ----------------------------
    from ..ops.dering import DERING_VERY_LARGE
    from ..ops.dering_jax import dering_padded_jax

    halo_up = jax.lax.ppermute(rec[..., :3, :], "tile", perm_up)
    halo_dn = jax.lax.ppermute(rec[..., -3:, :], "tile", perm_dn)
    nhsb = w // 32
    nvsb = h // 32

    def _dering_one(plane, top3, bot3, is_first, is_last):
        P = jnp.full((h + 6, w + 6), DERING_VERY_LARGE, dtype=jnp.int32)
        P = P.at[3:3 + h, 3:3 + w].set(plane.astype(jnp.int32))
        big = jnp.full((3, w), DERING_VERY_LARGE, dtype=jnp.int32)
        P = P.at[0:3, 3:3 + w].set(jnp.where(is_first, big, top3))
        P = P.at[3 + h:, 3:3 + w].set(jnp.where(is_last, big, bot3))
        thr = np.int32(np.power(float(max(1, quantizer)), 0.84182))
        bufs, _ = dering_padded_jax(P, nhsb, nvsb, thr, 0, 0)
        return bufs.transpose(0, 2, 1, 3).reshape(h, w)

    rec = jax.vmap(_dering_one, in_axes=(0, 0, 0, None, None))(
        rec, halo_dn.astype(jnp.int32), halo_up.astype(jnp.int32),
        t == 0, t == ntiles - 1)
    # Rate/distortion summaries ride the collectives; the dering
    # output feeds the checksum so the full pipeline stays live.
    nz = jax.lax.psum(jnp.sum(quant != 0), ("gop", "tile"))
    err = jax.lax.psum(
        jnp.sum(((recb - _to_blocks(c, n)).astype(jnp.float32)) ** 2)
        + jnp.float32(jnp.sum(jnp.abs(rec)) % 997),
        ("gop", "tile"))
    return quant, nz, err


def sharded_encode_step(mesh, frames, bs: int, quantizer: int, qm, qm_inv):
    """Jit a full multi-chip encode compute step.

    frames: (nframes, h, w) uint8, sharded (gop, tile-of-rows).
    Returns (quant symbols, global nonzero count, global sse)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    body = partial(_band_encode, bs=bs, quantizer=max(1, quantizer),
                   qm=jnp.asarray(qm), qm_inv=jnp.asarray(qm_inv),
                   ntiles=mesh.shape["tile"])
    fn = jax.jit(
        shard_map(
            lambda fr: body(fr),
            mesh=mesh,
            in_specs=P("gop", "tile", None),
            out_specs=(P("gop", "tile"), P(), P()),
        )
    )
    return fn(frames)


def sharded_gop_stream_encode(mesh, ys, us, vs, quantizer,
                              use_dering=True, bs_luma=1,
                              quality=None, qm_flat=False):
    """Multi-chip STREAM-VALID encode: the full device P-frame body
    (dense ME, mesh-level RDO, decoder-exact OBMC, integer-synthesis
    PVQ symbols, dering flags — pipeline/device_encode._frame_body)
    sharded one gray-start GOP chain per device across BOTH mesh axes.

    Gray-reference GOPs are fully independent (no cross-GOP state —
    the --gray-gop random-access points), so this is the data-parallel
    production path of SURVEY.md section 2.11: every chip encodes its
    GOPs' frames and returns the same symbol tensors the single-chip
    pipeline emits; the host packs each GOP's packets independently and
    byte-identically (tests/test_multichip_stream.py asserts equality
    with the single-device DeviceEncoderSession).

    ys/us/vs: (NG, T, h, w) / chroma halves, uint8; NG must be a
    multiple of the mesh device count.  Must run under
    jax.enable_x64(True) (integer synthesis).  Returns the per-frame
    symbol pytree with leading dims (NG, T, ...).

    quality (coded quantizer index): when given, each GOP chain opens
    with a DEVICE KEYFRAME instead of a gray reference — the sharded
    path then emits a standard keyframe-led stream (returns
    (key_syms, p_syms) with key leading dim (NG,) and P frames
    (NG, T-1, ...)).  bs_luma: uniform device P block size (1/2/3).

    qm_flat selects the flat (info.qm == 0) vs HVS PVQ weights for BOTH
    the keyframe and P-frame tables; the returned wrapper carries it
    (with bs_luma and quality) so pack_gop_sharded packs with exactly
    the geometry/tables the symbols were generated under."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from ..core.quant import QM8_FLAT, QM8_HVS, init_qm
    from ..core.state import interp_pvq_qm
    from .device_encode import PAD, _frame_body, _key_frame_planes, \
        _key_quants
    from .inter import _choose_mv_res

    h, w = int(ys.shape[2]), int(ys.shape[3])
    qm, qm_inv = init_qm(QM8_FLAT if qm_flat else QM8_HVS)
    qms = tuple(np.asarray(qm[b], dtype=np.int32) for b in range(4))
    qmis = tuple(np.asarray(qm_inv[b], dtype=np.int32)
                 for b in range(4))
    pvq_qms = tuple(interp_pvq_qm(quantizer, pli, False, flat=qm_flat)
                    for pli in range(3))
    import os as _os

    rr = _os.environ.get("DTPU_DEV_REFINE", "1") not in ("0", "false")
    body = partial(_frame_body, h=h, w=w, quantizer=int(quantizer),
                   mv_res=_choose_mv_res(quantizer), qms=qms,
                   qm_invs=qmis, pvq_qms=pvq_qms,
                   use_dering=bool(use_dering), emit_recon=False,
                   bs_luma=int(bs_luma), rate_refine=rr)
    if quality is not None:
        (_, kquant, kqms, kqmis, kpvq_qms, kdcq,
         kacq) = _key_quants(quality, qm_flat=qm_flat)
    axes = ("gop", "tile")

    def _mark_varying(t):
        # Replicated constants entering the scan carry must be marked
        # varying or carry types mismatch.
        _pcast = getattr(jax.lax, "pcast", None)
        _pvary = getattr(jax.lax, "pvary", None)
        if _pcast is not None:
            try:
                return _pcast(t, to="varying", axes=axes)
            except TypeError:
                if _pvary is not None:
                    return _pvary(t, axes)
        elif _pvary is not None:
            return _pvary(t, axes)
        return t   # this JAX generation has no varying types to satisfy

    def member(y, u, v):
        def one_gop(yy, uu, vv):
            if quality is not None:
                # Standard stream: the chain opens with a DEVICE
                # KEYFRAME (wavefront Haar-DC + noref isynth bands);
                # its reconstruction seeds the P chain's reference.
                r8, ksyms = _key_frame_planes(
                    yy[0], uu[0], vv[0], kquant, kqms, kqmis,
                    kpvq_qms, kdcq, kacq, bool(use_dering))
                carry0 = tuple(jnp.pad(r, PAD, mode="edge")
                               for r in r8)
                _, outs = jax.lax.scan(lambda c, x: body(c, x),
                                       carry0,
                                       (yy[1:], uu[1:], vv[1:]))
                ks = {"sbdc": tuple(ksyms["sbdc"]),
                      "acA": tuple(ksyms["acA"]),
                      "acB": tuple(ksyms["acB"]),
                      "qg": tuple(ksyms["qg"]),
                      "y": tuple(ksyms["y"]),
                      "dflags": ksyms["dflags"]}
                return (ks, outs)
            gray = jnp.full((h + 2 * PAD, w + 2 * PAD), 128, jnp.uint8)
            grayc = jnp.full((h // 2 + 2 * PAD, w // 2 + 2 * PAD), 128,
                             jnp.uint8)
            gray, grayc = _mark_varying((gray, grayc))
            _, outs = jax.lax.scan(lambda c, x: body(c, x),
                                   (gray, grayc, grayc), (yy, uu, vv))
            return outs

        return jax.vmap(one_gop)(y, u, v)

    spec = P(axes)
    if quality is not None:
        out_struct = ({"sbdc": (0,) * 3, "acA": (0,) * 3,
                       "acB": (0,) * 3, "qg": (0,) * 3, "y": (0,) * 3,
                       "dflags": 0}, _gop_out_structure())
    else:
        out_struct = _gop_out_structure()
    kw = dict(mesh=mesh, in_specs=(spec, spec, spec),
              out_specs=jax.tree.map(lambda _: spec, out_struct))
    try:
        # check_vma=False: the lax.cond level gating mixes replicated
        # iota/constants with varying operands inside the scan body,
        # which the varying-type checker rejects (JAX's own error
        # message prescribes this flag); the stream path has no
        # collectives, so the check buys nothing here.
        fn = shard_map(member, check_vma=False, **kw)
    except TypeError:   # older jax: no check_vma (and no vma checks)
        fn = shard_map(member, **kw)
    syms = jax.jit(fn)(ys, us, vs)
    return {"syms": syms,
            "meta": {"bs_luma": int(bs_luma),
                     "qm_flat": bool(qm_flat),
                     "quantizer": int(quantizer),
                     "quality": None if quality is None
                     else int(quality)}}


def _gop_out_structure():
    """Pytree skeleton of _frame_body's outs dict (emit_recon=False)
    for out_specs construction."""
    return {"grid": 0, "levels": 0, "dflags": 0,
            "dc": (0, 0, 0), "qg": (0, 0, 0), "y": (0, 0, 0),
            "y8": (0, 0, 0), "yovf": 0, "check": 0}


def pack_gop_sharded(info, quality, outs, use_dering=True):
    """Pack the symbol tensors of sharded_gop_stream_encode into
    packet dict lists, one list per GOP.

    outs is the wrapper dict sharded_gop_stream_encode returns; the
    block-size and QM geometry come from its meta (never a second
    manual argument — the symbol tensors' geometry and tables must
    match the packed grid exactly, so the encode is the single source
    of truth).  info.qm must agree with the encode's qm_flat or the
    stream would signal weights the symbols were not generated under.

    Gray-start mode (syms = P-frame pytree): each GOP's first frame is
    a signaled gray-reference random-access point, exactly the
    single-device gray-start layout.  Keyframe mode (syms =
    (key_syms, p_syms), from quality=... encode): each GOP opens with
    a standard device keyframe packet."""
    from .device_encode import pack_device_frame, pack_device_keyframe

    meta = outs["meta"]
    bs_luma = meta["bs_luma"]
    if (getattr(info, "qm", 1) == 0) != meta["qm_flat"]:
        raise ValueError(
            "pack_gop_sharded: info.qm (%r) disagrees with the "
            "encode's qm_flat=%r — the packets would signal PVQ "
            "weights the symbols were not generated under"
            % (getattr(info, "qm", 1), meta["qm_flat"]))
    host = jax.tree.map(np.asarray, outs["syms"])
    keyed = isinstance(host, tuple)
    khost, phost = host if keyed else (None, host)
    ng, t = phost["levels"].shape[:2]
    gop_len = t + (1 if keyed else 0)
    gops = []
    for g in range(ng):
        pkts = []
        if keyed:
            ksyms = {
                "sbdc": [a[g] for a in khost["sbdc"]],
                "acA": [a[g] for a in khost["acA"]],
                "acB": [a[g] for a in khost["acB"]],
                "qg": [a[g] for a in khost["qg"]],
                "y": [a[g] for a in khost["y"]],
                "dflags": khost["dflags"][g],
            }
            data = pack_device_keyframe(info, int(quality), ksyms,
                                        use_dering)
            pkts.append({"data": data, "ftype": 0,
                         "display_order": g * gop_len,
                         "use_haar": False, "dres": True})
        for i in range(t):
            syms = {"dc": [d[g][i] for d in phost["dc"]],
                    "qg": [q[g][i] for q in phost["qg"]],
                    "y": [yv[g][i] for yv in phost["y"]]}
            data = pack_device_frame(
                info, int(quality), phost["grid"][g][i],
                phost["levels"][g][i], syms, phost["dflags"][g][i],
                use_dering, bs_luma=bs_luma)
            pkts.append({"data": data, "ftype": 3,
                         "display_order": g * gop_len + i
                         + (1 if keyed else 0),
                         "use_haar": False, "dres": True,
                         "gray_ref": (not keyed) and i == 0})
        gops.append(pkts)
    return gops
