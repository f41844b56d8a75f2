"""Kernel experiments for the device-encode hot spots (round-2 perf).

Measures variants of the window-gather / interpolation primitives that
dominate ME+OBMC at 1080p, so only proven winners land in
ops/mc_jax.py / search/me_jax.py.  Run on the TPU:

    python tools/exp_kernels.py --exp banded,lv1,chroma,interp
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _sync(out):
    """Fetch ONE scalar (device-side slice first): np.asarray(full)
    would time the tunnel transfer, not the kernel (round-1 trap)."""
    import jax
    import numpy as _np

    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    return int(_np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x))


def timeit(fn, args, n=3, name=""):
    _sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:40s} {med * 1000:9.2f} ms")
    return med


def banded_windows_chunked(p, row_base, iy, ix, K, Bh, G=8):
    """Row-chunked variant of _banded_windows: G rows per scan step so
    the one-hot matmuls batch up (better MXU utilization, fewer scan
    steps)."""
    import jax
    import jax.numpy as jnp

    W = p.shape[1]
    R = len(row_base)
    Rp = ((R + G - 1) // G) * G
    rb = list(row_base) + [row_base[-1]] * (Rp - R)
    bands = jnp.stack([jax.lax.dynamic_slice(
        p, (int(r), 0), (Bh, W)) for r in rb]).astype(jnp.bfloat16)
    ry = (iy - jnp.asarray(row_base, dtype=jnp.int32)[:, None])
    pad_r = Rp - R
    if pad_r:
        ry = jnp.concatenate([ry, jnp.zeros((pad_r, ry.shape[1]),
                                            ry.dtype)])
        ix = jnp.concatenate([ix, jnp.zeros((pad_r, ix.shape[1]),
                                            ix.dtype)])
    C = ix.shape[1]
    kk = jnp.arange(K, dtype=jnp.int32)
    bands = bands.reshape(Rp // G, G, Bh, W)
    ry = ry.reshape(Rp // G, G, C).astype(jnp.int32)
    ixc = ix.reshape(Rp // G, G, C).astype(jnp.int32)

    def step(carry, args):
        band, ryr, ixr = args        # (G, Bh, W), (G, C), (G, C)
        wi = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0]
        sx = (wi[None, :, None] == (ixr[:, None, :, None]
              + kk[None, None, None, :]).reshape(G, 1, C * K)
              ).astype(jnp.bfloat16)           # (G, W, C*K)
        e1 = jnp.einsum("gbw,gwc->gbc", band, sx,
                        preferred_element_type=jnp.float32)
        e1 = e1.reshape(G, Bh, C, K)
        bi = jax.lax.broadcasted_iota(jnp.int32, (Bh, 1), 0)[:, 0]
        sy = (bi[None, None, :, None] == ryr[:, :, None, None]
              + kk[None, None, None, :]).astype(jnp.bfloat16)  # (G,C,Bh,K)
        e2 = jnp.einsum("gcbk,gbcl->gckl", sy,
                        e1.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return carry, e2.astype(jnp.int32)

    _, wins = jax.lax.scan(step, 0, (bands, ry, ixc))
    wins = wins.reshape(Rp, C, K, K)
    return wins[:R]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="banded,lv1,chroma")
    args = ap.parse_args()
    exps = args.exp.split(",")

    import jax
    import jax.numpy as jnp

    from daala_tpu.ops.mc_jax import (_banded_windows, _window_slices,
                                      obmc_predict_jax)

    h, w = 1088, 1920
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.integers(0, 256, (h + 160, w + 160),
                                   dtype=np.uint8))
    # 8px lattice geometry (lv2 OBMC): nvy x nvx vertices, K = 21.
    nvy, nvx = (h >> 3) + 1, (w >> 3) + 1
    grid = jnp.asarray(
        rng.integers(-58 * 8, 58 * 8, (nvy, nvx, 2), dtype=np.int64)
        .astype(np.int32))

    with jax.enable_x64(True):
        nul = jax.jit(lambda a: a.sum())
        timeit(nul, (ref,), name="(null latency)")

        if "banded" in exps:
            n = 8
            E = n + 8
            K = 2 * n + 5
            p = jnp.pad(ref, ((E, E), (E, E)), mode="edge")
            ys = (jnp.arange(nvy, dtype=jnp.int32) * n)[:, None] - n
            xs = (jnp.arange(nvx, dtype=jnp.int32) * n)[None, :] - n
            iy = ys + (grid[:, :, 0] >> 3) + 80 + E - 2
            ix = xs + (grid[:, :, 1] >> 3) + 80 + E - 2
            row_base = [int(rr * n - n - 62 + 80 + E)
                        for rr in range(nvy)]

            f_cur = jax.jit(lambda pp, iyy, ixx: _banded_windows(
                pp, row_base, iyy, ixx, K, K + 121))
            timeit(f_cur, (p, iy, ix), name="banded lv2 current (scan/row)")
            for G in (4, 8, 16):
                f_ch = jax.jit(lambda pp, iyy, ixx, G=G:
                               banded_windows_chunked(
                                   pp, row_base, iyy, ixx, K, K + 121,
                                   G=G))
                a = np.asarray(f_cur(p, iy, ix))
                b = np.asarray(f_ch(p, iy, ix))
                ok = "OK" if np.array_equal(a, b) else "MISMATCH"
                timeit(f_ch, (p, iy, ix),
                       name=f"banded lv2 chunked G={G} [{ok}]")

        if "lv1" in exps:
            # 16px vertex patch fetch: current = vmap dynamic_slice.
            n = 16
            E = n + 8
            K = 2 * n + 5
            nvy1, nvx1 = (h >> 4) + 1, (w >> 4) + 1
            g1 = grid[::2, ::2]
            p = jnp.pad(ref, ((E, E), (E, E)), mode="edge")
            ys = (jnp.repeat(jnp.arange(nvy1, dtype=jnp.int32) * n,
                             nvx1) - n)
            xs = (jnp.tile(jnp.arange(nvx1, dtype=jnp.int32) * n,
                           nvy1) - n)
            iy = ys + (g1[:, :, 0].reshape(-1) >> 3) + 80 + E - 2
            ix = xs + (g1[:, :, 1].reshape(-1) >> 3) + 80 + E - 2

            def slices(pp, iyy, ixx):
                return jax.vmap(lambda y, x: jax.lax.dynamic_slice(
                    pp, (y, x), (K, K)))(iyy, ixx).astype(jnp.int32)

            f_sl = jax.jit(slices)
            timeit(f_sl, (p, iy, ix), name="lv1 fetch dynamic_slice")
            row_base = [int(rr * n - n - 62 + 80 + E)
                        for rr in range(nvy1)]
            f_bd = jax.jit(lambda pp, iyy, ixx: _banded_windows(
                pp, row_base, iyy.reshape(nvy1, nvx1),
                ixx.reshape(nvy1, nvx1), K, K + 121 + 16))
            a = np.asarray(f_sl(p, iy, ix))
            b = np.asarray(f_bd(p, iy, ix)).reshape(-1, K, K)
            ok = "OK" if np.array_equal(a, b) else "MISMATCH"
            timeit(f_bd, (p, iy, ix), name=f"lv1 fetch banded [{ok}]")
            for G in (8,):
                f_ch = jax.jit(lambda pp, iyy, ixx, G=G:
                               banded_windows_chunked(
                                   pp, row_base, iyy.reshape(nvy1, nvx1),
                                   ixx.reshape(nvy1, nvx1), K,
                                   K + 121 + 16, G=G))
                b = np.asarray(f_ch(p, iy, ix)).reshape(-1, K, K)
                ok = "OK" if np.array_equal(a, b) else "MISMATCH"
                timeit(f_ch, (p, iy, ix),
                       name=f"lv1 fetch banded chunk G={G} [{ok}]")

        if "interp" in exps:
            # int32 vs f32 arithmetic for the 6-tap subpel interp:
            # all intermediates are exact in f32 (|hacc| <= 26584,
            # sum|taps| <= 208 -> |vacc| + bias < 2^24).
            from daala_tpu.ops.mc import SUBPEL_FILTERS

            N = 33017          # lv2 vertex count at 1080p
            K = 21
            n = 8
            win = jnp.asarray(rng.integers(0, 256, (K, K, N),
                                           dtype=np.int32))
            fy = jnp.asarray(rng.integers(0, 8, N, dtype=np.int64)
                             .astype(np.int32))
            fx = jnp.asarray(rng.integers(0, 8, N, dtype=np.int64)
                             .astype(np.int32))
            filt = np.asarray(SUBPEL_FILTERS, dtype=np.int32)

            def interp_i32(w, fyv, fxv):
                f = jnp.asarray(filt)
                fh = f[fxv]
                hacc = jnp.zeros((n + 5, n, N), dtype=jnp.int32)
                sub = w[: n + 5]
                for k in range(6):
                    hacc = hacc + sub[:, k:k + n] * fh[:, k][None, None]
                hacc = hacc - (128 << 7)
                fv = f[fyv]
                vacc = jnp.zeros((n, n, N), dtype=jnp.int32)
                for k in range(6):
                    vacc = vacc + hacc[k:k + n] * fv[:, k][None, None]
                return (vacc + (1 << 13) + (128 << 14)) >> 14

            def interp_f32(w, fyv, fxv):
                f = jnp.asarray(filt.astype(np.float32))
                wf = w.astype(jnp.float32)
                fh = f[fxv]
                hacc = jnp.zeros((n + 5, n, N), dtype=jnp.float32)
                sub = wf[: n + 5]
                for k in range(6):
                    hacc = hacc + sub[:, k:k + n] * fh[:, k][None, None]
                hacc = hacc - float(128 << 7)
                fv = f[fyv]
                vacc = jnp.zeros((n, n, N), dtype=jnp.float32)
                for k in range(6):
                    vacc = vacc + hacc[k:k + n] * fv[:, k][None, None]
                out = vacc + float((1 << 13) + (128 << 14))
                return jnp.floor(out * (1.0 / (1 << 14))).astype(
                    jnp.int32)

            fi = jax.jit(interp_i32)
            ff = jax.jit(interp_f32)
            a = np.asarray(fi(win, fy, fx))
            b = np.asarray(ff(win, fy, fx))
            ok = "OK" if np.array_equal(a, b) else "MISMATCH"
            timeit(fi, (win, fy, fx), name="interp 8px int32")
            timeit(ff, (win, fy, fx), name=f"interp 8px f32 [{ok}]")

            # raw elementwise MAC chain comparison
            big = jnp.asarray(rng.integers(0, 255, (1088, 1920),
                                           dtype=np.int32))

            def mac_i32(x):
                acc = x
                for k in range(12):
                    acc = acc + x * (k + 3)
                return acc

            def mac_f32(x):
                xf = x.astype(jnp.float32)
                acc = xf
                for k in range(12):
                    acc = acc + xf * float(k + 3)
                return acc.astype(jnp.int32)

            timeit(jax.jit(mac_i32), (big,), name="12-MAC chain int32")
            timeit(jax.jit(mac_f32), (big,), name="12-MAC chain f32")

        if "chroma" in exps:
            hc, wc = h // 2, w // 2
            refc = ref[:hc + 160, :wc + 160]
            gc = (grid >> 1).astype(jnp.int32)
            f_two = jax.jit(lambda r1, r2, gg: (
                obmc_predict_jax([r1], 80, hc, wc, gg, 2),
                obmc_predict_jax([r2], 80, hc, wc, gg, 2)))
            timeit(f_two, (refc, refc, gc), name="chroma 4px U,V separate")
            f_vm = jax.jit(lambda rr, gg: jax.vmap(
                lambda r: obmc_predict_jax([r], 80, hc, wc, gg, 2)
            )(rr))
            rr = jnp.stack([refc, refc])
            a = np.asarray(f_two(refc, refc, gc)[0])
            b = np.asarray(f_vm(rr, gc))[0]
            ok = "OK" if np.array_equal(a, b) else "MISMATCH"
            timeit(f_vm, (rr, gc), name=f"chroma 4px U+V vmapped [{ok}]")


if __name__ == "__main__":
    main()
