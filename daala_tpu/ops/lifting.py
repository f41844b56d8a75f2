"""Declarative integer-lifting engine for reversible transforms.

The reference implements its reversible DCT/lapping networks as thousands
of lines of hand-unrolled scalar C (src/dct.c, src/filter.c), with the
forward and inverse transforms maintained separately.  Here each network
is written ONCE as a declarative program over named lanes; the exact
inverse is derived mechanically by reversing the program and inverting
each step.  The engine executes on batched arrays (numpy or jax.numpy),
so a "scalar" network runs vectorized across every block in a frame —
the TPU-native replacement for the reference's per-block loops and its
SIMD kernels (src/x86/*).

Primitive ops (all exactly invertible in int32):

  ("lift", i, j, c, r, s, sgn)  t[i] += sgn * ((t[j]*c + r) >> s)
  ("add", i, j)                 t[i] += t[j]
  ("sub", i, j)                 t[i] -= t[j]
  ("rsub", i, j)                t[i] = t[j] - t[i]          (involution)
  ("addh", i, j)                t[i] += hrnd(t[j])
  ("subh", i, j)                t[i] -= hrnd(t[j])
  ("rsubh", i, j)               t[i] = hrnd(t[j]) - t[i]    (involution)
  ("neg", i)                    t[i] = -t[i]                (involution)

where hrnd(x) is the unbiased right shift by 1 (round toward zero,
filter.h:40-43).  A program is a list of ops; lanes are arbitrary
hashable names.  Sub-networks compose via `inline(prog, mapping)`.
"""

from __future__ import annotations

from typing import Dict, Hashable, List, Sequence, Tuple

Op = Tuple
Program = List[Op]


def lift(i, j, c: int, r: int, s: int) -> Op:
    """t[i] += (t[j]*c + r) >> s."""
    return ("lift", i, j, c, r, s, 1)


def liftm(i, j, c: int, r: int, s: int) -> Op:
    """t[i] -= (t[j]*c + r) >> s."""
    return ("lift", i, j, c, r, s, -1)


def add(i, j) -> Op:
    return ("add", i, j)


def sub(i, j) -> Op:
    return ("sub", i, j)


def rsub(i, j) -> Op:
    return ("rsub", i, j)


def addh(i, j) -> Op:
    return ("addh", i, j)


def subh(i, j) -> Op:
    return ("subh", i, j)


def rsubh(i, j) -> Op:
    return ("rsubh", i, j)


def neg(i) -> Op:
    return ("neg", i)


def addf(i, j) -> Op:
    """t[i] += t[j] >> 1 (floor shift, used by the lapped filters)."""
    return ("addf", i, j)


def subf(i, j) -> Op:
    return ("subf", i, j)


def scale6(i, s: int) -> Op:
    """Biorthogonal scaling: t[i] = (t[i]*s) >> 6, then +1 if positive.

    The positive-increment makes the step exactly invertible by the
    truncating division in `unscale6` (filter.c:190-204).
    """
    return ("scale6", i, s)


def hrnd(x):
    """Unbiased right shift by 1: x/2 rounded toward zero.

    Works on numpy/jnp signed integer arrays (arithmetic >>).
    """
    return (x + ((x >> 31) & 1)) >> 1


def inline(prog: Program, mapping: Dict[Hashable, Hashable]) -> Program:
    """Rename program lanes through `mapping` (identity if missing)."""
    out: Program = []
    for op in prog:
        kind = op[0]
        if kind == "neg":
            out.append(("neg", mapping.get(op[1], op[1])))
        elif kind == "lift":
            _, i, j, c, r, s, sgn = op
            out.append(
                ("lift", mapping.get(i, i), mapping.get(j, j), c, r, s, sgn)
            )
        elif kind in ("scale6", "unscale6"):
            # op[2] is a scale constant, not a lane.
            out.append((kind, mapping.get(op[1], op[1]), op[2]))
        else:
            _, i, j = op
            out.append((kind, mapping.get(i, i), mapping.get(j, j)))
    return out


_INVERSE_KIND = {
    "add": "sub",
    "sub": "add",
    "addh": "subh",
    "subh": "addh",
    "rsub": "rsub",
    "rsubh": "rsubh",
    "neg": "neg",
    "addf": "subf",
    "subf": "addf",
    "scale6": "unscale6",
    "unscale6": "scale6",
}


def invert(prog: Program) -> Program:
    """Exact inverse program: reversed order, each op inverted."""
    out: Program = []
    for op in reversed(prog):
        kind = op[0]
        if kind == "lift":
            _, i, j, c, r, s, sgn = op
            out.append(("lift", i, j, c, r, s, -sgn))
        else:
            out.append((_INVERSE_KIND[kind],) + tuple(op[1:]))
    return out


def run(prog: Program, t: Dict[Hashable, object]) -> None:
    """Execute a program, mutating the lane dict in place.

    Lane values may be numpy/jnp arrays (any shape) or int32 scalars;
    all ops are elementwise.
    """
    for op in prog:
        kind = op[0]
        if kind == "lift":
            _, i, j, c, r, s, sgn = op
            v = (t[j] * c + r) >> s
            t[i] = t[i] + v if sgn > 0 else t[i] - v
        elif kind == "add":
            t[op[1]] = t[op[1]] + t[op[2]]
        elif kind == "sub":
            t[op[1]] = t[op[1]] - t[op[2]]
        elif kind == "rsub":
            t[op[1]] = t[op[2]] - t[op[1]]
        elif kind == "addh":
            t[op[1]] = t[op[1]] + hrnd(t[op[2]])
        elif kind == "subh":
            t[op[1]] = t[op[1]] - hrnd(t[op[2]])
        elif kind == "rsubh":
            t[op[1]] = hrnd(t[op[2]]) - t[op[1]]
        elif kind == "neg":
            t[op[1]] = -t[op[1]]
        elif kind == "addf":
            t[op[1]] = t[op[1]] + (t[op[2]] >> 1)
        elif kind == "subf":
            t[op[1]] = t[op[1]] - (t[op[2]] >> 1)
        elif kind == "scale6":
            v = (t[op[1]] * op[2]) >> 6
            t[op[1]] = v + (v > 0)
        elif kind == "unscale6":
            v = t[op[1]]
            av = abs(v)
            q = (av << 6) // op[2]
            t[op[1]] = _copysign(q, v)
        else:  # pragma: no cover
            raise ValueError(f"unknown op {kind}")


def _copysign(q, v):
    """q with the sign of v (q >= 0), elementwise."""
    import numpy as np

    if isinstance(v, np.ndarray):
        return np.where(v < 0, -q, q)
    if isinstance(v, (int, np.integer)):
        return -q if v < 0 else q
    import jax.numpy as jnp

    return jnp.where(v < 0, -q, q)


class LanedTransform:
    """A 1D reversible transform defined by (loads, program, stores).

    loads:  loads[lane] = input index (the initial permutation).
    stores: stores[k] = lane whose final value is output k.
    The inverse transform is derived automatically.
    """

    def __init__(self, n: int, loads: Dict[Hashable, int],
                 prog: Program, stores: Sequence[Hashable]):
        assert len(loads) == n and len(stores) == n
        self.n = n
        self.loads = loads
        self.prog = prog
        self.iprog = invert(prog)
        self.stores = list(stores)
        self._nat = None    # lazily compiled native forms

    def _native(self):
        """Compile both directions for the C++ lifting VM
        (dtpu_lift_apply) — a bit-exact int32 twin of `run`."""
        if self._nat is not None:
            return self._nat
        import os

        if os.environ.get("DTPU_PY_LIFT"):
            self._nat = False
            return False
        try:
            import ctypes

            import numpy as np

            from ..entropy.native import _load

            lib = _load()
            if not lib or not hasattr(lib, "dtpu_lift_apply"):
                self._nat = False
                return False
            if not getattr(lib, "_lift_ready", False):
                p = ctypes.c_void_p
                i32 = ctypes.c_int
                i64 = ctypes.c_int64
                lib.dtpu_lift_apply.argtypes = [
                    p, i32, i32, p, p, i32, p, i64, p]
                lib.dtpu_lift_apply_s.argtypes = [
                    p, i32, i32, p, p, i32, p, p, i64, i64, i64, i64,
                    i32]
                lib._lift_ready = True
            lanes = {}

            def lane_id(name):
                if name not in lanes:
                    lanes[name] = len(lanes)
                return lanes[name]

            _KIND = {"add": 2, "sub": 3, "rsub": 4, "addh": 5,
                     "subh": 6, "rsubh": 7, "neg": 8, "addf": 9,
                     "subf": 10, "scale6": 11, "unscale6": 12}

            def compile_prog(prog):
                rows = []
                for op in prog:
                    kind = op[0]
                    if kind == "lift":
                        _, i, j, c, r, s, sgn = op
                        rows.append([0 if sgn > 0 else 1, lane_id(i),
                                     lane_id(j), c, r, s])
                    elif kind == "neg":
                        rows.append([8, lane_id(op[1]), 0, 0, 0, 0])
                    elif kind in ("scale6", "unscale6"):
                        rows.append([_KIND[kind], lane_id(op[1]),
                                     int(op[2]), 0, 0, 0])
                    else:
                        rows.append([_KIND[kind], lane_id(op[1]),
                                     lane_id(op[2]), 0, 0, 0])
                return np.ascontiguousarray(rows, dtype=np.int32)

            fops = compile_prog(self.prog)
            iops = compile_prog(self.iprog)
            load_arr = np.empty(self.n, dtype=np.int32)
            for lane, idx in self.loads.items():
                load_arr[idx] = lane_id(lane)
            store_arr = np.asarray([lane_id(s) for s in self.stores],
                                   dtype=np.int32)
            self._nat = (lib, fops, iops, load_arr, store_arr,
                         len(lanes))
        except Exception:
            self._nat = False
        return self._nat

    def _apply_native(self, x, inverse: bool):
        import ctypes

        import numpy as np

        lib, fops, iops, load_arr, store_arr, nlanes = self._nat
        ops = iops if inverse else fops
        shape = x.shape
        xv = np.ascontiguousarray(x, dtype=np.int32).reshape(-1, self.n)
        out = np.empty_like(xv)
        vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        # Inverse: loads/stores swap roles (inverse() reads stores and
        # writes loads).
        if inverse:
            lib.dtpu_lift_apply(vp(ops), len(ops), nlanes,
                                vp(store_arr), vp(load_arr), self.n,
                                vp(xv), len(xv), vp(out))
        else:
            lib.dtpu_lift_apply(vp(ops), len(ops), nlanes,
                                vp(load_arr), vp(store_arr), self.n,
                                vp(xv), len(xv), vp(out))
        return out.reshape(shape)

    def apply_2d_native(self, x, inverse_rows: bool,
                        inverse_cols: bool, col_first: bool):
        """Both passes of a 2D separable transform in the VM, the
        column pass strided (no transposes).  x: (..., n, n) ndarray;
        returns int32 or None when the native VM is unavailable."""
        import ctypes

        import numpy as np

        if not (isinstance(x, np.ndarray) and x.size >= 2048
                and self._native()):
            return None
        lib, fops, iops, load_arr, store_arr, nlanes = self._nat
        n = self.n
        xv = np.ascontiguousarray(x, dtype=np.int32).reshape(-1, n, n)
        out = np.empty_like(xv)
        vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)

        def one(src, dst, inverse, cols):
            ops = iops if inverse else fops
            ld, st = (store_arr, load_arr) if inverse \
                else (load_arr, store_arr)
            if cols:
                lib.dtpu_lift_apply_s(
                    vp(ops), len(ops), nlanes, vp(ld), vp(st), n,
                    vp(src), vp(dst), len(xv), n * n, 1, n, n)
            else:
                lib.dtpu_lift_apply(
                    vp(ops), len(ops), nlanes, vp(ld), vp(st), n,
                    vp(src), len(xv) * n, vp(dst))

        if col_first:
            one(xv, out, inverse_cols, True)
            one(out, out, inverse_rows, False)
        else:
            one(xv, out, inverse_rows, False)
            one(out, out, inverse_cols, True)
        return out.reshape(x.shape)

    def forward(self, x):
        """x: array (..., n) -> (..., n).  Stacks on the caller's backend."""
        import numpy as np

        if isinstance(x, np.ndarray) and x.size >= 1024 and self._native():
            return self._apply_native(x, False)
        t = {lane: x[..., idx] for lane, idx in self.loads.items()}
        run(self.prog, t)
        cols = [t[lane] for lane in self.stores]
        return _stack(cols)

    def inverse(self, y):
        import numpy as np

        if isinstance(y, np.ndarray) and y.size >= 1024 and self._native():
            return self._apply_native(y, True)
        t = {lane: y[..., k] for k, lane in enumerate(self.stores)}
        run(self.iprog, t)
        inv = sorted(self.loads.items(), key=lambda kv: kv[1])
        cols = [t[lane] for lane, _ in inv]
        return _stack(cols)


def _stack(cols):
    import numpy as np

    first = cols[0]
    if isinstance(first, np.ndarray) or np.isscalar(first):
        return np.stack(cols, axis=-1)
    import jax.numpy as jnp

    return jnp.stack(cols, axis=-1)
