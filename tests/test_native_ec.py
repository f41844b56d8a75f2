"""Native (C++) range coder must match the Python oracle bit-exactly —
the --enable-check-asm equivalent for the native runtime layer."""

import random

import numpy as np
import pytest

from daala_tpu.entropy import RangeDecoder, RangeEncoder, uniform_cdf_q15
from daala_tpu.entropy import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native EC library not built")


def _random_ops(n, seed=0):
    rng = random.Random(seed)
    ops = []
    for _ in range(n):
        k = rng.randrange(4)
        if k == 0:
            m = rng.randrange(2, 17)
            ops.append(("u", rng.randrange(m), m))
        elif k == 1:
            nb = rng.randrange(1, 24)
            ops.append(("b", rng.randrange(1 << nb), nb))
        elif k == 2:
            m = rng.randrange(2, 17)
            cdf = np.cumsum([rng.randrange(1, 300) for _ in range(m)])
            ops.append(("c", rng.randrange(m), cdf.astype(np.uint16)))
        else:
            ft = rng.randrange(2, 1 << 20)
            ops.append(("i", rng.randrange(ft), ft))
    return ops


def _encode(E, ops):
    e = E()
    for op in ops:
        if op[0] == "u":
            e.encode_cdf_q15(op[1], uniform_cdf_q15(op[2]))
        elif op[0] == "b":
            e.encode_bits(op[1], op[2])
        elif op[0] == "c":
            e.encode_cdf_unscaled(op[1], op[2])
        else:
            e.encode_uint(op[1], op[2])
    return e.done()


def _decode_all(D, buf, ops):
    d = D(buf)
    for op in ops:
        if op[0] == "u":
            assert d.decode_cdf_q15(uniform_cdf_q15(op[2])) == op[1]
        elif op[0] == "b":
            assert d.decode_bits(op[2]) == op[1]
        elif op[0] == "c":
            assert d.decode_cdf_unscaled(op[2]) == op[1]
        else:
            assert d.decode_uint(op[2]) == op[1]


def test_native_encoder_bit_exact():
    ops = _random_ops(8000, seed=1)
    assert _encode(native.NativeRangeEncoder, ops) == \
        _encode(RangeEncoder, ops)


def test_cross_decode():
    ops = _random_ops(5000, seed=2)
    buf = _encode(RangeEncoder, ops)
    _decode_all(native.NativeRangeDecoder, buf, ops)
    buf2 = _encode(native.NativeRangeEncoder, ops)
    _decode_all(RangeDecoder, buf2, ops)


def test_tell_matches():
    ops = _random_ops(500, seed=3)
    ep = RangeEncoder()
    en = native.NativeRangeEncoder()
    for op in ops:
        if op[0] == "u":
            ep.encode_cdf_q15(op[1], uniform_cdf_q15(op[2]))
            en.encode_cdf_q15(op[1], uniform_cdf_q15(op[2]))
        elif op[0] == "b":
            ep.encode_bits(op[1], op[2])
            en.encode_bits(op[1], op[2])
        elif op[0] == "c":
            ep.encode_cdf_unscaled(op[1], op[2])
            en.encode_cdf_unscaled(op[1], op[2])
        else:
            ep.encode_uint(op[1], op[2])
            en.encode_uint(op[1], op[2])
        assert ep.tell() == en.tell()
