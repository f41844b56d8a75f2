"""Entropy coding: range coder, adaptive CDFs, generic + Laplace models."""

from .coder import (
    OD_BITRES,
    EC_UINT_BITS,
    RangeDecoder,
    RangeEncoder,
    tell_frac,
    uniform_cdf_q15,
)
from .adapt import (
    GENERIC_TABLES,
    GenericModel,
    cdf_init,
    decode_cdf_adapt,
    encode_cdf_adapt,
    generic_decode,
    generic_encode,
    generic_encode_cost,
    laplace_decode,
    laplace_decode_special,
    laplace_decode_vector,
    laplace_encode,
    laplace_encode_special,
    laplace_encode_vector,
)
from .tables import EXP_CDF_TABLE, LAPLACE_OFFSET


def make_encoder():
    """Range encoder for the serialization spine: the native C++ coder
    when built (identical streams — tests/test_native_ec.py), else the
    Python oracle.  Force Python with DTPU_PY_EC=1."""
    import os

    from . import native

    if not os.environ.get("DTPU_PY_EC") and native.available():
        return native.NativeRangeEncoder()
    return RangeEncoder()


def make_decoder(data: bytes):
    import os

    from . import native

    if not os.environ.get("DTPU_PY_EC") and native.available():
        return native.NativeRangeDecoder(data)
    return RangeDecoder(data)
