"""ctypes bindings for the native range coder (native/ec.cpp).

Drop-in fast path for the serialization spine: `NativeRangeEncoder` /
`NativeRangeDecoder` expose the same symbol-level API as the Python
classes in coder.py (which remain the tested oracle).  Built with
`make -C native`; falls back gracefully when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Sequence

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libdtpu_ec.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        # Try building it.
        os.system(f"make -s -C {os.path.dirname(path)} >/dev/null 2>&1")
    if not os.path.exists(path):
        _LIB = False
        return False
    lib = ctypes.CDLL(path)
    lib.dtpu_enc_create.restype = ctypes.c_void_p
    lib.dtpu_dec_create.restype = ctypes.c_void_p
    lib.dtpu_dec_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.dtpu_enc_symbol.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                    ctypes.c_uint32, ctypes.c_uint32]
    lib.dtpu_enc_symbols.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int]
    lib.dtpu_enc_bits.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                  ctypes.c_int]
    lib.dtpu_enc_done.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int]
    lib.dtpu_enc_tell.argtypes = [ctypes.c_void_p]
    lib.dtpu_dec_symbol.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int, ctypes.c_uint32,
                                    ctypes.c_int]
    lib.dtpu_dec_symbol.restype = ctypes.c_int
    lib.dtpu_dec_bits.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.dtpu_dec_bits.restype = ctypes.c_uint32
    lib.dtpu_enc_destroy.argtypes = [ctypes.c_void_p]
    lib.dtpu_dec_destroy.argtypes = [ctypes.c_void_p]
    lib.dtpu_dec_error.argtypes = [ctypes.c_void_p]
    lib.dtpu_enc_checkpoint.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.dtpu_enc_rollback.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.dtpu_enc_tell_frac.argtypes = [ctypes.c_void_p]
    lib.dtpu_enc_tell_frac.restype = ctypes.c_int
    lib.dtpu_enc_serialize.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int]
    lib.dtpu_enc_serialize.restype = ctypes.c_int
    lib.dtpu_enc_deserialize.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.dtpu_enc_deserialize.restype = ctypes.c_void_p
    lib.dtpu_dec_serialize.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.dtpu_dec_deserialize.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_void_p]
    lib.dtpu_dec_deserialize.restype = ctypes.c_void_p
    lib.dtpu_dec_symbol32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int, ctypes.c_uint32,
                                      ctypes.c_int]
    lib.dtpu_dec_symbol32.restype = ctypes.c_int
    lib.dtpu_dec_symbol64.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int, ctypes.c_uint32,
                                      ctypes.c_int]
    lib.dtpu_dec_symbol64.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return bool(_load())


def _ilog(x: int) -> int:
    return int(x).bit_length()


class NativeRangeEncoder:
    """Symbol-compatible with entropy.coder.RangeEncoder."""

    def __init__(self):
        self._lib = _load()
        if not self._lib:
            raise RuntimeError("native EC library not available")
        self._h = self._lib.dtpu_enc_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dtpu_enc_destroy(self._h)
            self._h = None

    def encode(self, fl, fh, ft):
        self._lib.dtpu_enc_symbol(self._h, int(fl), int(fh), int(ft))

    def encode_cdf_q15(self, s, cdf):
        self.encode(cdf[s - 1] if s > 0 else 0, cdf[s], cdf[-1])

    def encode_cdf_unscaled(self, s, cdf):
        ft = int(cdf[-1])
        sh = 15 - _ilog(ft - 1)
        fl = (int(cdf[s - 1]) << sh) if s > 0 else 0
        self.encode(fl, int(cdf[s]) << sh, ft << sh)

    def encode_bool_q15(self, val, fz):
        if val:
            self.encode(fz, 32768, 32768)
        else:
            self.encode(0, fz, 32768)

    def encode_uint(self, fl, ft):
        from .coder import EC_UINT_BITS, uniform_cdf_q15

        fl = int(fl)
        ft = int(ft)
        if ft > 1 << EC_UINT_BITS:
            ft -= 1
            ftb = _ilog(ft) - EC_UINT_BITS
            ft1 = (ft >> ftb) + 1
            self.encode_cdf_q15(fl >> ftb, uniform_cdf_q15(ft1))
            self.encode_bits(fl & ((1 << ftb) - 1), ftb)
        else:
            self.encode_cdf_q15(fl, uniform_cdf_q15(ft))

    def encode_bits(self, fl, ftb):
        if ftb:
            self._lib.dtpu_enc_bits(self._h, int(fl), int(ftb))

    def tell(self):
        return self._lib.dtpu_enc_tell(self._h)

    def tell_frac(self):
        return self._lib.dtpu_enc_tell_frac(self._h)

    def checkpoint(self):
        st = (ctypes.c_int64 * 7)()
        self._lib.dtpu_enc_checkpoint(self._h, st)
        return bytes(st)

    def rollback(self, state):
        st = (ctypes.c_int64 * 7).from_buffer_copy(state)
        self._lib.dtpu_enc_rollback(self._h, st)

    def __reduce__(self):
        n = self._lib.dtpu_enc_serialize(self._h, None, 0)
        buf = ctypes.create_string_buffer(n)
        self._lib.dtpu_enc_serialize(self._h, buf, n)
        return (_enc_from_state, (buf.raw,))

    def done(self) -> bytes:
        n = self._lib.dtpu_enc_done(self._h, None, 0)
        buf = ctypes.create_string_buffer(n)
        self._lib.dtpu_enc_done(self._h, buf, n)
        return buf.raw


def _enc_from_state(blob: bytes) -> "NativeRangeEncoder":
    enc = NativeRangeEncoder.__new__(NativeRangeEncoder)
    enc._lib = _load()
    enc._h = enc._lib.dtpu_enc_deserialize(blob, len(blob))
    return enc


def _dec_from_state(data: bytes, blob: bytes) -> "NativeRangeDecoder":
    dec = NativeRangeDecoder.__new__(NativeRangeDecoder)
    dec._lib = _load()
    dec._data = ctypes.create_string_buffer(bytes(data), len(data))
    st = (ctypes.c_int64 * 8).from_buffer_copy(blob)
    dec._h = dec._lib.dtpu_dec_deserialize(dec._data, len(data), st)
    dec._raw = bytes(data)
    dec.error = int(st[7])
    return dec


class NativeRangeDecoder:
    def __init__(self, data: bytes):
        self._lib = _load()
        if not self._lib:
            raise RuntimeError("native EC library not available")
        self._data = ctypes.create_string_buffer(bytes(data), len(data))
        self._h = self._lib.dtpu_dec_create(self._data, len(data))
        self._raw = bytes(data)
        self.error = 0

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dtpu_dec_destroy(self._h)
            self._h = None

    def _dec(self, cdf, ft, sh):
        if isinstance(cdf, np.ndarray) and cdf.flags["C_CONTIGUOUS"]:
            if cdf.dtype == np.int32:
                return self._lib.dtpu_dec_symbol32(
                    self._h, cdf.ctypes.data_as(ctypes.c_void_p),
                    len(cdf), int(ft), int(sh))
            if cdf.dtype == np.int64:
                return self._lib.dtpu_dec_symbol64(
                    self._h, cdf.ctypes.data_as(ctypes.c_void_p),
                    len(cdf), int(ft), int(sh))
        arr = np.ascontiguousarray(cdf, dtype=np.uint16)
        return self._lib.dtpu_dec_symbol(
            self._h, arr.ctypes.data_as(ctypes.c_void_p), len(arr),
            int(ft), int(sh))

    def __reduce__(self):
        st = (ctypes.c_int64 * 8)()
        self._lib.dtpu_dec_serialize(self._h, st)
        return (_dec_from_state, (self._raw, bytes(st)))

    def decode_cdf_q15(self, cdf):
        return self._dec(cdf, 32768, 0)

    def decode_cdf_unscaled(self, cdf):
        ft = int(cdf[-1])
        return self._dec(cdf, ft, 15 - _ilog(ft - 1))

    def decode_bool_q15(self, fz):
        return self._dec(np.array([fz, 32768], dtype=np.uint16), 32768, 0)

    def decode_uint(self, ft):
        from .coder import EC_UINT_BITS, uniform_cdf_q15

        ft = int(ft)
        if ft > 1 << EC_UINT_BITS:
            ft -= 1
            ftb = _ilog(ft) - EC_UINT_BITS
            ft1 = (ft >> ftb) + 1
            t = self.decode_cdf_q15(uniform_cdf_q15(ft1))
            t = (t << ftb) | self.decode_bits(ftb)
            if t <= ft:
                return t
            self.error = 1
            return ft
        return self.decode_cdf_q15(uniform_cdf_q15(ft))

    def decode_bits(self, ftb):
        if not ftb:
            return 0
        return int(self._lib.dtpu_dec_bits(self._h, int(ftb)))
