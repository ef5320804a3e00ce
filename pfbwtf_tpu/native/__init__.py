"""ctypes loader for the native SA-IS kernel (native/sais.cpp).

Builds the shared library on first use (g++ -O3 -shared); the build is
cached next to the source.  Raises PfbwtError if no toolchain is available
— callers fall back to the numpy/JAX paths.
"""

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ..utils.errors import PfbwtError

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "sais.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libsais.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-std=c++14", "-O3", "-fPIC", "-shared", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise PfbwtError(f"native sais build failed: {e}")
    return _SO


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.sais_int.restype = ctypes.c_int
        lib.sais_int.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.sais_u8.restype = ctypes.c_int
        lib.sais_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.sais_int_lcp.restype = ctypes.c_int
        lib.sais_int_lcp.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.sais_int32.restype = ctypes.c_int
        lib.sais_int32.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.sais_int_lcp32.restype = ctypes.c_int
        lib.sais_int_lcp32.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.rank_substrings.restype = ctypes.c_int
        lib.rank_substrings.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except PfbwtError:
        return False


def suffix_array_ints_native(seq: np.ndarray) -> np.ndarray:
    """SA of an int sequence with unique 0 terminator (sacak_int role)."""
    lib = load()
    s = np.ascontiguousarray(np.asarray(seq, dtype=np.int64))
    n = s.shape[0]
    sa = np.empty(n, dtype=np.int64)
    K = int(s.max()) + 1 if n else 1
    rc = lib.sais_int(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        K,
    )
    if rc != 0:
        raise PfbwtError(f"sais_int failed with code {rc}")
    return sa


def suffix_array_u8_native(text: np.ndarray) -> np.ndarray:
    """SA of a byte string with unique 0 terminator."""
    lib = load()
    s = np.ascontiguousarray(np.asarray(text, dtype=np.uint8))
    n = s.shape[0]
    sa = np.empty(n, dtype=np.int64)
    rc = lib.sais_u8(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
    )
    if rc != 0:
        raise PfbwtError(f"sais_u8 failed with code {rc}")
    return sa


def dict_suffix_sort_native(dict_flat: np.ndarray):
    """Generalized dict suffix order (gsacak role) via the same symbol
    remapping the doubling kernels use (ops/suffix.py)."""
    from ..ops.suffix import dict_initial_symbols_np

    sym, word_id, suf_len, dwords = dict_initial_symbols_np(dict_flat)
    sa = suffix_array_ints_native(sym.astype(np.int64))
    return sa, word_id, suf_len, dwords


def dict_suffix_sort_lcp_native(dict_flat: np.ndarray):
    """Generalized dict SA + LCP (the gsacak(SA, LCP) role).  With distinct
    separator symbols the LCP counts only real matched chars, so suffix
    equality groups are exactly (len equal) & (lcp >= len).  Uses the
    32-bit kernel instantiation whenever sizes fit."""
    from ..ops.suffix import dict_initial_symbols_np

    lib = load()
    sym, word_id, suf_len, dwords = dict_initial_symbols_np(dict_flat)
    n = sym.shape[0]
    K = int(sym.max()) + 1 if n else 1
    if n < 2**31 - 2 and K < 2**31 - 2:
        s = np.ascontiguousarray(sym.astype(np.int32))
        sa = np.empty(n, dtype=np.int32)
        lcp = np.empty(n, dtype=np.int32)
        rc = lib.sais_int_lcp32(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lcp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
            K,
        )
    else:
        s = np.ascontiguousarray(sym.astype(np.int64))
        sa = np.empty(n, dtype=np.int64)
        lcp = np.empty(n, dtype=np.int64)
        rc = lib.sais_int_lcp(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lcp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            K,
        )
    if rc != 0:
        raise PfbwtError(f"sais_int_lcp failed with code {rc}")
    return sa, lcp, word_id, suf_len, dwords


def rank_substrings_native(T: np.ndarray, starts: np.ndarray,
                           lens: np.ndarray):
    """1-based byte-lex dense ranks of substrings (equal substrings share a
    rank); returns (ranks, ndistinct)."""
    lib = load()
    T = np.ascontiguousarray(np.asarray(T, dtype=np.uint8))
    starts = np.ascontiguousarray(np.asarray(starts, dtype=np.int64))
    lens = np.ascontiguousarray(np.asarray(lens, dtype=np.int64))
    m = starts.shape[0]
    ranks = np.empty(m, dtype=np.int64)
    nd = ctypes.c_int64(0)
    rc = lib.rank_substrings(
        T.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        T.shape[0],
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        m,
        ranks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(nd),
    )
    if rc != 0:
        raise PfbwtError(f"rank_substrings failed with code {rc}")
    return ranks, int(nd.value)
