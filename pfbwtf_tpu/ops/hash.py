"""Wang hash + rolling 2-bit k-mer window, vectorized.

The reference rolls one char at a time through a stateful hasher
(hash.hpp:23-43).  The TPU-native formulation is stateless and positionwise:
the k-mer ending at position i depends only on chars [i-w+1, i], so every
position's k-mer is computed with w shifted ORs over the whole array and the
Wang mix is applied elementwise on the VPU.  That turns the reference's
inherently serial hot loop 1 (pfparser.hpp:345-351) into a pure map.

Bit layout matches hash.hpp:32: newest char occupies bits [0:2), a char t
steps back occupies bits [2t:2t+2).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.tables import NTOA_TABLE
from ..utils.errors import die

_U64 = np.uint64


_ALL_ONES = _U64(0xFFFFFFFFFFFFFFFF)


def wang_hash_np(key: np.ndarray) -> np.ndarray:
    """Wang 64-bit integer mix (hash.hpp:12-21), mod 2**64.

    (~key is spelled key^0xFF..F: numpy's uint64 invert ufunc hits a slow
    fallback path in this environment — 100x slower than xor.)
    """
    key = np.asarray(key, dtype=_U64)
    key = (key ^ _ALL_ONES) + (key << _U64(21))
    key = key ^ (key >> _U64(24))
    key = (key + (key << _U64(3))) + (key << _U64(8))
    key = key ^ (key >> _U64(14))
    key = (key + (key << _U64(2))) + (key << _U64(4))
    key = key ^ (key >> _U64(28))
    key = key + (key << _U64(31))
    return key


def window_kmers_np(codes: np.ndarray, w: int) -> np.ndarray:
    """2-bit packed k-mer ending at each position.

    Positions i < w-1 pack fewer than w chars (missing high bits are zero),
    mirroring the reference's warm-up behavior where the rolling register
    starts at 0 ('A'-filled).
    """
    n = codes.shape[0]
    km = np.zeros(n, dtype=_U64)
    c = codes.astype(_U64)
    for t in range(w):
        km[t:] |= c[: n - t] << _U64(2 * t)
    return km


def hash_scan_np(chars_u8: np.ndarray, w: int, p: int):
    """(codes, hashes, cut-mask) for a char stream.

    A cut happens AFTER stream position k (0-based) iff k >= w and
    wang(kmer_k) % p == 0 — the `pos_ > w && hash % p == 0` condition of
    pfparser.hpp:347 restated for a stream that excludes the leading Dollar.
    """
    codes = NTOA_TABLE[chars_u8]
    if codes.max(initial=0) > 3:
        bad = chars_u8[codes > 3][0]
        die(f"invalid character {bad}/{chr(bad)} in input (use --non-acgt-to-a)")
    km = window_kmers_np(codes, w)
    h = wang_hash_np(km)
    cut = (h % _U64(p)) == 0
    cut[:w] = False
    return codes, h, cut


# -- JAX path ----------------------------------------------------------------

def wang_hash_jax(key):
    key = key.astype(jnp.uint64)
    key = (~key) + (key << 21)
    key = key ^ (key >> 24)
    key = (key + (key << 3)) + (key << 8)
    key = key ^ (key >> 14)
    key = (key + (key << 2)) + (key << 4)
    key = key ^ (key >> 28)
    key = key + (key << 31)
    return key


def window_kmers_jax(codes, w: int):
    n = codes.shape[0]
    # the k-mer register fits 32 bits for w <= 16 (the default w=10 case):
    # build it in uint32 — half the emulated-64-bit shift/or traffic —
    # and widen once for the Wang mix
    dt = jnp.uint32 if 2 * w <= 32 else jnp.uint64
    c = codes.astype(dt)
    km = jnp.zeros(n, dtype=dt)
    for t in range(w):
        shifted = jnp.pad(c[: n - t], (t, 0)) << dt(2 * t)
        km = km | shifted
    return km.astype(jnp.uint64)


def mod_p_u64_via_u32(h, p: int):
    """h mod p for uint64 h and constant p < 2**15, in uint32 arithmetic.

    (hi % p) * (2**32 % p) + (lo % p) fits u32 (< p**2 + p <= 2**30), so
    the whole reduction runs as 32-bit mod-by-constant — which XLA
    strength-reduces to magic multiplies — instead of an emulated 64-bit
    long division (the scan's hottest op after the Wang mix).
    """
    hi = (h >> jnp.uint64(32)).astype(jnp.uint32)
    lo = h.astype(jnp.uint32)
    p32 = jnp.uint32(p)
    fold = jnp.uint32((1 << 32) % p)
    return ((hi % p32) * fold + lo % p32) % p32


def hash_scan_jax(codes, w: int, p: int, start_offset=0):
    """Device-side cut mask over a code array (values 0..3).

    ``start_offset`` is the absolute stream position of codes[0]; the k>=w
    warm-up suppression only applies near the stream start, which makes this
    kernel directly shardable: interior shards pass their offset and the
    suppression vanishes.

    Returns (hashes, cut_mask).  The caller is responsible for halo handling
    (each position needs the w-1 previous chars).
    """
    km = window_kmers_jax(codes, w)
    h = wang_hash_jax(km)
    idx = jnp.arange(codes.shape[0], dtype=jnp.int64) + start_offset
    if p < (1 << 15):
        hit = mod_p_u64_via_u32(h, p) == 0
    else:
        hit = (h % jnp.uint64(p)) == 0
    cut = hit & (idx >= w)
    return h, cut
