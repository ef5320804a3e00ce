"""Stable LSD radix argsort on device — the lax.sort alternative.

``jax.lax.sort`` lowers to a bitonic network on TPU: O(log^2 n) full-array
compare-exchange sweeps (~530 at n=8M).  The doubling/emission sorts
(ops/suffix.py, ops/bwt_jax.py — the pipeline's FLOP centers, reference
roles gsa/gsacak.c:2499,2504) sort keys whose range is bounded by the
STATIC padded array size, so a least-significant-digit radix sort needs
only ceil(nbits/b) counting passes — ~12 at n=8M with b=4 — each built
from cumsums (VPU-friendly) plus one unique-index scatter.

TPU-shaped choices:

* No 64-bit keys anywhere: the doubling round key is (rank, key2), two
  int32 operands sorted by two LSD phases (low key first) instead of the
  rank*(n+1)+key2 int64 pack — TPU has no native u64, so 64-bit shifts
  and compares are emulated pairs (the round-1 scan lesson: hunt u64 ops
  off the hot path first).
* Within-bucket ranks come from 2^b cumsums per pass (a static Python
  loop — XLA fuses the mask+cumsum chain), not a one-hot (n, 2^b)
  matrix: at n=8M a one-hot int32 blow-up would be 2^b * 32 MB of HBM
  traffic anyway, with worse locality.
* The permutation is applied with ``.at[dest].set(..., unique_indices
  =True)`` — dest is a permutation by construction, letting XLA skip
  the collision protocol.

Whether the scatter beats the bitonic network is an empirical question
per size; ``benchmarks/sort_bench.py`` measures both on the real chip
and ``PFBWT_SORT_IMPL`` selects the engine default.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _counting_pass(digit, arrays, nbuckets: int):
    """One stable counting-sort pass by ``digit`` (int32 in [0, nbuckets)).

    Returns ``arrays`` reordered.  within-bucket rank via one cumsum per
    bucket; global bucket offsets via the buckets' total counts.
    """
    n = digit.shape[0]
    within = jnp.zeros(n, jnp.int32)
    counts = []
    for v in range(nbuckets):
        m = digit == v
        c = jnp.cumsum(m.astype(jnp.int32))
        within = jnp.where(m, c - 1, within)
        counts.append(c[-1])
    counts = jnp.stack(counts)
    offsets = jnp.concatenate(
        (jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1])
    )
    dest = offsets[digit] + within
    return [
        jnp.zeros_like(a)
        .at[dest]
        .set(a, unique_indices=True, mode="promise_in_bounds")
        for a in arrays
    ]


def _lsd_phase(key, carried, nbits: int, bits: int):
    """Stable LSD radix over one int32 key; key itself is carried too."""
    nb = 1 << bits
    mask = jnp.int32(nb - 1)
    for shift in range(0, nbits, bits):
        digit = (key >> jnp.int32(shift)) & mask
        key, *carried = _counting_pass(digit, [key, *carried], nb)
    return key, carried


@partial(jax.jit, static_argnames=("nbits_hi", "nbits_lo", "bits"))
def radix_argsort_pair(hi, lo, nbits_hi: int, nbits_lo: int, bits: int = 4):
    """Stable argsort by (hi, lo), both int32 with values < 2**nbits_*.

    Two LSD phases (low key first — LSD stability makes the second phase
    the primary key).  Returns int32 ``order`` with keys[order] sorted.
    """
    n = hi.shape[0]
    order = jnp.arange(n, dtype=jnp.int32)
    hi = hi.astype(jnp.int32)
    lo, carried = _lsd_phase(lo.astype(jnp.int32), [hi, order], nbits_lo, bits)
    hi, order = carried
    _, carried = _lsd_phase(hi, [order], nbits_hi, bits)
    return carried[0]


@partial(jax.jit, static_argnames=("nbits", "bits"))
def radix_argsort_u32(key, nbits: int, bits: int = 4):
    """Stable argsort of one int32 key with values < 2**nbits."""
    n = key.shape[0]
    order = jnp.arange(n, dtype=jnp.int32)
    _, carried = _lsd_phase(key.astype(jnp.int32), [order], nbits, bits)
    return carried[0]


def key_bits(n: int) -> int:
    """Bits needed for values in [0, n]."""
    return max(int(np.ceil(np.log2(max(n, 1) + 1))), 1)
