"""Pallas TPU kernel for the windowed Wang-hash cut scan.

The XLA-fused jnp path (ops/hash.py) relies on jax_enable_x64 uint64
emulation; this kernel instead carries the 64-bit k-mer/hash as explicit
uint32 (lo, hi) pairs — the TPU's native integer width — and streams the
code array HBM->VMEM block-by-block with a manual halo DMA (each position's
window needs the previous w-1 chars, so block i copies
[i*BLK, i*BLK + BLK + HALO) from a left-padded buffer).

Emits the cut mask as int8.  Constraints: w <= 32 (the 2-bit k-mer register,
hash.hpp:26-27), p < 2**15 (the mod-p fold below).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 32  # max window w


def _add64(alo, ahi, blo, bhi):
    rlo = alo + blo
    carry = (rlo < alo).astype(jnp.uint32)
    return rlo, ahi + bhi + carry


def _shl64(lo, hi, k: int):
    if k == 0:
        return lo, hi
    if k >= 32:
        return jnp.zeros_like(lo), lo << (k - 32)
    return lo << k, (hi << k) | (lo >> (32 - k))


def _shr64(lo, hi, k: int):
    if k == 0:
        return lo, hi
    if k >= 32:
        return hi >> (k - 32), jnp.zeros_like(hi)
    return (lo >> k) | (hi << (32 - k)), hi >> k


def _xor64(alo, ahi, blo, bhi):
    return alo ^ blo, ahi ^ bhi


def _wang64(lo, hi):
    """wang_hash (hash.hpp:12-21) on (lo, hi) uint32 pairs."""
    ones = jnp.uint32(0xFFFFFFFF)
    # key = ~key + (key << 21)
    slo, shi = _shl64(lo, hi, 21)
    lo, hi = _add64(lo ^ ones, hi ^ ones, slo, shi)
    # key ^= key >> 24
    lo, hi = _xor64(lo, hi, *_shr64(lo, hi, 24))
    # key = key + (key << 3) + (key << 8)
    s3 = _shl64(lo, hi, 3)
    s8 = _shl64(lo, hi, 8)
    lo, hi = _add64(lo, hi, *s3)
    lo, hi = _add64(lo, hi, *s8)
    # key ^= key >> 14
    lo, hi = _xor64(lo, hi, *_shr64(lo, hi, 14))
    # key = key + (key << 2) + (key << 4)
    s2 = _shl64(lo, hi, 2)
    s4 = _shl64(lo, hi, 4)
    lo, hi = _add64(lo, hi, *s2)
    lo, hi = _add64(lo, hi, *s4)
    # key ^= key >> 28
    lo, hi = _xor64(lo, hi, *_shr64(lo, hi, 28))
    # key = key + (key << 31)
    lo, hi = _add64(lo, hi, *_shl64(lo, hi, 31))
    return lo, hi


def _kernel(hbm_ref, out_ref, scratch, sem, *, w: int, p: int, blk: int):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        hbm_ref.at[:, pl.ds(i * blk, blk + HALO)], scratch, sem
    )
    dma.start()
    dma.wait()
    ext = scratch[:].astype(jnp.uint32)  # (1, blk + HALO)
    klo = jnp.zeros((1, blk), jnp.uint32)
    khi = jnp.zeros((1, blk), jnp.uint32)
    # char t steps back occupies k-mer bits [2t, 2t+2); 2-bit chars never
    # straddle the 32-bit boundary.  Static slices (offsets are Python
    # constants) — lax.dynamic_slice is not lowerable in Pallas TC kernels.
    for t in range(w):
        c = ext[:, HALO - t: HALO - t + blk]
        if 2 * t < 32:
            klo = klo | (c << (2 * t))
        else:
            khi = khi | (c << (2 * t - 32))
    hlo, hhi = _wang64(klo, khi)
    # h mod p via 2**32 fold: (hi % p) * (2**32 % p) + lo % p, p < 2**15
    fold = jnp.uint32((1 << 32) % p)
    m = ((hhi % p) * fold + hlo % p) % p
    out_ref[:] = (m == 0).astype(jnp.int8)


@partial(jax.jit, static_argnames=("w", "p", "blk", "interpret"))
def _scan(padded, w: int, p: int, blk: int, interpret: bool):
    n_blocks = (padded.shape[1] - HALO) // blk
    return pl.pallas_call(
        partial(_kernel, w=w, p=p, blk=blk),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_blocks * blk), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((1, blk + HALO), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)


def hash_scan_pallas(codes: np.ndarray, w: int, p: int, blk: int = 1 << 19,
                     interpret: bool = False) -> np.ndarray:
    """Cut mask for a code array (values 0..3).  Positions < w are masked
    off by the caller-visible contract (k >= w), handled here."""
    import sys

    # Mosaic lowering recurses per jaxpr equation; the unrolled u32-pair
    # Wang arithmetic overflows CPython's default 1000-frame limit
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    assert w <= HALO and p < (1 << 15)
    n = codes.shape[0]
    n_blocks = -(-n // blk)
    padded = np.zeros((1, HALO + n_blocks * blk), dtype=np.uint8)
    padded[0, HALO : HALO + n] = codes
    out = _scan(jnp.asarray(padded), w, p, blk, interpret)
    cut = np.asarray(out)[0, :n].astype(bool)
    cut[:w] = False
    return cut
