"""Pallas TPU kernel for the windowed Wang-hash cut scan.

The XLA-fused jnp path (ops/hash.py) relies on jax_enable_x64 uint64
emulation; this kernel instead carries the 64-bit k-mer/hash as explicit
uint32 (lo, hi) pairs — the TPU's native integer width.  The code stream
is laid out as overlapping halo rows (row r starts LEAD chars before
stream position r*cols), so every block is pure tile-aligned vector
compute with standard BlockSpec pipelining.

Emits the cut mask as int32 — narrowing casts cannot live inside the
kernel (see _kernel).  Constraints: w <= 32 (the 2-bit k-mer register,
hash.hpp:26-27), p < 2**15 (the mod-p fold below).

Mosaic lowering rules this kernel works around (verified on the real
chip, 2026-08; interpret mode does NOT catch any of them):
* lax.dynamic_slice is unimplemented in TC kernels -> static slices only
* jnp.mod / jnp.floor_divide on int recurse infinitely in
  convert_element_type lowering -> lax.rem (equal for unsigned)
* any int -> int8 cast recurses the same way -> int32 outputs
* (1, N) uint8 buffers fail sublane tiling alignment -> (32k, 128m)
  blocks (the 8-bit sublane tile is 32 rows; lane dim multiple of 128)
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 32  # max window w
LEAD = 128  # per-row halo lead, lane-aligned (>= HALO)
ROWS = 32  # sublane tile: rows per kernel block (8-bit dtype tile is 32)


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


def _kernel(x_ref, out_ref, *, w: int, p: int, cols: int):
    ext = x_ref[:].astype(jnp.uint32)  # (ROWS, cols + LEAD)
    klo = jnp.zeros((ROWS, cols), jnp.uint32)
    khi = jnp.zeros((ROWS, cols), jnp.uint32)
    # char t steps back occupies k-mer bits [2t, 2t+2); 2-bit chars never
    # straddle the 32-bit boundary.  The shifted windows come from a
    # hardware lane rotate + LANE-ALIGNED slice (offset LEAD = 128):
    # unaligned overlapping slices (ext[:, LEAD-t : LEAD-t+cols]) compile
    # but produce wrong values on real TPUs — interpret mode does not
    # catch it.  Wraparound lanes land in columns < t <= HALO < LEAD and
    # are sliced away.  The shift must be int32 (tpu.dynamic_rotate
    # rejects the i64 that a bare Python int becomes under x64).
    for t in range(w):
        c = pltpu.roll(ext, jnp.int32(t), 1)[:, LEAD: LEAD + cols]
        if 2 * t < 32:
            klo = klo | (c << (2 * t))
        else:
            khi = khi | (c << (2 * t - 32))
    hlo, hhi = _wang64(klo, khi)
    # h mod p via 2**32 fold: (hi % p) * (2**32 % p) + lo % p, p < 2**15.
    # lax.rem, NOT jnp.mod: unsigned rem == mod, and jnp.mod's
    # floor-correction graph hits an infinitely-recursing
    # convert_element_type in Mosaic lowering on current runtimes
    def mod_p(x):
        return jax.lax.rem(x, jnp.full_like(x, jnp.uint32(p)))

    fold = jnp.uint32((1 << 32) % p)
    m = mod_p(mod_p(hhi) * fold + mod_p(hlo))
    # int32 mask output: ANY int->int8 convert_element_type inside a TC
    # kernel recurses infinitely in Mosaic lowering on current runtimes
    # (trunci branch is version-gated off; _convert_helper self-recurses),
    # so the narrow cast happens outside the kernel
    out_ref[:] = jnp.where(m == 0, jnp.int32(1), jnp.int32(0))


@partial(jax.jit, static_argnames=("w", "p", "blk", "interpret"))
def _scan(padded, w: int, p: int, blk: int, interpret: bool):
    """padded: (LEAD + R*cols,) uint8 stream with a LEAD-char lead.

    XLA gathers the stream into a (R, cols + LEAD) matrix whose row r
    starts LEAD chars before stream position r*cols (overlapping halo
    rows), so the kernel body is pure tiled vector compute — no manual
    DMA, no (1, N) buffers, and every block dim is tile-aligned
    (32 sublanes for uint8, lane dim a multiple of 128).
    """
    cols = blk // ROWS
    R = (padded.shape[0] - LEAD) // cols
    rows_idx = jnp.arange(R, dtype=jnp.int32)[:, None] * cols
    col_idx = jnp.arange(cols + LEAD, dtype=jnp.int32)[None, :]
    X = padded[rows_idx + col_idx]  # row r covers stream[r*cols - LEAD ...]
    grid = R // ROWS

    def idx(i):
        # literal 0 would trace as int64 under jax_enable_x64 and Mosaic
        # rejects the mixed (i32, i64) index tuple at func.return
        return (i, jnp.int32(0))

    return pl.pallas_call(
        partial(_kernel, w=w, p=p, cols=cols),
        grid=(grid,),
        in_specs=[pl.BlockSpec((ROWS, cols + LEAD), idx,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, cols), idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, cols), jnp.int32),
        interpret=interpret,
    )(X).reshape(-1)


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
    assert blk % ROWS == 0 and (blk // ROWS) % 128 == 0
    n = codes.shape[0]
    n_blocks = -(-n // blk)
    padded = np.zeros(LEAD + n_blocks * blk, dtype=np.uint8)
    padded[LEAD: LEAD + n] = codes
    out = _scan(jnp.asarray(padded), w, p, blk, interpret)
    cut = np.asarray(out)[:n].astype(bool)
    cut[:w] = False
    return cut
