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


def _kmer_log_packed(ext_u32, w: int):
    """k-mer register for every lane of the halo-extended block with
    O(log w) lane rotates instead of w.

    pack_{2^b}[i] packs chars [i-2^b+1 .. i] into 2*2^b bits; each doubling
    is one rotate + shift + or.  The k-mer of width w then ORs one pack per
    set bit of w, each rotated by the cumulative width below it.  For the
    default w=10 that is 4 rotates (vs 10 in the per-offset form — the
    round-1 kernel's dominant VMEM traffic).  Requires 2w <= 32 (the u32
    register); rotate wraparound lands in lanes < HALO <= LEAD and is
    sliced away by the caller.
    """
    packs = {1: ext_u32}
    width = 1
    while width * 2 <= w:
        prev = packs[width]
        packs[width * 2] = prev | (
            pltpu.roll(prev, jnp.int32(width), 1) << (2 * width)
        )
        width *= 2
    km = None
    covered = 0
    for b in sorted((1 << i for i in range(6)), reverse=True):
        if w & b:
            part = packs[b]
            if covered:
                part = pltpu.roll(part, jnp.int32(covered), 1) << (
                    2 * covered
                )
            km = part if km is None else (km | part)
            covered += b
    return km


def _kernel(halo_ref, body_ref, out_ref, *, w: int, p: int, cols: int):
    # halo: (ROWS, LEAD) chars preceding each row; body: (ROWS, cols).
    # Concatenating in VMEM replaces the round-1 design's host-side
    # overlapping-row gather (an expensive dynamic gather in XLA) with two
    # cheap strided block loads.
    ext = jnp.concatenate(
        (halo_ref[:], body_ref[:]), axis=1
    ).astype(jnp.uint32)
    if 2 * w <= 32:
        klo = _kmer_log_packed(ext, w)[:, LEAD: LEAD + cols]
        khi = jnp.zeros((ROWS, cols), jnp.uint32)
    else:
        klo = jnp.zeros((ROWS, cols), jnp.uint32)
        khi = jnp.zeros((ROWS, cols), jnp.uint32)
        # wide-window fallback: per-offset rotates (w > 16 is rare)
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

    The stream reshapes to (R, cols) body rows; each row's LEAD-char halo
    is the previous row's tail — one pad + slice, NO gather (the round-1
    kernel fed an overlapping-row gather, which dominated its runtime).
    Kernel blocks stay tile-aligned: 32 sublanes for uint8, lane dims
    multiples of 128.
    """
    cols = blk // ROWS
    R = (padded.shape[0] - LEAD) // cols
    body = padded[LEAD:].reshape(R, cols)
    halo = jnp.concatenate(
        (padded[:LEAD][None, :], body[:-1, cols - LEAD:]), axis=0
    )
    grid = R // ROWS

    def idx(i):
        # literal 0 would trace as int64 under jax_enable_x64 and Mosaic
        # rejects the mixed (i32, i64) index tuple at func.return
        return (i, jnp.int32(0))

    return pl.pallas_call(
        partial(_kernel, w=w, p=p, cols=cols),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((ROWS, LEAD), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, cols), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, cols), idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, cols), jnp.int32),
        interpret=interpret,
    )(halo, body).reshape(-1)


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
