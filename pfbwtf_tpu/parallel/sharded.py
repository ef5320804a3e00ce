"""Multi-chip sharded parse: the data-parallel hash scan with halo exchange.

The reference's only distribution mechanism is a process pool over haplotype
FASTAs plus a serial thread merge (SURVEY.md §2.4).  The TPU-native design
shards the *character stream* across a device mesh:

* Each device holds a contiguous text shard; the k-mer at the first w-1
  positions of a shard needs the previous shard's tail, so shards exchange
  a (w-1)-char halo over ICI with `jax.lax.ppermute` — the collective
  analogue of operator+='s junction re-hash (pfparser.hpp:226-245), exact
  for the same reason that merge is exact.
* Cut masks are computed locally (pure map); occurrence statistics are
  reduced with `psum`.
* Dictionary dedup/rank across shards then rides the same global sorts as
  the single-chip path (jax.lax.sort is collective-aware under shard_map
  constraints; the current implementation gathers cut masks and runs the
  dict build once — the global distributed sort is the planned next step).

The step below is the unit the driver compile-checks over an N-device mesh.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.hash import mod_p_u64_via_u32, wang_hash_jax, window_kmers_jax


def make_parse_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _shard_parse_block(codes_blk, w: int, p: int, shard_len: int, axis: str):
    """Per-device body: halo exchange + windowed hash + cut mask + stats.

    codes_blk: (1, shard_len) uint8 block of 2-bit codes (0..3).
    Returns (cut_mask (1, shard_len) bool, local phrase count (1,) int64).
    """
    codes = codes_blk[0]
    n_sh = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    halo = w - 1
    # receive the previous shard's tail (ring shift right); shard 0 receives
    # shard n-1's tail but masks it off below via the absolute-position guard
    tail = codes[-halo:] if halo > 0 else codes[:0]
    prev_tail = jax.lax.ppermute(
        tail, axis, [(i, (i + 1) % n_sh) for i in range(n_sh)]
    )
    ext = jnp.concatenate((prev_tail, codes))  # (halo + shard_len,)
    # windowed 2-bit pack + Wang mix + u32-fold mod (ops/hash.py); the
    # shared kmer builder zero-pads its warm-up, which the true halo in
    # ext overrides for every live position
    km = window_kmers_jax(ext, w)[halo:]
    h = wang_hash_jax(km)
    gpos = idx * shard_len + jnp.arange(shard_len, dtype=jnp.int64)
    if p < (1 << 15):
        hit = mod_p_u64_via_u32(h, p) == 0
    else:
        hit = (h % jnp.uint64(p)) == 0
    cut = hit & (gpos >= w)
    nphrases = jnp.sum(cut.astype(jnp.int64))
    total = jax.lax.psum(nphrases, axis)
    return cut[None, :], total[None]


def sharded_cut_mask(codes: np.ndarray, w: int, p: int, mesh: Mesh,
                     axis: str = "dp"):
    """Compute the global cut mask for a code array on a device mesh.

    Pads the stream to a multiple of the mesh size with 'A' codes (0); the
    caller must ignore cuts beyond the true length.  Returns (cut_mask,
    total_phrase_count) with the mask laid out shard-major.
    """
    n_dev = mesh.devices.size
    n = codes.shape[0]
    shard_len = -(-n // n_dev)
    padded = np.zeros(n_dev * shard_len, dtype=np.uint8)
    padded[:n] = codes
    blocks = padded.reshape(n_dev, shard_len)

    fn = jax.jit(
        jax.shard_map(
            partial(_shard_parse_block, w=w, p=p, shard_len=shard_len,
                    axis=axis),
            mesh=mesh,
            in_specs=P(axis, None),
            out_specs=(P(axis, None), P(axis)),
        )
    )
    cut, totals = fn(blocks)
    cut = np.asarray(cut).reshape(-1)[:n]
    return cut, int(np.asarray(totals)[0])


def _shard_phrase_sketch(codes_blk, w: int, p: int, shard_len: int,
                         axis: str, sketch_bits: int):
    """Per-device phrase-occurrence sketch, psum-reduced across the mesh.

    Each device hashes the phrase *end-window* k-mer of every local cut into
    a 2**sketch_bits-bucket count array (scatter-add) and the mesh psums the
    sketches — the collective skeleton of the distributed dictionary union
    (SURVEY.md §2.4 row 2: all-gather/psum phrase sets): identical phrases
    hash to identical buckets no matter which shard saw them, so the global
    sketch equals the single-stream sketch exactly.
    """
    cut, _ = _shard_parse_block(codes_blk, w, p, shard_len, axis)
    codes = codes_blk[0]
    n_sh = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    halo = w - 1
    tail = codes[-halo:] if halo > 0 else codes[:0]
    prev_tail = jax.lax.ppermute(
        tail, axis, [(i, (i + 1) % n_sh) for i in range(n_sh)]
    )
    ext = jnp.concatenate((prev_tail, codes))
    km = window_kmers_jax(ext, w)[halo:]
    h = wang_hash_jax(km)
    nbuckets = 1 << sketch_bits
    bucket = (h >> jnp.uint64(40)).astype(jnp.int64) % nbuckets
    local = jnp.zeros(nbuckets, jnp.int64).at[bucket].add(
        cut[0].astype(jnp.int64)
    )
    return jax.lax.psum(local, axis)[None, :]


def sharded_phrase_sketch(codes: np.ndarray, w: int, p: int, mesh: Mesh,
                          sketch_bits: int = 16, axis: str = "dp"):
    """Global phrase-window sketch over the mesh (see _shard_phrase_sketch)."""
    n_dev = mesh.devices.size
    n = codes.shape[0]
    shard_len = -(-n // n_dev)
    padded = np.zeros(n_dev * shard_len, dtype=np.uint8)
    padded[:n] = codes
    blocks = padded.reshape(n_dev, shard_len)
    fn = jax.jit(
        jax.shard_map(
            partial(_shard_phrase_sketch, w=w, p=p, shard_len=shard_len,
                    axis=axis, sketch_bits=sketch_bits),
            mesh=mesh,
            in_specs=P(axis, None),
            out_specs=P(axis, None),
        )
    )
    out = np.asarray(fn(blocks))
    return out[0]


def sharded_parse_step(w: int, p: int, mesh: Mesh, shard_len: int,
                       axis: str = "dp"):
    """The jittable multi-chip step (what dryrun_multichip exercises):
    blocks (n_dev, shard_len) -> (cut masks, global phrase count)."""
    return jax.jit(
        jax.shard_map(
            partial(_shard_parse_block, w=w, p=p, shard_len=shard_len,
                    axis=axis),
            mesh=mesh,
            in_specs=P(axis, None),
            out_specs=(P(axis, None), P(axis)),
        )
    )
