"""Distributed sort / gather primitives + distributed prefix doubling.

These are the collective building blocks that push pipeline stages 2-3
(the parse suffix sort and the dict suffix sort + emission sort — the
reference's sacak_int/gsacak roles, gsa/gsacak.c:2499,2504) across a
device mesh instead of one chip.

Data convention: every primitive works on (n_dev, cap) blocks sharded over
one mesh axis.  Invalid slots carry -1 in EVERY int64 operand and
0xFF..FF in uint64 key operands.  Exchanges are two-phase: a count
program sizes the all_to_all with exact per-pair capacities (O(N)
aggregate buffers instead of the padded all_to_all's O(n_dev*N)).

Primitives:
  dsort_blocks          global sample-sort of (key, payload...) — output
                        block-major sorted, ragged per-device counts
  dense_ranks           0-based dense group ids over sorted blocks
                        (ppermute boundary stitch + all_gather base scan)
  route_to_slots        exact scatter of (pos, val) to position-block
                        owners — the inverse-permutation step of a round
  dist_gather           out[tag] = table[idx] for a position-sharded
                        table — request/reply routing
  distributed_doubling  Manber-Myers over the mesh: log n rounds of
                        (rank, rank[i+k]) sample-sorts; identical SA to
                        ops/suffix._doubling_jax
"""

from functools import partial

import numpy as np

from ..ops.suffix import compact_indices_jax as _compact

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_PROGRAMS = {}


def _round_up(n: int, step: int) -> int:
    return -(-n // step) * step


# --------------------------------------------------------------------------
# shard_map bodies
# --------------------------------------------------------------------------


def _sort_bucket(key, valid, *, axis: str, n_dev: int, cap: int):
    """Sample-sort bucket ids: n_dev-1 global splitters from local regular
    samples (deterministic in the data, so the count and exchange programs
    agree without extra communication)."""
    import jax
    import jax.numpy as jnp

    k0 = jnp.where(valid, key, _U64MAX)
    nvalid = jnp.sum(valid.astype(jnp.int64))
    sortk = jnp.sort(k0)
    pos = (jnp.arange(1, n_dev + 1, dtype=jnp.int64) * nvalid) // (n_dev + 1)
    samples = sortk[jnp.clip(pos, 0, cap - 1)]
    all_sorted = jnp.sort(jax.lax.all_gather(samples, axis).reshape(-1))
    sp = (jnp.arange(1, n_dev, dtype=jnp.int64) * (n_dev * n_dev)) // n_dev
    return jnp.searchsorted(all_sorted[sp], k0, side="right")


def _counts_of(bucket, valid, n_dev: int):
    import jax.numpy as jnp

    return jnp.zeros(n_dev, jnp.int64).at[bucket].add(
        valid.astype(jnp.int64), mode="drop"
    )


def _count_sort_body(key_blk, pay_blk, *, axis: str, n_dev: int, cap: int):
    key, pay = key_blk[0], pay_blk[0]
    valid = pay >= 0
    bucket = _sort_bucket(key, valid, axis=axis, n_dev=n_dev, cap=cap)
    return _counts_of(bucket, valid, n_dev)[None]


def _count_route_body(pos_blk, *, axis: str, n_dev: int, cap: int, W: int):
    import jax.numpy as jnp

    pos = pos_blk[0]
    valid = pos >= 0
    bucket = jnp.clip(pos // W, 0, n_dev - 1)
    return _counts_of(bucket, valid, n_dev)[None]


def _exchange(key_u64, pays, bucket, valid, *, axis: str, n_dev: int,
              pair_cap: int, cap: int):
    """Route (key, payloads...) rows to their buckets; returns receive-side
    flat arrays of length n_dev * pair_cap (U64MAX / -1 padding)."""
    import jax
    import jax.numpy as jnp

    sel = jnp.stack([
        _compact((bucket == d) & valid, pair_cap, fill=cap)
        for d in range(n_dev)
    ])  # (n_dev, pair_cap)
    flat = sel.reshape(-1)
    sk = jnp.take(key_u64, flat, mode="fill", fill_value=_U64MAX).reshape(
        n_dev, pair_cap
    )
    outs = [jax.lax.all_to_all(sk, axis, 0, 0, tiled=True).reshape(-1)]
    for p in pays:
        sp = jnp.take(p, flat, mode="fill", fill_value=-1).reshape(
            n_dev, pair_cap
        )
        outs.append(
            jax.lax.all_to_all(sp, axis, 0, 0, tiled=True).reshape(-1)
        )
    return outs


def _dsort_body(key_blk, *pay_blks, axis: str, n_dev: int, cap: int,
                pair_cap: int):
    import jax.numpy as jnp

    key = key_blk[0]
    pays = [p[0] for p in pay_blks]
    valid = pays[0] >= 0
    bucket = _sort_bucket(key, valid, axis=axis, n_dev=n_dev, cap=cap)
    rk, *rpays = _exchange(key, pays, bucket, valid, axis=axis,
                           n_dev=n_dev, pair_cap=pair_cap, cap=cap)
    # stable order: break key ties by the first payload (position) so the
    # output permutation is deterministic across mesh sizes
    order = jnp.lexsort((rpays[0], rk))
    return tuple([rk[order][None]] + [p[order][None] for p in rpays])


def _route_body(pos_blk, val_blk, *, axis: str, n_dev: int, cap: int,
                pair_cap: int, W: int):
    """Scatter (pos, val) to the owner of position block pos // W; each
    device materializes its dense (W,) int64 value slab."""
    import jax.numpy as jnp

    pos, val = pos_blk[0], val_blk[0]
    valid = pos >= 0
    key_u = jnp.where(valid, pos.astype(jnp.uint64), _U64MAX)
    bucket = jnp.clip(pos // W, 0, n_dev - 1)
    rpos, rval = _exchange(key_u, [val], bucket, valid, axis=axis,
                           n_dev=n_dev, pair_cap=pair_cap, cap=cap)
    rvalid = rpos != _U64MAX
    slot = jnp.where(rvalid, rpos.astype(jnp.int64) % W, W)
    out = jnp.zeros(W, jnp.int64).at[slot].add(
        jnp.where(rvalid, rval, 0), mode="drop"
    )
    return out[None]


def _dense_body(key_blk, *, axis: str, n_dev: int, cap: int):
    """0-based dense group ids over globally block-major-sorted keys.
    Padding (U64MAX keys) forms its own trailing group; callers mask by
    payload validity."""
    import jax
    import jax.numpy as jnp

    key = key_blk[0]
    my = jax.lax.axis_index(axis)
    prev_last = jax.lax.ppermute(
        key[-1:], axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    prevk = jnp.concatenate((prev_last, key[:-1]))
    # padding (U64MAX) rows open no group: otherwise each device's padding
    # tail would consume a group id and the ids would stop being dense over
    # the valid keys (breaking the all-distinct termination check)
    is_pad = key == _U64MAX
    changed = ((key != prevk) & ~is_pad).astype(jnp.int64)
    changed = changed.at[0].set(
        jnp.where((my == 0) & ~is_pad[0], 1, changed[0])
    )
    local = jnp.cumsum(changed)
    bases = jax.lax.all_gather(local[-1], axis)
    base = jnp.sum(jnp.where(jnp.arange(n_dev) < my, bases, 0))
    return (base + local - 1)[None]


def _gather_req_body(idx_blk, tag_blk, table_blk, *, axis: str, n_dev: int,
                     cap: int, pair_cap: int, W: int):
    """Request half of dist_gather: route (idx, tag) to the table shard
    owning idx, look up, return (tag, val) receive arrays for the reply."""
    import jax.numpy as jnp

    idx, tag = idx_blk[0], tag_blk[0]
    table = table_blk[0]
    valid = (idx >= 0) & (tag >= 0)
    key_u = jnp.where(valid, idx.astype(jnp.uint64), _U64MAX)
    bucket = jnp.clip(idx // W, 0, n_dev - 1)
    ridx, rtag = _exchange(key_u, [tag], bucket, valid, axis=axis,
                           n_dev=n_dev, pair_cap=pair_cap, cap=cap)
    rvalid = ridx != _U64MAX
    val = jnp.where(
        rvalid,
        table[jnp.clip(ridx.astype(jnp.int64) % W, 0, W - 1)],
        jnp.int64(-1),
    )
    return jnp.where(rvalid, rtag, -1)[None], val[None]


def _max_body(blk, *, axis: str, n_dev: int, cap: int):
    # all_gather + max instead of lax.pmax: the axon remote TPU compiler
    # only lowers Sum all-reduces
    import jax
    import jax.numpy as jnp

    return jnp.max(jax.lax.all_gather(jnp.max(blk[0]), axis))[None, None]


def _program(name, body, mesh, axis, nin, nout, **stat):
    import jax
    from jax.sharding import PartitionSpec as P

    key = (name, mesh, axis, nin, nout, tuple(sorted(stat.items())))
    if key not in _PROGRAMS:
        out_specs = (
            tuple(P(axis, None) for _ in range(nout)) if nout > 1
            else P(axis, None)
        )
        _PROGRAMS[key] = jax.jit(
            jax.shard_map(
                partial(body, axis=axis, **stat),
                mesh=mesh,
                in_specs=tuple(P(axis, None) for _ in range(nin)),
                out_specs=out_specs,
            )
        )
    return _PROGRAMS[key]


# --------------------------------------------------------------------------
# host-callable primitives (blocks stay device-resident between programs)
# --------------------------------------------------------------------------


def dsort_blocks(mesh, axis, key_blk, *pay_blks):
    """Global sample-sort; returns (key, payload...) blocks, block-major
    sorted with ragged per-device counts (U64MAX keys / -1 payloads last).
    Key ties break by the first payload, so with position payloads the
    result is the stable sort."""
    n_dev, cap = key_blk.shape
    counts = np.asarray(
        _program("csort", _count_sort_body, mesh, axis, 2, 1,
                 n_dev=n_dev, cap=cap)(key_blk, pay_blks[0])
    )
    pair_cap = max(64, _round_up(int(counts.max(initial=0)), 64))
    fn = _program("dsort", _dsort_body, mesh, axis, 1 + len(pay_blks),
                  1 + len(pay_blks), n_dev=n_dev, cap=cap,
                  pair_cap=pair_cap)
    return fn(key_blk, *pay_blks)


def _route_pair_cap(mesh, axis, pos_blk, W):
    n_dev, cap = pos_blk.shape
    counts = np.asarray(
        _program("croute", _count_route_body, mesh, axis, 1, 1,
                 n_dev=n_dev, cap=cap, W=W)(pos_blk)
    )
    return max(64, _round_up(int(counts.max(initial=0)), 64))


def route_to_slots(mesh, axis, pos_blk, val_blk, W: int):
    """Dense (n_dev, W) int64 array with out[pos] = val (each slot written
    at most once; unwritten slots 0)."""
    n_dev, cap = pos_blk.shape
    pair_cap = _route_pair_cap(mesh, axis, pos_blk, W)
    fn = _program("route", _route_body, mesh, axis, 2, 1,
                  n_dev=n_dev, cap=cap, pair_cap=pair_cap, W=W)
    return fn(pos_blk, val_blk)


def dense_ranks(mesh, axis, key_blk):
    """0-based dense group ids over block-major sorted key blocks."""
    n_dev, cap = key_blk.shape
    return _program("dense", _dense_body, mesh, axis, 1, 1,
                    n_dev=n_dev, cap=cap)(key_blk)


def dist_gather(mesh, axis, table_blk, idx_blk, tag_blk, W: int,
                out_W: int):
    """out[tag] = table[idx] for a position-sharded int64 table.  idx/tag
    use -1 padding; out is a dense (n_dev, out_W) slab."""
    n_dev, cap = idx_blk.shape
    pair_cap = _route_pair_cap(mesh, axis, idx_blk, W)
    fn = _program("gather_req", _gather_req_body, mesh, axis, 3, 2,
                  n_dev=n_dev, cap=cap, pair_cap=pair_cap, W=W)
    rtag, val = fn(idx_blk, tag_blk, table_blk)
    return route_to_slots(mesh, axis, rtag, val, out_W)


def global_max(mesh, axis, blk) -> int:
    n_dev, cap = blk.shape
    return int(
        np.asarray(
            _program("max", _max_body, mesh, axis, 1, 1,
                     n_dev=n_dev, cap=cap)(blk)
        ).flat[0]
    )


# --------------------------------------------------------------------------
# distributed prefix doubling
# --------------------------------------------------------------------------


def _ckey_body(rank_blk, *, axis: str, n_dev: int, W: int, q: int, r: int,
               n: int):
    """One doubling round's packed sort key, fully on device:
    ckey[i] = rank[i]*(n+1) + rank[i+k]+1 with k = q*W + r, where the
    rank[i+k] gather is a global left shift done with two ring ppermutes
    plus static slices.  Positions >= n get U64MAX keys."""
    import jax
    import jax.numpy as jnp

    rank = rank_blk[0]
    my = jax.lax.axis_index(axis)

    def from_shard(dq):
        perm = [(i, (i - dq) % n_dev) for i in range(n_dev)]
        return jax.lax.ppermute(rank, axis, perm)

    a = from_shard(q % n_dev)
    if r > 0:
        b = from_shard((q + 1) % n_dev)
        shifted = jnp.concatenate((a[r:], b[:r]))
    else:
        shifted = a
    gpos = my.astype(jnp.int64) * W + jnp.arange(W, dtype=jnp.int64)
    key2 = jnp.where(gpos + (q * W + r) < n, shifted, jnp.int64(-1))
    ck = (rank * jnp.int64(n + 1) + key2 + 1).astype(jnp.uint64)
    ck = jnp.where(gpos < n, ck, _U64MAX)
    pos = jnp.where(gpos < n, gpos, jnp.int64(-1))
    return ck[None], pos[None]


def distributed_doubling(seq: np.ndarray, mesh, axis: str = "dp"):
    """SA of an int64 sequence (non-negative values, unique minimum last)
    over the mesh — identical to ops/suffix._doubling_jax's order, computed
    with sample-sorts and exact position routing.  The host drives the
    rounds; bulk arrays stay device-resident between programs."""
    seq = np.asarray(seq, dtype=np.int64)
    n = seq.shape[0]
    n_dev = mesh.devices.size
    W = _round_up(max(-(-n // n_dev), 64), 64)
    total = n_dev * W

    pos0 = np.arange(total, dtype=np.int64)
    pos0[pos0 >= n] = -1
    pos_blk = pos0.reshape(n_dev, W)
    key0 = np.full(total, -1, dtype=np.int64)
    key0[:n] = seq
    key0_u = key0.astype(np.uint64).reshape(n_dev, W)  # -1 -> U64MAX

    sk, spos = dsort_blocks(mesh, axis, key0_u, pos_blk)
    gid = dense_ranks(mesh, axis, sk)
    rank_blk = route_to_slots(mesh, axis, spos, gid, W)

    k = 1
    while k < n:
        if global_max(mesh, axis, rank_blk) >= n - 1:
            break
        q, r = divmod(k, W)
        ck, posb = _program(
            "ckey", _ckey_body, mesh, axis, 1, 2,
            n_dev=n_dev, W=W, q=q, r=r, n=n,
        )(rank_blk)
        sk, spos = dsort_blocks(mesh, axis, ck, posb)
        gid = dense_ranks(mesh, axis, sk)
        rank_blk = route_to_slots(mesh, axis, spos, gid, W)
        k *= 2

    # SA = positions sorted by final rank (a permutation: ties impossible
    # except padding)
    rank_np = np.asarray(rank_blk).reshape(-1)
    key = np.full(total, -1, dtype=np.int64)
    key[:n] = rank_np[:n]
    _, spos = dsort_blocks(
        mesh, axis, key.astype(np.uint64).reshape(n_dev, W), pos_blk
    )
    spos = np.asarray(spos).reshape(-1)
    return spos[spos >= 0][:n]
