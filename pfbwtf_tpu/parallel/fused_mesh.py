"""Fused multi-chip pipeline: the single-chip HBM-chained design, sharded.

The staged mesh path (pfbwt_mesh.py) distributes the SORTS but keeps the
per-element emission metadata as O(n) host numpy between them.  This module
instead runs the same architecture as the fused single-chip chain
(ops/fused.py) across a `jax.sharding.Mesh`:

  FM-J2   sharded parse: halo-exchange cut scan, on-device cut compaction
          and phrase-row gathers per shard, COLLECTIVE dictionary
          union/rank (two-phase sample-sort over ICI) — exactly
          parallel/dict_union.distributed_parse_records.
  FM-J3a  ONE dict/phrase-scale program (these are unit-sized for the
          pan-genome inputs PFP targets, so sharding them buys nothing and
          costs collectives): parse-BWT (doubling SA + wrap permutes +
          ilist), generalized dict suffix sort with exact equality
          captures, and the COMPACTED EMITTER TABLES — per emitting
          suffix: first emission slot, group id, BWT-char flags, and the
          ilist-slot base.  Shares emission_state with the single-chip
          assembly (ops/bwt_jax.py) so every single-chip win carries over.
  FM-J3e  sharded emission: each device owns a contiguous slice of the
          n+1 emission lanes and builds its lanes' single-operand sort
          keys ((gid, j) with the 9 flag bits riding below j — unique per
          lane, so order-safe) by one searchsorted into the replicated
          emitter tables plus an ilist gather.  No total-length array is
          ever resident on a single device.
  FM-sort one distributed stable sample-sort of the keys
          (parallel/dsort.dsort_blocks: splitter agreement + all_to_all
          over ICI), then a sharded decode program turns each device's
          sorted key block into its .bwt/.sa shard.

Host traffic: O(#phrases) parse metadata + O(dict) bytes + the final
sharded outputs — never an O(n) intermediate.

Reference analogue: merge_pfp.cpp:97-152 + pfbwt.hpp:97-194 folded into
one distributed program chain.  Byte parity vs the host path is gated on
the 8-device CPU mesh by tests/test_fused_mesh.py.
"""

from functools import partial
from typing import Optional

import numpy as np

from ..constants import EndOfDict
from ..ops.bwt import BWTResult
from ..ops.parse import ParserParams
from .dict_union import distributed_parse_records
from .dsort import _round_up, dsort_blocks

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _bucket(n: int, floor: int = 1 << 12) -> int:
    if n <= floor:
        return floor
    step = max(floor, 1 << (max(int(np.floor(np.log2(n))) - 3, 0)))
    return -(-n // step) * step


# --------------------------------------------------------------------------
# FM-J3a: dict/phrase-scale single program -> emitter tables
# --------------------------------------------------------------------------


def _j3a_core(
    dict_flat, occs, ranks_p, last_p, sai_p,
    nphrases, nsuf_true, total_true,
    w: int, nsuf_b: int, total_b: int, impl: str,
    n_levels: int = None, alphabet: str = "byte",
):
    import jax.numpy as jnp

    from ..ops.bwt_jax import dict_sort_part, emission_state
    from ..ops.parse_bwt import parse_bwt_core
    from ..ops.suffix import compact_indices_jax

    D_b = dict_flat.shape[0]
    it = jnp.int32 if max(D_b, total_b) < 2**31 - 2 else jnp.int64
    bwlast, ilist, bwsai, _ = parse_bwt_core(
        ranks_p, last_p, sai_p, nphrases, impl=impl
    )
    ss = dict_sort_part(dict_flat, w, impl, n_levels=n_levels,
                        alphabet=alphabet)
    (
        sa_kept, suf_valid, ls, gid, u, counts, first, flags, ls_tab,
        seg_u,
    ) = emission_state(
        dict_flat, occs, nsuf_true, w, nsuf_b, it, ss
    )
    # compact the emitting suffixes (counts > 0), preserving lex order:
    # firstE is then strictly increasing and searchsorted-able; pads get
    # a sentinel past every real lane so they are never selected
    emit = counts > it(0)
    eix = compact_indices_jax(emit, nsuf_b, fill=0)
    nemit = jnp.sum(emit.astype(it))
    kvalid = jnp.arange(nsuf_b, dtype=it) < nemit
    sent = it(total_b + 1)
    firstE = jnp.where(kvalid, first[eix], sent)
    gidE = jnp.where(kvalid, gid[eix], it(0))
    flagsE = jnp.where(kvalid, flags[eix], it(0))
    baseE = jnp.where(kvalid, (seg_u - first)[eix], it(0))
    return firstE, gidE, flagsE, baseE, ls_tab, bwlast, ilist, bwsai


_j3a_jits = {}


# --------------------------------------------------------------------------
# FM-J3e: sharded emission key build + sharded decode
# --------------------------------------------------------------------------


def _key_body(firstE, gidE, flagsE, baseE, ilist, total_true,
              *, axis: str, W: int, KB: int, nsuf_b: int):
    import jax
    import jax.numpy as jnp

    it = firstE.dtype.type
    m_b = ilist.shape[0]
    my = jax.lax.axis_index(axis).astype(jnp.int64)
    e = (my * W + jnp.arange(W, dtype=jnp.int64)).astype(firstE.dtype)
    # owning emitter: the last k with firstE[k] <= e (firstE[0] == 0)
    k = jnp.clip(
        jnp.searchsorted(firstE, e, side="right") - 1, 0, nsuf_b - 1
    )
    gid = gidE[k]
    flags = flagsE[k]
    slot = jnp.clip(baseE[k] + e, 0, m_b - 1)
    E_j = ilist.astype(firstE.dtype)[slot]
    key = (
        (gid.astype(jnp.int64) << (KB + 9))
        | (E_j.astype(jnp.int64) << 9)
        | flags.astype(jnp.int64)
    )
    valid = e.astype(jnp.int64) < total_true
    key_u = jnp.where(
        valid, key.astype(jnp.uint64), jnp.uint64(_U64MAX)
    )
    pos = jnp.where(valid, e.astype(jnp.int64), jnp.int64(-1))
    del it
    return key_u[None], pos[None]


def _decode_body(key_blk, ls_tab, bwlast, bwsai, *, KB: int, nsuf_b: int):
    import jax.numpy as jnp

    from ..ops.bwt_jax import _emit_decode

    it = ls_tab.dtype.type
    key = key_blk[0]
    invalid = key == jnp.uint64(_U64MAX)
    k = jnp.where(invalid, jnp.uint64(0), key).astype(jnp.int64)
    fl_ord = (k & 511).astype(ls_tab.dtype)
    j_ord = ((k >> 9) & jnp.int64((1 << KB) - 1)).astype(ls_tab.dtype)
    gid_ord = (k >> (KB + 9)).astype(ls_tab.dtype)
    ls_ord = ls_tab[jnp.clip(gid_ord, 0, nsuf_b - 1)]
    bwtc, sa_vals = _emit_decode(
        fl_ord, j_ord, ls_ord, bwlast, bwsai, bwlast.shape[0], it
    )
    bwtc = jnp.where(invalid, jnp.uint8(0), bwtc)
    sa_vals = jnp.where(invalid, jnp.uint64(0), sa_vals)
    return bwtc[None], sa_vals[None]


_shard_jits = {}


def _shard_programs(mesh, axis, key_stat, kind):
    import jax
    from jax.sharding import PartitionSpec as P

    ck = (id(mesh), axis, kind, tuple(sorted(key_stat.items())))
    if ck in _shard_jits:
        return _shard_jits[ck]
    if kind == "key":
        fn = jax.jit(
            jax.shard_map(
                partial(_key_body, axis=axis, **key_stat),
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(), P()),
                out_specs=(P(axis, None), P(axis, None)),
            )
        )
    else:
        fn = jax.jit(
            jax.shard_map(
                partial(_decode_body, **key_stat),
                mesh=mesh,
                in_specs=(P(axis, None), P(), P(), P()),
                out_specs=(P(axis, None), P(axis, None)),
            )
        )
    _shard_jits[ck] = fn
    return fn


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------


def pfbwt_fused_mesh_records(
    records,
    params: ParserParams,
    mesh,
    axis: str = "dp",
    want_sa: bool = False,
    want_rssa: bool = False,
    sa_dtype=np.uint64,
) -> BWTResult:
    """Full distributed pipeline over FASTA records: sharded parse +
    collective dict union (FM-J2), dict-scale emitter-table program
    (FM-J3a), sharded emission keys + distributed sample-sort + sharded
    decode (FM-J3e).  Byte-identical to the host/single-chip paths."""
    import jax
    import jax.numpy as jnp

    w = params.w
    res = distributed_parse_records(records, params, mesh)
    return _fused_mesh_from_parse(
        res, w, mesh, axis, want_sa, want_rssa, sa_dtype, jax, jnp
    )


def _fused_mesh_from_parse(
    res, w, mesh, axis, want_sa, want_rssa, sa_dtype, jax, jnp
):
    from ..ops.suffix import sort_impl

    n = res.n
    dict_flat = res.dict_flat()
    occs = np.asarray(res.occs, dtype=np.int64)
    ranks = np.asarray(res.parse_ranks, dtype=np.int64)
    D_true = int(occs.shape[0])
    D = int(dict_flat.shape[0])
    nphrases = int(ranks.shape[0])
    nsuf = int((D - 1 - D_true) - D_true * w)
    total = n + 1

    D_b = _bucket(D)
    nph_b = _bucket(nphrases)
    nsuf_b = _bucket(nsuf)
    total_b = _bucket(total)
    n_dev = mesh.devices.size

    it_np = (
        np.int32 if max(D_b, total_b) < 2**31 - 2 else np.int64
    )

    def pad(a, size, fill=0):
        out = np.full(size, fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    impl = sort_impl()
    from ..ops.fused import capture_levels

    # invariant guard (ADVICE r4): max_len below assumes a separator-
    # terminated dict byte array; an unterminated tail word would
    # undersize n_levels and silently corrupt the equality captures
    if D == 0 or dict_flat[-1] > 1:
        raise ValueError(
            "fused_mesh: dict_flat must end with a separator byte "
            "(EndOfWord/EndOfDict)"
        )
    seps = np.flatnonzero(dict_flat <= 1)
    max_len = (
        int(np.diff(np.concatenate(([-1], seps))).max()) - 1
        if seps.size
        else 1
    )
    from ..ops.bwt_jax import dict_alphabet_of_bytes

    alphabet = dict_alphabet_of_bytes(dict_flat)
    n_levels = capture_levels(max_len, w, alphabet)
    key3 = (w, D_b, nph_b, nsuf_b, total_b, impl, n_levels, alphabet)
    if key3 not in _j3a_jits:
        _j3a_jits[key3] = jax.jit(
            partial(
                _j3a_core, w=w, nsuf_b=nsuf_b, total_b=total_b, impl=impl,
                n_levels=n_levels, alphabet=alphabet,
            )
        )
    firstE, gidE, flagsE, baseE, ls_tab, bwlast, ilist, bwsai = _j3a_jits[
        key3
    ](
        jnp.asarray(pad(dict_flat, D_b, EndOfDict)),
        jnp.asarray(pad(occs, nph_b)),
        jnp.asarray(pad(ranks, nph_b)),
        jnp.asarray(pad(np.asarray(res.last, np.uint8), nph_b)),
        jnp.asarray(pad(np.asarray(res.sai, np.uint64), nph_b)),
        jnp.int64(nphrases),
        jnp.int64(nsuf),
        jnp.int64(total),
    )

    m_b = int(ilist.shape[0])
    KB = int(np.ceil(np.log2(m_b + 2)))
    nsuf_bits = int(np.ceil(np.log2(nsuf_b + 2)))
    if nsuf_bits + KB + 9 > 63:
        # single-operand key would overflow 63 bits: fall back to the
        # staged mesh path (exact at any width)
        import warnings

        from .pfbwt_mesh import mesh_assemble_bwt, mesh_parse_bwt

        warnings.warn(
            "fused-mesh emission key exceeds 63 bits; using the staged "
            "mesh path",
            stacklevel=2,
        )
        pb = mesh_parse_bwt(res.parse_ranks, res.last, res.sai, mesh, axis)
        return mesh_assemble_bwt(
            dict_flat, w, occs, pb.bwlast, pb.ilist, pb.bwsai, n, mesh,
            axis, want_sa=want_sa, want_rssa=want_rssa, sa_dtype=sa_dtype,
        )

    # FM-J3e: sharded lanes -> keys -> distributed sample-sort -> decode
    W = _round_up(max(-(-total_b // n_dev), 64), 64)
    key_fn = _shard_programs(
        mesh, axis, {"W": W, "KB": KB, "nsuf_b": nsuf_b}, "key"
    )
    key_blk, pos_blk = key_fn(
        firstE, gidE, flagsE, baseE, ilist, jnp.int64(total)
    )
    key_s, _pos_s = dsort_blocks(mesh, axis, key_blk, pos_blk)
    dec_fn = _shard_programs(
        mesh, axis, {"KB": KB, "nsuf_b": nsuf_b}, "decode"
    )
    bwt_blk, sa_blk = dec_fn(key_s, ls_tab, bwlast, bwsai)

    key_h = np.asarray(key_s).reshape(-1)
    keep = key_h != _U64MAX
    bwtc = np.asarray(bwt_blk).reshape(-1)[keep]
    assert bwtc.shape[0] == total, (
        f"fused-mesh emission count {bwtc.shape[0]} != n+1 ({total})"
    )
    sa_np = np.asarray(sa_blk).reshape(-1)[keep] if (
        want_sa or want_rssa
    ) else None
    del it_np
    return _finalize_host(
        bwtc, sa_np, n, total, want_sa, want_rssa, sa_dtype
    )


def _finalize_host(bwtc, sa_np, n, total, want_sa, want_rssa, sa_dtype):
    run_start = np.empty(total, dtype=bool)
    run_start[0] = True
    np.not_equal(bwtc[1:], bwtc[:-1], out=run_start[1:])
    nruns = int(np.count_nonzero(run_start))
    sa_out = ssa = esa = None
    if sa_np is not None:
        sa_np = np.array(sa_np)
        sa_np[0] = np.uint64(n)
        if want_rssa:
            rs = np.flatnonzero(run_start)
            re = np.concatenate((rs[1:] - 1, [total - 1]))
            ssa = np.empty(2 * rs.shape[0], dtype=sa_dtype)
            ssa[0::2] = rs.astype(sa_dtype)
            ssa[1::2] = sa_np[rs].astype(sa_dtype)
            esa = np.empty(2 * re.shape[0], dtype=sa_dtype)
            esa[0::2] = re.astype(sa_dtype)
            esa[1::2] = sa_np[re].astype(sa_dtype)
        sa_out = sa_np if want_sa else None
    return BWTResult(
        bwt=bwtc, sa=sa_out, nruns=nruns, ssa=ssa, esa=esa
    )
