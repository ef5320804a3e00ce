"""Exact distributed dictionary union/rank: a collective string sample-sort.

The reference merges shard dictionaries by folding PfParser::operator+= in
threads (src/merge_pfp.cpp:97-152): every phrase of every shard lands in one
std::map, which both dedups and byte-lex ranks them.  The TPU-native
equivalent is a *distributed string sort* over the device mesh — one
all_to_all on ICI replaces the shared-memory map:

1. Every device holds a slab of phrase occurrences as fixed-width rows of
   big-endian 8-byte chunks (zero-padded past the phrase end).  Valid phrase
   bytes are >= Dollar == 2, so chunk-wise uint64 order == strcmp order; and
   because the PFP dictionary is prefix-free with no 0x00/0x01 bytes inside
   phrases, padded-row equality == phrase equality.
2. Devices agree on n_dev-1 splitters by regular sampling of the primary
   chunk (all_gather + sort of n_dev samples per device), route each row to
   its bucket with searchsorted(side='right') — equal keys always ride to
   the same device, so no phrase group ever straddles a device boundary —
   and exchange rows with a single tiled all_to_all.
3. Each device lex-sorts its received rows (one multi-operand lax.sort),
   marks group heads, and numbers groups globally with an exclusive scan of
   per-device unique counts (all_gather) — yielding the 1-based dictionary
   rank of every occurrence, byte-identical to the host sort
   (ops/parse._dedup_and_rank) and hence to the reference's
   pfparser.hpp:500-517 ranking.

Capacity note: the padded exchange reserves ``cap`` rows per (src, dst)
pair, so the received slab is n_dev * cap rows.  That is the simple exact
scheme; at pod scale the same program drops in `lax.ragged_all_to_all`
(send exactly the bucket counts) or a two-phase count+exchange.  Row width
is the longest phrase (expected ~p+w chars; p bounds the tail).
"""

from functools import partial
from typing import List

import numpy as np

from ..ops.parse import (
    ParserParams,
    ParseResult,
    _pack8,
    _tprime,
    build_stream,
    phrase_bounds_from_cuts,
)
from ..utils.errors import die

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _dict_rank_step(cols_blk, idx_blk, *, axis: str, n_dev: int, cap: int,
                    ncols: int):
    """Per-device body: splitter agreement + all_to_all route + local rank.

    cols_blk: (1, cap, ncols) uint64 big-endian chunk rows (U64MAX padding).
    idx_blk:  (1, cap) int64 global occurrence index (-1 padding).
    Returns (occ index, 1-based global rank) over the received slab.
    """
    import jax
    import jax.numpy as jnp

    cols = cols_blk[0]
    idx = idx_blk[0]
    valid = idx >= 0
    k0 = jnp.where(valid, cols[:, 0], _U64MAX)
    nvalid = jnp.sum(valid.astype(jnp.int64))

    # splitters: n_dev regular samples of the locally sorted primary chunk,
    # all-gathered and re-sampled globally
    sortk = jnp.sort(k0)
    pos = (jnp.arange(1, n_dev + 1, dtype=jnp.int64) * nvalid) // (n_dev + 1)
    samples = sortk[jnp.clip(pos, 0, cap - 1)]
    all_sorted = jnp.sort(jax.lax.all_gather(samples, axis).reshape(-1))
    sp_pos = (jnp.arange(1, n_dev, dtype=jnp.int64) * (n_dev * n_dev)) // n_dev
    splitters = all_sorted[sp_pos]

    # equal keys -> same bucket (side='right'), so groups never straddle
    bucket = jnp.searchsorted(splitters, k0, side="right")

    send_cols: List = []
    send_idx: List = []
    for d in range(n_dev):
        sel = jnp.nonzero((bucket == d) & valid, size=cap, fill_value=cap)[0]
        send_cols.append(
            jnp.take(cols, sel, axis=0, mode="fill", fill_value=_U64MAX)
        )
        send_idx.append(jnp.take(idx, sel, mode="fill", fill_value=-1))
    sc = jnp.stack(send_cols)  # (n_dev, cap, ncols)
    si = jnp.stack(send_idx)  # (n_dev, cap)

    rcols = jax.lax.all_to_all(sc, axis, 0, 0, tiled=True).reshape(
        n_dev * cap, ncols
    )
    ridx = jax.lax.all_to_all(si, axis, 0, 0, tiled=True).reshape(n_dev * cap)

    # local byte-lex sort (padding rows are all-U64MAX and sort last: valid
    # rows start with a byte <= 'Z' < 0xFF)
    order = jnp.lexsort(tuple(rcols[:, j] for j in range(ncols - 1, -1, -1)))
    scols = rcols[order]
    sidx = ridx[order]
    svalid = sidx >= 0
    diff = jnp.any(scols[1:] != scols[:-1], axis=1)
    head = jnp.concatenate((jnp.ones(1, bool), diff)) & svalid
    gid = jnp.cumsum(head.astype(jnp.int64)) - 1

    # global dense 1-based ranks: exclusive scan of per-device unique counts
    local_unique = jnp.sum(head.astype(jnp.int64))
    counts = jax.lax.all_gather(local_unique, axis)
    my = jax.lax.axis_index(axis)
    base = jnp.sum(jnp.where(jnp.arange(n_dev) < my, counts, 0))
    rank = jnp.where(svalid, base + gid + 1, 0)
    return sidx[None], rank[None]


def _rank_program(mesh, axis: str, n_dev: int, cap: int, ncols: int):
    import jax
    from jax.sharding import PartitionSpec as P

    return jax.jit(
        jax.shard_map(
            partial(_dict_rank_step, axis=axis, n_dev=n_dev, cap=cap,
                    ncols=ncols),
            mesh=mesh,
            in_specs=(P(axis, None, None), P(axis, None)),
            out_specs=(P(axis, None), P(axis, None)),
        )
    )


def _round_up(n: int, step: int) -> int:
    return -(-n // step) * step


def distributed_rank_rows(cols: np.ndarray, mesh, axis: str = "dp"):
    """Dense 1-based lexicographic group ranks of uint64 chunk rows,
    computed with mesh collectives.  Returns (ranks (N,), n_unique)."""
    cols = np.ascontiguousarray(cols, dtype=np.uint64)
    N, ncols = cols.shape
    n_dev = mesh.devices.size
    cap = _round_up(max(1, -(-N // n_dev)), 256)
    blk_cols = np.full((n_dev, cap, ncols), _U64MAX, dtype=np.uint64)
    blk_idx = np.full((n_dev, cap), -1, dtype=np.int64)
    flat_cols = blk_cols.reshape(n_dev * cap, ncols)
    flat_idx = blk_idx.reshape(n_dev * cap)
    flat_cols[:N] = cols
    flat_idx[:N] = np.arange(N, dtype=np.int64)

    fn = _rank_program(mesh, axis, n_dev, cap, ncols)
    out_idx, out_rank = fn(blk_cols, blk_idx)
    out_idx = np.asarray(out_idx).reshape(-1)
    out_rank = np.asarray(out_rank).reshape(-1)
    keep = out_idx >= 0
    ranks = np.zeros(N, dtype=np.int64)
    ranks[out_idx[keep]] = out_rank[keep]
    if N and ranks.min() < 1:
        die("distributed rank: unassigned occurrence (collective bug)")
    return ranks, int(ranks.max(initial=0))


def phrase_chunk_rows(T: np.ndarray, starts, ends) -> np.ndarray:
    """(N, ncols) big-endian 8-byte chunk rows of T[s..e] per phrase."""
    starts = np.asarray(starts, dtype=np.int64)
    lens = (np.asarray(ends, dtype=np.int64) - starts + 1)
    ncols = max(1, -(-int(lens.max(initial=1)) // 8))
    cols = np.empty((starts.shape[0], ncols), dtype=np.uint64)
    for j in range(ncols):
        cols[:, j] = _pack8(T, starts, 8 * j, lens)
    return cols


def _dict_from_ranks(T: np.ndarray, starts, ends, ranks: np.ndarray):
    """Host tail shared by the distributed and local device paths: flat
    (start, len) dict view + occurrence counts from 1-based ranks."""
    D = int(ranks.max(initial=0))
    occs = np.bincount(ranks, minlength=D + 1)[1:].astype(np.uint64)
    _, first = np.unique(ranks, return_index=True)
    lens = (ends - starts + 1).astype(np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    return starts[first], lens[first], occs, ranks.astype(np.uint32)


def distributed_dedup_rank(T: np.ndarray, starts, ends, mesh,
                           axis: str = "dp"):
    """Collective phrase dedup + byte-lex ranking.

    Returns (dict_starts, dict_lens, occs, parse_ranks) with identical
    semantics to ops.parse._dedup_and_rank (pfparser.hpp:484-517).
    """
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    cols = phrase_chunk_rows(T, starts, ends)
    ranks, _ = distributed_rank_rows(cols, mesh, axis)
    return _dict_from_ranks(T, starts, ends, ranks)


_local_rank_jit = None


def device_rank_rows(cols: np.ndarray) -> np.ndarray:
    """Single-device byte-lex group ranks of chunk rows: one multi-operand
    lax.sort + adjacent-compare in HBM (the no-mesh form of the collective
    rank; shapes are bucketed so compiled programs are reused)."""
    global _local_rank_jit
    import jax
    import jax.numpy as jnp

    if _local_rank_jit is None:

        @jax.jit
        def rank_rows(c):
            order = jnp.lexsort(
                tuple(c[:, j] for j in range(c.shape[1] - 1, -1, -1))
            )
            s = c[order]
            head = jnp.concatenate(
                (jnp.ones(1, bool), jnp.any(s[1:] != s[:-1], axis=1))
            )
            gid = jnp.cumsum(head.astype(jnp.int64))  # 1-based
            return jnp.zeros(c.shape[0], jnp.int64).at[order].set(gid)

        _local_rank_jit = rank_rows

    N, ncols = cols.shape
    ncols_b = -(-max(ncols, 1) // 4) * 4
    Nb = _round_up(max(N, 1), 4096)
    padded = np.zeros((Nb, ncols_b), dtype=np.uint64)
    padded[:N, :ncols] = cols
    padded[N:, :] = _U64MAX  # padding rows sort last (real bytes < 0xFF)
    return np.asarray(_local_rank_jit(padded))[:N]


_text_rank_jit = None


def dedup_rank_device(T: np.ndarray, starts, ends):
    """On-device phrase dedup+rank: ONE jit gathers the 8-byte chunk rows
    straight out of the text in HBM, lex-sorts them, and emits dense
    1-based ranks — no host-side row materialization (the device-resident
    pipeline path).  Shapes are bucketed for compile reuse."""
    global _text_rank_jit
    import jax
    import jax.numpy as jnp
    from functools import partial

    if _text_rank_jit is None:

        @partial(jax.jit, static_argnames=("ncols",))
        def text_rank(Tp, starts_p, lens_p, valid, ncols):
            Nb = starts_p.shape[0]
            tmax = Tp.shape[0] - 1
            cols = []
            for j in range(ncols):
                val = jnp.zeros(Nb, dtype=jnp.uint64)
                for b in range(8):
                    off = 8 * j + b
                    idx = jnp.minimum(starts_p + off, tmax)
                    ch = Tp[idx].astype(jnp.uint64)
                    ok = off < lens_p
                    val = (val << jnp.uint64(8)) | jnp.where(ok, ch, 0)
                cols.append(jnp.where(valid, val, _U64MAX))
            c = jnp.stack(cols, axis=1)
            order = jnp.lexsort(
                tuple(c[:, j] for j in range(ncols - 1, -1, -1))
            )
            s = c[order]
            head = jnp.concatenate(
                (jnp.ones(1, bool), jnp.any(s[1:] != s[:-1], axis=1))
            )
            gid = jnp.cumsum(head.astype(jnp.int64))  # 1-based
            return jnp.zeros(Nb, jnp.int64).at[order].set(gid)

        _text_rank_jit = text_rank

    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    lens = ends - starts + 1
    N = starts.shape[0]
    ncols = max(1, -(-int(lens.max(initial=1)) // 8))
    ncols_b = -(-ncols // 4) * 4
    Nb = _round_up(max(N, 1), 4096)
    Tb_len = _round_up(T.shape[0] + 1, 1 << 16)
    Tp = np.zeros(Tb_len, dtype=np.uint8)
    Tp[: T.shape[0]] = T
    starts_p = np.zeros(Nb, dtype=np.int64)
    starts_p[:N] = starts
    lens_p = np.zeros(Nb, dtype=np.int64)
    lens_p[:N] = lens
    valid = np.zeros(Nb, dtype=bool)
    valid[:N] = True
    ranks = np.asarray(
        _text_rank_jit(Tp, starts_p, lens_p, valid, ncols_b)
    )[:N]
    return _dict_from_ranks(T, starts, ends, ranks)


def distributed_parse_records(records, params: ParserParams, mesh,
                              axis: str = "dp") -> ParseResult:
    """Full collective parse: sharded halo-exchange hash scan for the cut
    mask + distributed sample-sort for the dictionary — the multi-chip
    equivalent of PfParser::add_fasta + finalize (pfparser.hpp:299-369,
    484-517), exact by the junction identity."""
    from ..utils.tables import NTOA_TABLE
    from .sharded import sharded_cut_mask

    C, doc_names, doc_starts = build_stream(records, params)
    codes = NTOA_TABLE[C]
    if codes.size and codes.max() > 3:
        bad = C[codes > 3][0]
        die(f"invalid character {bad}/{chr(bad)} in input "
            "(use --non-acgt-to-a)")
    cut, _ = sharded_cut_mask(codes, params.w, params.p, mesh, axis=axis)
    cuts = np.flatnonzero(cut)
    starts, ends = phrase_bounds_from_cuts(C.shape[0], cuts, params.w)
    if starts.shape[0] == 1:
        die("error: only one dict word total. Re-run with a smaller p "
            "modulus")
    from ..utils.limits import check_phrase_count

    check_phrase_count(starts.shape[0])
    T = _tprime(C, params.w)
    dict_starts, dict_lens, occs, parse_ranks = distributed_dedup_rank(
        T, starts, ends, mesh, axis
    )
    last = T[ends - params.w]
    sai = ends.astype(np.uint64)
    return ParseResult(
        params=params,
        text=T,
        dict_starts=dict_starts,
        dict_lens=dict_lens,
        occs=occs,
        parse_ranks=parse_ranks,
        last=last,
        sai=sai,
        doc_names=list(doc_names) if params.store_docs else [],
        doc_starts=list(doc_starts) if params.store_docs else [],
        pos=C.shape[0] + params.w,
        nseqs=len(records),
    )
