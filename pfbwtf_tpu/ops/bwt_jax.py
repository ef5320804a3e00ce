"""Device-side final BWT assembly.

Same emission-sort formulation as ops/bwt.py (see its docstring for the
derivation), with every large-array stage on device:

* generalized dict suffix order   -> prefix doubling (lax.sort rounds)
* suffix length per position      -> reverse cummin of separator indices
* kept-suffix compaction          -> jnp.nonzero with static size
* emission fan-out                -> jnp.repeat(total_repeat_length=n+1)
* final (group, parse-pos) order  -> one uint64 key argsort
* BWT char / SA sample            -> gathers

Suffix-equality groups use two independent 64-bit polynomial hashes
computed on host (exact mod-2**64 wraparound, two passes over the dict).
The numpy path (ops/bwt.py) byte-verifies group equality; the device path
relies on the 128-bit hash (collision odds ~2**-128 per adjacent pair) and
is cross-checked against the verified path in the test suite.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bwt import BWTResult
from .suffix import (
    _doubling_jax,
    _segmented_suffix_hashes_np,
    _HB1,
    _HB2,
)
from ..constants import EndOfDict, EndOfWord


@partial(jax.jit, static_argnames=("w", "nsuf", "total"))
def _assemble_device(
    dict_flat, occs, bwlast, ilist, bwsai, h1, h2, w: int, nsuf: int, total: int
):
    D = dict_flat.shape[0]
    iota = jnp.arange(D, dtype=jnp.int64)
    is_eow = dict_flat == EndOfWord
    is_sep = is_eow | (dict_flat == EndOfDict)
    word_id = jnp.concatenate(
        (jnp.zeros(1, jnp.int64), jnp.cumsum(is_eow.astype(jnp.int64))[:-1])
    )
    dwords = occs.shape[0]
    # initial doubling symbols: EndOfDict->0, i-th EOW->1+i, char c->dwords+1+c
    sym = dict_flat.astype(jnp.int64) + (dwords + 1)
    sym = jnp.where(is_eow, 1 + word_id, sym)
    sym = jnp.where(dict_flat == EndOfDict, 0, sym)
    sa_all, _ = _doubling_jax(sym)
    # suffix length = distance to the next separator (reverse cummin)
    sep_idx = jnp.where(is_sep, iota, D)
    next_sep = jax.lax.cummin(sep_idx, reverse=True)
    suf_len = next_sep - iota
    # keep suffixes longer than w, in lexicographic order
    kept_idx = jnp.nonzero(suf_len[sa_all] > w, size=nsuf)[0]
    sa_kept = sa_all[kept_idx]
    ls = suf_len[sa_kept]
    # equality groups via (len, h1, h2)
    eq = (
        (ls[1:] == ls[:-1])
        & (h1[sa_kept][1:] == h1[sa_kept][:-1])
        & (h2[sa_kept][1:] == h2[sa_kept][:-1])
    )
    gid = jnp.concatenate(
        (jnp.zeros(1, jnp.int64), jnp.cumsum((~eq).astype(jnp.int64)))
    )
    u = word_id[sa_kept]
    seg_start = jnp.concatenate(
        (jnp.ones(1, jnp.int64), 1 + jnp.cumsum(occs)[:-1])
    )
    counts = occs[u]
    E_suffix = jnp.repeat(
        jnp.arange(nsuf, dtype=jnp.int64), counts, total_repeat_length=total
    )
    first = jnp.concatenate((jnp.zeros(1, jnp.int64), jnp.cumsum(counts)[:-1]))
    within = jnp.arange(total, dtype=jnp.int64) - jnp.repeat(
        first, counts, total_repeat_length=total
    )
    E_j = ilist[
        jnp.repeat(seg_start[u], counts, total_repeat_length=total) + within
    ]
    # final order: one u64 key (gid, j); gid*(n+2)+j < 2**63 for our sizes
    key = gid[E_suffix] * jnp.int64(total + 1) + E_j
    order = jnp.argsort(key)
    s_ord = E_suffix[order]
    j_ord = E_j[order]
    pos_ord = sa_kept[s_ord]
    prev_sep = jnp.concatenate(
        (jnp.ones(1, dtype=bool), dict_flat[:-1] <= 1)
    )
    whole = prev_sep[pos_ord]
    bwtc = jnp.where(
        whole,
        bwlast[j_ord],
        jnp.where(
            pos_ord == 1,
            jnp.uint8(0),
            dict_flat[jnp.maximum(pos_ord - 1, 0)],
        ),
    ).astype(jnp.uint8)
    sa_vals = bwsai[j_ord] - ls[s_ord].astype(jnp.uint64)
    run_start = jnp.concatenate(
        (jnp.ones(1, dtype=bool), bwtc[1:] != bwtc[:-1])
    )
    nruns = jnp.sum(run_start.astype(jnp.int64))
    return bwtc, sa_vals, run_start, nruns


def assemble_bwt_jax(
    dict_flat: np.ndarray,
    w: int,
    occs: np.ndarray,
    bwlast: np.ndarray,
    ilist: np.ndarray,
    bwsai,
    n: int,
    want_sa: bool = False,
    want_rssa: bool = False,
    sa_dtype=np.uint64,
) -> BWTResult:
    dict_flat = np.asarray(dict_flat, dtype=np.uint8)
    occs = np.asarray(occs, dtype=np.int64)
    D = dict_flat.shape[0]
    dwords = int(occs.shape[0])
    nsuf = int((D - 1 - dwords) - dwords * w)
    total = n + 1
    # host: exact mod-2**64 polynomial suffix hashes (two passes over dict)
    is_sep = dict_flat <= 1
    sep_pos = np.flatnonzero(is_sep)
    next_sep = sep_pos[np.searchsorted(sep_pos, np.arange(D))]
    suf_len_np = next_sep - np.arange(D)
    h1 = _segmented_suffix_hashes_np(dict_flat, suf_len_np, _HB1)
    h2 = _segmented_suffix_hashes_np(dict_flat, suf_len_np, _HB2)
    if bwsai is None:
        bwsai = np.zeros(ilist.shape[0], dtype=np.uint64)
    bwtc, sa_vals, run_start, nruns = _assemble_device(
        jnp.asarray(dict_flat),
        jnp.asarray(occs),
        jnp.asarray(np.asarray(bwlast, dtype=np.uint8)),
        jnp.asarray(np.asarray(ilist, dtype=np.int64)),
        jnp.asarray(np.asarray(bwsai, dtype=np.uint64)),
        jnp.asarray(h1),
        jnp.asarray(h2),
        w,
        nsuf,
        total,
    )
    bwtc = np.asarray(bwtc)
    nruns = int(np.asarray(nruns))
    sa_out = None
    ssa = esa = None
    if want_sa or want_rssa:
        sa_np = np.array(sa_vals)  # copy: device buffers are read-only
        sa_np[0] = np.uint64(n)
        if want_rssa:
            rs = np.flatnonzero(np.asarray(run_start))
            re = np.concatenate((rs[1:] - 1, [total - 1]))
            ssa = np.empty(2 * rs.shape[0], dtype=sa_dtype)
            ssa[0::2] = rs.astype(sa_dtype)
            ssa[1::2] = sa_np[rs].astype(sa_dtype)
            esa = np.empty(2 * re.shape[0], dtype=sa_dtype)
            esa[0::2] = re.astype(sa_dtype)
            esa[1::2] = sa_np[re].astype(sa_dtype)
        sa_out = sa_np if want_sa else None
    return BWTResult(bwt=bwtc, sa=sa_out, nruns=nruns, ssa=ssa, esa=esa)
