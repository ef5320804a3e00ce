"""Final BWT assembly: the emission-sort formulation.

The reference walks the dict gSA left-to-right with EASY1/EASY2/HARD cases
(pfbwt.hpp:97-194), serially interleaving rank/select queries, per-word
ilist gathers and small std::sorts.  The TPU-native insight is that the
whole sweep is one flat sort:

Every output position corresponds to a unique pair (suffix s, occurrence j)
where s = (word u, offset) is a dict suffix with len > w and j ranges over
the parse-BWT positions of u (its ilist).  Total pairs = n+1 exactly.  The
reference's emission order is (lexicographic rank of the suffix string,
then ascending j) for ALL cases:

* EASY1 (whole word, pfbwt.hpp:116-128): singleton suffix group (the PFP
  prefix-free property makes whole words never equal proper suffixes),
  ilist order == ascending j.
* EASY2/HARD (:146-181): groups of equal proper-suffix strings; the
  reference merges member ilists by position (SuffixT::operator< compares
  bwtp, :29-31), i.e. ascending j.

So: build the n+1 emissions as flat arrays, sort once by (group, j), and
gather BWT chars / SA samples.  BWT char and SA sample per emission
(pfbwt.hpp:116-181, pfbwt-f.cpp:298-320):

  off == 0             -> char = bwlast[j]
  dict position == 1   -> char = 0 (the leading Dollar stands for the EOS)
  else                 -> char = dict[pos-1]
  sa = bwsai[j] - suf_len   (output index 0 is written as n)
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .suffix import dict_suffix_sort_np, suffix_group_ids_np


@dataclass
class BWTResult:
    bwt: np.ndarray  # uint8, n+1
    sa: Optional[np.ndarray]  # uint64, n+1 (first entry already = n)
    nruns: int
    ssa: Optional[np.ndarray] = None  # (pos, sample) pairs flattened
    esa: Optional[np.ndarray] = None


def _dict_suffix_sort_host(dict_flat):
    """Generalized dict suffix sort on host: native SA-IS when the toolchain
    is available (gsacak-speed), else numpy prefix doubling."""
    try:
        from ..native import available, dict_suffix_sort_native

        if available():
            return dict_suffix_sort_native(dict_flat)
    except Exception:
        pass
    return dict_suffix_sort_np(dict_flat)


def suffix_layout(dict_flat, w, occs, sa_all=None, word_id=None,
                  suf_len=None, verify_groups=True, small_hint=True,
                  workspace=None):
    """Dict-scale emission layout: kept suffixes in lexicographic order,
    their equality groups, owning words and lengths.

    Returns (sa_kept, gid, u, suf_len_kept, seg_start, idt).  Everything
    here is O(|dict|) — the n-scale emission fan-out happens either in
    one shot (_emissions) or in bounded chunks (ops/bwt_mmap).

    ``workspace(sa_all, lcp_or_none)`` is called with the full gSA (and
    LCP when the native kernel produced one) right after the sort — the
    hook the -m mode uses to spill the reference's .gsa/.glcp files
    (pfbwt.hpp:208-209).
    """
    dict_flat = np.asarray(dict_flat, dtype=np.uint8)
    small = dict_flat.shape[0] < 2**31 - 8 and small_hint
    idt = np.int32 if small else np.int64
    gid = None
    lcp_for_ws = None
    if sa_all is None:
        try:
            from ..native import available, dict_suffix_sort_lcp_native

            if available():
                sa_all, lcp, word_id, suf_len, _ = (
                    dict_suffix_sort_lcp_native(dict_flat)
                )
                lcp_for_ws = lcp
                sa_all = sa_all.astype(idt)
                lcp = lcp.astype(idt)
                word_id = word_id.astype(idt)
                suf_len = suf_len.astype(idt)
                keep = suf_len[sa_all] > w
                kidx = np.flatnonzero(keep).astype(idt)
                sa_kept = sa_all[kidx]
                # equal suffixes are contiguous in the full gSA, so adjacent
                # kept entries are equal iff they are full-SA neighbors with
                # equal length and LCP covering that length
                ls = suf_len[sa_kept]
                eq = (
                    (kidx[1:] == kidx[:-1] + 1)
                    & (ls[1:] == ls[:-1])
                    & (lcp[kidx[1:]] >= ls[:-1])
                )
                gid = np.concatenate(
                    (np.zeros(1, idt), np.cumsum(~eq, dtype=idt))
                )
        except Exception:
            sa_all = None
    if sa_all is None:
        sa_all, word_id, suf_len, _ = _dict_suffix_sort_host(dict_flat)
        sa_all = sa_all.astype(idt)
        word_id = np.asarray(word_id).astype(idt)
        suf_len = np.asarray(suf_len).astype(idt)
    if workspace is not None:
        workspace(sa_all, lcp_for_ws)
    if gid is None:
        keep = suf_len[sa_all] > w
        sa_kept = sa_all[keep]
        gid = suffix_group_ids_np(
            dict_flat, sa_kept, suf_len, verify=verify_groups
        ).astype(idt)
    u = word_id[sa_kept]
    # ilist segment starts per word: F[u+1] = 1 + cumsum(occ)[:u]
    occs = np.asarray(occs).astype(idt)
    seg_start = np.concatenate(
        (np.ones(1, idt), (1 + np.cumsum(occs, dtype=np.int64)[:-1]).astype(idt))
    )
    return sa_kept, gid, u, suf_len[sa_kept], seg_start, idt


def _emissions(dict_flat, w, occs, ilist, sa_all=None, word_id=None,
               suf_len=None, verify_groups=True):
    """Sorted dict suffixes + their emission layout.

    Returns (sa_kept, gid, word_of_suffix, suf_len_kept, E_suffix, E_j).

    Index arrays use int32 when sizes allow: this numpy build's 64-bit
    fancy-indexing/gather paths are an order of magnitude slower than the
    32-bit ones, and n < 2**31 covers the reference's own 32-bit domain.
    """
    ilist = np.asarray(ilist)
    sa_kept, gid, u, suf_len_kept, seg_start, idt = suffix_layout(
        dict_flat, w, occs, sa_all=sa_all, word_id=word_id,
        suf_len=suf_len, verify_groups=verify_groups,
        small_hint=ilist.shape[0] < 2**31 - 8,
    )
    occs = np.asarray(occs).astype(idt)
    counts = occs[u]
    E_suffix = np.repeat(np.arange(sa_kept.shape[0], dtype=idt), counts)
    # within-suffix occurrence index 0..count-1
    first = np.concatenate(
        (np.zeros(1, idt), np.cumsum(counts, dtype=np.int64)[:-1].astype(idt))
    )
    within = np.arange(E_suffix.shape[0], dtype=idt) - np.repeat(first, counts)
    E_j = ilist.astype(idt)[np.repeat(seg_start[u], counts) + within]
    return sa_kept, gid, u, suf_len_kept, E_suffix, E_j


def assemble_bwt(
    dict_flat: np.ndarray,
    w: int,
    occs: np.ndarray,
    bwlast: np.ndarray,
    ilist: np.ndarray,
    bwsai: Optional[np.ndarray],
    n: int,
    want_sa: bool = False,
    want_rssa: bool = False,
    sa_dtype=np.uint64,
) -> BWTResult:
    sa_kept, gid, u, suf_len_kept, E_suffix, E_j = _emissions(
        dict_flat, w, occs, ilist
    )
    total = E_j.shape[0]
    assert total == n + 1, f"emission count {total} != n+1 ({n + 1})"
    idt = E_j.dtype
    # final order: (suffix group, parse-BWT position)
    order = np.lexsort((E_j, gid[E_suffix])).astype(idt)
    s_ord = E_suffix[order]
    j_ord = E_j[order]
    pos_ord = sa_kept[s_ord]  # dict positions of each emission's suffix
    # offset-0 detection: suffix starts right after a separator or at 0
    dict_flat = np.asarray(dict_flat, dtype=np.uint8)
    is_word_start = np.concatenate(
        ([True], (dict_flat[:-1] <= 1))
    )  # previous byte is EndOfWord/EndOfDict
    whole = is_word_start[pos_ord]
    bwtc = np.where(
        whole,
        np.asarray(bwlast, dtype=np.uint8)[j_ord],
        np.where(pos_ord == 1, np.uint8(0), dict_flat[np.maximum(pos_ord - 1, 0)]),
    ).astype(np.uint8)

    nruns = int(np.count_nonzero(np.diff(bwtc.astype(np.int16))) + 1)

    sa_vals = None
    ssa = esa = None
    if want_sa or want_rssa:
        bwsai = np.asarray(bwsai)
        if idt == np.int32 and n < 2**32 - 2:
            # 32-bit gather path (values fit: sa <= n); widen at the end
            sa32 = bwsai.astype(np.uint32)[j_ord] - suf_len_kept[s_ord].astype(
                np.uint32
            )
            sa_vals = sa32.astype(np.uint64)
        else:
            sa_vals = bwsai.astype(np.uint64)[j_ord] - suf_len_kept[
                s_ord
            ].astype(np.uint64)
        sa_vals[0] = np.uint64(n)
        if want_rssa:
            run_start = np.concatenate(
                ([True], bwtc[1:] != bwtc[:-1])
            )
            rs = np.flatnonzero(run_start)
            re = np.concatenate((rs[1:] - 1, [total - 1]))
            ssa = np.empty(2 * rs.shape[0], dtype=sa_dtype)
            ssa[0::2] = rs.astype(sa_dtype)
            ssa[1::2] = sa_vals[rs].astype(sa_dtype)
            esa = np.empty(2 * re.shape[0], dtype=sa_dtype)
            esa[0::2] = re.astype(sa_dtype)
            esa[1::2] = sa_vals[re].astype(sa_dtype)
    return BWTResult(
        bwt=bwtc,
        sa=sa_vals if want_sa else None,
        nruns=nruns,
        ssa=ssa,
        esa=esa,
    )
