"""The prefix-free parse engine.

Re-expresses the reference's streaming parser (pfparser.hpp:299-369,
484-517) as array dataflow:

1. Build the char stream C = concat(upper(record) [+ non-ACGT->A] + 'A'*w)
   — every FASTA record is padded with w 'A's (pfparser.hpp:333-337).
2. Positionwise Wang-hash scan -> cut mask (ops/hash.py); a cut after stream
   position k ends a phrase.
3. T' = Dollar + C + Dollar*w (leading sentinel pfparser.hpp:316-318,
   trailing Dollars from finalize() pfparser.hpp:485-488).  Phrase j spans
   T'[s_j..e_j] with e_j = cut_k + 1 in T' coords, s_{j+1} = e_j - w + 1
   (phrases overlap by w chars).
4. Dictionary = byte-lex sorted unique phrases; ranks are 1-based
   (pfparser.hpp:504-517); per-occurrence metadata:
   last_j = T'[e_j - w]   (the char w+1 from the phrase end, pfparser.hpp:599)
   sai_j  = e_j           (absolute end position, pfparser.hpp:600)

Exactness notes: the hash stream is continuous across records (the hasher is
not reset between records, pfparser.hpp:319-320) and the warm-up suppression
`pos_ > w` applies only at the very start of the collection, so the parse of
a multi-document collection is a pure function of the concatenated padded
stream — which is what makes data-parallel sharding exact (§2.4 of
SURVEY.md).
"""

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..constants import Dollar, DEFAULT_P, DEFAULT_W, EndOfDict, EndOfWord, MAX_W
from ..utils.errors import die
from ..utils.limits import check_phrase_count
from ..utils.tables import NT4_TABLE, UPPER_TABLE
from . import hash as hash_ops


@dataclass
class ParserParams:
    """Mirrors pfbwtf::PfParserParams (pfparser.hpp:30-44)."""

    w: int = DEFAULT_W
    p: int = DEFAULT_P
    get_sai: bool = False
    store_docs: bool = False
    verbose: bool = False
    trim_non_acgt: bool = False
    non_acgt_to_a: bool = False

    def __post_init__(self):
        if self.w > MAX_W:
            die("window size w must be < 32!")


@dataclass
class ParseResult:
    """Finalized parse: dictionary + occurrence metadata.

    The dictionary is a FLAT view — (text, dict_starts, dict_lens) — never a
    Python list of phrase objects: at genome scale the dictionary has tens of
    millions of words, and the reference's per-phrase std::map node
    (pfparser.hpp:604-605) is exactly the cost this representation avoids.
    ``text`` is T' (Dollar + C + Dollar*w) and may be a read-only memmap
    (the chunked / out-of-core path), so phrase bytes are paged on demand.
    """

    params: ParserParams
    text: np.ndarray  # T', uint8 (possibly memmap)
    dict_starts: np.ndarray  # int64 word start in text, byte-lex dict order
    dict_lens: np.ndarray  # int64 word length, dict order
    occs: np.ndarray  # per-phrase occurrence counts, dict order
    parse_ranks: np.ndarray  # 1-based ranks, text order (uint32)
    last: np.ndarray  # uint8, per occurrence
    sai: np.ndarray  # uint64 phrase end positions, per occurrence
    doc_names: List[str] = field(default_factory=list)
    doc_starts: List[int] = field(default_factory=list)
    pos: int = 0  # total chars incl. sentinels (pfparser.hpp:614)
    nseqs: int = 0

    @property
    def n(self) -> int:
        """Text length incl. per-record 'A' pads, excl. Dollar sentinels
        (pfparser.hpp:529-532)."""
        return self.pos - self.params.w if self.pos >= self.params.w else 0

    @property
    def phrases(self) -> List[bytes]:
        """Materialized phrase list (compat / test convenience only — O(D)
        Python objects; production paths use the flat view)."""
        s, l = self.dict_starts, self.dict_lens
        return [self.text[s[i] : s[i] + l[i]].tobytes() for i in range(len(s))]

    def iter_dict_chunks(self, chunk_bytes: int = 1 << 23):
        """Yield the .dict byte stream (sorted words + EndOfWord each, then
        EndOfDict) as bounded uint8 slabs — the streaming .dict writer
        (pfbwt_io.hpp:71-82 semantics) with O(1) Python objects.

        Slabs are capped by BYTES, not word count: the expansion builds
        four index arrays per slab, so a word-count cap made slab memory
        scale with dictionary word length (the 1 GB memory profile showed
        ~4 GB of index temporaries under the old 1M-word cap)."""
        starts = np.asarray(self.dict_starts, dtype=np.int64)
        lens = np.asarray(self.dict_lens, dtype=np.int64)
        D = starts.shape[0]
        cum = np.cumsum(lens + 1)
        lo = 0
        while lo < D:
            base = int(cum[lo - 1]) if lo else 0
            hi = int(np.searchsorted(cum, base + chunk_bytes, side="right"))
            hi = min(max(hi, lo + 1), D)
            s = starts[lo:hi]
            l = lens[lo:hi]
            bounds = cum[lo:hi] - base
            out_len = int(bounds[-1])
            idx = np.arange(out_len, dtype=np.int64)
            word = np.searchsorted(bounds, idx, side="right")
            wstart = bounds - (l + 1)
            within = idx - wstart[word]
            src = s[word] + np.minimum(within, np.maximum(l[word] - 1, 0))
            out = np.asarray(self.text[src], dtype=np.uint8)
            out[bounds - 1] = EndOfWord
            yield out
            lo = hi
        yield np.array([EndOfDict], dtype=np.uint8)

    def dict_flat(self) -> np.ndarray:
        """The .dict byte array (separators included), built vectorized."""
        return np.concatenate(list(self.iter_dict_chunks()))


def normalize_records(
    records: Sequence[Tuple[str, np.ndarray]], params: ParserParams
) -> List[Tuple[str, np.ndarray]]:
    """toupper + optional non-ACGT->'A' (pfparser.hpp:337-344)."""
    out = []
    for name, seq in records:
        seq = UPPER_TABLE[np.asarray(seq, dtype=np.uint8)]
        if params.non_acgt_to_a:
            seq = np.where(NT4_TABLE[seq] > 3, np.uint8(ord("A")), seq)
        out.append((name, seq))
    return out


def build_stream(
    records: Sequence[Tuple[str, np.ndarray]], params: ParserParams
):
    """Concatenate normalized records, each padded with w 'A's.

    Returns (C, doc_names, doc_starts).  doc_starts[r] is the offset of
    record r inside C (matching pfparser.hpp:321-324 semantics: 0 for the
    first record, cumulative padded length after).
    """
    records = normalize_records(records, params)
    pad = np.full(params.w, ord("A"), dtype=np.uint8)
    chunks = []
    doc_names: List[str] = []
    doc_starts: List[int] = []
    off = 0
    for name, seq in records:
        doc_names.append(name)
        doc_starts.append(off)
        chunks.append(seq)
        chunks.append(pad)
        off += seq.shape[0] + params.w
    C = np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.uint8)
    return C, doc_names, doc_starts


def phrase_bounds_from_cuts(C_len: int, cuts: np.ndarray, w: int):
    """Phrase (start, end) pairs in T' coordinates.

    ``cuts`` holds stream positions k (0-based in C) after which a phrase
    ends.  T' = Dollar + C + Dollar*w, so char k of C sits at T' index k+1.
    """
    ends = np.empty(cuts.shape[0] + 1, dtype=np.int64)
    ends[:-1] = cuts + 1
    ends[-1] = C_len + w  # final phrase ends at the last trailing Dollar
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] - w + 1
    return starts, ends


def parse_stream_np(
    C: np.ndarray, params: ParserParams
):
    """Cut-mask scan + phrase bounds on host (reference path)."""
    _, _, cut = hash_ops.hash_scan_np(C, params.w, params.p)
    cuts = np.flatnonzero(cut)
    return phrase_bounds_from_cuts(C.shape[0], cuts, params.w)


def _tprime(C: np.ndarray, w: int) -> np.ndarray:
    return np.concatenate(
        (
            np.array([Dollar], dtype=np.uint8),
            C,
            np.full(w, Dollar, dtype=np.uint8),
        )
    )


_HB1 = np.uint64(0x9E3779B97F4A7C15)
_HB2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _substring_hashes(T: np.ndarray, starts, lens, base):
    """Polynomial hash of T[s:s+l] per (s, l), mod 2**64, via prefix sums.

    Above _HASH_CHUNK_LIMIT characters the computation switches to the
    chunked variant: the one-shot form materializes three text-length
    uint64 arrays (24 bytes/char — at 1 GB text that alone is 24 GB,
    breaking the -m bounded-memory contract, file_wrappers.hpp:36-124)."""
    n = T.shape[0]
    if n > _HASH_CHUNK_LIMIT:
        return _substring_hashes_chunked(T, starts, lens, base)
    c = T.astype(np.uint64)
    b = np.full(n, base, dtype=np.uint64)
    b[0] = np.uint64(1)
    powers = np.multiply.accumulate(b)
    G = np.zeros(n + 1, dtype=np.uint64)
    G[:n] = (c * powers)[::-1].cumsum(dtype=np.uint64)[::-1]
    inv = np.uint64(pow(int(base), -1, 1 << 64))
    binv = np.full(n, inv, dtype=np.uint64)
    binv[0] = np.uint64(1)
    inv_powers = np.multiply.accumulate(binv)
    s = np.asarray(starts, dtype=np.int64)
    return (G[s] - G[s + np.asarray(lens, dtype=np.int64)]) * inv_powers[s]


_HASH_CHUNK_LIMIT = 1 << 26  # 64 MB


def _pow_u64(base: int, exp: np.ndarray) -> np.ndarray:
    """base**exp mod 2**64, vectorized square-and-multiply (O(log max_exp)
    passes over the exponent array — exponents are text positions)."""
    e = np.asarray(exp, dtype=np.uint64)
    acc = np.ones(e.shape[0], dtype=np.uint64)
    b = int(base) & 0xFFFFFFFFFFFFFFFF  # python int: silent 2**64 wrap
    nbits = int(e.max(initial=0)).bit_length()
    for bit in range(nbits):
        mask = ((e >> np.uint64(bit)) & np.uint64(1)).astype(bool)
        acc = np.where(mask, acc * np.uint64(b), acc)
        b = (b * b) & 0xFFFFFFFFFFFFFFFF
    return acc


def _substring_hashes_chunked(T, starts, lens, base, chunk: int = 1 << 24):
    """Same hashes as _substring_hashes with O(chunk + nphrases) memory:
    one backward pass over fixed-size text chunks carries the suffix
    accumulator G and harvests G at the query positions; the B^{-s}
    normalization comes from vectorized binary exponentiation instead of a
    text-length cumprod.  T may be a memmap — each chunk is touched once.
    """
    n = T.shape[0]
    s = np.asarray(starts, dtype=np.int64)
    e = s + np.asarray(lens, dtype=np.int64)
    q = np.concatenate((s, e))
    Gq = np.zeros(q.shape[0], dtype=np.uint64)
    acc = np.uint64(0)  # G[hi] of the chunk being entered
    first_lo = ((n - 1) // chunk) * chunk if n else 0
    for lo in range(first_lo, -1, -chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        c = np.asarray(T[lo:hi], dtype=np.uint64)
        pw = np.full(m, base, dtype=np.uint64)
        pw[0] = np.uint64(pow(int(base), lo, 1 << 64))
        np.multiply.accumulate(pw, out=pw)
        Gc = (c * pw)[::-1].cumsum(dtype=np.uint64)[::-1]
        Gc += acc
        sel = (q >= lo) & (q < hi)
        Gq[sel] = Gc[q[sel] - lo]
        acc = Gc[0] if m else acc
    # q == n keeps G = 0
    inv = pow(int(base), -1, 1 << 64)
    inv_s = _pow_u64(inv, s)
    nph = s.shape[0]
    return (Gq[:nph] - Gq[nph:]) * inv_s


def _dedup_and_rank(T: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                    impl: str = None):
    """Vectorized phrase dedup + byte-lex ranking.

    Fast path: the native memcmp-rank kernel (one C++ sort over the
    occurrence (start, len) pairs — exact, allocation-light).  Fallback:
    (len, 128-bit substring hash) dedup + chunked radix word sort in numpy.
    PFBWT_DICT_IMPL=jax selects the on-device chunk-row sort instead
    (parallel/dict_union.device_rank_rows) — the device-resident pipeline
    option.  ``impl='host'`` forces the host paths regardless of env: the
    bounded-memory chunked parse uses it because the device row build
    materializes O(nphrases * maxlen) bytes.  Returns (dict_starts,
    dict_lens, occs, 1-based rank/occurrence): the dictionary stays a flat
    (start, len) view into T, never a Python phrase list.
    """
    import os

    if impl is None:
        impl = os.environ.get("PFBWT_DICT_IMPL", "").lower()
    if impl == "jax":
        from ..parallel.dict_union import dedup_rank_device

        return dedup_rank_device(T, starts, ends)
    lens = (ends - starts + 1).astype(np.int64)
    try:
        from ..native import available, rank_substrings_native

        if available():
            starts64 = np.asarray(starts, dtype=np.int64)
            ranks, D = rank_substrings_native(T, starts64, lens)
            occs = np.bincount(ranks, minlength=D + 1)[1:].astype(np.uint64)
            _, first = np.unique(ranks, return_index=True)
            return (
                starts64[first],
                lens[first],
                occs,
                ranks.astype(np.uint32),
            )
    except Exception:
        pass
    h1 = _substring_hashes(T, starts, lens, _HB1)
    h2 = _substring_hashes(T, starts, lens, _HB2)
    order = np.lexsort((h2, h1, lens))
    l_o, h1_o, h2_o = lens[order], h1[order], h2[order]
    new_grp = np.empty(order.shape[0], dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (
        (l_o[1:] != l_o[:-1]) | (h1_o[1:] != h1_o[:-1]) | (h2_o[1:] != h2_o[:-1])
    )
    gid_in_order = np.cumsum(new_grp) - 1
    D = int(gid_in_order[-1]) + 1
    # group id per original occurrence; representative + count per group
    gid = np.empty(order.shape[0], dtype=np.int64)
    gid[order] = gid_in_order
    rep = order[new_grp]  # first occurrence index per group
    counts = np.bincount(gid_in_order, minlength=D)
    rep_starts = starts[rep]
    rep_lens = lens[rep]
    # byte-lex order of the unique phrases
    word_order = _lex_order_of_substrings(T, rep_starts, rep_lens)
    # rank_of_group: 1-based lexicographic rank
    rank_of_group = np.empty(D, dtype=np.int64)
    rank_of_group[word_order] = np.arange(1, D + 1)
    parse_ranks = rank_of_group[gid].astype(np.uint32)
    occs = counts[word_order].astype(np.uint64)
    return rep_starts[word_order], rep_lens[word_order], occs, parse_ranks


def _pack8(T: np.ndarray, starts, off: int, lens) -> np.ndarray:
    """Big-endian pack of T[s+off : s+off+8] per phrase, zero-padded past
    the phrase end (zero < any real byte, giving prefix-correct order)."""
    D = starts.shape[0]
    val = np.zeros(D, dtype=np.uint64)
    limit = np.uint64(0)
    tmax = T.shape[0] - 1
    for b in range(8):
        idx = np.minimum(starts + off + b, tmax)
        ch = T[idx].astype(np.uint64)
        valid = (off + b) < lens
        val = (val << np.uint64(8)) | np.where(valid, ch, limit)
    return val


def _lex_order_of_substrings(T: np.ndarray, starts, lens) -> np.ndarray:
    """argsort of the (unique) substrings of T by byte-lex order.

    Iterative 8-byte-chunk radix refinement: O(D * maxlen/8) gathers and
    O(maxlen/8) sorts of D keys — far cheaper than a suffix sort of the
    concatenated dictionary, and allocation-light (the host's weak spot).
    Terminates early once all ranks are distinct (phrases are unique, and
    the PFP prefix-free property means no phrase is a prefix of another).
    """
    D = starts.shape[0]
    if D <= 1:
        return np.arange(D, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    maxlen = int(lens.max())
    rank = np.zeros(D, dtype=np.int64)
    for off in range(0, maxlen + 8, 8):
        chunk = _pack8(T, starts, off, lens)
        order = np.lexsort((chunk, rank))
        r_o, c_o = rank[order], chunk[order]
        newg = np.empty(D, dtype=np.int64)
        newg[0] = 0
        newg[1:] = (r_o[1:] != r_o[:-1]) | (c_o[1:] != c_o[:-1])
        nr = np.cumsum(newg)
        rank[order] = nr
        if nr[-1] == D - 1:
            break
    assert rank.max() == D - 1, "duplicate phrases reached the word sort"
    return np.argsort(rank, kind="stable")


def finalize_parse(
    C: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    params: ParserParams,
    doc_names: Optional[List[str]] = None,
    doc_starts: Optional[List[int]] = None,
    nseqs: int = 0,
) -> ParseResult:
    """Dict sort + ranking + per-occurrence metadata (pfparser.hpp:484-517).

    Fully vectorized: phrase dedup by (len, 128-bit substring hash) and
    byte-lex ranking via SA over a separator-joined concat — no per-phrase
    Python loop (the reference's std::map insert per phrase,
    pfparser.hpp:595-601, is the parse stage's real bottleneck at scale).
    """
    w = params.w
    T = _tprime(C, w)
    nphrases = starts.shape[0]
    if nphrases == 1:
        die("error: only one dict word total. Re-run with a smaller p modulus")
    check_phrase_count(nphrases)
    dict_starts, dict_lens, occs, parse_ranks = _dedup_and_rank(T, starts, ends)
    last = T[ends - w]
    sai = ends.astype(np.uint64)
    pos = C.shape[0] + w  # == |T'| - 1
    return ParseResult(
        params=params,
        text=T,
        dict_starts=dict_starts,
        dict_lens=dict_lens,
        occs=occs,
        parse_ranks=parse_ranks,
        last=last,
        sai=sai,
        doc_names=list(doc_names or []),
        doc_starts=list(doc_starts or []),
        pos=pos,
        nseqs=nseqs,
    )


def parse_records(
    records: Sequence[Tuple[str, np.ndarray]], params: ParserParams
) -> ParseResult:
    """End-to-end host parse of FASTA records (the add_fasta + finalize
    equivalent)."""
    C, doc_names, doc_starts = build_stream(records, params)
    starts, ends = parse_stream_np(C, params)
    return finalize_parse(
        C,
        starts,
        ends,
        params,
        doc_names=doc_names if params.store_docs else [],
        doc_starts=doc_starts if params.store_docs else [],
        nseqs=len(records),
    )


def parse_fasta(fname: str, params: ParserParams) -> ParseResult:
    from ..io.fasta import read_fasta_bytes

    return parse_records(read_fasta_bytes(fname), params)
