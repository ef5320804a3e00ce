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

from ..constants import Dollar, DEFAULT_P, DEFAULT_W, MAX_W
from ..utils.errors import die
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
    """Finalized parse: dictionary + occurrence metadata."""

    params: ParserParams
    phrases: List[bytes]  # byte-lex sorted unique phrases
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


def finalize_parse(
    C: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    params: ParserParams,
    doc_names: Optional[List[str]] = None,
    doc_starts: Optional[List[int]] = None,
    nseqs: int = 0,
) -> ParseResult:
    """Dict sort + ranking + per-occurrence metadata (pfparser.hpp:484-517)."""
    w = params.w
    T = _tprime(C, w)
    Tb = T.tobytes()
    nphrases = starts.shape[0]
    if nphrases == 1:
        die("error: only one dict word total. Re-run with a smaller p modulus")
    phrase_list = [Tb[s : e + 1] for s, e in zip(starts.tolist(), ends.tolist())]
    # dictionary: byte-lex sort of unique phrases (strcmp order,
    # pfparser.hpp:500-501)
    from collections import Counter

    freq = Counter(phrase_list)
    phrases = sorted(freq)
    occs = np.fromiter((freq[ph] for ph in phrases), dtype=np.uint64, count=len(phrases))
    rank_of = {ph: i + 1 for i, ph in enumerate(phrases)}
    parse_ranks = np.fromiter(
        (rank_of[ph] for ph in phrase_list), dtype=np.uint32, count=nphrases
    )
    last = T[ends - w]
    sai = ends.astype(np.uint64)
    pos = C.shape[0] + w  # == final sai + ... == |T'| - 1
    return ParseResult(
        params=params,
        phrases=phrases,
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
