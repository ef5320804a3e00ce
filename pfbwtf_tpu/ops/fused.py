"""HBM-chained end-to-end pipeline: chars -> .bwt/.sa without host hops.

The staged engine (engine.py) runs each stage as its own program with host
round-trips between (Python phrase metadata, re-pad, re-upload).  This module
chains the WHOLE construction — cut scan -> phrase bounds -> dictionary
dedup/rank -> parse-BWT -> emission-sort assembly — through two device
programs whose intermediates never leave HBM:

  J2 parse     cut scan + count, cut compaction (sort-based — sized
               nonzero is a full-length scatter on TPU), phrase bounds,
               dictionary dedup by (len, two 64-bit polynomial substring
               hashes), per-occurrence metadata (rank/last/sai), and the
               dict (start, len) view in PROVISIONAL dedup order — all
               device arrays, kept in HBM.  The phrase-array bucket is
               chosen SPECULATIVELY from
               C_len/p (cuts are hash%p==0 events, tightly concentrated at
               rate 1/p); the device-counted ncuts comes back in the single
               sizing fetch, and the rare overflow (adversarial inputs whose
               cut density far exceeds 1/p) re-runs J2 at the exact bucket.
  J3 assemble  dict byte-array construction, generalized dict suffix
               sort, TRUE byte-lex word-rank recovery (word-start suffixes
               appear in SA order exactly in byte-lex word order by
               prefix-freeness — J2 needs no ranking pass of its own),
               parse-BWT (doubling SA + permutes), emission fan-out and
               the final (suffix-group, ilist-pos) sort -> bwt chars + SA
               samples.  Reuses parse_bwt_core / assemble_core.

The chain costs exactly TWO host syncs: one 3-scalar fetch after J2 (ncuts,
D, dict_total — they size J3's static buckets) and the final checksum/output
fetch.  Round 2's separate J1 sizing pass (a third sync plus a second full
hash scan over the input) is gone.

Covers run_parser + run_pfbwt of the reference in one chain
(src/pfbwt-f.cpp:209-349) with only .bwt/.sa leaving HBM.  The recovered
ranks match pfparser.hpp:500-517 (strcmp dict order); dedup equality is
(len, h1, h2) with two independent 64-bit hashes — the same contract as the
host hash path (ops/parse._dedup_and_rank), cross-checked against the exact
native-memcmp path in tests.
"""

import os
from functools import partial
from typing import Optional

import numpy as np

from ..constants import Dollar, EndOfDict, EndOfWord
from ..utils.errors import die
from ..utils.tables import NTOA_TABLE

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_HB1 = np.uint64(0x9E3779B97F4A7C15)
_HB2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bucket(n: int, floor: int = 1 << 12) -> int:
    if n <= floor:
        return floor
    step = max(floor, 1 << (max(int(np.floor(np.log2(n))) - 3, 0)))
    return -(-n // step) * step


# --------------------------------------------------------------------------
# speculative phrase-count bound (replaces the round-2 J1 sizing pass)
# --------------------------------------------------------------------------


def capture_levels(max_len: int, w: int, alphabet: str = "byte") -> int:
    """Static capture-table height for doubling_with_captures, from the
    device-counted max dict word length: levels cover t up to
    floor_pow2(max suffix length) (suffix lengths never exceed the word
    length), +1 safety, rounded up to a multiple of 4 to bound the
    number of compiled variants.  Rows are indexed from t_min (the
    smallest capture level; fingerprint rows fill [t_min, k0) in acgt3
    mode — see suffix.dict_key_plan)."""
    from .suffix import dict_key_plan

    _, t_min, _ = dict_key_plan(w, alphabet)
    log2tmin = int(np.round(np.log2(t_min)))
    need = int(np.floor(np.log2(max(max_len, 1)))) - log2tmin + 2
    return max(4, -(-need // 4) * 4)


def _default_scan_impl(w: int, p: int) -> str:
    """Cut-scan kernel for the fused J2.  On the real TPU the Pallas
    kernel (explicit u32-pair blocks, halo-row layout) beats the
    XLA-fused scan INSIDE the fused program — measured 2026-08-21 at
    16 MB: pallas 2.23/2.24/2.25 s e2e vs xla 2.49/2.69/2.76 s
    (same process, identical checksums) — even though it loses the
    STANDALONE scan race by ~90x (round-1 ledger): inside J2 the XLA
    scan's fusion competes with neighboring ops for VMEM/scheduling
    while the Pallas kernel pipelines its own blocks.  Kernel
    constraints: w <= 32, p < 2**15; otherwise (and on CPU, where
    Mosaic TC kernels cannot run) the XLA scan is used.
    PFBWT_SCAN_IMPL=xla|pallas overrides."""
    env = os.environ.get("PFBWT_SCAN_IMPL", "").lower()
    if env in ("xla", "pallas"):
        return env
    if w > 32 or p >= (1 << 15):
        return "xla"
    try:
        import jax

        if jax.devices()[0].platform == "cpu":
            return "xla"
    except Exception:  # noqa: BLE001
        return "xla"
    return "pallas"


class _ShapeDtype:
    """Lightweight aval carrier for fingerprint computation."""

    def __init__(self, shape, dtype):
        self.shape, self.dtype = shape, dtype


def j2_blob_ready(C_len: int, w: int, p: int) -> bool:
    """True iff the AOT executable store holds the fused-J2 blob for this
    input size under the CURRENT code digest.  The bench uses this to
    decide whether an e2e size is safe to attempt: a missing/stale blob
    means minutes of trace+lower+compile during which SIGALRM cannot be
    delivered (the interpreter is inside one long C call), so the
    in-process budget would silently overrun — observed as rounds 3/4's
    driver timeouts.  The warm script runs the whole pipeline, so J2's
    blob existing implies J3's does too."""
    from ..aot import _blob_path, _fingerprint, aot_dir

    d = aot_dir()
    if not d:
        return False
    n_b = _bucket(max(C_len, 1), 1 << 16)
    nph_b = _bucket(speculative_nphrases(C_len, p))
    scan_impl = _default_scan_impl(w, p)
    args = (
        _ShapeDtype((n_b,), np.dtype(np.uint8)),
        _ShapeDtype((), np.dtype(np.int64)),
    )
    fp = _fingerprint("fused_j2", (nph_b, w, p, scan_impl), args)
    return os.path.exists(_blob_path(d, "fused_j2", fp))


def dict_alphabet(C: np.ndarray) -> str:
    """Static key-packing mode for the dict suffix sort.  'acgt3'
    (3-bit symbol packing, k0=16 with fingerprint capture tiers) is
    available for pure-ACGT inputs but is a MEASURED LOSER on v5e at
    64 MB: the doubling saves one round (~0.37 s) yet the end-to-end ran
    ~0.3-0.6 s slower in two same-process A/B races (2026-08-21; both
    the i64 and the native-i32 pack variants), so 'byte' stays the
    default.  PFBWT_DICT_KEYS=acgt3 opts in (requires pure ACGT)."""
    if os.environ.get("PFBWT_DICT_KEYS", "").lower() != "acgt3":
        return "byte"
    if C.size == 0:
        return "acgt3"
    pure = bool(
        ((C == 65) | (C == 67) | (C == 71) | (C == 84)).all()
    )
    return "acgt3" if pure else "byte"


def speculative_nphrases(C_len: int, p: int) -> int:
    """Upper bound on nphrases used to pick J2's static bucket WITHOUT a
    device round-trip.  Cuts are `hash % p == 0` events: for hash-random
    input ncuts ~ Binomial(C_len, 1/p), so mean + 8 sigma + a flat pad is
    conservatively safe; genuinely adversarial inputs (constant k-mers whose
    hash hits 0 mod p at every position) overflow the bound, which the
    driver detects from the device-counted ncuts and re-runs exactly."""
    exp = C_len / max(p, 1)
    return int(exp + 8.0 * exp**0.5 + 4096.0)


# --------------------------------------------------------------------------
# J2: parse + dictionary rank
# --------------------------------------------------------------------------


def _substring_hashes_dev(Tp, starts, lens, base: int):
    """Polynomial hash of Tp[s:s+l] per (s,l), mod 2**64 (device version of
    ops/parse._substring_hashes; uint64 wraps identically in XLA).  Powers
    via binary exponentiation + one reverse u64 cumsum per base — u64
    cumprod/flip chains are emulated u32-pair scans on TPU (slow, and they
    blow scoped VMEM at multi-M sizes)."""
    import jax.numpy as jnp

    from .suffix import cumsum_u64_jax, pow_u64_jax

    c = Tp.astype(jnp.uint64)
    tb = c.shape[0]
    powers = pow_u64_jax(base, tb)
    G = jnp.concatenate(
        (
            cumsum_u64_jax(c * powers, reverse=True),
            jnp.zeros(1, jnp.uint64),
        )
    )
    s = jnp.clip(starts, 0, tb - 1)
    e = jnp.clip(starts + lens, 0, tb)
    # inv_base^s computed AT the nph phrase positions only (binary
    # exponentiation over the exponent's bits with precomputed scalar
    # squares) — the full tb-length pow_u64_jax array cost ~25 emulated-
    # u64 passes over the whole stream and 600 MB of HBM per base
    ipow = pow(int(base), -1, 1 << 64)
    inv_s = jnp.ones(s.shape[0], jnp.uint64)
    su = s.astype(jnp.uint64)
    for j in range(max(int(np.ceil(np.log2(tb + 1))), 1)):
        sq = np.uint64(pow(ipow, 1 << j, 1 << 64))
        inv_s = jnp.where(
            (su >> jnp.uint64(j)) & jnp.uint64(1) == jnp.uint64(1),
            inv_s * sq,
            inv_s,
        )
    return (G[s] - G[e]) * inv_s


def _parse_core(chars_p, C_len, w: int, p: int, nph_b: int,
                scan_impl: str = "xla"):
    """Cut scan/count + compaction + phrase bounds + dict dedup/rank +
    occurrence metadata, all on device.  Returns the HBM-resident parse
    state plus a 3-scalar sizing vector [ncuts, D, dict_total] — the ONLY
    values the host needs before dispatching J3.  Valid only when
    ncuts + 1 <= nph_b (the driver re-runs at the exact bucket otherwise).

    ``scan_impl`` selects the cut-scan kernel inside the fused program:
    'xla' (ops/hash.py, u32-folded Wang scan — the measured winner) or
    'pallas' (ops/pallas/hash_scan.py) for A/B runs."""
    import jax
    import jax.numpy as jnp

    from .hash import hash_scan_jax

    from ..utils.tables import ntoa_codes_jax

    n_b = chars_p.shape[0]
    # arithmetic NTOA (chars are driver-validated): the 256-entry LUT
    # gather measured 0.59 s over 75.5M lanes in this program
    codes = ntoa_codes_jax(chars_p)
    if scan_impl == "pallas":
        from ..engine import _cut_mask_device

        cut = _cut_mask_device(codes, w, p, "pallas")
    else:
        _, cut = hash_scan_jax(codes, w, p)
    sidx = jnp.arange(n_b, dtype=jnp.int64)
    cut = cut & (sidx < C_len)
    ncuts = jnp.sum(cut.astype(jnp.int64))
    it = jnp.int32 if n_b < 2**31 - 2 else jnp.int64

    # T' = Dollar + C + Dollar*w  (chars_p pads beyond C_len become
    # Dollar).  Static concat + where — the shifted-gather form cost
    # 181 ms at 18.9M on-chip (TPU gathers are row-latency-bound)
    tb = n_b + w + 1
    tidx = jnp.arange(tb, dtype=jnp.int64)
    shifted = jnp.concatenate(
        (
            jnp.full(1, Dollar, jnp.uint8),
            chars_p,
            jnp.zeros(w, jnp.uint8),
        )
    )
    Tp = jnp.where(tidx > C_len, jnp.uint8(Dollar), shifted)

    from .suffix import compact_indices_jax

    cuts = compact_indices_jax(cut, nph_b, fill=n_b).astype(jnp.int64)
    k = jnp.arange(nph_b, dtype=jnp.int64)
    valid = k <= ncuts  # nphrases = ncuts + 1
    ends = jnp.where(k < ncuts, cuts + 1, C_len + w)
    prev_end = jnp.concatenate((jnp.zeros(1, jnp.int64), ends[:-1]))
    starts = jnp.where(k == 0, 0, prev_end - w + 1)
    lens = jnp.where(valid, ends - starts + 1, 0)

    # dedup by (len, h1, h2) — contract shared with the host hash path
    h1 = jnp.where(valid, _substring_hashes_dev(Tp, starts, lens, _HB1), 0)
    h2 = jnp.where(valid, _substring_hashes_dev(Tp, starts, lens, _HB2), 0)
    key_l = jnp.where(valid, lens, jnp.int64(-1) - k)  # invalid: distinct
    inv = (~valid).astype(jnp.int64)
    order = jnp.lexsort((h2, h1, key_l, inv))
    l_o, h1_o, h2_o, v_o = key_l[order], h1[order], h2[order], valid[order]
    head = jnp.concatenate(
        (
            jnp.ones(1, bool),
            (l_o[1:] != l_o[:-1])
            | (h1_o[1:] != h1_o[:-1])
            | (h2_o[1:] != h2_o[:-1]),
        )
    )
    gid_sorted = (jnp.cumsum(head.astype(it)) - 1).astype(jnp.int64)
    D = jnp.sum((head & v_o).astype(jnp.int64))  # valid groups come first
    gid = (
        jnp.zeros(nph_b, jnp.int64)
        .at[order]
        .set(gid_sorted, unique_indices=True, mode="promise_in_bounds")
    )
    # representative (first-in-sorted) start/len per group: exactly one head
    # per group, and non-head lanes contribute 0, so scatter-add == set
    rep_start = (
        jnp.zeros(nph_b, jnp.int64)
        .at[gid_sorted]
        .add(jnp.where(head, starts[order], 0), mode="drop")
    )
    rep_len = (
        jnp.zeros(nph_b, jnp.int64)
        .at[gid_sorted]
        .add(jnp.where(head, lens[order], 0), mode="drop")
    )

    group_counts = (
        jnp.zeros(nph_b, jnp.int64)
        .at[gid]
        .add(jnp.where(valid, 1, 0), mode="drop")
    )

    # dict views stay in PROVISIONAL (dedup-sorted) order: the true
    # byte-lex word ranks fall out of J3's dict suffix sort for free
    # (word-start suffixes in SA order == byte-lex word order), so the
    # dedicated byte-lex refinement pass (1.6 s of J2 at 16 MB on-chip)
    # is gone; J3 remaps ranks before the parse-BWT.
    rep_valid = jnp.arange(nph_b, dtype=jnp.int64) < D
    dict_start = rep_start * rep_valid
    dict_len = rep_len * rep_valid
    occs = group_counts * rep_valid

    # per-occurrence outputs (provisional ranks, 1-based)
    parse_ranks = jnp.where(valid, jnp.clip(gid, 0, nph_b - 1) + 1, 0)
    last = jnp.where(
        valid, Tp[jnp.clip(ends - w, 0, tb - 1)], jnp.uint8(0)
    )
    sai = jnp.where(valid, ends, 0).astype(jnp.uint64)
    dict_total = jnp.sum(dict_len) + D + 1
    # 4th sizing scalar: max dict word length bounds the capture-table
    # height of J3's doubling (suffix.doubling_with_captures n_levels)
    meta = jnp.stack((ncuts, D, dict_total, jnp.max(dict_len)))
    return (
        Tp,
        parse_ranks,
        occs,
        dict_start,
        dict_len,
        last,
        sai,
        meta,
    )


_parse_jits = {}


# --------------------------------------------------------------------------
# J2 (streamed): chunked parse for inputs past the monolithic J2's HBM
# ceiling
# --------------------------------------------------------------------------


def speculative_chunk_phrases(L: int, p: int) -> int:
    """Static per-chunk phrase window for the streamed J2 (same Binomial
    bound as speculative_nphrases, over one chunk's positions)."""
    exp = L / max(p, 1)
    return _bucket(int(exp + 8.0 * exp**0.5 + 4096.0))


def _parse_core_stream(
    chars_p, C_len, w: int, p: int, nph_b: int, n_chunks: int,
    m_max: int, scan_impl: str = "xla",
):
    """Streamed J2: identical contract to _parse_core, but nothing of
    length T' is ever materialized at 64-bit width.  The monolithic J2's
    ceiling is _substring_hashes_dev (four u64 arrays of T' length: ~8.6 GB
    HBM at 256 MB input, ~17 GB at 512 MB — the round-4 GB-scale blocker);
    here the polynomial prefix sums F[i] = sum_{j<i} c_j*base^j are
    computed by a lax.scan over T' chunks carrying (F, base^chunk_start)
    scalars, and F is sampled ONLY at the phrase start/end positions that
    fall inside the live chunk (a dynamic-slice window of the
    position-sorted phrase arrays — phrases are position-ordered, so each
    chunk sees a contiguous window).  The cut-index compaction (an n-scale
    i32 sort in the monolithic J2) likewise becomes a scan with a carried
    count + per-chunk scatter.

    h(s,e) = (F[e] - F[s]) * inv_base^s  ==  the monolithic
    (G[s] - G[e]) * inv_base^s  (forward-vs-reverse prefix identity), so
    dedup keys are bit-identical to _parse_core's.

    meta gains a 5th scalar: max phrases per chunk (the driver re-runs
    with a wider m_max window on overflow — same speculative-bound
    pattern as nph_b).  Reference role: 64-bit mode + mmap scaling
    (pfparser.hpp:326-331, README.md:23-24).
    """
    import jax
    import jax.numpy as jnp

    from .hash import hash_scan_jax
    from .suffix import cumsum_u64_jax, pow_u64_jax

    from ..utils.tables import ntoa_codes_jax

    n_b = chars_p.shape[0]
    codes = ntoa_codes_jax(chars_p)
    if scan_impl == "pallas":
        from ..engine import _cut_mask_device

        cut = _cut_mask_device(codes, w, p, "pallas")
    else:
        _, cut = hash_scan_jax(codes, w, p)
    sidx = jnp.arange(n_b, dtype=jnp.int64)
    cut = cut & (sidx < C_len)
    ncuts = jnp.sum(cut.astype(jnp.int64))
    it = jnp.int32 if n_b < 2**31 - 2 else jnp.int64

    tb = n_b + w + 1
    tidx = jnp.arange(tb, dtype=jnp.int64)
    shifted = jnp.concatenate(
        (
            jnp.full(1, Dollar, jnp.uint8),
            chars_p,
            jnp.zeros(w, jnp.uint8),
        )
    )
    Tp = jnp.where(tidx > C_len, jnp.uint8(Dollar), shifted)

    # ---- scan A: chunked cut-index compaction (carried count+scatter;
    # the monolithic compact_indices_jax sorts n-scale i32 operands) ----
    Lc = -(-n_b // n_chunks)
    padc = n_chunks * Lc - n_b
    cut_p = jnp.concatenate((cut, jnp.zeros(padc, bool))) if padc else cut

    def body_a(carry, k):
        cnt, buf = carry
        cm = jax.lax.dynamic_slice(cut_p, (k * Lc,), (Lc,))
        loc = jnp.cumsum(cm.astype(jnp.int32))
        gpos = (k.astype(jnp.int64) * Lc) + jnp.arange(Lc, dtype=jnp.int64)
        slot = jnp.where(cm, cnt + loc.astype(jnp.int64) - 1,
                         jnp.int64(nph_b))
        buf = buf.at[slot].set(gpos, mode="drop", unique_indices=True)
        return (cnt + loc[-1].astype(jnp.int64), buf), None

    (_, cuts), _ = jax.lax.scan(
        body_a,
        (jnp.int64(0), jnp.full(nph_b, jnp.int64(n_b))),
        jnp.arange(n_chunks, dtype=jnp.int32),
    )

    # ---- phrase bounds (nph-scale, identical to _parse_core) ----
    k = jnp.arange(nph_b, dtype=jnp.int64)
    valid = k <= ncuts
    ends = jnp.where(k < ncuts, cuts + 1, C_len + w)
    prev_end = jnp.concatenate((jnp.zeros(1, jnp.int64), ends[:-1]))
    starts = jnp.where(k == 0, 0, prev_end - w + 1)
    lens = jnp.where(valid, ends - starts + 1, 0)

    # ---- scan B: F sampled at phrase endpoints, chunk by chunk ----
    # tb+1: the last phrase's end position is tb itself (F[tb] = full
    # prefix sum), so the chunk grid must strictly cover position tb
    Lh = -(-(tb + 1) // n_chunks)
    # round the chunk length to the u64-cumsum block grid so the in-chunk
    # limb scans stay aligned
    Lh = -(-Lh // (1 << 15)) * (1 << 15)
    padh = n_chunks * Lh - tb
    Tp_p = jnp.concatenate(
        (Tp, jnp.full(padh, jnp.uint8(Dollar)))
    ) if padh else Tp

    s_cl = jnp.clip(starts, 0, tb - 1)
    e_cl = jnp.clip(starts + lens, 0, tb)
    # position-sorted query windows: phrases are position-ordered, so the
    # ones whose start (resp. end) lies in chunk kc form the contiguous
    # index range [lo[kc], lo[kc+1]).  Buffers padded by m_max so the
    # dynamic slices never clamp-shift.
    grid = jnp.arange(n_chunks + 1, dtype=jnp.int64) * Lh
    # invalid-lane sentinel must sort past EVERY grid point (not just tb):
    # otherwise the tail chunk's window would count the bucket-pad lanes
    # and trigger spurious m_max overflows
    sent = jnp.int64(1) << jnp.int64(62)
    lo_s = jnp.searchsorted(
        jnp.where(valid, s_cl, sent), grid, side="left"
    ).astype(jnp.int32)
    lo_e = jnp.searchsorted(
        jnp.where(valid, e_cl, sent), grid, side="left"
    ).astype(jnp.int32)
    per_chunk_s = jnp.max(lo_s[1:] - lo_s[:-1])
    per_chunk_e = jnp.max(lo_e[1:] - lo_e[:-1])
    m_over = jnp.maximum(per_chunk_s, per_chunk_e)

    def padq(a, fill):
        return jnp.concatenate((a, jnp.full(m_max, fill, a.dtype)))

    s_q = padq(s_cl, jnp.int64(0))
    e_q = padq(e_cl, jnp.int64(0))

    pow1 = pow_u64_jax(int(_HB1), Lh)
    pow2 = pow_u64_jax(int(_HB2), Lh)
    step1 = jnp.uint64(pow(int(_HB1), Lh, 1 << 64))
    step2 = jnp.uint64(pow(int(_HB2), Lh, 1 << 64))

    def body_b(carry, kc):
        F1, F2, bp1, bp2, Gs1, Ge1, Gs2, Ge2 = carry
        base_pos = kc.astype(jnp.int64) * Lh
        c = jax.lax.dynamic_slice(Tp_p, (base_pos,), (Lh,)).astype(
            jnp.uint64
        )
        # F within chunk, exclusive, at global scale: F_glob(base+j) =
        # F_carry + bp * excl_cumsum(c * pow_local)[j]
        t1 = c * pow1
        t2 = c * pow2
        cs1 = cumsum_u64_jax(t1)
        cs2 = cumsum_u64_jax(t2)
        ex1 = jnp.concatenate((jnp.zeros(1, jnp.uint64), cs1[:-1]))
        ex2 = jnp.concatenate((jnp.zeros(1, jnp.uint64), cs2[:-1]))

        def sample(lo_row, q_pos, G1, G2):
            lo = lo_row
            qs = jax.lax.dynamic_slice(q_pos, (lo.astype(jnp.int64),),
                                       (m_max,))
            j = qs - base_pos
            ok = (j >= 0) & (j < Lh)
            jc = jnp.clip(j, 0, Lh - 1)
            v1 = F1 + bp1 * ex1[jc]
            v2 = F2 + bp2 * ex2[jc]
            w1 = jax.lax.dynamic_slice(G1, (lo.astype(jnp.int64),),
                                       (m_max,))
            w2 = jax.lax.dynamic_slice(G2, (lo.astype(jnp.int64),),
                                       (m_max,))
            G1 = jax.lax.dynamic_update_slice(
                G1, jnp.where(ok, v1, w1), (lo.astype(jnp.int64),)
            )
            G2 = jax.lax.dynamic_update_slice(
                G2, jnp.where(ok, v2, w2), (lo.astype(jnp.int64),)
            )
            return G1, G2

        Gs1, Gs2 = sample(lo_s[kc], s_q, Gs1, Gs2)
        Ge1, Ge2 = sample(lo_e[kc], e_q, Ge1, Ge2)
        F1 = F1 + bp1 * cs1[-1]
        F2 = F2 + bp2 * cs2[-1]
        return (F1, F2, bp1 * step1, bp2 * step2, Gs1, Ge1, Gs2, Ge2), None

    zeros_q = jnp.zeros(nph_b + m_max, jnp.uint64)
    (_, _, _, _, Gs1, Ge1, Gs2, Ge2), _ = jax.lax.scan(
        body_b,
        (jnp.uint64(0), jnp.uint64(0), jnp.uint64(1), jnp.uint64(1),
         zeros_q, zeros_q, zeros_q, zeros_q),
        jnp.arange(n_chunks, dtype=jnp.int32),
    )

    # h(s,e) = (F[e]-F[s]) * inv_base^s, evaluated at the nph positions
    def inv_pow_at(base, su):
        ipow = pow(int(base), -1, 1 << 64)
        inv_s = jnp.ones(su.shape[0], jnp.uint64)
        for j in range(max(int(np.ceil(np.log2(tb + 1))), 1)):
            sq = np.uint64(pow(ipow, 1 << j, 1 << 64))
            inv_s = jnp.where(
                (su >> jnp.uint64(j)) & jnp.uint64(1) == jnp.uint64(1),
                inv_s * sq,
                inv_s,
            )
        return inv_s

    su = s_cl.astype(jnp.uint64)
    h1 = jnp.where(
        valid, (Ge1[:nph_b] - Gs1[:nph_b]) * inv_pow_at(_HB1, su), 0
    )
    h2 = jnp.where(
        valid, (Ge2[:nph_b] - Gs2[:nph_b]) * inv_pow_at(_HB2, su), 0
    )

    # ---- dedup + per-occurrence metadata (identical to _parse_core) ----
    key_l = jnp.where(valid, lens, jnp.int64(-1) - k)
    inv = (~valid).astype(jnp.int64)
    order = jnp.lexsort((h2, h1, key_l, inv))
    l_o, h1_o, h2_o, v_o = key_l[order], h1[order], h2[order], valid[order]
    head = jnp.concatenate(
        (
            jnp.ones(1, bool),
            (l_o[1:] != l_o[:-1])
            | (h1_o[1:] != h1_o[:-1])
            | (h2_o[1:] != h2_o[:-1]),
        )
    )
    gid_sorted = (jnp.cumsum(head.astype(it)) - 1).astype(jnp.int64)
    D = jnp.sum((head & v_o).astype(jnp.int64))
    gid = (
        jnp.zeros(nph_b, jnp.int64)
        .at[order]
        .set(gid_sorted, unique_indices=True, mode="promise_in_bounds")
    )
    rep_start = (
        jnp.zeros(nph_b, jnp.int64)
        .at[gid_sorted]
        .add(jnp.where(head, starts[order], 0), mode="drop")
    )
    rep_len = (
        jnp.zeros(nph_b, jnp.int64)
        .at[gid_sorted]
        .add(jnp.where(head, lens[order], 0), mode="drop")
    )
    group_counts = (
        jnp.zeros(nph_b, jnp.int64)
        .at[gid]
        .add(jnp.where(valid, 1, 0), mode="drop")
    )
    rep_valid = jnp.arange(nph_b, dtype=jnp.int64) < D
    dict_start = rep_start * rep_valid
    dict_len = rep_len * rep_valid
    occs = group_counts * rep_valid
    parse_ranks = jnp.where(valid, jnp.clip(gid, 0, nph_b - 1) + 1, 0)
    last = jnp.where(
        valid, Tp[jnp.clip(ends - w, 0, tb - 1)], jnp.uint8(0)
    )
    sai = jnp.where(valid, ends, 0).astype(jnp.uint64)
    dict_total = jnp.sum(dict_len) + D + 1
    meta = jnp.stack(
        (ncuts, D, dict_total, jnp.max(dict_len), m_over.astype(jnp.int64))
    )
    return (
        Tp,
        parse_ranks,
        occs,
        dict_start,
        dict_len,
        last,
        sai,
        meta,
    )


_parse_stream_jits = {}


def run_parse_stream(dev_chars, C_len, w, p, nph_b, chunk_target=32 << 20):
    """Dispatch the streamed J2 with speculative (nph_b, m_max) windows,
    re-running at exact sizes on the rare overflow.  Returns
    (state, ncuts, D, dict_total, max_len)."""
    import jax
    import jax.numpy as jnp

    n_b = dev_chars.shape[0]
    n_chunks = max(-(-n_b // chunk_target), 1)

    scan_impl = _default_scan_impl(w, p)

    def dispatch(nph_b, m_max):
        key = (nph_b, n_chunks, m_max, w, p, scan_impl)
        if key not in _parse_stream_jits:
            _parse_stream_jits[key] = jax.jit(
                partial(
                    _parse_core_stream, w=w, p=p, nph_b=nph_b,
                    n_chunks=n_chunks, m_max=m_max, scan_impl=scan_impl,
                )
            )
        state = _parse_stream_jits[key](dev_chars, jnp.int64(C_len))
        meta = np.asarray(state[-1])  # SYNC 1
        return state, [int(x) for x in meta]

    m_max = speculative_chunk_phrases(
        -(-n_b // n_chunks), p
    )
    state, (ncuts, D, dict_total, max_len, m_over) = dispatch(nph_b, m_max)
    if ncuts + 1 > nph_b or m_over > m_max:
        nph_b = _bucket(max(ncuts + 1, nph_b))
        m_max = max(m_max, _bucket(m_over))
        state, (ncuts, D, dict_total, max_len, m_over) = dispatch(
            nph_b, m_max
        )
    return state, ncuts, D, dict_total, max_len


# --------------------------------------------------------------------------
# J3: dict bytes + parse-BWT + assembly
# --------------------------------------------------------------------------


def _j3_prep_core(
    Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
    nphrases, D, dict_total,
    w: int, dict_b: int, impl: str = "lax", n_levels: int = None,
    alphabet: str = "byte",
):
    """First half of J3 (dict-scale): dict byte array, dict suffix sort
    with captures, true word-rank recovery, parse-BWT, and the ilist
    segment starts permuted to provisional word order.  Split out so the
    PFBWT_J3_SPLIT=1 mode can dispatch it as its OWN program (HBM-chained
    into the second half) — XLA schedules the emission program's big
    gathers much better when they are not fused into the same program as
    the doubling loop (in-program gather cost measured 8.6 s vs 1.1 s
    standalone at 64 MB)."""
    import jax
    import jax.numpy as jnp

    from .bwt_jax import dict_sort_part
    from .parse_bwt import parse_bwt_core
    from .suffix import compact_indices_jax

    nph_b = parse_ranks.shape[0]
    tb = Tp.shape[0]
    it = jnp.int32 if max(dict_b, nph_b) < 2**31 - 2 else jnp.int64
    r = jnp.arange(nph_b, dtype=it)
    # dict byte array: word r spans [bounds[r]-contrib[r], bounds[r]) with
    # its EndOfWord at bounds[r]-1; EndOfDict terminator + zero pads after.
    # word-of-position via scatter word ids at word starts + cummax — a
    # searchsorted here is log2(nph_b) gather passes over dict_b lanes
    # (measured 1.1 s of J3 at 16 MB); the scatter is collision-free
    # (valid word starts are strictly increasing: contrib >= 1)
    contrib = jnp.where(r < it(D), dict_len.astype(it) + 1, it(0))
    bounds = jnp.cumsum(contrib)
    pidx = jnp.arange(dict_b, dtype=it)
    mark = (
        jnp.zeros(dict_b, it)
        .at[jnp.where(r < it(D), bounds - contrib, it(dict_b))]
        .set(r + 1, unique_indices=True, mode="drop")
    )
    word = jnp.clip(jax.lax.cummax(mark) - 1, 0, nph_b - 1)
    # (wstart, len, start) as ONE 3-column row gather per position
    W3 = jnp.stack(
        (bounds - contrib, dict_len.astype(it), dict_start.astype(it)),
        axis=1,
    )
    wrows = W3[word]
    within = pidx - wrows[:, 0]
    ch = jnp.where(
        within < wrows[:, 1],
        Tp[jnp.clip(wrows[:, 2] + within, 0, tb - 1)],
        jnp.uint8(EndOfWord),
    )
    dict_flat = jnp.where(pidx < dict_total - 1, ch, jnp.uint8(EndOfDict))

    # dict suffix sort FIRST: word-start suffixes appear in SA order in
    # byte-lex word order (prefix-free), recovering the true ranks the
    # parse stage no longer computes
    from .bwt_jax import dict_sort_part
    from .suffix import compact_indices_jax

    ss = dict_sort_part(dict_flat, w, impl, n_levels=n_levels,
                        alphabet=alphabet)
    sa_all, _, _, _, word_id = ss
    prev_sep0 = jnp.concatenate(
        (jnp.ones(1, bool), dict_flat[:-1] <= 1)
    )
    is_wstart = prev_sep0 & (pidx.astype(jnp.int64) < dict_total - 1)
    wsa = compact_indices_jax(is_wstart[sa_all], nph_b, fill=0)
    prov_in_lex = word_id[jnp.clip(sa_all[wsa], 0, dict_b - 1)].astype(it)
    lex_valid = jnp.arange(nph_b, dtype=it) < it(D)
    lex_of_prov = (
        jnp.zeros(nph_b, it)
        .at[jnp.where(lex_valid, jnp.clip(prov_in_lex, 0, nph_b - 1),
                      it(nph_b))]
        .set(jnp.arange(nph_b, dtype=it), unique_indices=True,
             mode="drop")
    )
    ranks_true = jnp.where(
        parse_ranks > 0,
        lex_of_prov[
            jnp.clip(parse_ranks - 1, 0, nph_b - 1)
        ].astype(jnp.int64) + 1,
        0,
    )
    bwlast, ilist, bwsai, _ = parse_bwt_core(
        ranks_true, last, sai, nphrases, impl=impl
    )
    # ilist segment starts live in LEX rank space; permute them to the
    # provisional word ids the dict (and its suffixes' word_id) carry
    occs_lex = jnp.where(
        lex_valid, occs[jnp.clip(prov_in_lex, 0, nph_b - 1)].astype(it),
        it(0),
    )
    seg_lex = jnp.concatenate(
        (jnp.ones(1, it), it(1) + jnp.cumsum(occs_lex)[:-1])
    )
    seg_prov = seg_lex[jnp.clip(lex_of_prov, 0, nph_b - 1)]
    return dict_flat, ss, bwlast, ilist, bwsai, seg_prov


def _final_core(
    Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
    nphrases, D, dict_total, nsuf_true, total_true,
    w: int, dict_b: int, nsuf_b: int, total_b: int, impl: str = "lax",
    fanout: str = "scatter", n_levels: int = None,
    alphabet: str = "byte",
):
    import jax.numpy as jnp

    from .bwt_jax import assemble_core

    dict_flat, ss, bwlast, ilist, bwsai, seg_prov = _j3_prep_core(
        Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
        nphrases, D, dict_total, w, dict_b, impl=impl,
        n_levels=n_levels, alphabet=alphabet,
    )
    bwtc, sa_vals = assemble_core(
        dict_flat, occs, bwlast, ilist, bwsai, nsuf_true, total_true,
        w, nsuf_b, total_b, impl=impl, sorted_state=ss,
        seg_start=seg_prov, fanout=fanout,
    )
    checksum = jnp.sum(bwtc.astype(jnp.uint64)) + jnp.sum(sa_vals)
    return bwtc, sa_vals, checksum


def _j3_emit_core(
    dict_flat, ss0, ss1, ss2, ss3, ss4, occs, bwlast, ilist, bwsai,
    seg_prov, nsuf_true, total_true,
    w: int, nsuf_b: int, total_b: int, impl: str = "lax",
    fanout: str = "scatter",
):
    """Second half of the split-J3 mode: emission fan-out + final sort +
    decode as its own program over the HBM-resident prep outputs."""
    import jax.numpy as jnp

    from .bwt_jax import assemble_core

    bwtc, sa_vals = assemble_core(
        dict_flat, occs, bwlast, ilist, bwsai, nsuf_true, total_true,
        w, nsuf_b, total_b, impl=impl,
        sorted_state=(ss0, ss1, ss2, ss3, ss4),
        seg_start=seg_prov, fanout=fanout,
    )
    checksum = jnp.sum(bwtc.astype(jnp.uint64)) + jnp.sum(sa_vals)
    return bwtc, sa_vals, checksum


_final_jits = {}
_prep_jits = {}
_emit_jits = {}


# --------------------------------------------------------------------------
# host driver
# --------------------------------------------------------------------------


def pfbwt_fused_device(
    C: np.ndarray,
    w: int,
    p: int,
    want_sa: bool = False,
    want_rssa: bool = False,
    sa_dtype=np.uint64,
    fetch: bool = True,
):
    """Whole-pipeline device run over the padded char stream C.

    Returns ``(BWTResult, timings)`` when ``fetch`` (parity use), else
    ``(device_arrays, checksum)`` with everything still in HBM (bench use:
    only the checksum scalar is materialized to force completion).
    """
    import jax
    import jax.numpy as jnp

    from .bwt import BWTResult

    codes_chk = NTOA_TABLE[C]
    if codes_chk.size and codes_chk.max() > 3:
        bad = C[codes_chk > 3][0]
        die(f"invalid character {bad}/{chr(bad)} in input "
            "(use --non-acgt-to-a)")
    del codes_chk
    alphabet = dict_alphabet(C)

    C_len = int(C.shape[0])
    # n = text length incl. per-record pads, excl. Dollar sentinels
    # (pfparser.hpp:529-532): C already carries the pads, so n == |C|
    n = C_len
    n_b = _bucket(max(C_len, 1), 1 << 16)
    # empty + tail fill, not np.full: full would write all n_b bytes
    # before the copy overwrites most of them (~0.15 s of host memory
    # traffic at 64 MB on the bench VM)
    chars_p = np.empty(n_b, dtype=np.uint8)
    chars_p[:C_len] = C
    chars_p[C_len:] = ord("A")
    dev_chars = jax.device_put(chars_p)

    from ..aot import maybe_aot

    scan_impl = _default_scan_impl(w, p)

    def run_parse(nph_b):
        key2 = (nph_b, w, p, scan_impl)
        fn = maybe_aot(
            "fused_j2", key2,
            lambda: jax.jit(partial(
                _parse_core, w=w, p=p, nph_b=nph_b, scan_impl=scan_impl,
            )),
            (dev_chars, jnp.int64(C_len)), _parse_jits,
        )
        state = fn(dev_chars, jnp.int64(C_len))
        # SYNC 1: [ncuts, D, dict_total, max_len]
        meta = np.asarray(state[-1])
        return state, int(meta[0]), int(meta[1]), int(meta[2]), int(meta[3])

    nph_b = _bucket(speculative_nphrases(C_len, p))
    state, ncuts, D, dict_total, max_len = run_parse(nph_b)
    if ncuts == 0:
        die("error: only one dict word total. Re-run with a smaller p modulus")
    if ncuts + 1 > nph_b:  # speculative bound overflowed: exact re-run
        nph_b = _bucket(ncuts + 1)
        state, ncuts, D, dict_total, max_len = run_parse(nph_b)
    nphrases = ncuts + 1
    # capture-table height for J3's doubling: exact need from the max
    # dict word length (+1 safety), rounded up to a multiple of 4 so the
    # static-arg space stays small across inputs
    n_levels = capture_levels(max_len, w, alphabet)
    (Tp, parse_ranks, occs, dict_start, dict_len, last, sai, _) = state

    nsuf = (dict_total - 1 - D) - D * w
    total = n + 1
    dict_b = _bucket(dict_total)
    nsuf_b = _bucket(nsuf)
    total_b = _bucket(total)

    from .suffix import fanout_impl, sort_impl

    if os.environ.get("PFBWT_J3_SPLIT", "0") == "1":
        # two-dispatch J3: dict-scale prep program, then the emission
        # program over its HBM-resident outputs (one extra dispatch, no
        # host transfer) — isolates the emission gathers/sort from the
        # doubling loop's buffer pressure
        keyp = (w, dict_b, nph_b, sort_impl(), n_levels, alphabet)
        if keyp not in _prep_jits:
            _prep_jits[keyp] = jax.jit(
                partial(
                    _j3_prep_core, w=w, dict_b=dict_b, impl=sort_impl(),
                    n_levels=n_levels, alphabet=alphabet,
                )
            )
        dict_flat_d, ss, bwlast_d, ilist_d, bwsai_d, seg_d = _prep_jits[
            keyp
        ](
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
            jnp.int64(nphrases), jnp.int64(D), jnp.int64(dict_total),
        )
        keye = (w, dict_b, nsuf_b, total_b, nph_b, sort_impl(),
                fanout_impl())
        if keye not in _emit_jits:
            _emit_jits[keye] = jax.jit(
                partial(
                    _j3_emit_core, w=w, nsuf_b=nsuf_b, total_b=total_b,
                    impl=sort_impl(), fanout=fanout_impl(),
                )
            )
        bwt_d, sa_d, checksum_d = _emit_jits[keye](
            dict_flat_d, *ss, occs, bwlast_d, ilist_d, bwsai_d, seg_d,
            jnp.int64(nsuf), jnp.int64(total),
        )
    else:
        key3 = (w, dict_b, nsuf_b, total_b, nph_b, sort_impl(),
                fanout_impl(), n_levels, alphabet)
        j3_args = (
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
            jnp.int64(nphrases), jnp.int64(D), jnp.int64(dict_total),
            jnp.int64(nsuf), jnp.int64(total),
        )
        fn3 = maybe_aot(
            "fused_j3", key3,
            lambda: jax.jit(
                partial(
                    _final_core, w=w, dict_b=dict_b, nsuf_b=nsuf_b,
                    total_b=total_b, impl=sort_impl(),
                    fanout=fanout_impl(), n_levels=n_levels,
                    alphabet=alphabet,
                )
            ),
            j3_args, _final_jits,
        )
        bwt_d, sa_d, checksum_d = fn3(*j3_args)
    if not fetch:
        return (bwt_d, sa_d), int(np.asarray(checksum_d))

    bwtc = np.asarray(bwt_d)[:total]
    run_start = np.empty(total, dtype=bool)
    run_start[0] = True
    np.not_equal(bwtc[1:], bwtc[:-1], out=run_start[1:])
    nruns = int(np.count_nonzero(run_start))
    sa_out = ssa = esa = None
    if want_sa or want_rssa:
        sa_np = np.array(sa_d)[:total]
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
    return BWTResult(bwt=bwtc, sa=sa_out, nruns=nruns, ssa=ssa, esa=esa), None


def pfbwt_fused_records(records, params, **kw):
    """Fused run over FASTA records (build_stream + pfbwt_fused_device)."""
    from .parse import build_stream

    C, _, _ = build_stream(records, params)
    return pfbwt_fused_device(C, params.w, params.p, **kw)
