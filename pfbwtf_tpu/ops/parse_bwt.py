"""BWT of the parse: bwlast / ilist / bwsai construction.

Array re-expression of PfParser::bwt_of_parse (pfparser.hpp:380-467):

* SA of parse_ranks + [0] terminator (the sacak_int call, :425) comes from
  the doubling kernel in ops/suffix.py.
* The SA->bwlast/bwsai permutation (:431-451) becomes two gathers with the
  reference's exact wrap conventions: SA[0]=n -> last[n-2]/sai[n-1];
  SA[i]==0 -> (0, 0); SA[i]==1 -> last wraps to last[n-1].
* The F-array counting sort into ilist (:452-462) is a stable argsort of the
  parse-BWT symbols — identical output, fully parallel.
"""

from dataclasses import dataclass

import numpy as np

from ..utils.errors import die
from .suffix import sort_impl, suffix_array_ints_np


def _parse_sa_host(seq):
    """SA of the parse-rank sequence: native SA-IS when available, else
    numpy doubling."""
    try:
        from ..native import available, suffix_array_ints_native

        if available():
            return suffix_array_ints_native(seq)
    except Exception:
        pass
    return suffix_array_ints_np(seq)


@dataclass
class ParseBWT:
    bwlast: np.ndarray  # uint8, n+1
    ilist: np.ndarray  # int64 positions, n+1
    bwsai: np.ndarray  # uint64, n+1 (empty when get_sai is off)
    bwt_sym: np.ndarray  # parse-BWT symbols (phrase ranks, 0 = EOS), n+1


def parse_bwt_core(ranks_p, last_p, sai_p, n, impl: str = "lax"):
    """Traceable parse-BWT body: doubling SA + wrap-gather permutes +
    stable-argsort ilist.  ``ranks_p`` is padded to a bucket grid; a
    strictly descending sentinel tail is placed AFTER the terminator
    (sentinels exceed every rank, so every padded suffix sorts after every
    real suffix and the true SA occupies the first n+1 slots unchanged).
    Reused by the standalone jit below and the fused program (ops/fused.py).
    """
    import jax.numpy as jnp

    from .suffix import _doubling_jax, sort_impl

    m = ranks_p.shape[0]  # bucketed; true length n <= m
    idx = jnp.arange(m + 1, dtype=jnp.int64)
    big = jnp.int64(np.iinfo(np.int64).max // 2)
    seq = jnp.where(
        idx < n,
        ranks_p[jnp.clip(idx, 0, m - 1)],
        jnp.where(idx == n, 0, big - idx),
    )
    SA, _ = _doubling_jax(seq, impl=impl)
    zero = SA == 0
    bwlast = jnp.where(
        zero, jnp.uint8(0), last_p[jnp.clip((SA - 2) % n, 0, m - 1)]
    )
    bwsai = jnp.where(
        zero,
        jnp.uint64(0),
        sai_p[jnp.clip((SA - 1) % n, 0, m - 1)],
    )
    sym = jnp.where(zero, 0, ranks_p[jnp.clip((SA - 1) % n, 0, m - 1)])
    sym = sym.at[0].set(ranks_p[jnp.clip(n - 1, 0, m - 1)])
    # padded rows (positions n+1..m in SA order) must sort last; ranks
    # <= n <= m, so m+1 is a past-every-rank sentinel that keeps the sort
    # key in int32 (avoids emulated 64-bit comparators on TPU)
    valid = idx <= n
    if m < 2**31 - 4:
        sym = jnp.where(valid, sym, jnp.int64(m + 1))
        if impl == "radix":
            from .radix import key_bits, radix_argsort_u32

            # radix is stable, matching argsort(stable=True)
            ilist = radix_argsort_u32(
                sym.astype(jnp.int32), nbits=key_bits(m + 1)
            ).astype(jnp.int64)
        else:
            ilist = jnp.argsort(sym.astype(jnp.int32), stable=True).astype(
                jnp.int64
            )
    else:
        sym = jnp.where(valid, sym, big)
        ilist = jnp.argsort(sym, stable=True)
    return bwlast, ilist, bwsai, sym


_pb_jit = None


def bwt_of_parse_device(
    parse_ranks: np.ndarray,
    last: np.ndarray,
    sai: np.ndarray,
    get_sai: bool = True,
) -> ParseBWT:
    """Fully on-device parse-BWT (see parse_bwt_core)."""
    global _pb_jit
    import jax

    if _pb_jit is None:
        _pb_jit = jax.jit(parse_bwt_core, static_argnames=("impl",))

    parse_ranks = np.asarray(parse_ranks, dtype=np.int64)
    n = parse_ranks.shape[0]
    if n == 1:
        die("error: only one dict word total. Re-run with a smaller p modulus")
    n_b = max(4096, 1 << int(np.ceil(np.log2(max(n, 2)))))

    def pad(a, dtype, fill=0):
        out = np.full(n_b, fill, dtype=dtype)
        out[: a.shape[0]] = a
        return out

    sai = np.asarray(sai, dtype=np.uint64)
    if sai.shape[0] == 0:
        sai = np.zeros(n, dtype=np.uint64)
    bwlast, ilist, bwsai, sym = _pb_jit(
        pad(parse_ranks, np.int64),
        pad(np.asarray(last, dtype=np.uint8), np.uint8),
        pad(sai, np.uint64),
        np.int64(n),
        impl=sort_impl(),
    )
    bwlast = np.asarray(bwlast)[: n + 1].astype(np.uint8)
    ilist = np.asarray(ilist)[: n + 1].astype(np.int64)
    sym = np.asarray(sym)[: n + 1].astype(np.int64)
    bwsai = (
        np.asarray(bwsai)[: n + 1].astype(np.uint64)
        if get_sai
        else np.zeros(0, dtype=np.uint64)
    )
    return ParseBWT(bwlast=bwlast, ilist=ilist, bwsai=bwsai, bwt_sym=sym)


def bwt_of_parse(
    parse_ranks: np.ndarray,
    last: np.ndarray,
    sai: np.ndarray,
    get_sai: bool = True,
    sa_fn=None,
) -> ParseBWT:
    if sa_fn is None:
        sa_fn = _parse_sa_host
    parse_ranks = np.asarray(parse_ranks, dtype=np.int64)
    n = parse_ranks.shape[0]
    if n == 1:
        die("error: only one dict word total. Re-run with a smaller p modulus")
    seq = np.concatenate((parse_ranks, np.zeros(1, dtype=np.int64)))
    SA = np.asarray(sa_fn(seq), dtype=np.int64)  # length n+1, SA[0] == n
    assert SA[0] == n, "parse SA must start with the terminator suffix"

    last = np.asarray(last)
    sai = np.asarray(sai, dtype=np.uint64)
    zero = SA == 0
    # bwlast: preceding-phrase "last" char with the reference's wrap quirks
    bwlast = np.where(zero, np.uint8(0), last[(SA - 2) % n])
    if get_sai:
        bwsai = np.where(zero, np.uint64(0), sai[(SA - 1) % n])
    else:
        bwsai = np.zeros(0, dtype=np.uint64)
    # parse-BWT symbols: phrase rank preceding each suffix (0 for EOS)
    bwt_sym = np.where(zero, 0, parse_ranks[(SA - 1) % n])
    bwt_sym[0] = parse_ranks[n - 1]
    # ilist = stable counting sort by symbol (== ilist[F[sym]++] = i)
    ilist = np.argsort(bwt_sym, kind="stable").astype(np.int64)
    return ParseBWT(
        bwlast=bwlast.astype(np.uint8),
        ilist=ilist,
        bwsai=bwsai,
        bwt_sym=bwt_sym,
    )
