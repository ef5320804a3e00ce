"""Per-stage wall-clock breakdown of the fused on-chip pipeline.

Separates the rig's host-sync overhead (tunnel RTTs on this remote-
attached chip) from device compute: times each program dispatch+sync of
pfbwt_fused_device's chain individually, plus upload.  Run AFTER the
shapes are in the persistent compile cache (bench.py warms them).

Usage: [PFBWT_BENCH_MB=16] python benchmarks/e2e_breakdown.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE_MB = int(os.environ.get("PFBWT_BENCH_MB", "16"))
CACHE = f"/tmp/pfbwtf_tpu_bench_{SIZE_MB}mb"
W, P = 10, 100


def main():
    import jax
    import jax.numpy as jnp

    from pfbwtf_tpu.io.fasta import read_fasta_bytes
    from pfbwtf_tpu.ops import fused
    from pfbwtf_tpu.ops.parse import ParserParams, build_stream

    fasta = CACHE + ".pan.fa"
    if not os.path.exists(fasta):
        sys.exit(f"missing bench input {fasta}; run bench.py first")
    records = read_fasta_bytes(fasta)
    C, _, _ = build_stream(records, ParserParams(w=W, p=P))

    # warm everything (compile-cache hits)
    fused.pfbwt_fused_device(C, W, P, fetch=False)

    def t(label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{label:28s} {dt*1e3:9.1f} ms", flush=True)
        return out

    C_len = int(C.shape[0])
    n_b = fused._bucket(max(C_len, 1), 1 << 16)
    chars_p = np.full(n_b, ord("A"), dtype=np.uint8)
    chars_p[:C_len] = C

    print(f"input {SIZE_MB} MB  (n_b={n_b})")
    dev_chars = t("H2D upload (device_put)",
                  lambda: jax.block_until_ready(jax.device_put(chars_p)))

    nph_b = fused._bucket(fused.speculative_nphrases(C_len, P))
    key2 = (nph_b, W, P)
    state = t("J2 parse dispatch (async)", lambda: fused._parse_jits[key2](
        dev_chars, jnp.int64(C_len)))
    meta = t("J2 sizing fetch (4 scalars)",
             lambda: np.asarray(state[-1]))
    ncuts, D, dict_total = int(meta[0]), int(meta[1]), int(meta[2])
    n_levels = fused.capture_levels(int(meta[3]), W)
    assert ncuts + 1 <= nph_b, "speculative bucket overflow on bench input"
    (Tp, parse_ranks, occs, dict_start, dict_len, last, sai, _) = state

    nsuf = (dict_total - 1 - D) - D * W
    total = C_len + 1
    dict_b = fused._bucket(dict_total)
    nsuf_b = fused._bucket(nsuf)
    total_b = fused._bucket(total)
    from pfbwtf_tpu.ops.suffix import fanout_impl, sort_impl

    key3 = (W, dict_b, nsuf_b, total_b, nph_b, sort_impl(), fanout_impl(),
            n_levels)
    out3 = t("J3 assemble dispatch (async)", lambda: fused._final_jits[key3](
        Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
        jnp.int64(ncuts + 1), jnp.int64(D), jnp.int64(dict_total),
        jnp.int64(nsuf), jnp.int64(total),
    ))
    t("J3 compute+checksum fetch", lambda: int(np.asarray(out3[2])))
    t("whole chain (2nd run)", lambda: fused.pfbwt_fused_device(
        C, W, P, fetch=False))


if __name__ == "__main__":
    main()
