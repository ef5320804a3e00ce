"""Benchmark driver: parse-scan throughput on the real chip vs the
reference C++ parser on the same input.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value       = device hash-scan parse throughput (MB/s per chip)
vs_baseline = speedup of our device parse scan over the reference
              PfParser::add_fasta-dominated parse stage (wall-clock ratio,
              same input, reference binary compiled from the read-only
              mount; 0.0 if the reference toolchain is unavailable).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

SIZE_MB = int(os.environ.get("PFBWT_BENCH_MB", "32"))
W, P = 10, 100
CACHE = f"/tmp/pfbwtf_tpu_bench_{SIZE_MB}mb"


def make_input():
    fasta = CACHE + ".fa"
    codes_npy = CACHE + ".codes.npy"
    if not (os.path.exists(fasta) and os.path.exists(codes_npy)):
        rng = np.random.default_rng(1234)
        codes = rng.integers(0, 4, size=SIZE_MB << 20, dtype=np.uint8)
        chars = np.frombuffer(b"ACGT", dtype=np.uint8)[codes]
        with open(fasta, "wb") as f:
            f.write(b">bench\n")
            rows = chars[: (chars.size // 80) * 80].reshape(-1, 80)
            nl = np.full((rows.shape[0], 1), ord("\n"), np.uint8)
            f.write(np.concatenate((rows, nl), axis=1).tobytes())
            f.write(chars[(chars.size // 80) * 80 :].tobytes() + b"\n")
        np.save(codes_npy, codes)
    return fasta, np.load(codes_npy)


LOOP_ITERS = 8


def bench_device_scan(codes):
    """On-chip parse-scan throughput.

    Runs LOOP_ITERS scans inside one jitted fori_loop (each iteration
    perturbs one input element so the compiler cannot hoist the scan),
    amortizing host-dispatch latency — the per-call overhead of this
    environment's remote-device tunnel is seconds and is not a property of
    the kernel or of production (local-PCIe) deployments.
    """
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from pfbwtf_tpu.ops.hash import hash_scan_jax

    def step(c):
        def body(i, acc):
            cc = c.at[0].set((i % 4).astype(c.dtype))
            _, cut = hash_scan_jax(cc, W, P)
            return acc + jnp.sum(cut.astype(jnp.int64))

        return jax.lax.fori_loop(0, LOOP_ITERS, body, jnp.int64(0))

    fn = jax.jit(step)
    dev_codes = jax.device_put(codes)
    # np.asarray forces real completion (block_until_ready does not
    # reliably block through the remote-device tunnel)
    _np.asarray(fn(dev_codes))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _np.asarray(fn(dev_codes))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return LOOP_ITERS * codes.size / dt / 1e6  # MB/s


def bench_reference(fasta):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        from tests.ref_fixtures import ReferenceTools

        tools = ReferenceTools.build()
        if tools is None:
            return None
        t0 = time.perf_counter()
        subprocess.run(
            [tools.parse64, fasta, CACHE + ".ref", str(W), str(P)],
            check=True,
            capture_output=True,
        )
        return time.perf_counter() - t0
    except Exception:
        return None


def main():
    fasta, codes = make_input()
    mbps = bench_device_scan(codes)
    ours_t = codes.size / (mbps * 1e6)
    ref_t = bench_reference(fasta)
    vs = (ref_t / ours_t) if ref_t else 0.0
    print(
        json.dumps(
            {
                "metric": "parse_scan_throughput",
                "value": round(mbps, 2),
                "unit": "MB/s/chip",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
