"""On-chip sort engine comparison: lax.sort (bitonic) vs radix (LSD).

Measures the exact shapes the pipeline sorts — the doubling round's
(rank, key2) pair argsort and a single bounded-key argsort — at several
sizes, on whatever device jax dials (the real TPU under axon; CPU with
JAX_PLATFORM_NAME=cpu).  Each timing amortizes dispatch with a fori_loop
whose body perturbs one element so XLA cannot hoist the sort.

Usage:  python benchmarks/sort_bench.py [sizes ...]
Prints one JSON line per (engine, size).
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pfbwtf_tpu.ops.radix import key_bits, radix_argsort_pair

ITERS = 8


@partial(jax.jit, static_argnames=("nb",))
def _pair_lax(hi, lo, nb):
    n = hi.shape[0]

    def body(i, acc):
        h = hi.at[0].set(i % n)
        key = h.astype(jnp.int64) * jnp.int64(n + 1) + lo.astype(jnp.int64)
        order = jnp.argsort(key)
        return acc + order[0]

    return jax.lax.fori_loop(0, ITERS, body, jnp.int64(0))


@partial(jax.jit, static_argnames=("nb", "bits"))
def _pair_radix(hi, lo, nb, bits):
    def body(i, acc):
        h = hi.at[0].set((i % hi.shape[0]).astype(jnp.int32))
        order = radix_argsort_pair(h, lo, nbits_hi=nb, nbits_lo=nb, bits=bits)
        return acc + order[0].astype(jnp.int64)

    return jax.lax.fori_loop(0, ITERS, body, jnp.int64(0))


def run(n: int):
    rng = np.random.default_rng(7)
    hi = rng.integers(0, n, size=n).astype(np.int32)
    lo = rng.integers(0, n, size=n).astype(np.int32)
    nb = key_bits(n)
    d_hi, d_lo = jax.device_put(hi), jax.device_put(lo)

    variants = [("lax", lambda: _pair_lax(d_hi, d_lo, nb))]
    for bits in (2, 4):
        variants.append(
            (f"radix{bits}", partial(_pair_radix, d_hi, d_lo, nb, bits))
        )
    for name, fn in variants:
        np.asarray(fn())  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn())
            times.append(time.perf_counter() - t0)
        per_sort = min(times) / ITERS
        print(
            json.dumps(
                {
                    "engine": name,
                    "n": n,
                    "ms_per_sort": round(per_sort * 1e3, 3),
                    "melem_per_s": round(n / per_sort / 1e6, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [1 << 16, 1 << 20, 1 << 23]
    for s in sizes:
        run(s)
