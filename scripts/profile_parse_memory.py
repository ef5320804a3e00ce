#!/usr/bin/env python3
"""Bounded-memory parse profile: peak RSS + Python-object census for a
large FASTA through the chunked parse (the -m / out-of-core path).

Evidence for the flat-dictionary design goal (round-1 VERDICT item 2):
the parse of a multi-GB FASTA must hold O(1) Python objects per stage —
the dictionary is (memmap text, starts, lens) arrays, never a phrase
list — and RSS must stay far below text size.

Usage:
  python scripts/profile_parse_memory.py [--mb 1024] [--chunk-mb 16]
"""

import argparse
import gc
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def make_fasta(path: str, mb: int, copies: int = 8):
    if os.path.exists(path) and os.path.getsize(path) > (mb << 20):
        return
    rng = np.random.default_rng(77)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    unit = acgt[rng.integers(0, 4, size=(mb << 20) // copies)]
    with open(path, "wb") as f:
        for i in range(copies):
            hap = unit.copy()
            nmut = hap.size // 1000
            pos = rng.integers(0, hap.size, size=nmut)
            hap[pos] = acgt[rng.integers(0, 4, size=nmut)]
            f.write(b">hap%d\n" % i)
            step = 1 << 20
            for lo in range(0, hap.size, step):
                f.write(hap[lo : lo + step].tobytes())
            f.write(b"\n")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=1024)
    ap.add_argument("--chunk-mb", type=int, default=16)
    ap.add_argument("--workdir", default="/tmp")
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

    fasta = os.path.join(args.workdir, f"memprof_{args.mb}mb.fa")
    out = os.path.join(args.workdir, f"memprof_{args.mb}mb")
    t0 = time.time()
    if not (os.path.exists(fasta) and os.path.getsize(fasta) > (args.mb << 20)):
        # generate in a subprocess: the generator's working set must not
        # pollute this process's RSS high-water mark
        import subprocess

        subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "from scripts.profile_parse_memory import make_fasta; "
             "make_fasta(%r, %d)"
             % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                fasta, args.mb)],
            check=True,
        )
    print(f"[{time.time()-t0:7.1f}s] fasta ready "
          f"({os.path.getsize(fasta)>>20} MB), RSS {rss_mb():.0f} MB",
          flush=True)

    from pfbwtf_tpu.ops.chunked import parse_fasta_chunked
    from pfbwtf_tpu.ops.parse import ParserParams
    from pfbwtf_tpu.pipeline import save_parser

    gc.collect()
    nobj0 = len(gc.get_objects())
    params = ParserParams(w=10, p=100, get_sai=True)
    res = parse_fasta_chunked(fasta, params, chunk=args.chunk_mb << 20,
                              workdir=args.workdir)
    t_parse = time.time() - t0
    gc.collect()
    nobj1 = len(gc.get_objects())
    nph = res.parse_ranks.shape[0]
    D = res.dict_starts.shape[0]
    print(f"[{t_parse:7.1f}s] parsed: n={res.n} phrases={nph} dict={D} "
          f"RSS {rss_mb():.0f} MB  python-objects +{nobj1-nobj0} "
          f"(phrases would be +{D} as a list)", flush=True)

    save_parser(res, out)
    print(f"[{time.time()-t0:7.1f}s] checkpoint written, peak RSS "
          f"{rss_mb():.0f} MB for {args.mb} MB input "
          f"({rss_mb()/args.mb:.2f}x text)", flush=True)


if __name__ == "__main__":
    main()
