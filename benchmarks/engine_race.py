"""Identical-conditions race of the J3 emission engines at one size.

Configs: {fill, scatter} x {monolithic, split-J3}.  All four run in ONE
process on the same input and device state; each is compiled+warmed, then
timed (min of REPS).  Settles the engine-default question that separate
noisy runs cannot (ref wall on this VM varies 24-37 s at 64 MB).

Usage: [PFBWT_BENCH_MB=64] python benchmarks/engine_race.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE_MB = int(os.environ.get("PFBWT_BENCH_MB", "64"))
CACHE = f"/tmp/pfbwtf_tpu_bench_{SIZE_MB}mb"
W, P = 10, 100
REPS = 2


def main():
    from pfbwtf_tpu.io.fasta import read_fasta_bytes
    from pfbwtf_tpu.ops.fused import pfbwt_fused_device
    from pfbwtf_tpu.ops.parse import ParserParams, build_stream

    fasta = CACHE + ".pan.fa"
    if not os.path.exists(fasta):
        sys.exit(f"missing bench input {fasta}; run bench.py first")
    records = read_fasta_bytes(fasta)
    C, _, _ = build_stream(records, ParserParams(w=W, p=P))
    print(f"input {C.size >> 20} MB", flush=True)

    configs = [
        ("fill monolithic", "fill", "0"),
        ("fill split-J3", "fill", "1"),
        ("scatter monolithic", "scatter", "0"),
        ("scatter split-J3", "scatter", "1"),
    ]
    checks = set()
    for label, fanout, split in configs:
        os.environ["PFBWT_FANOUT"] = fanout
        os.environ["PFBWT_J3_SPLIT"] = split
        _, ck = pfbwt_fused_device(C, W, P, fetch=False)  # compile + warm
        checks.add(ck)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _, ck2 = pfbwt_fused_device(C, W, P, fetch=False)
            times.append(time.perf_counter() - t0)
            assert ck2 == ck
        print(f"{label:22s} {min(times):7.2f} s  "
              f"({C.size / min(times) / 1e6:.2f} MB/s/chip)", flush=True)
    assert len(checks) == 1, f"engines disagree: {checks}"
    print("all engines agree on the output checksum", flush=True)


if __name__ == "__main__":
    main()
