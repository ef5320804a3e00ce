"""Past-the-HBM-ceiling capability run: streamed fused pipeline at >=1 GB.

The monolithic fused J3 holds ~10 total_b-length arrays (ceiling
~128-192 MB input on a 16 GB chip); the streamed pipeline
(ops/fused_stream.py) keeps only dict-scale state resident and emits the
BWT/SA in group-aligned chunks.  This harness runs it at SIZE_MB (default
1024) on a pan-genome-style input (PAN_COPIES near-identical haplotypes —
the panel workload PFP targets, so the dictionary stays unit-sized) in
checksum-only mode (only per-chunk u64 checksums leave HBM; on this rig
D2H runs at tunnel speed, which no locally attached TPU exhibits).

Exactness evidence at this scale: the checksum equals the sum of all
n+1 BWT bytes + SA values, and the identical code path is byte-diffed
against the host pipeline at test sizes (tests/test_fused_stream.py) and
CLI-diffed vs the monolithic device path (--fused vs --fused -m).

Usage: [PFBWT_BENCH_MB=1024] [PFBWT_BENCH_PAN_COPIES=32] \
       python benchmarks/stream_big.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE_MB = int(os.environ.get("PFBWT_BENCH_MB", "1024"))
PAN_COPIES = int(os.environ.get("PFBWT_BENCH_PAN_COPIES", "32"))
W, P = 10, 100
CACHE = f"/tmp/pfbwtf_tpu_stream_{SIZE_MB}mb_{PAN_COPIES}c"


def make_input():
    fasta = CACHE + ".pan.fa"
    if not os.path.exists(fasta):
        rng = np.random.default_rng(4321)
        acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
        unit = acgt[rng.integers(0, 4, size=(SIZE_MB << 20) // PAN_COPIES)]
        with open(fasta, "wb") as f:
            for i in range(PAN_COPIES):
                hap = unit.copy()
                nmut = hap.size // 1000
                pos = rng.integers(0, hap.size, size=nmut)
                hap[pos] = acgt[rng.integers(0, 4, size=nmut)]
                f.write(b">hap%d\n" % i)
                f.write(hap.tobytes())
                f.write(b"\n")
    return fasta


def _peak_rss_gb():
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)


def main():
    from pfbwtf_tpu.io.fasta import read_fasta_bytes
    from pfbwtf_tpu.ops.fused_stream import pfbwt_fused_stream
    from pfbwtf_tpu.ops.parse import ParserParams, build_stream

    fasta = make_input()
    records = read_fasta_bytes(fasta)
    C, _, _ = build_stream(records, ParserParams(w=W, p=P))
    print(f"input {C.size >> 20} MB, {PAN_COPIES} haplotypes", flush=True)

    chunk_target = int(os.environ.get("PFBWT_STREAM_CHUNK",
                                      str(48 << 20)))
    t0 = time.perf_counter()
    _, total, ck = pfbwt_fused_stream(C, W, P, chunk_target=chunk_target)
    dt = time.perf_counter() - t0
    print(
        f"streamed fused e2e: {dt:.1f} s  "
        f"({C.size / dt / 1e6:.2f} MB/s/chip, cold incl. compiles)  "
        f"total={total}  checksum={ck:#018x}",
        flush=True,
    )
    t0 = time.perf_counter()
    _, total, ck2 = pfbwt_fused_stream(C, W, P, chunk_target=chunk_target)
    dt = time.perf_counter() - t0
    assert ck2 == ck, "nondeterministic checksum"
    print(
        f"streamed fused e2e (warm): {dt:.1f} s  "
        f"({C.size / dt / 1e6:.2f} MB/s/chip)  "
        f"host peak RSS {_peak_rss_gb():.2f} GB "
        f"({_peak_rss_gb() / (SIZE_MB / 1024):.2f}x text)",
        flush=True,
    )
    if os.environ.get("PFBWT_STREAM_REF", "1") != "0":
        import subprocess

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from tests.ref_fixtures import ReferenceTools

        tools = ReferenceTools.build()
        if tools is not None:
            t0 = time.perf_counter()
            subprocess.run(
                [tools.pfbwt64, fasta, CACHE + ".ref", str(W), str(P),
                 "1", "0"],
                check=True, capture_output=True,
            )
            ref_dt = time.perf_counter() - t0
            print(
                f"reference pfbwt-f64 (full 3 stages + disk writes): "
                f"{ref_dt:.1f} s -> vs_baseline {ref_dt / dt:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
