"""Warm the committed AOT executable store for the driver bench shapes.

Runs the fused on-chip pipeline over exactly the inputs bench.py generates
(same seeds, same sizes), with PFBWT_AOT_SAVE=1 so the J2/J3 executables are
serialized into <repo>/bench_aot.  Commit the resulting blobs: the driver's
bench VM then skips tracing+lowering entirely (measured ~8 min for the two
programs on the 2-vCPU VM) and starts executing in seconds.

Usage: python scripts/warm_bench_aot.py [sizes_mb ...]   (default: 16 64)
"""

import json
import os
import sys
import time

os.environ.setdefault("PFBWT_AOT_SAVE", "1")
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("PFBWT_AOT_DIR", os.path.join(repo, "bench_aot"))
os.makedirs(os.environ["PFBWT_AOT_DIR"], exist_ok=True)
sys.path.insert(0, repo)

import bench  # noqa: E402


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [16, 64]
    from pfbwtf_tpu.io.fasta import read_fasta_bytes
    from pfbwtf_tpu.ops.fused import pfbwt_fused_device
    from pfbwtf_tpu.ops.parse import ParserParams, build_stream

    cks_path = os.path.join(os.environ["PFBWT_AOT_DIR"], "checksums.json")
    try:
        with open(cks_path) as fh:
            checksums = json.load(fh)
    except OSError:
        checksums = {}
    for size_mb in sizes:
        fasta = bench.make_pangenome_input(size_mb)
        records = read_fasta_bytes(fasta)
        C, _, _ = build_stream(records, ParserParams(w=bench.W, p=bench.P))
        t0 = time.time()
        _, checksum = pfbwt_fused_device(C, bench.W, bench.P, fetch=False)
        print(f"{size_mb} MB warmed in {time.time() - t0:.1f} s "
              f"(checksum {checksum})", flush=True)
        t0 = time.time()
        _, checksum2 = pfbwt_fused_device(C, bench.W, bench.P, fetch=False)
        print(f"{size_mb} MB warm re-run {time.time() - t0:.1f} s", flush=True)
        assert checksum2 == checksum
        # recorded so bench.py can verify the AOT executables still
        # compute the same pipeline (guards against stale-blob bugs)
        checksums[str(size_mb)] = int(checksum)
    with open(cks_path, "w") as fh:
        json.dump(checksums, fh, indent=1)


if __name__ == "__main__":
    main()
