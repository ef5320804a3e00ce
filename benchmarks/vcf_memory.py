"""Peak-RSS probe for panel-scale VCF parsing (VERDICT r2 item 6).

Generates a synthetic bgzip'd VCF of SITES x SAMPLES biallelic SNPs,
parses it with vcf/reader.py, and reports peak RSS plus the GT matrix
footprint.  PFBWT_GT_MMAP_MB controls the memmap spill threshold (set it
low to bound RSS below the matrix size).

Usage: [PFBWT_VCF_SITES=200000] [PFBWT_VCF_SAMPLES=1000]
       [PFBWT_GT_MMAP_MB=...] python benchmarks/vcf_memory.py
"""

import gzip
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SITES = int(os.environ.get("PFBWT_VCF_SITES", "200000"))
SAMPLES = int(os.environ.get("PFBWT_VCF_SAMPLES", "1000"))
PATH = f"/tmp/pfbwt_panel_{SITES}x{SAMPLES}.vcf.gz"


def make_input():
    if os.path.exists(PATH):
        return
    rng = np.random.default_rng(9)
    gts = np.frombuffer(b"0|01|00|11|1", dtype="S3").reshape(4)
    with gzip.open(PATH, "wb", compresslevel=1) as f:
        f.write(b"##fileformat=VCFv4.2\n")
        f.write(b"##contig=<ID=c1,length=%d>\n" % (SITES * 10 + 10))
        f.write(b'##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n')
        f.write(
            b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + b"\t".join(b"s%d" % i for i in range(SAMPLES))
            + b"\n"
        )
        for chunk0 in range(0, SITES, 2000):
            rows = []
            hi = min(chunk0 + 2000, SITES)
            picks = rng.integers(0, 4, size=(hi - chunk0, SAMPLES))
            for r, site in enumerate(range(chunk0, hi)):
                cols = gts[picks[r]]
                rows.append(
                    b"c1\t%d\tv%d\tA\tG\t50\tPASS\t.\tGT\t" % (
                        site * 10 + 1, site)
                    + b"\t".join(cols) + b"\n"
                )
            f.write(b"".join(rows))


def main():
    make_input()
    from pfbwtf_tpu.vcf.reader import VCF

    t0 = time.perf_counter()
    v = VCF(PATH)
    dt = time.perf_counter() - t0
    st = v._store["c1"]
    gt_bytes = st.gts.nbytes
    peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(
        f"sites={SITES} samples={SAMPLES} parse={dt:.1f}s "
        f"gt_matrix={gt_bytes / 1e6:.0f}MB "
        f"gt_is_memmap={isinstance(st.gts, np.memmap)} "
        f"peak_rss={peak_kb / 1024:.0f}MB"
    )


if __name__ == "__main__":
    main()
