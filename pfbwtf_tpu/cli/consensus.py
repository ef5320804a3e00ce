"""consensus CLI (src/consensus.cpp role, pipeline-relevant subset).

The reference ships a fork of bcftools consensus extended with
-x/--markers + --marker_wsize to emit a .mps marker stream while applying
variants (consensus.cpp:683, :937).  Functionally this is vcf_scan's
haplotype materialization with bcftools-style flags, which is what this
wrapper provides: apply a sample's haplotype to the reference FASTA, write
the consensus FASTA, optionally write markers.

bcftools compatibility notes: -H is 1-based (1|2); with no sample the
reference alleles are applied (gt=0 everywhere).  The bcftools masking /
chain / IUPAC options are out of scope.
"""

import argparse
import sys

from ..io.fasta import write_fai
from ..vcf.reader import merge_vcfs
from ..vcf.scan import scan_vcf_sample


def main(argv=None):
    ap = argparse.ArgumentParser(prog="consensus")
    ap.add_argument("vcfs", nargs="+")
    ap.add_argument("-f", "--fasta-ref", required=True, dest="ref")
    ap.add_argument("-s", "--sample", default="")
    ap.add_argument("-H", "--haplotype", type=int, default=1,
                    help="1-based haplotype (bcftools convention)")
    ap.add_argument("-o", "--output", default="-",
                    help="output fasta ('-' = stdout)")
    ap.add_argument("-x", "--markers", default="",
                    help="write marker positions (.mps) to this file")
    ap.add_argument("--marker_wsize", type=int, default=10)
    ap.add_argument("-w", "--window-size", type=int, default=10, dest="w")
    args = ap.parse_args(argv)

    write_fai(args.ref)
    vcf = merge_vcfs(args.vcfs)
    res = scan_vcf_sample(
        vcf,
        args.ref,
        args.sample,
        max(args.haplotype - 1, 0),
        w=args.w,
        ma_wsize=args.marker_wsize,
        ref_only=(args.sample == ""),
        want_markers=bool(args.markers),
    )
    out = sys.stdout if args.output == "-" else open(args.output, "w")
    for name, seq in res.records:
        out.write(f">{name}\n")
        out.write(seq.tobytes().decode("ascii") + "\n")
    if out is not sys.stdout:
        out.close()
    if args.markers:
        with open(args.markers, "wb") as f:
            f.write(res.mps_bytes)
    return 0


if __name__ == "__main__":
    sys.exit(main())
