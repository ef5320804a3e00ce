#!/usr/bin/env python3
"""Independent truth-set generator (scripts/generate_truth_set.py role).

Builds the e2e acceptance artifacts for a FASTA+VCF case WITHOUT any PFP
machinery: haplotypes by direct position splicing, the suffix array by a
brute-force kernel, the BWT by the textbook formula, markers by direct
simulation — a deliberately different code path from the pipeline so the
byte-diff gate is meaningful (the reference used bcftools consensus +
pysuffixarray the same way, generate_truth_set.py:83-98).

Outputs, matching the committed tests/data formats:
  {out}.bwt      n+1 bytes (0x00 terminator row included)
  {out}.sa       text, one SA value per line (SA[0] == n)
  {out}.markers  text, "sa_index seqid refpos allele" per marked position

Usage:
  python scripts/generate_truth_set.py ref.fa panel.vcf.gz -o out [-w 10]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="generate_truth_set")
    ap.add_argument("fasta")
    ap.add_argument("vcfs", nargs="+")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-w", "--window-size", type=int, default=10, dest="w")
    ap.add_argument("-S", "--samples", default="",
                    help="file of sample names (default: all VCF samples)")
    args = ap.parse_args(argv)

    from tests.oracle import oracle_outputs

    from pfbwtf_tpu.io.fasta import write_fai
    from pfbwtf_tpu.vcf.reader import merge_vcfs

    write_fai(args.fasta)
    vcf = merge_vcfs(args.vcfs)
    samples = (
        [s for s in open(args.samples).read().split() if s]
        if args.samples
        else vcf.samples
    )
    big, sa, bwt, markers, marker_lines = oracle_outputs(
        args.fasta, vcf, samples, w=args.w
    )
    with open(args.output + ".bwt", "wb") as f:
        f.write(bwt.tobytes())
    # newline conventions byte-match the committed reference truth files:
    # .sa has NO trailing newline, .markers has one
    with open(args.output + ".sa", "w") as f:
        f.write("\n".join(str(int(v)) for v in sa))
    with open(args.output + ".markers", "w") as f:
        f.write("\n".join(marker_lines) + "\n")
    print(f"wrote {args.output}.bwt/.sa/.markers "
          f"(n={big.shape[0]}, {len(marker_lines)} marked rows)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
