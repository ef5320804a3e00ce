#!/usr/bin/env python3
"""Random VCF generator for fuzz-style testing (scripts/random_vcf.py
role, extended with indels — the library lives in tests/vcf_gen.py and
drives the independent-oracle fuzz harness).

Usage:
  python scripts/random_vcf.py ref.fa -o out.vcf [--samples 2]
      [--density 0.01] [--indel-frac 0.2] [--seed 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="random_vcf")
    ap.add_argument("fasta")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--density", type=float, default=0.01)
    ap.add_argument("--af", type=float, default=0.5)
    ap.add_argument("--indel-frac", type=float, default=0.2)
    ap.add_argument("--max-indel", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import numpy as np

    from tests.vcf_gen import random_vcf

    from pfbwtf_tpu.io.fasta import read_fasta

    contigs = read_fasta(args.fasta)
    random_vcf(
        args.output,
        contigs,
        np.random.default_rng(args.seed),
        nsamples=args.samples,
        density=args.density,
        af=args.af,
        indel_frac=args.indel_frac,
        max_indel=args.max_indel,
    )
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
