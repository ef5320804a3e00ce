"""vcf_to_bwt CLI: flag surface of the reference orchestrator
(vcf_to_bwt.py:296-320)."""

import argparse
import sys

from ..io import formats
from ..vcf.pipeline import VcfToBwtConfig, vcf_to_bwt


def main(argv=None):
    ap = argparse.ArgumentParser(prog="vcf_to_bwt")
    ap.add_argument("fasta", help="reference fasta file")
    ap.add_argument("vcf", nargs="+", help="vcf/bcf files with haplotype panel")
    ap.add_argument("--samples", "-S",
                    help="file of newline-delimited samples (default: all)")
    ap.add_argument("--threads", "-t", type=int, default=1)
    ap.add_argument("--save_fasta", "-f", action="store_true")
    ap.add_argument("-o", default="out")
    ap.add_argument("--no_merge", action="store_true",
                    help="accepted for compatibility (merge is implicit)")
    ap.add_argument("--clean", action="store_true")
    ap.add_argument("--ma", "-m", action="store_true",
                    help="build marker array")
    ap.add_argument("--keep_parse", action="store_true")
    ap.add_argument("-s", "--sa", action="store_true")
    ap.add_argument("-r", "--rssa", action="store_true")
    ap.add_argument("--mmap", "-M", action="store_true")
    ap.add_argument("--ma_wsize", default=1, type=int)
    ap.add_argument("--wsize", default=10, type=int)
    ap.add_argument("--mod", default=10, type=int)
    ap.add_argument("--contigs", default="",
                    help="comma-separated contig subset (uses the VCF's "
                         ".csi/.tbi index to seek when present)")
    ap.add_argument("--u32", action="store_true")
    ap.add_argument("--device", action="store_true",
                    help="device-resident pipeline (scan, dict sort, "
                         "parse-BWT, assembly, SA->MA on the accelerator)")
    ap.add_argument("--fused", action="store_true",
                    help="HBM-chained whole-pipeline device run for the "
                         "parse->BWT->SA stages (no checkpoint files)")
    ap.add_argument("--mesh", action="store_true",
                    help="fused mesh pipeline: collective parse + "
                         "distributed emission sort over the device mesh")
    args = ap.parse_args(argv)
    if args.device:
        from ..engine import enable_device_pipeline

        enable_device_pipeline()

    samples = None
    if args.samples:
        samples = [
            s for s in open(args.samples).read().strip().split("\n") if s
        ]
    cfg = VcfToBwtConfig(
        fasta=args.fasta,
        vcfs=args.vcf,
        output=args.o,
        samples=samples,
        wsize=args.wsize,
        mod=args.mod,
        ma_wsize=args.ma_wsize,
        sa=args.sa,
        rssa=args.rssa,
        ma=args.ma,
        save_fasta=args.save_fasta,
        keep_parse=args.keep_parse or not args.clean,
        threads=args.threads,
        dtype=formats.U32 if args.u32 else formats.U64,
        contigs=[c for c in args.contigs.split(",") if c] or None,
        fused=args.fused,
        mesh=args.mesh,
    )
    vcf_to_bwt(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
