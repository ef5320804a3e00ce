"""pfbwt-f CLI: flag-compatible with the reference binary
(src/pfbwt-f.cpp:102-182).

    python -m pfbwtf_tpu.cli.pfbwt_f [options] <fasta file>

Width: ``--u32`` selects the 32-bit build's file widths (pfbwt-f);
default is 64-bit (pfbwt-f64).
"""

import argparse
import sys

import numpy as np

from ..io import formats
from ..ops.parse import ParserParams
from ..pipeline import PfbwtConfig, run_parser, run_pfbwt
from ..utils.errors import PfbwtError


def build_argparser():
    ap = argparse.ArgumentParser(
        prog="pfbwt-f",
        description="prefix-free parsing BWT for genomic data (TPU-native)",
    )
    ap.add_argument("fasta", nargs="?", default="-")
    ap.add_argument("-o", "--output", default="")
    ap.add_argument("-s", "--sa", action="store_true",
                    help="output full suffix array to <prefix>.sa")
    ap.add_argument("-r", "--rssa", action="store_true",
                    help="output run-length sampled SA to .ssa/.esa")
    ap.add_argument("-w", "--window-size", type=int, default=10, dest="w")
    ap.add_argument("-p", "--mod-val", type=int, default=100, dest="p")
    ap.add_argument("-m", "--mmap", action="store_true",
                    help="out-of-core mode: memmap-backed stage-3 inputs, "
                         ".gsa/.glcp workspace spill, and streamed "
                         "bounded-RAM assembly")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--pfbwt-only", action="store_true")
    ap.add_argument("--trim-non-acgt", action="store_true")
    ap.add_argument("--non-acgt-to-a", action="store_true")
    ap.add_argument("--print-docs", action="store_true")
    ap.add_argument("-c", "--stdout", default="", dest="stdout_ext",
                    help="output file ending <ext> goes to stdout (bwt, sa)")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--u32", action="store_true",
                    help="32-bit integer file widths (reference pfbwt-f)")
    ap.add_argument("--chunk-mb", type=int, default=0,
                    help="bounded-memory parse: stream the scan through the "
                         "device in chunks of this many MB (0 = whole-array)")
    ap.add_argument("--device", action="store_true",
                    help="device-resident pipeline: run scan, dict sort, "
                         "parse-BWT and assembly on the accelerator")
    ap.add_argument("--fused", action="store_true",
                    help="HBM-chained whole-pipeline device run: chars -> "
                         ".bwt/.sa with no host hops between stages (writes "
                         "final outputs only, no checkpoint files)")
    ap.add_argument("--mesh", action="store_true",
                    help="parse collectively on the local device mesh "
                         "(halo-exchange scan + all_to_all dictionary "
                         "sample-sort)")
    ap.add_argument("--shards", type=int, default=0,
                    help="pod-style parse: split into N shards, parse in "
                         "parallel, merge (0 = single stream)")
    ap.add_argument("--workers", type=int, default=0,
                    help="process workers for --shards (default: shards)")
    ap.add_argument("-f", action="store_true", help=argparse.SUPPRESS)  # legacy
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)
    print("==== Command line:", " ".join(sys.argv), file=sys.stderr)
    if args.device:
        from ..engine import enable_device_pipeline

        enable_device_pipeline()
    if args.non_acgt_to_a and args.trim_non_acgt:
        print("cannot have both --non-acgt-to-a and --trim-non-acgt",
              file=sys.stderr)
        return 1
    if args.fasta == "-" and not args.output:
        print("if reading from stdin, need a prefix for output files (-o)",
              file=sys.stderr)
        return 1
    if args.parse_only and args.pfbwt_only:
        print("cannot simultaneously do parse_only and pfbwt_only",
              file=sys.stderr)
        return 1
    output = args.output or args.fasta
    dtype = formats.U32 if args.u32 else formats.U64
    try:
        if args.fused:
            return _run_fused(args, output, dtype)
        n = None
        if not args.pfbwt_only:
            print("running parser...", file=sys.stderr)
            params = ParserParams(
                w=args.w,
                p=args.p,
                get_sai=args.sa or args.rssa,
                store_docs=args.print_docs,
                non_acgt_to_a=args.non_acgt_to_a,
                trim_non_acgt=args.trim_non_acgt,
                verbose=args.verbose,
            )
            if args.mesh:
                from ..io import formats as _fmt
                from ..io.fasta import read_fasta_bytes
                from ..parallel.dict_union import distributed_parse_records
                from ..parallel.pfbwt_mesh import mesh_parse_bwt
                from ..parallel.sharded import make_parse_mesh
                from ..pipeline import save_parser

                mesh = make_parse_mesh()
                res = distributed_parse_records(
                    read_fasta_bytes(args.fasta), params, mesh
                )
                save_parser(res, output, dtype)
                # stage 2 over the mesh (distributed doubling + ilist sort)
                pb = mesh_parse_bwt(
                    res.parse_ranks, res.last, res.sai, mesh,
                    get_sai=params.get_sai,
                )
                _fmt.write_u8(output + ".bwlast", pb.bwlast)
                _fmt.write_uint(output + ".ilist", pb.ilist, dtype)
                if params.get_sai:
                    _fmt.write_uint(output + ".bwsai", pb.bwsai, dtype)
                n = res.n
            elif args.shards > 1:
                from ..parallel.driver import pod_parse

                res = pod_parse(
                    args.fasta, output, params, nshards=args.shards,
                    workers=args.workers or args.shards, dtype=dtype,
                )
                n = res.n
            elif args.chunk_mb > 0:
                from ..ops.chunked import parse_fasta_chunked
                from ..pipeline import save_parse_bwt, save_parser

                res = parse_fasta_chunked(
                    args.fasta, params, chunk=args.chunk_mb << 20
                )
                save_parser(res, output, dtype)
                save_parse_bwt(res, output, dtype, sa=params.get_sai)
                n = res.n
            else:
                n = run_parser(args.fasta, output, params, dtype)
        if not args.parse_only:
            print("generating BWT using pfbwt algorithm...", file=sys.stderr)
            mesh = None
            if args.mesh:
                from ..parallel.sharded import make_parse_mesh

                mesh = make_parse_mesh()
            cfg = PfbwtConfig(
                prefix=output,
                w=args.w,
                sa=args.sa,
                rssa=args.rssa,
                verbose=args.verbose,
                dtype=dtype,
                stdout_ext=args.stdout_ext,
                mesh=mesh,
                mmap=args.mmap and mesh is None,
            )
            run_pfbwt(cfg, n)
    except PfbwtError as e:
        print(str(e), file=sys.stderr)
        return 1
    return 0


def _run_fused(args, output: str, dtype) -> int:
    """Whole-pipeline device run (ops/fused.py): .bwt/.sa[/.ssa/.esa] out.

    With -m/--mmap the STREAMED variant runs instead (ops/fused_stream.py):
    the emission assembly is dispatched in group-aligned chunks and the
    outputs leave HBM chunk by chunk — inputs past the monolithic
    program's HBM ceiling (the device analogue of the reference's
    out-of-core -m mode, file_wrappers.hpp:36-124).

    With --mesh the FUSED MESH pipeline runs (parallel/fused_mesh.py):
    sharded parse + collective dict union, one dict-scale emitter-table
    program, sharded emission keys + distributed sample-sort + sharded
    decode — the multi-chip form of the same architecture."""
    from ..io.fasta import read_fasta_bytes
    from ..ops.fused import pfbwt_fused_records
    from ..utils.limits import check_text_width
    from ..utils.timer import task_timer

    params = ParserParams(
        w=args.w, p=args.p, non_acgt_to_a=args.non_acgt_to_a,
        verbose=args.verbose,
    )
    if args.mesh:
        from ..parallel.fused_mesh import pfbwt_fused_mesh_records
        from ..parallel.sharded import make_parse_mesh

        with task_timer("fused mesh pipeline (parse+pfbwt)"):
            res = pfbwt_fused_mesh_records(
                read_fasta_bytes(args.fasta), params, make_parse_mesh(),
                want_sa=args.sa, want_rssa=args.rssa, sa_dtype=dtype,
            )
        return _write_fused_outputs(args, output, dtype, res)
    if args.mmap:
        from ..ops.fused_stream import pfbwt_fused_stream
        from ..ops.parse import build_stream

        C, _, _ = build_stream(read_fasta_bytes(args.fasta), params)
        bwt_fp = (
            sys.stdout.buffer if args.stdout_ext == "bwt"
            else open(output + ".bwt", "wb")
        )
        sa_fp = None
        if args.sa:
            sa_fp = (
                sys.stdout.buffer if args.stdout_ext == "sa"
                else open(output + ".sa", "wb")
            )
        with task_timer("fused device pipeline, streamed (parse+pfbwt)"):
            out = pfbwt_fused_stream(
                C, args.w, args.p, bwt_fp=bwt_fp, sa_fp=sa_fp,
                sa_dtype=dtype, want_rssa=args.rssa,
            )
        nruns, total = out[0], out[1]
        if args.rssa:
            ssa, esa = out[3], out[4]
            with open(output + ".ssa", "wb") as f:
                f.write(ssa.astype(dtype).tobytes())
            with open(output + ".esa", "wb") as f:
                f.write(esa.astype(dtype).tobytes())
        for fp in (bwt_fp, sa_fp):
            if fp is not None and fp is not sys.stdout.buffer:
                fp.close()
        n = total - 1
        check_text_width(n, dtype)
        print(f"n: {n}", file=sys.stderr)
        print(f"r: {nruns}", file=sys.stderr)
        print(f"n/r: {n / nruns:.3f}", file=sys.stderr)
        return 0
    with task_timer("fused device pipeline (parse+pfbwt)"):
        res, _ = pfbwt_fused_records(
            read_fasta_bytes(args.fasta), params,
            want_sa=args.sa, want_rssa=args.rssa, sa_dtype=dtype,
        )
    return _write_fused_outputs(args, output, dtype, res)


def _write_fused_outputs(args, output: str, dtype, res) -> int:
    from ..utils.limits import check_text_width

    n = res.bwt.shape[0] - 1
    check_text_width(n, dtype)
    bwt_fp = (
        sys.stdout.buffer if args.stdout_ext == "bwt"
        else open(output + ".bwt", "wb")
    )
    bwt_fp.write(res.bwt.tobytes())
    if bwt_fp is not sys.stdout.buffer:
        bwt_fp.close()
    if args.sa:
        sa_fp = (
            sys.stdout.buffer if args.stdout_ext == "sa"
            else open(output + ".sa", "wb")
        )
        sa_fp.write(res.sa.astype(dtype).tobytes())
        if sa_fp is not sys.stdout.buffer:
            sa_fp.close()
    if args.rssa:
        with open(output + ".ssa", "wb") as f:
            f.write(res.ssa.astype(dtype).tobytes())
        with open(output + ".esa", "wb") as f:
            f.write(res.esa.astype(dtype).tobytes())
    print(f"n: {n}", file=sys.stderr)
    print(f"r: {res.nruns}", file=sys.stderr)
    print(f"n/r: {n / res.nruns:.3f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
