"""merge_pfp CLI (src/merge_pfp.cpp:22-72 flag surface)."""

import argparse
import sys

from ..io import formats
from ..ops.parse import ParserParams
from ..pipeline import save_parse_bwt, save_parser
from ..parallel.merge import merge_parse_prefixes
from ..utils.errors import PfbwtError


def main(argv=None):
    ap = argparse.ArgumentParser(prog="merge_pfp")
    ap.add_argument("prefixes", nargs="+")
    ap.add_argument("-o", "--output", default="out")
    ap.add_argument("-w", "--window-size", type=int, default=10, dest="w")
    ap.add_argument("-p", "--mod-val", type=int, default=100, dest="p")
    ap.add_argument("-t", "--threads", type=int, default=1)
    ap.add_argument("-d", "--docs", action="store_true")
    ap.add_argument("-s", "--sai", action="store_true")
    ap.add_argument("--parse-bwt", action="store_true")
    ap.add_argument("--u32", action="store_true")
    args = ap.parse_args(argv)
    dtype = formats.U32 if args.u32 else formats.U64
    params = ParserParams(
        w=args.w, p=args.p, get_sai=args.sai, store_docs=args.docs
    )
    try:
        res = merge_parse_prefixes(args.prefixes, params)
        save_parser(res, args.output, dtype)
        if args.parse_bwt:
            save_parse_bwt(res, args.output, dtype, sa=args.sai)
    except PfbwtError as e:
        print(str(e), file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
