"""bcftools-style site filter expressions (-i/--include, -e/--exclude).

The reference delegates to htslib's filter engine
(consensus.cpp:288,397-401); this is a clean-room evaluator for the
practically-used core of that language over per-site fields:

  fields     TYPE, QUAL, FILTER, POS, ID, REF, ALT
  INFO       INFO/TAG or bare TAG (numeric, string, flag, or
             comma-separated vectors with any-element semantics);
             a bare flag is a boolean atom (``-i 'DB'``)
  FORMAT     GT / FMT/GT compared against bcftools genotype classes
             ("mis" "het" "hom" "ref" "alt" "hap") or a literal genotype
             ("0/1"; | and / compare equal) — true if ANY sample matches,
             bcftools' site-level semantics
  TYPE       "snp" | "indel" | "mnp" | "ref" | "other" (any ALT matches)
  operators  == (=), !=, <, <=, >, >=, && (&), || (|), !, parentheses
  literals   "strings", 'strings', numbers

POS is 1-based as in bcftools.  QUAL comparisons against a missing QUAL
('.') are false, matching htslib's missing-value semantics.  FILTER
equality treats "PASS" and "." per bcftools: FILTER="PASS" matches PASS
only; FILTER="." matches missing.  Missing INFO tags never satisfy a
comparison (and their flags are false).

Usage: ``f = compile_filter('TYPE="snp" && QUAL>30'); f(rec) -> bool``.
"""

import math
import re
from typing import Callable, List

from ..utils.errors import die

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+(?:\.\d+)?)
      | (?P<str>"[^"]*"|'[^']*')
      | (?P<op><=|>=|==|!=|&&|\|\||[<>=!()&|])
      | (?P<ident>[A-Za-z_][A-Za-z_0-9/]*)
    )""",
    re.VERBOSE,
)


def _tokenize(expr: str) -> List[str]:
    out = []
    i = 0
    while i < len(expr):
        m = _TOKEN.match(expr, i)
        if not m:
            if expr[i:].strip() == "":
                break
            die(f"filter expression: cannot parse at '{expr[i:]}'")
        out.append(m.group(0).strip())
        i = m.end()
    return out


def _rec_type(rec) -> set:
    """bcftools TYPE classes present in the record (any-ALT semantics)."""
    types = set()
    ref = rec.alleles[0]
    alts = rec.alleles[1:]
    if not alts:
        types.add("ref")
    for alt in alts:
        if alt in (".", ""):
            types.add("ref")
        elif len(ref) == 1 and len(alt) == 1:
            types.add("snp")
        elif len(ref) != len(alt):
            types.add("indel")
        elif len(ref) == len(alt) and len(ref) > 1:
            types.add("mnp")
        else:
            types.add("other")
    return types


class _Parser:
    """Recursive descent: or_expr -> and_expr -> not_expr -> cmp/atom."""

    def __init__(self, tokens: List[str]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> Callable:
        fn = self.or_expr()
        if self.peek() is not None:
            die(f"filter expression: trailing tokens at '{self.peek()}'")
        return fn

    def or_expr(self):
        left = self.and_expr()
        while self.peek() in ("||", "|"):
            self.take()
            right = self.and_expr()
            lf, rf = left, right
            left = lambda rec, lf=lf, rf=rf: lf(rec) or rf(rec)
        return left

    def and_expr(self):
        left = self.not_expr()
        while self.peek() in ("&&", "&"):
            self.take()
            right = self.not_expr()
            lf, rf = left, right
            left = lambda rec, lf=lf, rf=rf: lf(rec) and rf(rec)
        return left

    def not_expr(self):
        if self.peek() == "!":
            self.take()
            f = self.not_expr()
            return lambda rec, f=f: not f(rec)
        return self.cmp_expr()

    def _value(self):
        t = self.take()
        if t is None:
            die("filter expression: unexpected end")
        if t == "(":
            f = self.or_expr()
            if self.take() != ")":
                die("filter expression: missing ')'")
            return ("expr", f)
        if t[0] in "\"'":
            return ("str", t[1:-1])
        try:
            return ("num", float(t))
        except ValueError:
            pass
        return ("field", t)  # case kept: INFO tags are case-sensitive

    def cmp_expr(self):
        lhs = self._value()
        if lhs[0] == "expr":
            return lhs[1]
        op = self.peek()
        if op in ("==", "=", "!=", "<", "<=", ">", ">="):
            self.take()
            rhs = self._value()
            return _make_cmp(lhs, op, rhs)
        if lhs[0] == "field":  # bare field = boolean atom (INFO flags)
            name = lhs[1]
            return lambda rec, name=name: _field_truth(name, rec)
        die(f"filter expression: expected comparison after {lhs[1]}")

    # pragma: no cover — die raises


class _GTVals(list):
    """Per-sample genotype strings — distinguishes GT from INFO vectors."""


_CORE_FIELDS = {"TYPE", "QUAL", "FILTER", "POS", "ID", "REF", "ALT", "GT"}


def _info_lookup(tag: str, rec):
    """Value of INFO tag: None (absent), True (flag), or list of string
    elements (comma-split)."""
    info = getattr(rec, "info", ".") or "."
    if info in (".", ""):
        return None
    for part in info.split(";"):
        if not part:
            continue
        if "=" in part:
            k, v = part.split("=", 1)
            if k == tag:
                return v.split(",")
        elif part == tag:
            return True
    return None


def _gt_values(rec) -> "_GTVals":
    out = _GTVals()
    gts = rec.gts
    for s in range(len(gts)):
        a, b = int(gts[s][0]), int(gts[s][1])
        out.append(
            ("." if a < 0 else str(a)) + "/" + ("." if b < 0 else str(b))
        )
    return out


def _field_value(name: str, rec):
    upper = name.upper()
    if upper == "TYPE":
        return _rec_type(rec)
    if upper == "QUAL":
        return rec.qual
    if upper == "FILTER":
        return rec.filter
    if upper == "POS":
        return rec.pos + 1  # bcftools POS is 1-based
    if upper == "ID":
        return rec.vid
    if upper == "REF":
        return rec.alleles[0]
    if upper == "ALT":
        return rec.alleles[1] if len(rec.alleles) > 1 else "."
    if upper in ("GT", "FMT/GT", "FORMAT/GT"):
        return _gt_values(rec)
    if name.startswith(("INFO/", "info/")):
        return _info_lookup(name.split("/", 1)[1], rec)
    # bare identifier falls through to INFO (bcftools behavior)
    return _info_lookup(name, rec)


def _field_truth(name: str, rec) -> bool:
    """Bare-field boolean: flag present, or value present and nonzero."""
    val = _field_value(name, rec)
    if val is None:
        return False
    if val is True:
        return True
    if isinstance(val, _GTVals):
        return any(g != "./." for g in val)
    if isinstance(val, list):
        return any(v not in (".", "", "0") for v in val)
    return bool(val)


_GT_CLASSES = ("mis", "het", "hom", "ref", "alt", "hap")


def _gt_matches(g: str, want: str) -> bool:
    """One sample genotype vs a bcftools GT class or literal genotype."""
    want = want.replace("|", "/")
    a, b = g.split("/")
    low = want.lower()
    if low == "mis":
        return a == "." and b == "."
    if a == "." and b == ".":
        return low == "mis"
    if low == "het":
        return a != b and a != "." and b != "."
    if low == "hom":
        return a == b and a != "."
    if low == "ref":
        return a == "0" and b == "0"
    if low == "alt":
        return (a not in (".", "0")) or (b not in (".", "0"))
    if low == "hap":
        return a == b  # haploid records store duplicated haplotypes
    return g == want or g == "/".join(reversed(want.split("/")))


def _make_cmp(lhs, op, rhs):
    if lhs[0] != "field" and rhs[0] == "field":
        flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
        lhs, rhs = rhs, lhs
        op = flip.get(op, op)
    if lhs[0] != "field":
        die("filter expression: comparison needs a field operand")
    name = lhs[1]

    def cmp(rec):
        val = _field_value(name, rec)
        if val is None:  # absent INFO tag: no comparison matches
            return op == "!=" if rhs[0] != "num" else False
        if val is True:  # INFO flag compared numerically (FLAG=1 / =0)
            if rhs[0] == "num":
                r = rhs[1]
                return {"==": r == 1, "=": r == 1, "!=": r != 1}.get(
                    op, False
                )
            return False
        if isinstance(val, _GTVals):  # any-sample semantics
            if rhs[0] != "str":
                die("filter expression: GT compares against a string")
            hits = (_gt_matches(g, rhs[1]) for g in val)
            if op in ("==", "="):
                return any(hits)
            if op == "!=":
                return any(not h for h in hits)
            die(f"filter expression: GT does not support {op}")
        if isinstance(val, list):  # INFO vector: any-element semantics
            if rhs[0] == "num":
                nums = []
                for v in val:
                    try:
                        nums.append(float(v))
                    except ValueError:
                        pass
                r = rhs[1]
                tests = {
                    "==": lambda x: x == r, "=": lambda x: x == r,
                    "!=": lambda x: x != r, "<": lambda x: x < r,
                    "<=": lambda x: x <= r, ">": lambda x: x > r,
                    ">=": lambda x: x >= r,
                }[op]
                return any(tests(x) for x in nums)
            if op in ("==", "="):
                return rhs[1] in val
            if op == "!=":
                return any(v != rhs[1] for v in val)
            die(f"filter expression: INFO strings do not support {op}")
        if isinstance(val, set):  # TYPE
            if rhs[0] != "str":
                die("filter expression: TYPE compares against a string")
            hit = rhs[1].lower() in val
            if op in ("==", "="):
                return hit
            if op == "!=":
                return not hit
            die(f"filter expression: TYPE does not support {op}")
        if isinstance(val, float):
            if rhs[0] != "num":
                die("filter expression: numeric comparison needs a number")
            if math.isnan(val):
                return False  # missing QUAL never matches
            r = rhs[1]
            return {
                "==": val == r, "=": val == r, "!=": val != r,
                "<": val < r, "<=": val <= r, ">": val > r, ">=": val >= r,
            }[op]
        if isinstance(val, int):
            if rhs[0] != "num":
                die("filter expression: numeric comparison needs a number")
            r = rhs[1]
            return {
                "==": val == r, "=": val == r, "!=": val != r,
                "<": val < r, "<=": val <= r, ">": val > r, ">=": val >= r,
            }[op]
        # string field
        if rhs[0] != "str":
            die("filter expression: string comparison needs a string")
        if op in ("==", "="):
            return val == rhs[1]
        if op == "!=":
            return val != rhs[1]
        die(f"filter expression: strings do not support {op}")

    return cmp


def compile_filter(expr: str) -> Callable:
    """Compile a -i/-e expression into rec -> bool."""
    return _Parser(_tokenize(expr)).parse()
