"""bcftools-style site filter expressions (-i/--include, -e/--exclude).

The reference delegates to htslib's filter engine
(consensus.cpp:288,397-401); this is a clean-room evaluator for the
practically-used core of that language over per-site fields:

  fields     TYPE, QUAL, FILTER, POS, ID, REF, ALT
  TYPE       "snp" | "indel" | "mnp" | "ref" | "other" (any ALT matches)
  operators  == (=), !=, <, <=, >, >=, && (&), || (|), !, parentheses
  literals   "strings", 'strings', numbers

POS is 1-based as in bcftools.  QUAL comparisons against a missing QUAL
('.') are false, matching htslib's missing-value semantics.  FILTER
equality treats "PASS" and "." per bcftools: FILTER="PASS" matches PASS
only; FILTER="." matches missing.

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
        return ("field", t.upper())

    def cmp_expr(self):
        lhs = self._value()
        if lhs[0] == "expr":
            return lhs[1]
        op = self.peek()
        if op in ("==", "=", "!=", "<", "<=", ">", ">="):
            self.take()
            rhs = self._value()
            return _make_cmp(lhs, op, rhs)
        # bare field used as boolean is not part of the supported core
        die(f"filter expression: expected comparison after {lhs[1]}")

    # pragma: no cover — die raises


def _field_value(name: str, rec):
    if name == "TYPE":
        return _rec_type(rec)
    if name == "QUAL":
        return rec.qual
    if name == "FILTER":
        return rec.filter
    if name == "POS":
        return rec.pos + 1  # bcftools POS is 1-based
    if name == "ID":
        return rec.vid
    if name == "REF":
        return rec.alleles[0]
    if name == "ALT":
        return rec.alleles[1] if len(rec.alleles) > 1 else "."
    die(f"filter expression: unsupported field {name}")


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
