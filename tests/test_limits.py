"""Size-limit guards: the reference dies loudly at its width caps
(pfparser.hpp:326-331, 393-405); the repo must never wrap silently.

The caps are module-level constants so the tests patch them down to
reachable values and drive real inputs over them.
"""

import numpy as np
import pytest

from pfbwtf_tpu import constants
from pfbwtf_tpu.io.formats import U32, U64
from pfbwtf_tpu.ops.parse import ParserParams, parse_records
from pfbwtf_tpu.pipeline import save_parser
from pfbwtf_tpu.utils.errors import PfbwtError
from pfbwtf_tpu.utils.limits import check_phrase_count, check_text_width


def _small_parse():
    rng = np.random.default_rng(7)
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=4000)
    return parse_records([("s", seq)], ParserParams(w=4, p=5, get_sai=True))


def test_phrase_cap_64bit_hard_limit(monkeypatch):
    monkeypatch.setattr(constants, "MAX_PHRASES_64", 10)
    with pytest.raises(PfbwtError, match=r"more than 2\^32-2 phrases"):
        _small_parse()


def test_phrase_cap_32bit(monkeypatch):
    res = _small_parse()
    monkeypatch.setattr(constants, "MAX_PHRASES_32", 10)
    with pytest.raises(PfbwtError, match=r"more than 2\^31-2 phrases"):
        save_parser(res, "/tmp/pfbwt_limits_t32", dtype=U32)
    # 64-bit output is unaffected by the 32-bit cap
    save_parser(res, "/tmp/pfbwt_limits_t64", dtype=U64)


def test_text_width_cap_32bit(monkeypatch):
    res = _small_parse()
    monkeypatch.setattr(constants, "MAX_TEXT_32", 100)
    with pytest.raises(PfbwtError, match="use 64-bit version"):
        save_parser(res, "/tmp/pfbwt_limits_w32", dtype=U32)
    save_parser(res, "/tmp/pfbwt_limits_w64", dtype=U64)


def test_check_functions_direct(monkeypatch):
    check_phrase_count(1000)  # fine at real caps
    check_text_width(1 << 40, U64)  # 64-bit: no cap
    with pytest.raises(PfbwtError):
        check_text_width((1 << 32) + 5, U32)
    monkeypatch.setattr(constants, "MAX_PHRASES_64", 5)
    with pytest.raises(PfbwtError):
        check_phrase_count(6)


def test_chunked_parse_guarded(monkeypatch, tmp_path):
    from pfbwtf_tpu.ops.chunked import parse_fasta_chunked

    fa = tmp_path / "x.fa"
    rng = np.random.default_rng(3)
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=3000))
    fa.write_bytes(b">s\n" + seq + b"\n")
    monkeypatch.setattr(constants, "MAX_PHRASES_64", 10)
    with pytest.raises(PfbwtError, match=r"more than 2\^32-2 phrases"):
        parse_fasta_chunked(str(fa), ParserParams(w=4, p=5), chunk=1 << 12)
