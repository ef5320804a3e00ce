"""Special symbols and the file-extension registry.

Byte-level contract mirrors the reference (utils.h:8-31): these values appear
verbatim inside .dict files and as the BWT EOS byte, so they are fixed.
"""

# Special symbols used by the construction algorithm. They cannot appear in
# the input text; 0x00 is used in the final .bwt file as the EOS char.
Dollar = 2  # parsing sentinel; highest special char
EndOfWord = 1  # word delimiter inside the .dict file
EndOfDict = 0  # terminator of the .dict file


class EXT:
    """File-name extension registry (utils.h:17-31)."""

    PARSE = "parse"
    PARS0 = "parse_old"
    OCC = "occ"
    DICT = "dict"
    DICZ = "dicz"
    LST = "last"
    BWLST = "bwlast"
    SAI = "sai"
    BWSAI = "bwsai"
    ILIST = "ilist"
    SA = "sa"
    SSA = "ssa"
    ESA = "esa"
    GSA = "gsa"
    GLCP = "glcp"
    BWT = "bwt"
    N = "n"
    DOCS = "docs"
    MPS = "mps"
    MA = "ma"


# Default parsing parameters (pfparser.hpp:37-38).
DEFAULT_W = 10
DEFAULT_P = 100

# Window size is capped because the rolling k-mer is 2-bit packed into a
# uint64 (pfparser.hpp:371-376, hash.hpp:26-27).
MAX_W = 32

# Size limits, with the reference's exact semantics:
# * 32-bit build: text <= 2^32-1 chars (pfparser.hpp:326-331) and parse
#   <= 2^31-2 phrases (pfparser.hpp:393-398);
# * 64-bit build: parse <= 2^32-2 phrases — a hard limit because parse
#   ranks are int_text == uint32 in both builds (pfparser.hpp:399-405,
#   gsacak.h:64).
# Module-level so tests can patch them down to reachable values.
MAX_TEXT_32 = 0xFFFFFFFF
MAX_PHRASES_32 = 0x7FFFFFFE
MAX_PHRASES_64 = 0xFFFFFFFE
