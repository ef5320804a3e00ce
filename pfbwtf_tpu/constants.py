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
