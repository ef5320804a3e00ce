from . import hash as hash_ops
from . import suffix
from . import parse
from . import parse_bwt
from . import bwt

__all__ = ["hash_ops", "suffix", "parse", "parse_bwt", "bwt"]
