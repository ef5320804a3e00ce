"""Nucleotide code tables.

Behavioral contract from the reference (utils.c:139-180):

* ``NTOA_TABLE`` feeds the rolling hash (hash.hpp:30). It maps A/a->0,
  C/c->1, G/g->2, T/t->3, and — quirks preserved on purpose — N/n->0
  (hashed like 'A') and '-'->3 (hashed like 'T').  Everything else maps to 5,
  which the hasher treats as a fatal invalid character.
* ``NT4_TABLE`` drives the ``--non-acgt-to-a`` normalization
  (pfparser.hpp:342-344).  Only A/C/G/T (either case) map to 0..3; everything
  else (including N and '-') maps to 4 and is replaced by 'A' before hashing
  and storage.
"""

import numpy as np


def _build_ntoa() -> np.ndarray:
    t = np.full(256, 5, dtype=np.uint8)
    for chars, v in (("Aa", 0), ("Cc", 1), ("Gg", 2), ("Tt", 3)):
        for ch in chars:
            t[ord(ch)] = v
    # Reference quirks: N hashes like A, '-' hashes like T, and the IUPAC
    # wobble letters B/D/H/K/M/R/S/V/W/X/Y are *invalid* for the hasher.
    t[ord("N")] = 0
    t[ord("n")] = 0
    t[ord("-")] = 3
    return t


def _build_nt4() -> np.ndarray:
    t = np.full(256, 4, dtype=np.uint8)
    for chars, v in (("Aa", 0), ("Cc", 1), ("Gg", 2), ("Tt", 3)):
        for ch in chars:
            t[ord(ch)] = v
    return t


NTOA_TABLE = _build_ntoa()
NT4_TABLE = _build_nt4()

# Uppercasing table (std::toupper over the byte range, pfparser.hpp:337).
UPPER_TABLE = np.arange(256, dtype=np.uint8)
for _c in range(ord("a"), ord("z") + 1):
    UPPER_TABLE[_c] = _c - 32


def ntoa_codes_jax(chars_u8):
    """NTOA_TABLE as arithmetic compare/selects for PRE-VALIDATED device
    chars (the drivers die on any byte the table maps to 5 before
    dispatch).  The 256-entry LUT gather costs ~0.6 s over a 75 M-lane
    input on v5e (TPU gathers are ~120 M lanes/s even from tiny tables);
    four u8 compares + selects fuse into the downstream hash scan for
    free.  Mapping: A/a/N/n->0, C/c->1, G/g->2, T/t/'-'->3."""
    import jax.numpy as jnp

    u = chars_u8 & jnp.uint8(0xDF)  # uppercase ASCII letters
    return jnp.where(
        u == jnp.uint8(ord("C")),
        jnp.uint8(1),
        jnp.where(
            u == jnp.uint8(ord("G")),
            jnp.uint8(2),
            jnp.where(
                (u == jnp.uint8(ord("T"))) | (chars_u8 == jnp.uint8(ord("-"))),
                jnp.uint8(3),
                jnp.uint8(0),
            ),
        ),
    )
