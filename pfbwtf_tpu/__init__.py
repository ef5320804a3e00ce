"""pfbwt-f_tpu: a TPU-native prefix-free-parsing BWT engine.

A ground-up re-design of the capabilities of pfbwt-f (alshai/pfbwt-f,
reference anchors cited per-module) for TPU hardware: the byte-level file
contracts and the algorithmic outputs are identical, but the compute path is
idiomatic JAX/XLA/Pallas — vectorized hash scans, prefix-doubling suffix
sorts built on `jax.lax.sort`, scatter/gather BWT assembly, and
`jax.sharding` collectives for multi-chip scale — rather than a translation
of the reference's sequential C++.

64-bit integer support is required for exact Wang-hash arithmetic and
genome-scale offsets, so importing this package enables jax_enable_x64.
"""

from .utils.malloc_tuning import tune_malloc

tune_malloc()

import os  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA compiles are expensive through the
# remote-device tunnel (minutes); cache them across processes.  The engine
# also buckets array shapes (engine.parse_stream) so cache hits dominate.
# Default location is INSIDE the source checkout (gitignored): /tmp does
# not survive to the driver's bench environment, the repo does — a warm
# cache is the difference between a 20 s and a 10 min bench run.
_default_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".xla_cache",
)
_cache_dir = os.environ.get("PFBWT_COMPILE_CACHE", _default_cache)
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .constants import (  # noqa: E402
    Dollar,
    EndOfWord,
    EndOfDict,
    EXT,
)

__version__ = "0.1.0"

__all__ = [
    "Dollar",
    "EndOfWord",
    "EndOfDict",
    "EXT",
]
