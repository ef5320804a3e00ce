"""glibc malloc tuning for large-array workloads.

Raises M_MMAP_THRESHOLD / M_TRIM_THRESHOLD so numpy's large temporaries are
served from the reused sbrk heap instead of fresh mmap regions.  On
virtualized hosts with lazily-populated memory (first-touch page faults in
the ~10 MB/s range on this environment's firecracker VM), re-faulting fresh
mappings for every temporary dominates end-to-end wall-clock by 100x; heap
reuse pays the population cost once per high-water mark.

No-op (harmless) where glibc is absent or mallopt fails.
"""

import ctypes

_M_MMAP_THRESHOLD = -3
_M_TRIM_THRESHOLD = -1


def tune_malloc(threshold_bytes: int = 1 << 30) -> bool:
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, threshold_bytes)
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, threshold_bytes)
        return bool(ok1 and ok2)
    except OSError:
        return False
