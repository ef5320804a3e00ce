"""Per-stage wall-clock instrumentation.

Prints ``TASK\t<name>\t<sec>`` lines to stderr — the same text contract as
the reference's RAII Timer (pfbwt-f.cpp:35-50) so that downstream tooling
that greps TASK lines keeps working.
"""

import sys
import time
from contextlib import contextmanager


@contextmanager
def task_timer(name: str, file=None):
    out = file if file is not None else sys.stderr
    start = time.perf_counter()
    try:
        yield
    finally:
        dur = time.perf_counter() - start
        print(f"TASK\t{name}\t{dur:.2f}s", file=out)
