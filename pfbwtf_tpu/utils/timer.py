"""Per-stage wall-clock instrumentation + profiler hooks.

Prints ``TASK\t<name>\t<sec>`` lines to stderr — the same text contract as
the reference's RAII Timer (pfbwt-f.cpp:35-50) so that downstream tooling
that greps TASK lines keeps working.

Set ``PFBWT_PROFILE=<dir>`` to additionally capture a JAX/XLA profiler
trace of every timed stage into <dir> (one trace for the whole process,
each stage wrapped in a named TraceAnnotation — open with TensorBoard or
xprof).  This is the TPU-native upgrade of the reference's stderr-only
tracing (SURVEY.md §5.1).
"""

import atexit
import os
import sys
import time
from contextlib import contextmanager

_trace_started = False


def _maybe_start_trace():
    """Start a process-wide profiler trace once, if PFBWT_PROFILE is set."""
    global _trace_started
    prof_dir = os.environ.get("PFBWT_PROFILE", "")
    if not prof_dir or _trace_started:
        return prof_dir
    import jax

    jax.profiler.start_trace(prof_dir)
    _trace_started = True

    def _stop():
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass

    atexit.register(_stop)
    return prof_dir


@contextmanager
def task_timer(name: str, file=None):
    out = file if file is not None else sys.stderr
    profiling = _maybe_start_trace()
    if profiling:
        import jax

        ann = jax.profiler.TraceAnnotation(name)
        ann.__enter__()
    start = time.perf_counter()
    try:
        yield
    finally:
        dur = time.perf_counter() - start
        if profiling:
            ann.__exit__(None, None, None)
        print(f"TASK\t{name}\t{dur:.2f}s", file=out)
