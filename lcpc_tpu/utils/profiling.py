"""Lightweight observability: stage timers + optional XLA profiler traces.

The reference's observability is `Instant`-based bench printlns parsed by
print_bench.sh (SURVEY.md §5); this module provides the same granularity for
the TPU build plus an opt-in `jax.profiler` trace for kernel-level analysis.

Usage:
    with stage("commit/encode"):
        ...
    print(report())

Set LCPC_XPROF_DIR=/path to additionally capture an XLA profiler trace for
every `profile_region`.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

_times: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def stage(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _times[name].append(time.perf_counter() - t0)


@contextlib.contextmanager
def profile_region(name: str):
    """stage() plus an optional jax.profiler trace (LCPC_XPROF_DIR)."""
    trace_dir = os.environ.get("LCPC_XPROF_DIR")
    if trace_dir:
        import jax

        with jax.profiler.trace(os.path.join(trace_dir, name)):
            with stage(name):
                yield
    else:
        with stage(name):
            yield


def report() -> str:
    lines = []
    for name in sorted(_times):
        ts = _times[name]
        lines.append(
            f"{name}: n={len(ts)} total={sum(ts):.3f}s "
            f"mean={sum(ts)/len(ts)*1e3:.1f}ms min={min(ts)*1e3:.1f}ms"
        )
    return "\n".join(lines)


def reset() -> None:
    _times.clear()
