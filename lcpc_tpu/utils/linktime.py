"""Host<->device link-time accounting for prove/verify.

The corpus records wall times, but on this rig the chip sits behind a
~30 MB/s tunneled link, so a 7 MB proof has a ~0.25 s hard transfer floor
per side that says nothing about the chip (benchmarks/README.md).  To
record compute-only columns WITHOUT forking the production code into a
staged twin, the transfer points in protocol/streaming call `pull`/`push`
below; when a measurement is active they time the transfer synchronously
and accumulate it, otherwise they are passthroughs.

    with linktime.measure() as m:
        pf = comm.prove(outer, tr)
    compute_ns = wall_ns - m.ns

Timing a transfer requires making it synchronous (device_get / devices
block), which forfeits a little dispatch overlap — so measurement mode is
strictly opt-in and the default path is untouched.
"""

from __future__ import annotations

import contextlib
import time

_active = None


class LinkMeasure:
    def __init__(self):
        self.ns = 0
        self.bytes = 0


@contextlib.contextmanager
def measure():
    global _active
    prev = _active
    m = LinkMeasure()
    _active = m
    try:
        yield m
    finally:
        _active = prev


def pull(x):
    """Device array -> numpy (times the transfer when measuring)."""
    import jax
    import numpy as np

    if _active is None:
        return np.asarray(x)
    jax.block_until_ready(x)  # do not bill pending compute to the link
    t0 = time.perf_counter_ns()
    out = np.asarray(jax.device_get(x))
    _active.ns += time.perf_counter_ns() - t0
    _active.bytes += out.nbytes
    return out


def pull_tree(xs):
    """device_get on a tuple/list (single timed transfer)."""
    import jax
    import numpy as np

    if _active is None:
        return jax.device_get(xs)
    jax.block_until_ready(xs)
    t0 = time.perf_counter_ns()
    out = jax.device_get(xs)
    _active.ns += time.perf_counter_ns() - t0
    for o in out:
        _active.bytes += np.asarray(o).nbytes
    return out


def push(x):
    """numpy -> device array (times the upload when measuring)."""
    import jax
    import jax.numpy as jnp

    if _active is None:
        return jnp.asarray(x)
    t0 = time.perf_counter_ns()
    out = jax.device_put(x)
    out.block_until_ready()
    _active.ns += time.perf_counter_ns() - t0
    _active.bytes += out.nbytes
    return out
