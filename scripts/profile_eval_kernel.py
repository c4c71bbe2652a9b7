"""Isolate the column-eval kernel's pieces on the chip: conv alone, to7,
reduce, S-mul, and the full eval_fn — to find where the time goes."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lcpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from lcpc_tpu.fields import FT255
from lcpc_tpu.ops.limbs import get_ops
from lcpc_tpu.ops.mxu_ntt import ReducePlan, _conv_digits, _to7, _from7


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(label, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    log(f"{label}: {dt*1e3:.1f} ms")
    return dt


def main():
    spec = FT255
    ops = get_ops(spec)
    rows, chunk, k = 256, 2048, 189
    w7 = 37
    n_super = 8  # per-block super-chunks to time as a scan
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.integers(0, 1 << 16, (ops.w, rows, chunk * 2 * n_super),
                                 dtype=np.uint32))
    k7 = jnp.asarray(rng.integers(0, 128, (w7, chunk * 2, k),
                                  dtype=np.int8).astype(np.int8))
    plan = ReducePlan(spec, chunk * 2, split_acc=True)

    # 1) conv alone (both sub-convs of one super-chunk)
    @jax.jit
    def conv_only(x, k7):
        acc = None
        for s in range(n_super):
            for a in range(2):
                sl = jax.lax.dynamic_slice(
                    x, (0, 0, (2 * s + a) * chunk), (ops.w, rows, chunk))
                x7 = _to7(sl, w7)
                pl = _conv_digits(
                    x7, jax.lax.dynamic_slice(k7, (0, a * chunk, 0),
                                              (w7, chunk, k))
                ).astype(jnp.uint32)
                acc = pl if acc is None else acc + pl
        return acc

    macs = 2 * n_super * (w7 * w7) * rows * chunk * k
    dt = timeit("to7+conv+acc (16 convs)", conv_only, x, k7)
    log(f"  -> {macs/dt/1e12:.0f} int8-Tops effective")

    # 2) to7 alone
    @jax.jit
    def to7_only(x):
        outs = []
        for s in range(2 * n_super):
            sl = jax.lax.dynamic_slice(
                x, (0, 0, s * chunk), (ops.w, rows, chunk))
            outs.append(jnp.sum(_to7(sl, w7).astype(jnp.int32)))
        return sum(outs)

    timeit("to7 alone (16 chunks)", to7_only, x)

    # 3) conv without to7 (pre-digitized input)
    x7_all = jnp.asarray(rng.integers(0, 128, (w7, rows, chunk * 2 * n_super),
                                      dtype=np.int8).astype(np.int8))

    @jax.jit
    def conv_raw(x7_all, k7):
        acc = None
        for s in range(n_super):
            for a in range(2):
                sl = jax.lax.dynamic_slice(
                    x7_all, (0, 0, (2 * s + a) * chunk), (w7, rows, chunk))
                pl = _conv_digits(
                    sl, jax.lax.dynamic_slice(k7, (0, a * chunk, 0),
                                              (w7, chunk, k))
                ).astype(jnp.uint32)
                acc = pl if acc is None else acc + pl
        return acc

    dt = timeit("conv alone (16 convs)", conv_raw, x7_all, k7)
    log(f"  -> {macs/dt/1e12:.0f} int8-Tops effective")

    # 3b) the same contraction as ONE dot_general per digit pair sum —
    # i.e. materialize band on the kernel side, chunk=512 slices
    bchunk = 512
    kb = jnp.asarray(rng.integers(0, 128, (w7 * bchunk, k * (2 * w7 - 1)),
                                  dtype=np.int8).astype(np.int8))

    @jax.jit
    def banded(x7_all, kb):
        acc = None
        n_mm = 2 * n_super * chunk // bchunk
        for s in range(n_mm):
            sl = jax.lax.dynamic_slice(
                x7_all, (0, 0, s * bchunk), (w7, rows, bchunk))
            # (W7, rows, bc) -> (rows, bc*W7)
            x2 = jnp.transpose(sl, (1, 2, 0)).reshape(rows, bchunk * w7)
            pl = jax.lax.dot_general(
                x2, kb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.uint32)
            acc = pl if acc is None else acc + pl
        return acc

    macs_b = (2 * n_super * chunk) * w7 * k * (2 * w7 - 1) * rows
    dt = timeit("banded dot (chunk 512)", banded, x7_all, kb)
    log(f"  -> {macs_b/dt/1e12:.0f} Tops padded ({macs/dt/1e12:.0f} useful)")

    # 4) reduce alone
    planes = jnp.asarray(
        rng.integers(0, 1 << 31, (2 * w7 - 1, rows, k), dtype=np.int64
                     ).astype(np.uint32))

    @jax.jit
    def reduce_only(planes):
        outs = []
        for s in range(n_super):
            outs.append(plan.reduce(planes + jnp.uint32(s)))
        return sum(jnp.sum(o.astype(jnp.uint32)) for o in outs)

    timeit(f"reduce alone (x{n_super})", reduce_only, planes)

    # 5) S-mul + add alone
    part = jnp.asarray(rng.integers(0, 1 << 16, (ops.w, rows, k),
                                    dtype=np.uint32))
    s_m = jnp.asarray(rng.integers(0, 1 << 16, (ops.w, 1, k),
                                   dtype=np.uint32))

    @jax.jit
    def smul_only(part, s_m):
        acc = jnp.zeros_like(part)
        for s in range(n_super):
            acc = ops.add(acc, ops.mul(part, jnp.broadcast_to(s_m, part.shape)))
        return acc

    timeit(f"S-mul+add alone (x{n_super})", smul_only, part, s_m)

    # 6) from7 alone
    digs = jnp.asarray(rng.integers(0, 128, (w7, rows, k), dtype=np.uint32
                                    ).astype(np.uint8))

    @jax.jit
    def from7_only(digs):
        outs = []
        for s in range(n_super):
            outs.append(_from7(digs + jnp.uint8(s), ops.w))
        return sum(jnp.sum(o) for o in outs)

    timeit(f"from7 alone (x{n_super})", from7_only, digs)


if __name__ == "__main__":
    main()
