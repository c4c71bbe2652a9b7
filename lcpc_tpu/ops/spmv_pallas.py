"""Pallas TPU kernel for the expander SpMV's inner op: slot-sum of
Montgomery products with one deferred reduction.

The XLA formulation (ops.limbs.mul_sum_mont) reaches only ~7% of VPU peak at
Brakedown level shapes — the K*W^2 limb-product accumulation spills between
fusions.  This kernel keeps one (K, W, TR, TN) gather block in VMEM and runs
the whole chain — accumulate, carry-normalize, Montgomery reduce, conditional
subtract — in registers/VMEM, one output tile per grid step.

Semantics (bit-identical to mul_sum_mont, twin-tested):
  out[w, r, c] = (sum_k vals[k, :, c] * g[k, :, r, c]) * R^{-1} mod p
with all operands 16-bit-limb Montgomery form in u32 lanes.

Reference analogue: the per-level CSC SpMV of the recursive encode
(lcpc-brakedown-pc/src/encode.rs:36-94).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.spec import FieldSpec

MASK16 = 0xFFFF  # plain int: jnp scalars would be captured as pallas consts


def _limbs16(value: int, w: int) -> list[int]:
    return [(value >> (16 * i)) & 0xFFFF for i in range(w)]


def _build_kernel(spec: FieldSpec, k_slots: int, max_mult: int):
    w = spec.w16
    n0_16 = _limbs16(spec.n0inv_full, w)
    p_16 = _limbs16(spec.p, w)

    def norm(cols, out_limbs):
        """Carry-normalize u32 columns (< 2^32) to 16-bit limbs."""
        L = len(cols)
        tmp = [None] * (L + 1)
        for i in range(L):
            lo = cols[i] & MASK16
            hi = cols[i] >> 16
            tmp[i] = lo if tmp[i] is None else tmp[i] + lo
            tmp[i + 1] = hi
        out = []
        carry = None
        for i in range(min(L + 1, out_limbs + 1)):
            c = tmp[i] if carry is None else tmp[i] + carry
            out.append(c & MASK16)
            carry = c >> 16
        zero = jnp.zeros_like(out[0])
        while len(out) < out_limbs:
            out.append(zero)
        return out[:out_limbs]

    def conv_const_full(a, b16):
        """cols[i+j] += lo(a_i*b_j); cols[i+j+1] += hi — general version."""
        L = len(a) + len(b16)
        cols = [None] * L
        for i, ai in enumerate(a):
            for j, bj in enumerate(b16):
                if bj == 0:
                    continue
                t = ai * bj
                lo = t & MASK16
                hi = t >> 16
                kk = i + j
                cols[kk] = lo if cols[kk] is None else cols[kk] + lo
                cols[kk + 1] = hi if cols[kk + 1] is None else cols[kk + 1] + hi
        zero = None
        for c in cols:
            if c is not None:
                zero = jnp.zeros_like(c)
                break
        return [c if c is not None else zero for c in cols]

    def mont_reduce(v):
        """(len(v) 16-bit limbs) -> (len(v)-w+1) limbs of (V + m*p)/R."""
        m = norm(conv_const_full(v[:w], n0_16)[:w], w)
        mp = conv_const_full(m, p_16)  # 2w columns
        L = max(len(v), len(mp)) + 1
        s_cols = []
        for i in range(L):
            t = None
            if i < len(v):
                t = v[i]
            if i < len(mp):
                t = mp[i] if t is None else t + mp[i]
            s_cols.append(t if t is not None else jnp.zeros_like(v[0]))
        s = norm(s_cols, L)
        return s[w:]

    def cond_sub_chain(limbs):
        m = 1
        while m * 2 < max_mult:
            m *= 2
        while m >= 1:
            c16 = _limbs16(m * spec.p, len(limbs))
            # lexicographic limbs >= c
            ge = None
            eq = None
            for i in range(len(limbs) - 1, -1, -1):
                ci = c16[i]
                gti = limbs[i] > ci
                eqi = limbs[i] == ci
                if ge is None:
                    ge, eq = gti, eqi
                else:
                    ge = ge | (eq & gti)
                    eq = eq & eqi
            ge = ge | eq
            sub = []
            borrow = 0
            for i in range(len(limbs)):
                d = limbs[i] - c16[i] - borrow
                sub.append(d & MASK16)
                borrow = (d >> 31) & 1
            limbs = [jnp.where(ge, s, o) for s, o in zip(sub, limbs)]
            m //= 2
        return limbs

    def kernel(vals_ref, g_ref, out_ref, acc_ref):
        # grid: (n blocks, r blocks, k chunks) — k innermost so the output
        # block (whose index_map ignores k) stays resident while the column
        # accumulators in scratch build up across k chunks
        kc, tr, tn = g_ref.shape[0], g_ref.shape[2], g_ref.shape[3]
        kq = pl.program_id(2)
        n_kq = pl.num_programs(2)

        @pl.when(kq == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(k, cols):
            cols = list(cols)
            gk = g_ref[k]     # (W, TR, TN)
            vk = vals_ref[k]  # (W, TN)
            for i in range(w):
                vi = vk[i][None, :]
                for j in range(w):
                    t = vi * gk[j]
                    kk = i + j
                    cols[kk] = cols[kk] + (t & MASK16)
                    cols[kk + 1] = cols[kk + 1] + (t >> 16)
            return tuple(cols)

        cols0 = tuple(acc_ref[i] for i in range(2 * w + 1))
        cols = jax.lax.fori_loop(0, kc, body, cols0)
        for i in range(2 * w + 1):
            acc_ref[i] = cols[i]

        @pl.when(kq == n_kq - 1)
        def _():
            v = norm([acc_ref[i] for i in range(2 * w + 1)], 2 * w + 1)
            r = mont_reduce(v)
            r = cond_sub_chain(r)
            for i in range(w):
                out_ref[i] = r[i]

    return kernel


# k-chunk size: bounds the resident g block; the u32 accumulator bound
# K_total * W <= 2^15 is enforced across ALL chunks (they share scratch)
_K_CHUNK = 8


@functools.lru_cache(maxsize=None)
def _spmv_fn(spec: FieldSpec, k_pad: int, r_pad: int, n_pad: int,
             max_mult: int, tr: int, tn: int):
    w = spec.w16
    kernel = _build_kernel(spec, _K_CHUNK, max_mult)
    grid = (n_pad // tn, r_pad // tr, k_pad // _K_CHUNK)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((w, r_pad, n_pad), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_K_CHUNK, w, tn), lambda i, j, k: (k, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_K_CHUNK, w, tr, tn),
                         lambda i, j, k: (k, 0, j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((w, tr, tn), lambda i, j, k: (0, j, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * w + 1, tr, tn), jnp.uint32)],
        # CPU (tests): run the kernel under the Pallas interpreter
        interpret=jax.default_backend() == "cpu",
    )
    return jax.jit(fn)


def _pick_tiles(spec: FieldSpec, k_slots: int, r: int) -> tuple[int, int]:
    """Tile sizes: wide blocks amortize the ~2 ns/op VPU issue overhead (the
    k axis is chunked, so VMEM no longer constrains the row tile), but the
    row tile must not overshoot the actual row count — pad rows are wasted
    lanes (Brakedown matrices are short and wide)."""
    del k_slots
    tr = min(32, ((r + 7) // 8) * 8)
    return tr, 256


def spmv_mont(spec: FieldSpec, vals: jnp.ndarray, g: jnp.ndarray,
              n_out: int) -> jnp.ndarray:
    """out (W, R, n_out) = sum_k vals[k]*g[k] (Montgomery, one reduction).

    vals: (K_pad, W, n_pad); g: (K_pad, W, r_pad, n_pad), all padded to the
    tile grid (see pad_amounts; pad slots must carry zero values); returns
    the padded result (caller slices to (W, R, n_out)).
    """
    k_pad, w, r_pad, n_pad = g.shape
    assert vals.shape == (k_pad, w, n_pad)
    max_mult = max(2, int((k_pad * spec.p) // spec.R + 3))
    tr, tn = _pick_tiles(spec, k_pad, r_pad)
    assert r_pad % tr == 0 and n_pad % tn == 0, (r_pad, tr, n_pad, tn)
    assert k_pad % _K_CHUNK == 0
    assert k_pad * w <= (1 << 15), "u32 accumulator bound"
    return _spmv_fn(spec, k_pad, r_pad, n_pad, max_mult, tr, tn)(vals, g)


def pad_amounts(spec: FieldSpec, k_slots: int, r: int, n_out: int):
    """(k_pad, r_pad, n_pad) for the tile grid."""
    tr, tn = _pick_tiles(spec, k_slots, r)
    k_pad = ((k_slots + _K_CHUNK - 1) // _K_CHUNK) * _K_CHUNK
    r_pad = ((r + tr - 1) // tr) * tr
    n_pad = ((n_out + tn - 1) // tn) * tn
    return k_pad, r_pad, n_pad
