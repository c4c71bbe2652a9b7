"""Vectorized prime-field limb arithmetic for TPU (pure-jnp, XLA-fusable).

Field elements live on device as uint32 arrays in **limb-major** layout:
shape (W, ...batch) holding 16-bit limbs (little-endian, limb index first),
in Montgomery form with R = 2^(16*W).  Because 16*W equals 64*L of the Rust
`ff` representation for all four test fields, the device Montgomery value
coincides numerically with ff's internal form
(lcpc-test-fields/src/lib.rs:13-59), making wire serialization a repack.

Why limb-major: the TPU vector unit tiles the two minor dimensions as
(8 sublanes, 128 lanes).  Keeping the large batch axes minor means every
limb-wise op is a full-width VPU op, and the schoolbook/skew reshapes only
touch leading axes (layout-preserving).  A (..., W)-minor layout measured
~1000x slower on v5e for exactly this reason.

Why 16-bit limbs: the VPU has exact 32-bit integer multiply; a 16x16 product
fits in u32 with headroom, and schoolbook column accumulators stay below
2^22 for W<=32, so no 64-bit arithmetic is ever needed.  The modmul here is
the hot primitive called out in SURVEY.md §2.1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import FieldSpec

# np scalar, NOT jnp: a module-level jnp.uint32 initializes the XLA backend
# at import time, which breaks jax.distributed.initialize for any process
# that imports lcpc_tpu before calling it (multi-host entry).  Inside traces
# the np scalar binds identically.
MASK16 = np.uint32(0xFFFF)


def _spec_limbs16(value: int, w: int) -> np.ndarray:
    return np.array([(value >> (16 * i)) & 0xFFFF for i in range(w)], dtype=np.uint32)


def _bshape(w_arr: jnp.ndarray) -> tuple:
    return w_arr.shape[1:]


class FieldOps:
    """JAX ops for one field; arrays are (W, ...batch) uint32 16-bit limbs."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.w = spec.w16
        self.p_limbs = _spec_limbs16(spec.p, self.w)
        self.r2_limbs = _spec_limbs16(spec.R2, self.w)
        self.one_limbs = _spec_limbs16(1, self.w)
        self.mont_one_limbs = _spec_limbs16(spec.R % spec.p, self.w)
        self.n0inv_limbs = _spec_limbs16(spec.n0inv_full, self.w)
        # jit public entry points (eager dispatch of the unrolled chains is
        # pathological; under jit each op is a few fused XLA kernels)
        self.add = jax.jit(self.add)
        self.sub = jax.jit(self.sub)
        self.neg = jax.jit(self.neg)
        self.mul = jax.jit(self.mul)
        self.to_mont = jax.jit(self.to_mont)
        self.from_mont = jax.jit(self.from_mont)
        self.sum = jax.jit(self.sum, static_argnames=("axis",))
        self.dot_mont = jax.jit(self.dot_mont, static_argnames=("axis",))
        self.collapse_canon = jax.jit(self.collapse_canon)
        self.collapse_words = jax.jit(self.collapse_words)

    # ---- helpers -------------------------------------------------------------

    def _p(self, i: int) -> jnp.ndarray:
        return jnp.uint32(int(self.p_limbs[i]))

    def zeros(self, batch_shape) -> jnp.ndarray:
        return jnp.zeros((self.w, *batch_shape), dtype=jnp.uint32)

    def const_elem(self, value: int, batch_shape) -> jnp.ndarray:
        """Broadcast a host value's Montgomery limbs to (W, *batch)."""
        limbs = _spec_limbs16(self.spec.to_mont(value), self.w)
        return jnp.broadcast_to(
            jnp.asarray(limbs, jnp.uint32).reshape(self.w, *([1] * len(batch_shape))),
            (self.w, *batch_shape),
        )

    def _geq(self, a: list[jnp.ndarray], b_const: np.ndarray) -> jnp.ndarray:
        """Lexicographic a >= b for limb lists (b a host constant)."""
        gt = None
        eq = None
        for i in range(len(a) - 1, -1, -1):
            bi = jnp.uint32(int(b_const[i]) if i < len(b_const) else 0)
            gti = a[i] > bi
            eqi = a[i] == bi
            if gt is None:
                gt, eq = gti, eqi
            else:
                gt = gt | (eq & gti)
                eq = eq & eqi
        return gt | eq

    def _sub_const(self, a: list[jnp.ndarray], b_const: np.ndarray) -> list[jnp.ndarray]:
        out = []
        borrow = jnp.uint32(0)
        for i in range(len(a)):
            bi = jnp.uint32(int(b_const[i]) if i < len(b_const) else 0)
            d = a[i] - bi - borrow
            out.append(d & MASK16)
            borrow = (d >> 31) & jnp.uint32(1)
        return out

    def _cond_sub_p(self, cols: list[jnp.ndarray]) -> jnp.ndarray:
        """Conditionally subtract p; stack first W limbs to (W, ...batch)."""
        ge = self._geq(cols, self.p_limbs)
        sub = self._sub_const(cols, self.p_limbs)
        out = [jnp.where(ge, s, c) for s, c in zip(sub[: self.w], cols[: self.w])]
        return jnp.stack(out, axis=0)

    # ---- add / sub -----------------------------------------------------------

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        cols = []
        carry = jnp.uint32(0)
        for i in range(self.w):
            c = a[i] + b[i] + carry
            cols.append(c & MASK16)
            carry = c >> 16
        cols.append(carry)
        return self._cond_sub_p(cols)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        out = []
        borrow = jnp.uint32(0)
        for i in range(self.w):
            d = a[i] - b[i] - borrow
            out.append(d & MASK16)
            borrow = (d >> 31) & jnp.uint32(1)
        add_p = []
        carry = jnp.uint32(0)
        for i in range(self.w):
            s = out[i] + self._p(i) + carry
            add_p.append(s & MASK16)
            carry = s >> 16
        need = borrow.astype(jnp.bool_)
        return jnp.stack(
            [jnp.where(need, ap, o) for ap, o in zip(add_p, out)], axis=0
        )

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(self.zeros(_bshape(a)), a)

    # ---- multiply ------------------------------------------------------------

    def _skew_cols(self, t: jnp.ndarray) -> jnp.ndarray:
        """Sum anti-diagonals of (W, K, ...batch) -> (W+K-1, ...batch).

        Pad/reshape skew on the two *leading* axes (minor batch layout is
        untouched): padding rows to width W+K and re-viewing with row stride
        W+K-1 shifts row i right by i, so an axis-0 sum yields convolution
        columns.  O(1) XLA ops instead of W^2 scalar updates.
        """
        w, k = t.shape[0], t.shape[1]
        batch = t.shape[2:]
        tp = jnp.pad(t, [(0, 0), (0, w)] + [(0, 0)] * len(batch))
        flat = tp.reshape(w * (w + k), *batch)
        flat = flat[: w * (w + k - 1)]
        sk = flat.reshape(w, w + k - 1, *batch)
        return jnp.sum(sk, axis=0, dtype=jnp.uint32)

    def _conv_cols(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Product columns of a (W, ...) x b (K, ...): (W+K, ...) u32 < 2^22."""
        t = a[:, None] * b[None, :]
        lo = self._skew_cols(t & MASK16)
        hi = self._skew_cols(t >> 16)
        pad = [(0, 0)] * (lo.ndim - 1)
        return jnp.pad(lo, [(0, 1)] + pad) + jnp.pad(hi, [(1, 0)] + pad)

    def _norm_array(self, cols: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
        """Carry-normalize (K, ...) u32 columns (< 2^22) to 16-bit limbs.

        Returns (out_limbs, ...); carry beyond out_limbs is discarded (callers
        choose out_limbs so it is provably zero or reduction mod 2^(16*out)).
        """
        k = cols.shape[0]
        pad = [(0, 0)] * (cols.ndim - 1)
        cols = jnp.pad(cols & MASK16, [(0, 1)] + pad) + jnp.pad(
            cols >> 16, [(1, 0)] + pad
        )
        out = []
        carry = None
        for i in range(min(k + 1, out_limbs + 1)):
            c = cols[i] if carry is None else cols[i] + carry
            out.append(c & MASK16)
            carry = c >> 16
        while len(out) < out_limbs:
            out.append(jnp.zeros_like(out[0]))
        return jnp.stack(out[:out_limbs], axis=0)

    def _bc_const(self, limbs: np.ndarray, batch) -> jnp.ndarray:
        return jnp.broadcast_to(
            jnp.asarray(limbs, jnp.uint32).reshape(len(limbs), *([1] * len(batch))),
            (len(limbs), *batch),
        )

    def _mul_raw(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product via full-width separated reduction.

        T = a*b; m = (T mod R) * (-p^-1 mod R) mod R; out = (T + m*p)/R < 2p.
        Returns (W+1, ...) clean limbs before the conditional subtract.
        """
        w = self.w
        batch = _bshape(a)
        t_cols = self._conv_cols(a, b)                       # (2W, ...)
        t = self._norm_array(t_cols, 2 * w)
        n0 = self._bc_const(self.n0inv_limbs, batch)
        m_cols = self._conv_cols(t[:w], n0)[:w]
        m = self._norm_array(m_cols, w)                      # m mod R
        mp_cols = self._conv_cols(m, self._bc_const(self.p_limbs, batch))
        pad = [(0, 0)] * (t.ndim - 1)
        s_cols = jnp.pad(t, [(0, 1)] + pad) + jnp.pad(mp_cols, [(0, 1)] + pad)
        s = self._norm_array(s_cols, 2 * w + 1)
        return s[w:]                                         # (W+1, ...)

    def _mul_unrolled(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """CIOS Montgomery product as a flat elementwise DAG (no reshapes).

        Every intermediate has the batch shape, so XLA fuses the whole chain
        into a few loop fusions with no HBM temps — the preferred form on TPU,
        where pad/reshape/stack break fusion.  HLO count is O(W^2).
        """
        w = self.w
        cols: list = [None] * (2 * w + 1)
        zero = jnp.zeros_like(a[0])
        for i in range(w):
            ai = a[i]
            for j in range(w):
                t = ai * b[j]
                lo = t & MASK16
                hi = t >> 16
                k = i + j
                cols[k] = lo if cols[k] is None else cols[k] + lo
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
        if cols[2 * w] is None:
            cols[2 * w] = zero
        n0 = np.uint32(self.spec.n0inv16)
        for i in range(w):
            m = (cols[i] * n0) & MASK16
            for j in range(w):
                t = m * self._p(j)
                cols[i + j] = cols[i + j] + (t & MASK16)
                cols[i + j + 1] = cols[i + j + 1] + (t >> 16)
            cols[i + 1] = cols[i + 1] + (cols[i] >> 16)
        out = []
        carry = None
        for i in range(w, 2 * w + 1):
            c = cols[i] if carry is None else cols[i] + carry
            out.append(c & MASK16)
            carry = c >> 16
        out.append(carry)
        return self._cond_sub_p(out)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product a*b*R^{-1} mod p (inputs/outputs Montgomery form)."""
        return self._mul_unrolled(a, b)

    def mul_skew(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Alternative pad/reshape formulation (compile-light, fuses poorly on TPU)."""
        q = self._mul_raw(a, b)
        return self._cond_sub_p([q[i] for i in range(q.shape[0])])

    def mul_const(self, a: jnp.ndarray, c_limbs: np.ndarray) -> jnp.ndarray:
        """Multiply by a host-constant element (already in Montgomery form)."""
        return self.mul(a, self._bc_const(np.asarray(c_limbs), _bshape(a)))

    def to_mont(self, x: jnp.ndarray) -> jnp.ndarray:
        """Canonical (or any value < 2^(16W)) -> Montgomery form, reduced."""
        return self.mul(x, self._bc_const(self.r2_limbs, _bshape(x)))

    def from_mont(self, x: jnp.ndarray) -> jnp.ndarray:
        """Montgomery form -> canonical value limbs."""
        return self.mul(x, self._bc_const(self.one_limbs, _bshape(x)))

    # ---- reductions ----------------------------------------------------------

    def sum(self, x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
        """Modular sum over batch `axis` (>= 1) via a binary tree of adds."""
        assert axis >= 1, "axis 0 is the limb axis"
        x = jnp.moveaxis(x, axis, 1)
        n = x.shape[1]
        while n > 1:
            half = n // 2
            lo = self.add(x[:, :half], x[:, half : 2 * half])
            x = lo if n % 2 == 0 else jnp.concatenate([lo, x[:, 2 * half :]], axis=1)
            n = (n + 1) // 2
        return x[:, 0]

    def dot_mont(self, a: jnp.ndarray, b: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
        """Sum_k a_k * b_k over batch `axis` (both in Montgomery form)."""
        return self.sum(self.mul(a, b), axis=axis)

    # ---- fused lazy-reduction collapse ----------------------------------------

    def _mont_reduce_arr(self, v: jnp.ndarray) -> jnp.ndarray:
        """One Montgomery reduction step on a wide value.

        v: (L, ...batch) 16-bit limbs, L > W.  Returns (L-W+1, ...) limbs of
        (V + m*p) / R with m = (V mod R) * (-p^-1) mod R — i.e. V*R^{-1} mod p
        up to multiples of p, bounded by V/R + 2p.
        """
        w = self.w
        batch = v.shape[1:]
        n0 = self._bc_const(self.n0inv_limbs, batch)
        m = self._norm_array(self._conv_cols(v[:w], n0)[:w], w)
        mp = self._conv_cols(m, self._bc_const(self.p_limbs, batch))  # (2W, ...)
        L = v.shape[0]
        K = max(L, 2 * w)
        pad = [(0, 0)] * len(batch)
        s_cols = jnp.pad(v, [(0, K - L)] + pad) + jnp.pad(mp, [(0, K - 2 * w)] + pad)
        s = self._norm_array(s_cols, K + 1)
        # bottom W limbs are zero by construction of m; drop them (the /R)
        return s[w:]

    def _cond_sub_chain(self, limbs: list, max_multiple: int) -> jnp.ndarray:
        """Reduce a value < max_multiple*p to < p by conditional subtraction
        of power-of-two multiples of p; stacks the first W limbs."""
        m = 1
        while m * 2 < max_multiple:
            m *= 2
        while m >= 1:
            c = _spec_limbs16(m * self.spec.p, len(limbs))
            ge = self._geq(limbs, c)
            sub = self._sub_const(limbs, c)
            limbs = [jnp.where(ge, s, o) for s, o in zip(sub, limbs)]
            m //= 2
        return jnp.stack(limbs[: self.w], axis=0)

    def mul_sum_mont(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Sum_k a[k]*b[k] of Montgomery operands with ONE deferred reduction.

        a, b: (K, W, ...batch) Montgomery limbs -> (W, ...batch) Montgomery.
        The 32-bit limb products accumulate over K as plain u32 (safe while
        K*W <= 2^15), and the Montgomery reduction runs once per output —
        O(W^2) per output instead of per (k, output).  This is the expander
        SpMV's inner form: one slot-sum per codeword position.
        """
        k, w = a.shape[0], self.w
        assert b.shape[0] == k and a.shape[1] == w
        if k * w > (1 << 15):  # u32 accumulator bound: chunk and modadd
            kc = (1 << 15) // w
            out = None
            for c0 in range(0, k, kc):
                part = self.mul_sum_mont(a[c0 : c0 + kc], b[c0 : c0 + kc])
                out = part if out is None else self.add(out, part)
            return out
        cols: list = [None] * (2 * w + 1)
        for i in range(w):
            ai = a[:, i]
            for j in range(w):
                t = ai * b[:, j]                    # (K, ...batch)
                lo = jnp.sum(t & MASK16, axis=0, dtype=jnp.uint32)
                hi = jnp.sum(t >> 16, axis=0, dtype=jnp.uint32)
                kk = i + j
                cols[kk] = lo if cols[kk] is None else cols[kk] + lo
                cols[kk + 1] = hi if cols[kk + 1] is None else cols[kk + 1] + hi
        zero = jnp.zeros_like(cols[0])
        v = self._norm_array(
            jnp.stack([c if c is not None else zero for c in cols]), 2 * w + 1
        )
        r = self._mont_reduce_arr(v)  # value == sum(ab)/R mod p, < Kp^2/R + 2p
        # bound the leftover multiple of p: K * p/R + 2, rounded up
        max_mult = (k * self.spec.p) // self.spec.R + 3
        return self._cond_sub_chain([r[i] for i in range(r.shape[0])],
                                    max(2, int(max_mult)))

    def collapse_canon(self, ts: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
        """Batched field dot products with a single deferred reduction.

        ts: (W, T, R) and mat: (W, R, C), both Montgomery 16-bit limbs.
        Returns (W, T, C) **canonical** limbs of sum_r ts[t,r] * mat[r,c].

        This is collapse_columns (lcpc-2d/src/lib.rs:1095-1123) restructured
        for the VPU: instead of R*C full Montgomery multiplies + a modular
        reduction tree, the 32-bit limb products are split lo/hi and summed
        over r as plain u32 (safe by the chunk bound below), and the
        Montgomery reduction runs once per output element — O(W^2) work per
        output instead of per input.  Two reduction steps take the lazy
        double-Montgomery sum (== Σab·R² mod p) straight to canonical.
        """
        w = self.w
        T, R = ts.shape[1], ts.shape[2]
        C = mat.shape[2]
        # per (i,j) limb pair each r contributes < 2^16 to a lo and a hi
        # column; ≤ 2W pairs land in one column, so chunk R to keep the u32
        # accumulators below 2^32: 2W * Rc * 2^16 < 2^32
        r_chunk = max(1, (1 << 15) // w)
        n_chunks = (R + r_chunk - 1) // r_chunk
        total = None  # (2W+1, T, C) 16-bit limbs, summed over chunks (u32)
        for c0 in range(0, R, r_chunk):
            a = ts[:, :, c0 : c0 + r_chunk]    # (W, T, Rc)
            b = mat[:, c0 : c0 + r_chunk, :]   # (W, Rc, C)
            cols: list = [None] * (2 * w)
            for i in range(w):
                ai = a[i][:, :, None]          # (T, Rc, 1)
                for j in range(w):
                    bj = b[j][None, :, :]      # (1, Rc, C)
                    t32 = ai * bj              # (T, Rc, C)
                    lo = jnp.sum(t32 & MASK16, axis=1)
                    hi = jnp.sum(t32 >> 16, axis=1)
                    k = i + j
                    cols[k] = lo if cols[k] is None else cols[k] + lo
                    cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
            chunk = self._norm_array(jnp.stack(cols, axis=0), 2 * w + 1)
            total = chunk if total is None else total + chunk
        # chunk sums: limbs < 2^16 each, n_chunks < 2^16 -> still u32-safe
        assert n_chunks < (1 << 16)
        v = self._norm_array(total, 2 * w + 2)
        v = self._mont_reduce_arr(v)           # ≅ Σab·R  (W+3 limbs)
        v = self._mont_reduce_arr(v)           # ≅ Σab    (W+? limbs, < 2p)
        return self._cond_sub_p([v[i] for i in range(v.shape[0])])

    def collapse_words(self, ts: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
        """collapse_canon packed as wire words: (T, C, W/2) u32 LE words.

        Row-major per (t, c): words[t, c] viewed as little-endian bytes is
        exactly the ff to_repr byte string of the canonical value.
        """
        canon = self.collapse_canon(ts, mat)          # (W, T, C)
        words = canon[0::2] | (canon[1::2] << jnp.uint32(16))  # (W/2, T, C)
        return jnp.transpose(words, (1, 2, 0))

    # ---- host conversions ----------------------------------------------------

    def encode_host(self, values, to_mont: bool = True) -> np.ndarray:
        """Python ints -> (W, n) uint32 limb array (optionally Montgomery)."""
        spec = self.spec
        out = np.empty((self.w, len(values)), dtype=np.uint32)
        for i, v in enumerate(values):
            m = spec.to_mont(v) if to_mont else v
            for j in range(self.w):
                out[j, i] = (m >> (16 * j)) & 0xFFFF
        return out

    def encode_repr_words(self, values) -> np.ndarray:
        """Python ints (canonical, < p) -> (n, W/2) u32 LE repr words.

        Bulk path for big vectors (the verifier's inner tensor): one
        to_bytes per value + one frombuffer, ~10x faster than the
        per-limb Python loop in encode_host (no Montgomery multiply).
        """
        nbytes = (self.w // 2) * 4
        buf = b"".join(v.to_bytes(nbytes, "little") for v in values)
        return np.frombuffer(buf, dtype="<u4").reshape(len(values),
                                                       self.w // 2)

    def decode_host(self, arr, from_mont: bool = True) -> list[int]:
        """(W, ...) limb array -> flat list of Python ints (canonical)."""
        arr = np.asarray(arr).reshape(self.w, -1)
        spec = self.spec
        out = []
        for i in range(arr.shape[1]):
            m = 0
            for j in range(self.w):
                m |= int(arr[j, i]) << (16 * j)
            out.append(spec.from_mont(m) if from_mont else m)
        return out


@functools.lru_cache(maxsize=None)
def get_ops(spec: FieldSpec) -> FieldOps:
    return FieldOps(spec)
