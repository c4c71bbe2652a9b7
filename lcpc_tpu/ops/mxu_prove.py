"""MXU digit-conv kernels for the prover: collapse and direct column eval.

Two prove-side contractions dominate large-N proof latency, and both are
modular matrix products that map onto the same int8-conv machinery as the
MXU NTT (ops/mxu_ntt.py):

1. collapse_columns (lcpc-2d/src/lib.rs:1095-1123): tensor (T, R) x coeffs
   (R, C).  The VPU deferred-reduction collapse costs ~W^2 integer mults
   per input element; here the contraction over R runs as ONE int8 conv
   (chunked when R exceeds the accumulator cap).

2. Column opening for RS codes: an opened column c of the codeword is the
   row polynomial evaluated at g_c = w^bitrev(c), so the k opened columns
   are coeffs (R, npr) x V (npr, k) with V[m, j] = g_j^m.  Computing this
   directly replaces the re-encode of EVERY row block when the codeword
   was not retained: at 2^27 ft255 a re-encode gather costs a full ~19 s
   commit, the direct evaluation ~1 s.  V's npr*k entries are built ON
   DEVICE (host bigint pow for the per-chunk base scalars only).

Montgomery bookkeeping (same convention as MxuNttPlan._dft_kernel): inputs
are Montgomery (x*R), kernel entries are PLAIN values scaled by the
reduction radix (v*r7), one reduce divides by r7, so outputs come out in
Montgomery form (x*v*R) — bit-identical to the VPU path after the same
canonicalization (twin-tested in tests/test_mxu_prove.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import FieldSpec
from .limbs import get_ops
from .mxu_ntt import (
    ReducePlan,
    _conv_digits,
    _digits7,
    _from7,
    _to7,
    conv_cap,
)


def _host_kernel_digits(plan: ReducePlan, values, shape) -> np.ndarray:
    """Plain field values -> (W7, *shape) int8 digit kernel of v*kscale.

    `values` is a flat list of Python ints in row-major `shape` order.
    """
    p = plan.spec.p
    w7 = plan.w7
    nbytes = (7 * w7 + 7) // 8 + 1
    buf = bytearray(len(values) * nbytes)
    pos = 0
    for v in values:
        buf[pos : pos + nbytes] = ((v * plan.kscale) % p).to_bytes(
            nbytes, "little"
        )
        pos += nbytes
    raw = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(len(values), nbytes)
    k = np.zeros((w7, len(values)), dtype=np.int8)
    for d in range(w7):
        bitpos = 7 * d
        byte, sh = divmod(bitpos, 8)
        lo = raw[:, byte].astype(np.uint16)
        hi = raw[:, byte + 1].astype(np.uint16) if byte + 1 < nbytes else 0
        k[d] = (((lo | (hi << 8)) >> sh) & 0x7F).astype(np.int8)
    # flip the digit (spatial) axis so conv's correlation convolves digits
    return np.ascontiguousarray(k[::-1]).reshape(w7, *shape)


def mxu_prove_enabled(spec: FieldSpec) -> bool:
    """Same backend heuristic as the encode-side MXU choice."""
    import os

    flag = os.environ.get("LCPC_MXU_PROVE")
    if flag == "1":
        return True
    if flag == "0":
        return False
    return jax.default_backend() not in ("cpu",) and spec.w16 >= 8


# ---------------------------------------------------------------------------
# collapse: ts (T, R) x coeffs (R, C) -> canonical wire words (T, C, W/2)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _collapse_fns(spec: FieldSpec, r_chunk: int, packed: bool):
    ops = get_ops(spec)
    plan = ReducePlan(spec, r_chunk)
    w7 = plan.w7

    def one_slab(coeff_slab, kern):
        # coeff_slab (W or W/2, Rc, Cs) Montgomery; kern (W7, Rc, T) int8
        if packed:
            from ..core.protocol import _unpack_words_dev

            coeff_slab = _unpack_words_dev(coeff_slab)
        x7 = _to7(coeff_slab, w7)                      # (W7, Rc, Cs)
        x7 = jnp.swapaxes(x7, 1, 2)                    # (W7, Cs, Rc)
        planes = _conv_digits(x7, kern)                # (2W7-1, Cs, T)
        digs = plan.reduce(planes)                     # (W7, Cs, T) Montgomery
        return _from7(digs, ops.w)                     # (W, Cs, T) limbs

    def chunk(coeff_chunk, kern):
        # bound the digit transient: the (W7, Rc, C) int8 form is ~5 GB at
        # 2^27, so the column axis maps through sub-slabs under lax.map
        wdim, rc, c = coeff_chunk.shape
        c_sub = max(1, (256 << 20) // (w7 * rc))
        while c % c_sub:
            c_sub -= 1
        if c_sub == c:
            return one_slab(coeff_chunk, kern)
        xs = jnp.moveaxis(
            coeff_chunk.reshape(wdim, rc, c // c_sub, c_sub), 2, 0
        )
        out = jax.lax.map(lambda s: one_slab(s, kern), xs)
        return jnp.moveaxis(out, 0, 1).reshape(ops.w, c, -1)

    def finish(acc):
        # Montgomery sum (W, C, T) -> canonical packed wire (T, C, W/2)
        canon = ops.from_mont(acc)
        words = canon[0::2] | (canon[1::2] << jnp.uint32(16))
        return jnp.transpose(words, (2, 1, 0))

    return jax.jit(chunk), jax.jit(ops.add), jax.jit(finish)


class MxuCollapse:
    """collapse_words twin on the MXU; contraction chunked to conv_cap."""

    def __init__(self, spec: FieldSpec, n_rows: int, packed: bool = False):
        self.spec = spec
        self.n_rows = n_rows
        self.packed = packed
        self.r_chunk = min(n_rows, conv_cap(spec))
        self.plan = ReducePlan(spec, self.r_chunk)

    def __call__(self, tensor_ints: "list[list[int]]", coeffs_dev
                 ) -> jnp.ndarray:
        """tensor_ints: T lists of n_rows plain field ints.
        coeffs_dev: (W or W/2, n_rows, C) Montgomery.
        Returns (T, C, W/2) canonical wire words (== ops.collapse_words).
        """
        return self.collapse_source(
            tensor_ints, lambda r0, r1: coeffs_dev[:, r0:r1, :],
            self.n_rows, self.r_chunk,
        )

    def collapse_source(self, tensor_ints: "list[list[int]]", get_block,
                        n_rows: int, row_block: int) -> jnp.ndarray:
        """Blocked variant: coefficient rows come from get_block(r0, r1)
        (a resident slice, or a CoeffSource regenerating/uploading blocks);
        contraction accumulates Montgomery partials across blocks."""
        t_count = len(tensor_ints)
        row_block = min(row_block, self.r_chunk)
        chunk, add, finish = _collapse_fns(
            self.spec, self.r_chunk, self.packed
        )
        acc = None
        for r0 in range(0, n_rows, row_block):
            r1 = min(r0 + row_block, n_rows)
            vals = []
            for r in range(r0, r1):      # row-major (Rc, T)
                for t in range(t_count):
                    vals.append(tensor_ints[t][r])
            kern = _host_kernel_digits(self.plan, vals, (r1 - r0, t_count))
            part = chunk(get_block(r0, r1), jnp.asarray(kern))
            acc = part if acc is None else add(acc, part)
        return finish(acc)


# ---------------------------------------------------------------------------
# direct column evaluation: coeffs (R, npr) x V (npr, k) -> columns (R, k)
# ---------------------------------------------------------------------------

_EVAL_CHUNK = 2048  # contraction chunk; min(npr, conv_cap) enforced below


@functools.lru_cache(maxsize=32)
def _eval_fns(spec: FieldSpec, chunk: int, n_chunks: int):
    """Jitted block-evaluator for fixed (chunk, n_chunks)."""
    ops = get_ops(spec)
    plan = ReducePlan(spec, chunk)
    w7 = plan.w7

    def eval_block(block, v7_all):
        # block (W, rows, npr) Montgomery; v7_all (W7, n_chunks, chunk, k)
        rows = block.shape[1]
        k = v7_all.shape[-1]

        def body(acc, ci):
            sl = jax.lax.dynamic_slice(
                block, (0, 0, ci * chunk), (block.shape[0], rows, chunk)
            )
            x7 = _to7(sl, w7)                          # (W7, rows, chunk)
            kern = v7_all[:, ci]                       # (W7, chunk, k)
            planes = _conv_digits(x7, kern)            # (2W7-1, rows, k)
            digs = plan.reduce(planes)
            part = _from7(digs, ops.w)                 # (W, rows, k) Montgomery
            return ops.add(acc, part), None

        init = jnp.zeros((ops.w, rows, k), jnp.uint32)
        acc, _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
        return acc[0::2] | (acc[1::2] << jnp.uint32(16))  # (W/2, rows, k)

    return jax.jit(eval_block)


@functools.lru_cache(maxsize=32)
def _v7_build_fns(spec: FieldSpec, chunk: int):
    """Jitted (powers-ladder, per-chunk digitizer) pair.

    Split so the (W, chunk, k) Montgomery power table is built once and each
    npr-chunk of the kernel digitizes from it with a small transient — the
    all-chunks-at-once form materializes npr*k Montgomery elements (1.6 GB
    at 2^27) three times over.
    """
    ops = get_ops(spec)
    plan = ReducePlan(spec, chunk)
    w7 = plan.w7
    log_c = chunk.bit_length() - 1

    def powers(g_mont):
        # P[m] = mont(g^m), m < chunk, as a log-depth cumulative product:
        # [1, g, g, ..., g] under associative_scan(mul).  (A doubling
        # ladder built by concatenating growing slices compiled to an
        # XLA:CPU executable that never terminated — associative_scan
        # lowers to a shape-stable network.)
        k = g_mont.shape[-1]
        one = ops.const_elem(1, (1, k))                # (W, 1, k)
        gb = jnp.broadcast_to(g_mont[:, None, :], (ops.w, chunk, k))
        seq = jnp.concatenate([one, gb[:, : chunk - 1, :]], axis=1)
        return jax.lax.associative_scan(ops.mul, seq, axis=1)

    def chunk_digits(pw, base_mont, r7_mont):
        # mont(g^(m + chunk*ci)) = P[m] * base; then plain*r7 digits
        vals = ops.mul(pw, jnp.broadcast_to(base_mont[:, None, :], pw.shape))
        r7b = jnp.broadcast_to(r7_mont[:, None, None], vals.shape)
        plain_r7 = ops.from_mont(ops.mul(vals, r7b))
        # digit-major, FLIPPED on the digit axis (conv correlation)
        return _to7(plain_r7, w7)[::-1].astype(jnp.int8)  # (W7, chunk, k)

    return jax.jit(powers), jax.jit(chunk_digits)


class MxuColumnEval:
    """Direct MXU evaluation of opened RS-codeword columns.

    For LigeroEncoding: column c = row-poly evaluated at w_nc^bitrev(c).
    Usage: ev = MxuColumnEval(enc); ev.set_columns(cols);
    ev.eval_block(block) per row block -> (W/2, rows, k) packed Montgomery
    wire words, bit-identical to gathering the same columns out of the
    encoded codeword.
    """

    def __init__(self, enc):
        self.enc = enc
        self.spec = enc.spec
        self.ops = get_ops(enc.spec)
        npr = enc.n_per_row
        self.npr_pad = 1 << (npr - 1).bit_length() if npr > 1 else 1
        self.chunk = min(self.npr_pad, _EVAL_CHUNK, conv_cap(enc.spec))
        self.n_chunks = max(1, self.npr_pad // self.chunk)
        self.plan = ReducePlan(enc.spec, self.chunk)
        self._v7 = None

    def set_columns(self, cols: "list[int]") -> None:
        from .ntt import bit_reverse_indices

        spec = self.spec
        p = spec.p
        n_cols = self.enc.n_cols
        log_nc = n_cols.bit_length() - 1
        w_nc = spec.root_for_log_len(log_nc)
        rev = bit_reverse_indices(n_cols)
        # generators g_j = w^bitrev(c_j), plus per-chunk base scalars
        gs = [pow(w_nc, int(rev[c]), p) for c in cols]
        g_mont = jnp.asarray(self.ops.encode_host(gs))  # (W, k)
        bases = []
        for ci in range(self.n_chunks):
            e = self.chunk * ci
            bases.extend(pow(g, e, p) for g in gs)
        bases_mont = self.ops.encode_host(bases).reshape(
            self.ops.w, self.n_chunks, len(cols)
        )
        r7_mont = jnp.asarray(
            self.ops.encode_host([self.plan.kscale])[:, 0]
        )  # (W,)
        powers, chunk_digits = _v7_build_fns(self.spec, self.chunk)
        pw = powers(g_mont)
        parts = [
            chunk_digits(pw, jnp.asarray(bases_mont[:, ci, :]), r7_mont)
            for ci in range(self.n_chunks)
        ]
        self._v7 = jnp.stack(parts, axis=1)  # (W7, n_chunks, chunk, k)

    def eval_block(self, block: jnp.ndarray) -> jnp.ndarray:
        """block (W, rows, n_per_row) Montgomery -> (W/2, rows, k) packed."""
        assert self._v7 is not None, "set_columns first"
        npr = block.shape[2]
        if npr < self.npr_pad:
            block = jnp.pad(block, [(0, 0), (0, 0), (0, self.npr_pad - npr)])
        fn = _eval_fns(self.spec, self.chunk, self.n_chunks)
        return fn(block, self._v7)
