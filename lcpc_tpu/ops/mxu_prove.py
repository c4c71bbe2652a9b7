"""MXU digit kernels for the prover: collapse and direct column eval.

Two prove-side contractions dominate large-N proof latency, and both are
modular matrix products that map onto the same int8 digit machinery as the
MXU NTT (ops/mxu_ntt.py):

1. collapse_columns (lcpc-2d/src/lib.rs:1095-1123): tensor (T, R) x coeffs
   (R, C).  T is tiny (2 with the eval row riding the final degree test), so
   an int8 conv with C_out = T starves the MXU lanes (measured ~1 Tops).
   Instead the digit convolution is unrolled into the kernel as a BANDED
   matrix: K[(d1, r), (t, do)] = digits(v_rt * kscale)[do - d1], and one
   dot_general contracts (digit, row) jointly — C_out becomes T*(2*W7-1)
   (146 for ft255), wide enough to fill the lanes.  The band's zero padding
   costs ~2x the ideal MAC count but runs at dense-matmul rates, ~50x
   faster end to end than the conv form.

2. Column opening for RS codes: an opened column c of the codeword is the
   row polynomial evaluated at g_c = w^bitrev(c), so the k opened columns
   are coeffs (R, npr) x V (npr, k) with V[m, j] = g_j^m.  Computing this
   directly replaces the re-encode of EVERY row block when the codeword
   was not retained: at 2^27 ft255 a re-encode gather costs a full ~19 s
   commit, the direct evaluation well under a second.  Rather than
   materializing all npr*k Vandermonde entries (0.9 GB of tables and two
   VPU modmuls per entry at 2^27), the kernel holds ONE chunk of the power
   ladder — digits of g_j^m * kscale for m < super — and the chunk offsets
   fold in afterwards as a per-chunk scalar multiply by S[ci, j] =
   g_j^(super*ci) on the reduced field values (n_rows*k*n_chunks VPU
   modmuls total, ~4x fewer than the table build they replace).  Two int8
   convs accumulate into uint32 digit planes before each reduction
   (split_acc), doubling the per-reduce contraction beyond the single-conv
   int32 cap and halving both the reduce count and the scalar multiplies.

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


def _host_value_digits(plan: ReducePlan, values, shape) -> np.ndarray:
    """Plain field values -> (W7, *shape) uint8 digits of v*kscale (unflipped).

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
    k = np.zeros((w7, len(values)), dtype=np.uint8)
    for d in range(w7):
        bitpos = 7 * d
        byte, sh = divmod(bitpos, 8)
        lo = raw[:, byte].astype(np.uint16)
        hi = raw[:, byte + 1].astype(np.uint16) if byte + 1 < nbytes else 0
        k[d] = (((lo | (hi << 8)) >> sh) & 0x7F).astype(np.uint8)
    return k.reshape(w7, *shape)


def _banded_collapse_kernel(plan: ReducePlan, tensor_ints, r0: int, r1: int
                            ) -> np.ndarray:
    """(W7, Rc, T, L) int8 banded digit kernel for rows [r0, r1).

    K[d1, r, t, do] = digits(v_rt * kscale)[do - d1] for 0 <= do - d1 < W7,
    else 0 — so contracting x digits over (d1, r) computes the digit
    convolution directly, with the T*L output axis wide enough for the MXU.
    """
    w7 = plan.w7
    l = 2 * w7 - 1
    t_count = len(tensor_ints)
    rc = r1 - r0
    vals = []
    for r in range(r0, r1):          # row-major (Rc, T)
        for t in range(t_count):
            vals.append(tensor_ints[t][r])
    kd = _host_value_digits(plan, vals, (rc, t_count))   # (W7, Rc, T)
    kd_rt = np.moveaxis(kd, 0, 2)                        # (Rc, T, W7)
    out = np.zeros((w7, rc, t_count, l), dtype=np.int8)
    for d1 in range(w7):
        out[d1, :, :, d1 : d1 + w7] = kd_rt
    return out


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
def _collapse_fns(spec: FieldSpec, r_chunk: int, in_form: str):
    assert in_form in ("limbs", "packed", "digits"), in_form
    ops = get_ops(spec)
    plan = ReducePlan(spec, r_chunk)
    w7 = plan.w7

    def one_slab(coeff_slab, kern):
        # coeff_slab: (W, Rc, Cs) limbs / (W/2, Rc, Cs) packed words /
        # (W7, Rc, Cs) uint8 digit planes; kern (W7, Rc, T, L) int8
        rc = coeff_slab.shape[1]
        t_count, l = kern.shape[2], kern.shape[3]
        if in_form == "digits":
            x7 = coeff_slab.astype(jnp.int8)           # (W7, Rc, Cs)
        else:
            if in_form == "packed":
                from ..core.protocol import _unpack_words_dev

                coeff_slab = _unpack_words_dev(coeff_slab)
            x7 = _to7(coeff_slab, w7)                  # (W7, Rc, Cs)
        # joint (digit, row) contraction against the banded kernel: one
        # dense int8 matmul with C_out = T*L instead of a conv with C_out=T
        planes = jax.lax.dot_general(
            x7, kern.reshape(w7, rc, t_count * l),
            (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                              # (Cs, T*L)
        planes = jnp.transpose(
            planes.reshape(-1, t_count, l), (2, 0, 1)
        )                                              # (L, Cs, T)
        digs = plan.reduce(planes)                     # (W7, Cs, T) Montgomery
        return _from7(digs, ops.w)                     # (W, Cs, T) limbs

    def chunk(coeff_chunk, kern):
        # bound the digit transient: the (W7, Rc, Cs) int8 form is ~5 GB at
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
    """collapse_words twin on the MXU; contraction chunked to conv_cap.

    `in_form` declares the coefficient-block layout: "limbs" (W 16-bit
    limbs), "packed" (W/2 u32 limb-pair words, unpacked in-kernel), or
    "digits" (W7 uint8 7-bit planes, contracted with no digitization pass —
    the SeededCoeffSource fast path)."""

    def __init__(self, spec: FieldSpec, n_rows: int, packed: bool = False,
                 in_form: "str | None" = None):
        self.spec = spec
        self.n_rows = n_rows
        self.in_form = in_form if in_form else ("packed" if packed else "limbs")
        self.packed = self.in_form == "packed"
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
        row_block = min(row_block, self.r_chunk)
        chunk, add, finish = _collapse_fns(
            self.spec, self.r_chunk, self.in_form
        )
        acc = None
        for r0 in range(0, n_rows, row_block):
            r1 = min(r0 + row_block, n_rows)
            kern = _banded_collapse_kernel(self.plan, tensor_ints, r0, r1)
            part = chunk(get_block(r0, r1), jnp.asarray(kern))
            acc = part if acc is None else add(acc, part)
        return finish(acc)


# ---------------------------------------------------------------------------
# direct column evaluation: coeffs (R, npr) x V (npr, k) -> columns (R, k)
# ---------------------------------------------------------------------------


def _eval_chunking(spec: FieldSpec, npr_pad: int) -> tuple[int, int]:
    """(chunk, n_acc): per-conv contraction and how many convs accumulate
    into uint32 planes before one reduction.

    The conv's int32 accumulator WRAPS mod 2^32 (two's complement), and a
    wrapped sum bitcast to uint32 is exact as long as the true value stays
    below 2^32 — so a single conv may contract up to 2x conv_cap (the
    int32-positive bound), and further doubling comes from summing bitcast
    planes of multiple convs in uint32.  Bound: the worst digit plane
    accumulates <= W7 taps of 127^2 per contraction step.  Both factors are
    powers of two so chunks tile npr_pad exactly."""
    w7 = (spec.num_bits + 6) // 7
    plane_step = w7 * 127 * 127  # per contraction step
    wrap_cap = 1 << (((1 << 32) // plane_step).bit_length() - 1)
    chunk = min(npr_pad, wrap_cap)
    n_acc = 1
    while (n_acc * 2 * plane_step * chunk < (1 << 32)
           and chunk * n_acc * 2 <= npr_pad):
        n_acc *= 2
    return chunk, n_acc


@functools.lru_cache(maxsize=32)
def _eval_fns(spec: FieldSpec, chunk: int, n_acc: int, n_super: int,
              in_form: str = "limbs"):
    """Jitted block-evaluator for fixed (chunk, n_acc, n_super, layout)."""
    assert in_form in ("limbs", "packed", "digits"), in_form
    ops = get_ops(spec)
    super_len = chunk * n_acc
    plan = ReducePlan(spec, super_len, split_acc=True)
    w7 = plan.w7

    def eval_block(block, k7, s_mont):
        # block: (W, rows, npr_pad) limbs / (W/2, ...) packed words /
        # (W7, ...) uint8 digit planes — all Montgomery-semantics
        # k7 (W7, super, k) int8 digits of g_j^m * kscale (m < super)
        # s_mont (W, n_super, k) Montgomery g_j^(super * ci)
        rows = block.shape[1]
        k = k7.shape[-1]

        def body(acc, ci):
            planes = None
            for a in range(n_acc):
                sl = jax.lax.dynamic_slice(
                    block, (0, 0, ci * super_len + a * chunk),
                    (block.shape[0], rows, chunk),
                )
                if in_form == "digits":
                    x7 = sl.astype(jnp.int8)           # (W7, rows, chunk)
                else:
                    if in_form == "packed":
                        from ..core.protocol import _unpack_words_dev

                        sl = _unpack_words_dev(sl)
                    x7 = _to7(sl, w7)                  # (W7, rows, chunk)
                # bitcast, not astype: the int32 conv accumulator wraps
                # mod 2^32 past conv_cap, and the two's-complement bits ARE
                # the exact uint32 sum while the true value is < 2^32
                pl = jax.lax.bitcast_convert_type(
                    _conv_digits(
                        x7, jax.lax.dynamic_slice(
                            k7, (0, a * chunk, 0), (w7, chunk, k))
                    ), jnp.uint32)                     # (2W7-1, rows, k)
                planes = pl if planes is None else planes + pl
            digs = plan.reduce(planes)
            part = _from7(digs, ops.w)                 # (W, rows, k) Montgomery
            # fold the chunk offset in: column j of super-chunk ci carries
            # the scalar S[ci, j] = g_j^(super*ci)
            s_ci = jax.lax.dynamic_slice(
                s_mont, (0, ci, 0), (ops.w, 1, k))
            part = ops.mul(part, jnp.broadcast_to(s_ci, part.shape))
            return ops.add(acc, part), None

        init = jnp.zeros((ops.w, rows, k), jnp.uint32)
        if n_super == 1:
            acc, _ = body(init, 0)
        else:
            acc, _ = jax.lax.scan(body, init, jnp.arange(n_super))
        return acc[0::2] | (acc[1::2] << jnp.uint32(16))  # (W/2, rows, k)

    return jax.jit(eval_block)


@functools.lru_cache(maxsize=32)
def _kernel_build_fns(spec: FieldSpec, super_len: int):
    """Jitted builder: per-column power ladder -> int8 digit kernel.

    Two-level build: lo = g^m for m < A and hi = g^(A*c) * kscale for
    c < super/A (both tiny log-depth ladders), then ONE Montgomery multiply
    per entry forms g^(A*c+m) * kscale PLAIN (mont_mul(lo*R, hi*kscale) =
    lo*hi*kscale) — ~10x fewer modmuls than a flat associative_scan over
    super_len.  Digit axis flipped for the conv."""
    ops = get_ops(spec)
    w7 = (spec.num_bits + 6) // 7
    a_len = 1 << (super_len.bit_length() // 2)
    a_len = min(a_len, super_len)
    b_len = super_len // a_len

    def ladder(step_mont, count, k):
        # [1, s, s^2, ..., s^(count-1)] in Montgomery form
        one = ops.const_elem(1, (1, k))
        sb = jnp.broadcast_to(step_mont[:, None, :], (ops.w, count, k))
        seq = jnp.concatenate([one, sb[:, : count - 1, :]], axis=1)
        return jax.lax.associative_scan(ops.mul, seq, axis=1)

    def build(g_mont, ga_mont, kscale_plain):
        # g_mont (W, k) = mont(g); ga_mont (W, k) = mont(g^A)
        k = g_mont.shape[-1]
        lo = ladder(g_mont, a_len, k)                  # (W, A, k) mont
        hi = ladder(ga_mont, b_len, k)                 # (W, B, k) mont
        ksb = jnp.broadcast_to(kscale_plain[:, None, None], hi.shape)
        hi_ks = ops.mul(hi, ksb)                       # g^(A*c)*kscale plain
        # entry (c, m) = mont_mul(lo_m * R, hi_ks) = g^(A*c+m)*kscale plain
        lo_b = jnp.broadcast_to(lo[:, None], (ops.w, b_len, a_len, k))
        hi_b = jnp.broadcast_to(hi_ks[:, :, None], (ops.w, b_len, a_len, k))
        plain_r7 = ops.mul(lo_b, hi_b).reshape(ops.w, super_len, k)
        # digit-major, FLIPPED on the digit axis (conv correlation)
        return _to7(plain_r7, w7)[::-1].astype(jnp.int8)  # (W7, super, k)

    return jax.jit(build), a_len


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
        self.chunk, self.n_acc = _eval_chunking(enc.spec, self.npr_pad)
        self.super_len = self.chunk * self.n_acc
        self.n_super = max(1, self.npr_pad // self.super_len)
        self.plan = ReducePlan(enc.spec, self.super_len, split_acc=True)
        self._k7 = None
        self._s = None

    def set_columns(self, cols: "list[int]") -> None:
        from .ntt import bit_reverse_indices

        spec = self.spec
        p = spec.p
        n_cols = self.enc.n_cols
        log_nc = n_cols.bit_length() - 1
        w_nc = spec.root_for_log_len(log_nc)
        rev = bit_reverse_indices(n_cols)
        # generators g_j = w^bitrev(c_j)
        gs = [pow(w_nc, int(rev[c]), p) for c in cols]
        g_mont = jnp.asarray(self.ops.encode_host(gs))  # (W, k)
        kscale_plain = jnp.asarray(self.ops.encode_host(
            [self.plan.kscale], to_mont=False)[:, 0])   # (W,)
        build, a_len = _kernel_build_fns(self.spec, self.super_len)
        ga_mont = jnp.asarray(self.ops.encode_host(
            [pow(g, a_len, p) for g in gs]))
        self._k7 = build(g_mont, ga_mont, kscale_plain)
        # per-super-chunk scalars S[ci, j] = g_j^(super*ci), Montgomery
        s_vals = []
        step = [pow(g, self.super_len, p) for g in gs]
        acc = [1] * len(gs)
        for _ in range(self.n_super):
            s_vals.extend(acc)
            acc = [(a * t) % p for a, t in zip(acc, step)]
        self._s = jnp.asarray(self.ops.encode_host(s_vals).reshape(
            self.ops.w, self.n_super, len(cols)))

    def eval_block(self, block: jnp.ndarray,
                   in_form: str = "limbs") -> jnp.ndarray:
        """block (W|W/2|W7, rows, n_per_row) -> (W/2, rows, k) packed.

        `in_form` declares the block layout (see MxuCollapse)."""
        assert self._k7 is not None, "set_columns first"
        npr = block.shape[2]
        if npr < self.npr_pad:
            block = jnp.pad(block, [(0, 0), (0, 0), (0, self.npr_pad - npr)])
        fn = _eval_fns(self.spec, self.chunk, self.n_acc, self.n_super,
                       in_form)
        return fn(block, self._k7, self._s)
