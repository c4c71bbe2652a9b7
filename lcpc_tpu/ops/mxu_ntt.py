"""MXU-accelerated NTT: 4-step decomposition with int8 limb convolutions.

The radix-2 VPU ladder (ops/ntt.py) is already at VPU speed-of-light, so the
only way to go faster on TPU is to move the modular multiply-accumulate onto
the MXU.  This module implements the classic 4-step NTT n = A*B:

    step1: DFT_A along the major axis  (matmul vs an A x A twiddle matrix)
    step2: elementwise twiddle multiply (VPU modmul)
    step3: DFT_B along the minor axis  (matmul vs a B x B matrix)

with all bit-reversals baked into the matrices so the output ordering equals
fft_io's (out[rev(k)] = X_k), making this a drop-in replacement for
BatchedNtt (twin-tested in tests/test_mxu_ntt.py).

Big-field elements are decomposed into 7-bit digits stored as int8 (values
< 128, so no zero-point corrections), and each modular matmul runs as ONE
int8 x int8 -> int32 `lax.conv_general_dilated`: the conv's channel
contraction is the DFT sum and its spatial axis is the digit convolution
(measured ~110 int8-Tops on v5e, ~100x the VPU's effective modmul rate).
The wide digit-plane accumulator is Montgomery-reduced in base 2^7 with an
extended radix R7 = 2^(7*(W7+1)) so a single conditional subtract suffices
even after accumulating A <= 1024 products; the mullo/mul-by-p steps of the
separated reduction are themselves int8 Toeplitz matmuls on the MXU, leaving
only digit repacks and carries on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import FieldSpec
from .limbs import get_ops, MASK16
from .ntt import bit_reverse_indices


def _digits7(value: int, count: int) -> np.ndarray:
    return np.array([(value >> (7 * i)) & 0x7F for i in range(count)], dtype=np.int8)


def _pick_ab(n: int, in_len: "int | None" = None) -> tuple[int, int]:
    """Split n = A*B with A, B powers of two.

    For the full NTT (in_len == n) the split is as balanced as possible.
    For a ZERO-PADDED input of length in_len < n (the rate-1/m systematic
    encode: only the first in_len of n inputs are nonzero) the real work is
    the contraction pair (in_len/B, B), so B balances against in_len — the
    step-1 kernel is then rectangular (see MxuNttPlan) and the conv MACs
    drop by the expansion factor m = n/in_len.
    """
    if in_len is None or in_len >= n:
        log = n.bit_length() - 1
        a = 1 << (log // 2 + log % 2)
        return a, n // a
    log_in = in_len.bit_length() - 1
    b = 1 << ((log_in + 1) // 2)
    return n // b, b


def conv_cap(spec: FieldSpec) -> int:
    """Largest power-of-two DFT contraction length the int8 conv can take.

    Each conv output plane accumulates <= A * W7 * 127^2 into an int32 (A
    channel-contraction terms, <= W7 aligned digit taps each); the Montgomery
    radix R7 widens with A automatically (see MxuNttPlan.w7r), so the int32
    accumulator is the only hard ceiling: 2048 for ft255 (n <= 2^22), 4096
    for ft127/ft191, 8192 for ft63."""
    w7 = (spec.num_bits + 6) // 7
    cap = (1 << 31) // (w7 * 127 * 127)
    return 1 << (cap.bit_length() - 1)


def mxu_supported(spec: FieldSpec, n: int, in_len: "int | None" = None) -> bool:
    """True if the single-level 4-step contraction covers size n for this
    field (contraction lengths <= conv_cap); callers fall back to the VPU
    ladder beyond it.  With in_len < n (zero-padded encode) the bound is on
    the REAL contraction pair, so the cap extends by the expansion factor:
    ft255 full NTT caps at 2^22 but a rate-1/4 encode caps at 2^24."""
    if n < 4:
        return False
    a, b = _pick_ab(n, in_len)
    a_nz = a if in_len is None or in_len >= n else in_len // b
    if in_len is not None and in_len < n and (a_nz == 0 or in_len % b):
        return False
    return max(a_nz, b) <= conv_cap(spec)


class ReducePlan:
    """Separated base-2^7 Montgomery reduction for digit-conv accumulators.

    Self-contained so every MXU modular-contraction kernel (the 4-step NTT
    below, the prove-side collapse and column-evaluation kernels in
    ops/mxu_prove.py) shares one implementation: given int32 digit planes
    of a sum of <= `contract` products, `reduce` returns clean canonical-
    range Montgomery digits.  The extended radix R7 = 2^(7*W7r) is sized so
    a single conditional subtract suffices after the accumulation, and
    matrix entries built with `kscale` (= R7 mod p) cancel the radix.
    """

    def __init__(self, spec: FieldSpec, contract: int, split_acc: bool = False):
        # split_acc: the caller accumulates MULTIPLE int8 convs into uint32
        # digit planes before reducing (ops/mxu_prove.MxuColumnEval), so the
        # effective contraction may exceed what one conv's int32 accumulator
        # tolerates; the reduction math itself only needs w7r sized for it.
        assert split_acc or contract <= conv_cap(spec), \
            "contraction exceeds the int32 conv accumulator bound"
        self.spec = spec
        self.contract = contract
        p = spec.p
        self.w7 = w7 = (spec.num_bits + 6) // 7     # digits per element
        need_bits = spec.num_bits + (contract.bit_length() - 1) + 1
        self.w7r = w7r = max(w7 + 1, (need_bits + 6) // 7)
        r7 = 1 << (7 * w7r)
        self.n0inv7 = (-pow(p, -1, r7)) % r7        # -p^-1 mod 2^(7*W7r)
        self.kscale = r7 % p
        n0d = _digits7(self.n0inv7, w7r)
        # wide digit count: covers T < contract*p^2 and S = T + m*p
        self.lt = max(2 * w7 + 6, w7r + w7 + 2)
        # mullo: m[o] = sum_u T[u] * n0[o-u], o < w7r  -> (w7r, w7r)
        m1 = np.zeros((w7r, w7r), dtype=np.int8)
        for u in range(w7r):
            for o in range(u, w7r):
                m1[u, o] = n0d[o - u]
        self.toep_n0 = m1
        # mp: planes[o] = sum_u m[u] * p7[o-u] -> (w7r, w7r + w7)
        p7 = _digits7(p, w7)
        m2 = np.zeros((w7r, w7r + w7), dtype=np.int8)
        for u in range(w7r):
            for o in range(u, min(u + w7, w7r + w7)):
                m2[u, o] = p7[o - u]
        self.toep_p = m2
        self.p7 = p7

    def reduce(self, planes: jnp.ndarray) -> jnp.ndarray:
        """Digit planes (2W7-1, ...) int32 -> clean Montgomery digits (W7, ...).

        Separated Montgomery reduction base 2^7 with radix 2^(7*W7r):
        m = (T mod R7) * n0inv mod R7; S = T + m*p; out = S >> 7*W7r < 2p.
        All arrays are digit-major (see _to7).
        """
        w7, w7r = self.w7, self.w7r
        t = _carry7(planes, self.lt)                       # clean wide digits
        m_planes = _matmul_toep(t[:w7r], self.toep_n0)
        m = _carry7(m_planes, w7r)                         # m mod R7
        mp = _matmul_toep(m, self.toep_p)                  # (w7r + w7, ...)
        pad = self.lt - (w7r + w7)
        mp_wide = jnp.pad(mp, [(0, pad)] + [(0, 0)] * (mp.ndim - 1))
        s = t.astype(jnp.uint32) + mp_wide.astype(jnp.uint32)
        s = _carry7(s, self.lt)
        q = s[w7r : w7r + w7 + 1]                          # quotient digits (+top)
        # conditional subtract p (digit-domain)
        p7 = self.p7.astype(np.uint32)
        ge = None
        eq = None
        for i in range(q.shape[0] - 1, -1, -1):
            pi = jnp.uint32(int(p7[i]) if i < len(p7) else 0)
            gti = q[i] > pi
            eqi = q[i] == pi
            if ge is None:
                ge, eq = gti, eqi
            else:
                ge = ge | (eq & gti)
                eq = eq & eqi
        ge = ge | eq
        outs = []
        borrow = jnp.uint32(0)
        for i in range(w7):
            pi = jnp.uint32(int(p7[i]))
            qi = q[i].astype(jnp.uint32)
            d = qi - pi - borrow
            sub = d & jnp.uint32(0x7F)
            borrow = (d >> 31) & jnp.uint32(1)
            outs.append(jnp.where(ge, sub, qi).astype(jnp.uint8))
        return jnp.stack(outs, axis=0)                     # (W7, ...) u8


class MxuNttPlan:
    """4-step plan for an n-point NTT, optionally with a zero-padded input.

    in_len < n declares that only the first in_len inputs are nonzero (the
    systematic rate-1/m row encode: coefficients occupy the low n_per_row
    slots, lcpc-ligero-pc/src/lib.rs:162-164).  Index jA*B + jB is nonzero
    iff jA < in_len/B, so step 1's kernel drops to a RECTANGULAR
    (in_len/B, A) Vandermonde slice — the conv contracts over in_len/B
    instead of A, cutting the dominant MXU cost by m = n/in_len and
    skipping the padded-input materialization entirely.  Twiddles, step 3,
    and the output ordering are exactly the full plan's, so results are
    bit-identical to padding + full NTT (twin-tested).
    """

    def __init__(self, spec: FieldSpec, n: int, a: "int | None" = None,
                 in_len: "int | None" = None, canonical_out: bool = False,
                 share_from: "MxuNttPlan | None" = None):
        assert n & (n - 1) == 0 and n >= 4
        self.spec = spec
        self.n = n
        self.canonical_out = canonical_out
        self.in_len = in_len = n if in_len is None else in_len
        assert in_len & (in_len - 1) == 0 and in_len <= n, in_len
        if a is None:
            self.a, self.b = _pick_ab(n, in_len)
        else:
            assert n % a == 0, (n, a)
            self.a, self.b = a, n // a
        assert in_len % self.b == 0, (in_len, self.b)
        self.a_nz = in_len // self.b                # nonzero input channels
        assert max(self.a_nz, self.b) <= conv_cap(spec), \
            "contraction exceeds the int32 conv accumulator bound"
        self.ops = get_ops(spec)
        p = spec.p

        # reduction sized for the longer of the two real contractions;
        # matrix entries carry factor r7 so the reduction (divide by r7)
        # preserves the standard Montgomery factor R of the inputs
        self.red = ReducePlan(spec, max(self.a_nz, self.b))
        self.w7 = self.red.w7
        self.w7r = self.red.w7r
        self.n0inv7 = self.red.n0inv7
        self.kscale = self.red.kscale

        w_n = spec.root_for_log_len(n.bit_length() - 1)
        w_a = pow(w_n, self.b, p)
        w_b = pow(w_n, self.a, p)
        rev_a = bit_reverse_indices(self.a)
        rev_b = bit_reverse_indices(self.b)

        if share_from is not None:
            # canonical/Montgomery variants differ ONLY in k2's scalar
            # factor — reuse the expensive k1/twiddle tables
            assert (share_from.n, share_from.a, share_from.in_len) == \
                (n, self.a, in_len)
            self.k1 = share_from.k1
            self.tw = share_from.tw
        else:
            # step1 kernel: K[u, jA] = w_a^(rev_a(u)*jA) * kscale, as int8
            # digits; zero-padded inputs keep only the first a_nz input rows
            self.k1 = self._dft_kernel(w_a, self.a, rev_a, n_in=self.a_nz)
            # twiddles tw[u, jB] = w_n^(rev_a(u)*jB) in std Montgomery form
            rbytes = spec.repr_bytes
            buf = bytearray(self.a * self.b * rbytes)
            pos = 0
            for u in range(self.a):
                base = pow(w_n, int(rev_a[u]), p)
                acc = spec.R % p
                for _ in range(self.b):
                    buf[pos : pos + rbytes] = acc.to_bytes(rbytes, "little")
                    pos += rbytes
                    acc = (acc * base) % p
            u16 = np.frombuffer(bytes(buf), dtype="<u2").reshape(
                self.a, self.b, self.ops.w
            )
            self.tw = np.ascontiguousarray(
                np.moveaxis(u16, 2, 0)
            ).astype(np.uint32)
        # step3 kernel over jB; canonical_out folds the Montgomery R^-1
        # into its entries so the output arrives CANONICAL — the streaming
        # commit hashes canonical bytes, and this deletes its whole
        # from_mont pass (one modmul per codeword element)
        extra = pow(spec.R % p, -1, p) if canonical_out else 1
        self.k2 = self._dft_kernel(w_b, self.b, rev_b, extra_scale=extra)

        # separated-reduction constants live on the shared ReducePlan
        self.lt = self.red.lt
        self.toep_n0 = self.red.toep_n0
        self.toep_p = self.red.toep_p
        self.p7 = self.red.p7

    def _dft_kernel(self, w_root: int, size: int, rev: np.ndarray,
                    n_in: "int | None" = None,
                    extra_scale: int = 1) -> np.ndarray:
        """(W7, n_in, size_out) int8 digit kernel, spatial axis flipped so
        conv's correlation computes the digit convolution.  n_in < size
        emits only the first n_in input columns (zero-padded encode);
        extra_scale multiplies every entry (e.g. R^-1 for canonical_out)."""
        p = self.spec.p
        n_in = size if n_in is None else n_in
        nbytes = (7 * self.w7 + 7) // 8 + 1
        buf = bytearray(size * n_in * nbytes)
        pos = 0
        for u in range(size):
            w_row = pow(w_root, int(rev[u]), p)
            entry = (self.kscale * extra_scale) % p
            for _ in range(n_in):
                buf[pos : pos + nbytes] = entry.to_bytes(nbytes, "little")
                pos += nbytes
                entry = (entry * w_row) % p
        raw = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(size, n_in, nbytes)
        # extract 7-bit digits from the little-endian byte representation
        k = np.zeros((self.w7, size, n_in), dtype=np.int8)
        for d in range(self.w7):
            bitpos = 7 * d
            byte, sh = divmod(bitpos, 8)
            lo = raw[:, :, byte].astype(np.uint16)
            hi = raw[:, :, byte + 1].astype(np.uint16) if byte + 1 < nbytes else 0
            k[d] = (((lo | (hi << 8)) >> sh) & 0x7F).astype(np.int8)
        # k[d, u_row, j_in] -> (W7, j_in, u_out)
        k = np.swapaxes(k, 1, 2)
        # flip spatial so that out[o] = sum_{dv+du=o} x_dv * k_du
        return np.ascontiguousarray(k[::-1])


def _to7(x16: jnp.ndarray, w7: int) -> jnp.ndarray:
    """(W16, ...) u32 16-bit limbs -> (W7, ...) int8 digits (digit axis FIRST).

    Digit-major layout is load-bearing: axis-0 slices are address offsets (no
    relayout), so the carry chains and per-digit ops below run as full-width
    VPU ops — the digit-minor form measured ~5x slower end to end.
    """
    w16 = x16.shape[0]
    outs = []
    zero = jnp.zeros_like(x16[0])
    for k in range(w7):
        bitpos = 7 * k
        j, r = divmod(bitpos, 16)
        lo = x16[j] >> jnp.uint32(r)
        hi = (x16[j + 1] << jnp.uint32(16 - r)) if (r > 9 and j + 1 < w16) else zero
        outs.append(((lo | hi) & jnp.uint32(0x7F)).astype(jnp.int8))
    return jnp.stack(outs, axis=0)


def _from7(d7: jnp.ndarray, w16: int) -> jnp.ndarray:
    """(W7, ...) clean 7-bit digits (uint8/uint32) -> (W16, ...) 16-bit limbs."""
    w7 = d7.shape[0]
    cols = [None] * (w16 + 2)
    for k in range(w7):
        bitpos = 7 * k
        j, r = divmod(bitpos, 16)
        v = d7[k].astype(jnp.uint32) << jnp.uint32(r)
        lo = v & MASK16
        hi = v >> 16
        cols[j] = lo if cols[j] is None else cols[j] + lo
        if j + 1 < len(cols):
            cols[j + 1] = hi if cols[j + 1] is None else cols[j + 1] + hi
    out = []
    carry = None
    for j in range(w16):
        c = cols[j] if cols[j] is not None else jnp.zeros_like(d7[0], dtype=jnp.uint32)
        if carry is not None:
            c = c + carry
        out.append(c & MASK16)
        carry = c >> 16
    return jnp.stack(out, axis=0)


def _carry7(planes: jnp.ndarray, out_digits: int) -> jnp.ndarray:
    """(K, ...) int32/uint32 digit planes -> (out_digits, ...) clean digits.

    Output dtype is uint8: at streaming scale the stacked digit arrays are
    the dominant transient (80 digits/element), so 4x matters."""
    k = planes.shape[0]
    out = []
    carry = None
    for i in range(min(k, out_digits)):
        c = planes[i].astype(jnp.uint32)
        if carry is not None:
            c = c + carry
        out.append((c & jnp.uint32(0x7F)).astype(jnp.uint8))
        carry = c >> 7
    for i in range(k, out_digits):
        if carry is None:
            out.append(jnp.zeros_like(out[0]))
        else:
            out.append((carry & jnp.uint32(0x7F)).astype(jnp.uint8))
            carry = carry >> 7
    return jnp.stack(out[:out_digits], axis=0)


def _conv_digits(x7: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """x7 (W7, batch, C_in) int8, kernel (W7, C_in, C_out) -> planes
    (2*W7-1, batch, C_out) int32 of digit-convolved contraction (one MXU
    int8 conv; spatial = digit axis, channels = DFT contraction)."""
    w7 = kernel.shape[0]
    return jax.lax.conv_general_dilated(
        x7, kernel,
        window_strides=(1,),
        padding=[(w7 - 1, w7 - 1)],
        dimension_numbers=("WNC", "WIO", "WNC"),
        preferred_element_type=jnp.int32,
    )  # (2*W7-1, batch, C_out)


def _matmul_toep(digits: jnp.ndarray, toep: np.ndarray) -> jnp.ndarray:
    """(K, ...) digits x (K, M) int8 Toeplitz -> (M, ...) int32.

    Contraction runs as toep^T @ digits with the tiny constant on the left,
    so the output stays digit-major."""
    d = digits.astype(jnp.int8)
    batch = d.shape[1:]
    d2 = d.reshape(d.shape[0], -1)
    out = jax.lax.dot_general(
        jnp.asarray(np.ascontiguousarray(toep.T)), d2,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (M, prod(batch))
    return out.reshape(out.shape[0], *batch)


class MxuNtt:
    """Drop-in MXU NTT (same semantics as BatchedNtt: fft_io ordering).

    With in_len < n the input is the UNPADDED (W, rows, in_len) coefficient
    block and the output is the full (W, rows, n) codeword — identical bytes
    to padding + full NTT, at 1/m of the step-1 conv cost.
    """

    def __init__(self, spec: FieldSpec, n: int, a: "int | None" = None,
                 in_len: "int | None" = None, canonical_out: bool = False,
                 share_plan: "MxuNttPlan | None" = None):
        self.plan = MxuNttPlan(spec, n, a, in_len=in_len,
                               canonical_out=canonical_out,
                               share_from=share_plan)
        self.in_len = self.plan.in_len
        self.canonical_out = canonical_out
        self.ops = self.plan.ops
        # the big tables travel as jit ARGUMENTS (device-resident), not
        # closed-over constants: closure constants are re-lowered per process
        # with a device->host pull, which is minutes over a remote device link
        self._k1 = jax.device_put(self.plan.k1)
        self._k2 = jax.device_put(self.plan.k2)
        self._tw = jax.device_put(np.swapaxes(self.plan.tw, 1, 2))  # (W,b,a)
        self._fn = jax.jit(self._forward)

    def _reduce(self, planes: jnp.ndarray) -> jnp.ndarray:
        """Digit planes -> clean Montgomery digits (shared ReducePlan)."""
        return self.plan.red.reduce(planes)

    def _forward(self, x: jnp.ndarray, k1, k2, tw) -> jnp.ndarray:
        """(W16, rows, in_len) Montgomery -> (W16, rows, n) fft_io output."""
        plan = self.plan
        ops = self.ops
        a, b, w7 = plan.a, plan.b, plan.w7
        a_nz = plan.a_nz
        w16, rows, n_in = x.shape

        # -- step 1: DFT_A over the jA axis (a_nz nonzero input channels) ---
        x7 = _to7(x, w7)                          # (W7, rows, in_len)
        x7 = x7.reshape(w7, rows, a_nz, b)
        x7 = jnp.swapaxes(x7, 2, 3).reshape(w7, rows * b, a_nz)
        planes = _conv_digits(x7, k1)             # (2W7-1, rows*b, a)
        y7 = self._reduce(planes)                 # (W7, rows*b, a) digits

        # -- step 2: twiddle multiply (VPU modmul in the 16-limb domain) ----
        y16 = _from7(y7, w16).reshape(w16, rows, b, a)     # (W16, rows, b, a)
        twb = jnp.broadcast_to(tw[:, None], y16.shape)     # [limb, jB, u]
        z16 = ops.mul(y16, twb)

        # -- step 3: DFT_B over the jB axis ---------------------------------
        z7 = _to7(z16, w7)                        # (W7, rows, b, a)
        z7 = jnp.swapaxes(z7, 2, 3).reshape(w7, rows * a, b)
        planes = _conv_digits(z7, k2)             # (2W7-1, rows*a, b)
        o7 = self._reduce(planes)                 # (W7, rows*a, b)

        # -- assemble: out[row, u*B + v] ------------------------------------
        o16 = _from7(o7, w16)                     # (W16, rows*a, b)
        return o16.reshape(w16, rows, plan.n)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[-1] == self.plan.in_len
        return self._fn(x, self._k1, self._k2, self._tw)

    def mats(self) -> tuple:
        """The k1/k2/twiddle tables as a jit-ARGUMENT pytree (callers
        tracing this NTT inside their own jit thread these through their
        argument lists — closure capture embeds them in the HLO)."""
        return (self._k1, self._k2, self._tw)

    def apply(self, x: jnp.ndarray, mats: tuple) -> jnp.ndarray:
        """4-step body over caller-supplied tables (traced, not jitted)."""
        k1, k2, tw = mats
        return self._forward(x, k1, k2, tw)


def _norm_in_len(n: int, in_len: "int | None") -> "int | None":
    """Cache-key normalization: in_len == n means a full NTT, same plan as
    in_len=None — without this, (spec, n, n) and (spec, n, None) built two
    duplicate plans (an O(n) host bigint table plus a second device-resident
    copy of the k1/twiddle tables, hundreds of MB at large n)."""
    return None if in_len is None or in_len >= n else in_len


@functools.lru_cache(maxsize=None)
def _get_mxu_ntt_cached(spec: FieldSpec, n: int, in_len: "int | None") -> MxuNtt:
    return MxuNtt(spec, n, in_len=in_len)


def get_mxu_ntt(spec: FieldSpec, n: int, in_len: "int | None" = None) -> MxuNtt:
    return _get_mxu_ntt_cached(spec, n, _norm_in_len(n, in_len))


@functools.lru_cache(maxsize=None)
def _get_mxu_ntt_canonical_cached(spec: FieldSpec, n: int,
                                  in_len: "int | None") -> MxuNtt:
    base = get_mxu_ntt(spec, n, in_len)
    return MxuNtt(spec, n, in_len=in_len, canonical_out=True,
                  share_plan=base.plan)


def get_mxu_ntt_canonical(spec: FieldSpec, n: int,
                          in_len: "int | None" = None) -> MxuNtt:
    """Canonical-output variant; shares k1/twiddle tables with the
    Montgomery plan of the same shape."""
    return _get_mxu_ntt_canonical_cached(spec, n, _norm_in_len(n, in_len))
