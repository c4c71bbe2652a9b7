"""Ligero (Reed-Solomon) encoding: NTT row encode + proof-size-optimal dims.

Reimplements `LigeroEncodingRho` (lcpc-ligero-pc/src/lib.rs:32-195):
- rate rho = rho_num/rho_den (default 1/2 like `LigeroEncoding`);
- number of column openings ceil(-lambda / log2((1+rho)/2)) (lib.rs:61-64);
- `_get_dims` picks n_cols near sqrt(n_col_opens*len/ndt)/rho, capped by the
  field's 2-adicity, then keeps whichever of {nc, nc/2} minimizes proof size
  (lib.rs:70-112);
- encode = zero-pad the row to n_cols and apply the in-order-input,
  bit-reversed-output NTT (fft_io_pc, lib.rs:162-164).

The dimension formulas use f64 arithmetic in Rust; Python floats are the same
IEEE doubles, and the operation order is kept identical.
"""

from __future__ import annotations

import math
from fractions import Fraction

import jax
import jax.numpy as jnp

from ..core.encoding import LcEncoding
from ..core.soundness import n_degree_tests
from ..fields.spec import FieldSpec
from ..ops.limbs import get_ops
from ..ops.ntt import get_ntt, ntt_host

LAMBDA = 128


def _pick_ntt(spec: FieldSpec, n: int, in_len: "int | None" = None):
    """Choose the NTT backend: the MXU int8-conv path wins for wide fields on
    TPU (~1.4x for ft255); the VPU ladder is best for narrow fields and CPU.
    Override with LCPC_MXU_NTT=0/1.

    in_len < n requests the zero-padded-input plan (rate-1/m systematic
    encode): the step-1 kernel contracts only the nonzero channels, cutting
    the dominant conv cost by n/in_len (ops/mxu_ntt.MxuNttPlan).
    """
    import os

    import jax

    flag = os.environ.get("LCPC_MXU_NTT")
    if flag == "1":
        use_mxu = True
    elif flag == "0":
        use_mxu = False
    else:
        on_tpu = jax.default_backend() not in ("cpu",)
        use_mxu = on_tpu and spec.w16 >= 8 and n >= 4
    if use_mxu:
        from ..ops.mxu_ntt import get_mxu_ntt, mxu_supported

        if in_len is not None and in_len < n and mxu_supported(spec, n, in_len):
            return get_mxu_ntt(spec, n, in_len)
        if mxu_supported(spec, n):
            return get_mxu_ntt(spec, n)
        # beyond the int8-conv contraction cap (conv_cap; n > 2^22 for
        # ft255 full plans, 2^24 at rate 1/4): the VPU ladder has no size
        # cap below the 2-adicity bound
    return get_ntt(spec, n)


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length() if x > 1 else 1


class LigeroEncoding(LcEncoding):
    """Rate-rho RS encoding (default rho = 1/2, like the Rust alias)."""

    # codeword column c == row poly evaluated at w^bitrev(c): the prover can
    # compute opened columns directly from coefficients (ops/mxu_prove.py)
    # instead of re-encoding blocks when the codeword was not retained
    supports_direct_col_eval = True

    def __init__(self, spec: FieldSpec, n_per_row: int, n_cols: int,
                 rho_num: int = 1, rho_den: int = 2):
        self.spec = spec
        self.rho_num = rho_num
        self.rho_den = rho_den
        assert self._dims_ok_static(n_per_row, n_cols), (n_per_row, n_cols)
        assert (n_cols.bit_length() - 1) <= spec.s
        self.n_per_row = n_per_row
        self.n_cols = n_cols
        self.ops = get_ops(spec)
        # the systematic encode zero-pads n_per_row -> n_cols; the MXU plan
        # exploits that (rectangular step-1 kernel) when the padded length
        # is a power-of-two multiple of the input
        self._ntt = _pick_ntt(spec, n_cols, in_len=_next_pow2(n_per_row))
        self._ntt_in = getattr(self._ntt, "in_len", n_cols)

    # ---- constructors (lib.rs:120-148) ---------------------------------------

    @classmethod
    def new(cls, spec: FieldSpec, length: int, rho_num: int = 1, rho_den: int = 2):
        dims = cls._get_dims(spec, length, rho_num, rho_den)
        assert dims is not None, "no valid dims (2-adicity cap?)"
        _, n_per_row, n_cols = dims
        return cls(spec, n_per_row, n_cols, rho_num, rho_den)

    @classmethod
    def new_ml(cls, spec: FieldSpec, n_vars: int, rho_num: int = 1, rho_den: int = 2):
        n_monomials = 1 << n_vars
        dims = cls._get_dims(spec, n_monomials, rho_num, rho_den)
        assert dims is not None
        n_rows, n_per_row, n_cols = dims
        assert n_rows & (n_rows - 1) == 0
        assert n_per_row & (n_per_row - 1) == 0
        assert n_rows * n_per_row == n_monomials
        return cls(spec, n_per_row, n_cols, rho_num, rho_den)

    @classmethod
    def new_from_dims(cls, spec: FieldSpec, n_per_row: int, n_cols: int,
                      rho_num: int = 1, rho_den: int = 2):
        return cls(spec, n_per_row, n_cols, rho_num, rho_den)

    # ---- parameter logic (lib.rs:45-118) -------------------------------------

    @classmethod
    def _rho(cls, rho_num, rho_den) -> float:
        assert rho_num < rho_den
        return rho_num / rho_den

    @classmethod
    def n_col_opens_static(cls, rho_num: int, rho_den: int) -> int:
        den = math.log2((1.0 + cls._rho(rho_num, rho_den)) / 2.0)
        return math.ceil(-float(LAMBDA) / den)

    @classmethod
    def _n_degree_tests_static(cls, spec: FieldSpec, n_cols: int) -> int:
        return n_degree_tests(LAMBDA, n_cols, spec.flog2)

    @classmethod
    def _get_dims(cls, spec: FieldSpec, length: int, rho_num: int, rho_den: int):
        rho = cls._rho(rho_num, rho_den)
        n_col_opens = cls.n_col_opens_static(rho_num, rho_den)
        lncf = float(n_col_opens * length)
        ndt = float(
            cls._n_degree_tests_static(spec, math.ceil(math.sqrt(lncf) / rho))
        )
        nc1 = _next_pow2(math.ceil(math.sqrt(lncf / ndt) / rho))
        if nc1 > (1 << spec.s):
            return None

        np1 = nc1 * rho_num // rho_den
        nr1 = (length + np1 - 1) // np1
        nd1 = cls._n_degree_tests_static(spec, nc1)
        assert np1 * nr1 >= length
        assert np1 * (nr1 - 1) < length

        nc2 = nc1 // 2
        np2 = np1 // 2
        nr2 = (length + np2 - 1) // np2
        nd2 = cls._n_degree_tests_static(spec, nc2)
        assert nc2 & (nc2 - 1) == 0
        assert np2 * nr2 >= length
        assert np2 * (nr2 - 1) < length

        sz1 = n_col_opens * nr1 + (1 + nd1) * np1
        sz2 = n_col_opens * nr2 + (1 + nd2) * np2
        return (nr1, np1, nc1) if sz1 < sz2 else (nr2, np2, nc2)

    def _dims_ok_static(self, n_per_row: int, n_cols: int) -> bool:
        return n_per_row < n_cols and (n_cols & (n_cols - 1)) == 0

    # ---- LcEncoding interface ------------------------------------------------

    def get_dims(self, length: int) -> tuple[int, int, int]:
        n_rows = (length + self.n_per_row - 1) // self.n_per_row
        return (n_rows, self.n_per_row, self.n_cols)

    def dims_ok(self, n_per_row: int, n_cols: int) -> bool:
        return (
            self._dims_ok_static(n_per_row, n_cols)
            and n_per_row == self.n_per_row
            and n_cols == self.n_cols
        )

    def get_n_col_opens(self) -> int:
        return self.n_col_opens_static(self.rho_num, self.rho_den)

    def get_n_degree_tests(self) -> int:
        return self._n_degree_tests_static(self.spec, self.n_cols)

    def encode_rows(self, rows: jnp.ndarray) -> jnp.ndarray:
        w, r, npr = rows.shape
        assert npr == self.n_per_row and w == self.ops.w
        # pad only to the NTT's declared input length: the zero-padded-input
        # MXU plan takes the unpadded block (n_cols/in_len cheaper step 1)
        padded = jnp.pad(rows, [(0, 0), (0, 0), (0, self._ntt_in - npr)])
        return self._ntt(padded)

    def encode_mats(self) -> tuple:
        """The NTT's twiddle/kernel tables as a jit-ARGUMENT pytree.

        Same rule as SdigEncoding.encode_mats: callers tracing the encode
        inside their own jit/shard_map (verify's row re-encode, the mesh
        commit) must thread these through their argument lists — closure
        capture embeds them in the serialized HLO (tens to hundreds of MB
        at large n; remote-compile HTTP 413)."""
        return self._ntt.mats()

    def encode_rows_core(self, rows: jnp.ndarray, mats: tuple) -> jnp.ndarray:
        """encode_rows body over caller-supplied tables (see encode_mats)."""
        w, r, npr = rows.shape
        assert npr == self.n_per_row and w == self.ops.w
        padded = jnp.pad(rows, [(0, 0), (0, 0), (0, self._ntt_in - npr)])
        return self._ntt.apply(padded, mats)

    def stream_encode_mats(self, canonical: bool = False) -> tuple:
        """Tables for the NTT encode_rows_lowmem will run (which differs
        from the plain path's: the streaming MXU plan may be the
        canonical-output variant, and the fallback is the VPU ladder)."""
        ntt = self._stream_mxu_ntt()
        if ntt is None:
            return self._lowmem_ntt().mats()
        if canonical:
            from ..ops.mxu_ntt import get_mxu_ntt_canonical

            in_len = None if self._ntt_in == self.n_cols else self._ntt_in
            ntt = get_mxu_ntt_canonical(self.spec, self.n_cols, in_len)
        return ntt.mats()

    def _lowmem_ntt(self):
        """VPU ladder, constructed EAGERLY (device twiddle constants must
        materialize outside any enclosing jit trace — see _device_mats)."""
        if not hasattr(self, "_ntt_vpu"):
            from ..ops.ntt import BatchedNtt

            self._ntt_vpu = (
                self._ntt if isinstance(self._ntt, BatchedNtt)
                else get_ntt(self.spec, self.n_cols)
            )
        return self._ntt_vpu

    def _stream_mxu_ntt(self):
        """The MXU NTT for the streaming path, or None for the VPU ladder.

        Used when _pick_ntt already chose MXU for the plain path (TPU, wide
        field, n_cols under the int8-conv cap); LCPC_STREAM_MXU=0 forces the
        ladder."""
        import os

        from ..ops.mxu_ntt import MxuNtt

        if os.environ.get("LCPC_STREAM_MXU", "1") == "0":
            return None
        return self._ntt if isinstance(self._ntt, MxuNtt) else None

    # measured transient footprint of one MxuNtt call, bytes per CODEWORD
    # element: int32 digit planes (2*W7-1 ~ 73 planes), digit arrays, and
    # the two 16-limb intermediates
    _MXU_STREAM_BPE = 500

    def encode_rows_lowmem(self, rows: jnp.ndarray, post=None,
                           canonical: bool = False,
                           mats=None) -> jnp.ndarray:
        """Bounded-transient encode for the streaming path.

        `post` (optional) maps one encoded sub-chunk (W, sub, n_cols) to its
        consumer form INSIDE the lax.map body — e.g. canonicalize+pack for
        the streaming hasher — so the unpacked Montgomery codeword block
        (2.1 GB at 2^29 with 8-row blocks) never materializes; without it
        the map boundary forces the full block out before any fusion.

        `canonical=True` emits CANONICAL limbs instead of Montgomery: on
        the MXU path the R^-1 factor folds into the step-3 kernel for free
        (get_mxu_ntt_canonical), deleting the from_mont modmul pass the
        streaming hasher otherwise pays per codeword element.

        The MXU digit-conv NTT is ~40% faster than the VPU ladder but its
        int32 digit planes cost ~500 B/element — unaffordable for a whole
        96-row x 2^18 streaming block (the ladder needs ~250 B/element).
        Resolution: keep the MXU kernel and bound its transients by running
        the block as row SUB-chunks under lax.map (compiled once, buffers
        sized for one sub-chunk).  Profiled at 2^25 ft255 the VPU-ladder
        encode was 6.6 s of the 7.1 s commit — this path is what puts the
        streaming commit past the 64-core baseline.

        `mats` (optional) carries the tables stream_encode_mats(canonical)
        returned, as traced arguments — mandatory when this runs inside a
        caller's jit (closure-captured tables embed in the HLO)."""
        w, r, npr = rows.shape
        assert npr == self.n_per_row and w == self.ops.w
        ntt_mxu = self._stream_mxu_ntt()
        if ntt_mxu is None:
            ladder = self._lowmem_ntt()
            padded = jnp.pad(rows, [(0, 0), (0, 0), (0, self.n_cols - npr)])
            out = (ladder.apply(padded, mats) if mats is not None
                   else ladder(padded))
            if canonical:
                out = self.ops.from_mont(out)
            return post(out) if post is not None else out
        if canonical:
            from ..ops.mxu_ntt import get_mxu_ntt_canonical

            in_len = None if self._ntt_in == self.n_cols else self._ntt_in
            ntt_mxu = get_mxu_ntt_canonical(self.spec, self.n_cols, in_len)
        if mats is not None:
            base = ntt_mxu
            ntt_mxu = lambda x: base.apply(x, mats)
        # MXU path: pad only to the plan's input length (n_per_row for the
        # zero-padded-input plan — no (w, r, n_cols) zero buffer at all)
        padded = jnp.pad(rows, [(0, 0), (0, 0), (0, self._ntt_in - npr)])

        from ..utils import hbm as hbm_budget

        # 768 MiB default (utils/hbm.MXU_STREAM_BYTES_DEFAULT): at 2^25
        # ft255 with the retained-codeword buffer a 2 GiB sub-chunk
        # transient OOMed the chip (keep + coeffs + carry already hold
        # ~6.6 GB); commit_streaming reserves the same constant in its
        # row-block sizing, so the two cannot desynchronize
        budget = hbm_budget.mxu_stream_bytes()
        sub = max(1, min(budget // (self._MXU_STREAM_BPE * self.n_cols), r))
        while r % sub:  # largest divisor of the block's row count
            sub -= 1
        if sub == r:
            out = ntt_mxu(padded)
            return post(out) if post is not None else out
        xs = jnp.transpose(
            padded.reshape(w, r // sub, sub, self._ntt_in), (1, 0, 2, 3)
        )
        if post is not None:
            # consumer form per sub-chunk: nothing wider than one sub-chunk
            # of unpacked codeword ever exists
            out = jax.lax.map(lambda x: post(ntt_mxu(x)), xs)
            return out.reshape(-1, *out.shape[2:])
        out = jax.lax.map(ntt_mxu, xs)
        return jnp.transpose(out, (1, 0, 2, 3)).reshape(w, r, self.n_cols)

    def encode_row_host(self, row: list[int]) -> list[int]:
        assert len(row) <= self.n_cols
        padded = list(row) + [0] * (self.n_cols - len(row))
        return ntt_host(self.spec, padded)

    @property
    def rho(self) -> Fraction:
        return Fraction(self.rho_num, self.rho_den)
