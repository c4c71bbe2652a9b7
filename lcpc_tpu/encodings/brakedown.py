"""Brakedown / SDIG expander-code encoding.

Reimplements lcpc-brakedown-pc:
- `codespec.rs:17-232`: code parameter sets (alpha, beta, r as exact
  rationals) and the entropy-formula density constants;
- `matgen.rs:23-188`: deterministic seeded generation of the per-level sparse
  code matrices (ChaCha20 per-level streams, Lemire column sampling with
  rejection, nonzero values in sorted-column order) — the verifier
  regenerates identical matrices from the seed, so they never ride the wire;
- `encode.rs:18-110`: iterative recursive systematic encode over one flat
  buffer (precode SpMVs down, Vandermonde Reed-Solomon base case, postcode
  SpMVs up).

TPU mapping: each level's SpMV is applied to ALL matrix rows at once (the
n_rows commit rows are independent), as a lax.scan over the padded-CSR slot
axis: one gather of X columns + one vectorized modmul + modadd per slot.
Matrices are tiny relative to the data (nnz ~ 8/col), so the scan is
bandwidth-bound, and the dominant level is the first.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.encoding import LcEncoding
from ..core.soundness import n_degree_tests
from ..fields.spec import FieldSpec
from ..fs.chacha import ChaCha20Rng
from ..fs.sampling import UniformUsize, field_random_nonzero
from ..ops.limbs import get_ops

LAMBDA = 128


def _ent(z: float) -> float:
    assert 0.0 < z < 1.0
    mzp1 = 1.0 - z
    return -z * math.log2(z) - mzp1 * math.log2(mzp1)


def _ceil_muldiv(n: int, num: int, den: int) -> int:
    return (n * num + den - 1) // den


@dataclasses.dataclass(frozen=True)
class CodeSpec:
    """SDIG code parameters as exact rationals (codespec.rs:24-129)."""

    name: str
    an: int
    ad: int
    bn: int
    bd: int
    rn: int
    rd: int
    baselen: int

    def dist(self) -> float:
        return (self.bn * self.rd) / (self.bd * self.rn)

    def alpha(self) -> float:
        return self.an / self.ad

    def beta(self) -> float:
        return self.bn / self.bd

    def r(self) -> float:
        return self.rn / self.rd

    def mu(self) -> float:
        return self.r() - 1.0 - self.r() * self.alpha()

    def nu(self) -> float:
        return self.beta() + self.alpha() * self.beta() + 0.03

    def cnst_cn_1(self) -> float:
        return _ent(self.beta()) + self.alpha() * _ent(
            1.28 * self.beta() / self.alpha()
        )

    def cnst_cn_2(self) -> float:
        return self.beta() * math.log2(self.alpha() / (1.28 * self.beta()))

    def cnst_dn_1(self) -> float:
        return self.r() * self.alpha() * _ent(self.beta() / self.r()) + self.mu() * _ent(
            self.nu() / self.mu()
        )

    def cnst_dn_2(self) -> float:
        return self.alpha() * self.beta() * math.log2(self.mu() / self.nu())


# the six parameter rows (codespec.rs:169-232)
CODE1 = CodeSpec("code1", 239, 2000, 71, 2500, 71, 50, 20)
CODE2 = CodeSpec("code2", 69, 500, 111, 2500, 147, 100, 20)
CODE3 = CodeSpec("code3", 89, 500, 61, 1000, 1521, 1000, 20)
CODE4 = CodeSpec("code4", 1, 5, 41, 500, 41, 25, 20)
CODE5 = CodeSpec("code5", 211, 1000, 97, 1000, 202, 125, 20)
CODE6 = CodeSpec("code6", 119, 500, 241, 2000, 43, 25, 20)
ALL_CODES = (CODE1, CODE2, CODE3, CODE4, CODE5, CODE6)


def get_code_dims(code: CodeSpec, n: int, log2p: float):
    """Dimension ladder + densities (matgen.rs:56-111).

    Returns (pre_dims, post_dims): lists of (n_i, m_i, cn) / (n'_i, m'_i, dn).
    """
    baselen = code.baselen
    assert n > baselen
    ladder = [n]
    while ladder[-1] > baselen:
        ladder.append(_ceil_muldiv(ladder[-1], code.an, code.ad))
    assert len(ladder) > 1
    # the Rust take_while keeps entries > baselen, then pushes one more
    keep = [x for x in ladder if x > baselen]
    last = _ceil_muldiv(keep[-1], code.an, code.ad)
    assert last <= baselen
    keep.append(last)

    pre_dims = []
    for ni, mi in zip(keep, keep[1:]):
        cn = min(
            max(
                _ceil_muldiv(ni, 32 * code.bn, 25 * code.bd),
                4 + _ceil_muldiv(ni, code.bn, code.bd),
            ),
            math.ceil((110.0 / ni + code.cnst_cn_1()) / code.cnst_cn_2()),
        )
        cn = min(cn, mi)
        pre_dims.append((ni, mi, cn))

    post_dims = []
    for ni, mi, _ in pre_dims:
        niprime = _ceil_muldiv(mi, code.rn, code.rd)
        miprime = _ceil_muldiv(ni, code.rn, code.rd) - ni - niprime
        tmp1 = _ceil_muldiv(ni, 2 * code.bn, code.bd)
        tmp2 = _ceil_muldiv(ni, code.rn, code.rd) - ni + 110
        dn = min(
            tmp1 + math.ceil(tmp2 / log2p),
            math.ceil((110.0 / ni + code.cnst_dn_1()) / code.cnst_dn_2()),
        )
        dn = min(dn, miprime)
        post_dims.append((niprime, miprime, dn))

    return pre_dims, post_dims


@dataclasses.dataclass
class SparseMat:
    """CSC sparse matrix over the field, mapping R^n_in -> R^n_out.

    Matches the sprs CsMat built by gen_code (matgen.rs:114-188): column j of
    the CSC holds the entries sampled for generated row j.
    """

    n_out: int  # rows (m in gen_code's CSC shape)
    n_in: int   # cols (n)
    col_ptr: np.ndarray   # (n_in+1,) int64
    row_idx: np.ndarray   # (nnz,) int64, sorted within each column
    vals: list[int]       # canonical field values, aligned with row_idx

    def apply_host(self, x: list[int], p: int) -> list[int]:
        assert len(x) == self.n_in
        y = [0] * self.n_out
        for j in range(self.n_in):
            xj = x[j]
            if xj == 0:
                continue
            for k in range(self.col_ptr[j], self.col_ptr[j + 1]):
                y[self.row_idx[k]] = (y[self.row_idx[k]] + self.vals[k] * xj) % p
        return y


def gen_code(spec: FieldSpec, n: int, m: int, d: int, rng: ChaCha20Rng) -> SparseMat:
    """One code matrix: n generated rows over m columns, d distinct nonzeros
    per row (matgen.rs:114-188).  RNG consumption matches Rust exactly."""
    dist = UniformUsize(m)
    col_ptr = [0]
    row_idx: list[int] = []
    vals: list[int] = []
    for _ in range(n):
        cols: list[int] = []
        while len(cols) < d:
            x = dist.sample(rng)
            if x not in cols:
                cols.append(x)
        cols.sort()
        for c in cols:
            v = field_random_nonzero(spec, rng)
            row_idx.append(c)
            vals.append(v)
        col_ptr.append(len(row_idx))
    return SparseMat(
        n_out=m,
        n_in=n,
        col_ptr=np.asarray(col_ptr, dtype=np.int64),
        row_idx=np.asarray(row_idx, dtype=np.int64),
        vals=vals,
    )


def generate(spec: FieldSpec, code: CodeSpec, n: int, seed: int):
    """Seeded generation of all levels (matgen.rs:28-52).

    Level i draws from ChaCha20Rng::seed_from_u64(seed) with stream i;
    precode first, then postcode from the same stream.
    """
    pre_dims, post_dims = get_code_dims(code, n, float(spec.flog2))
    precodes = []
    postcodes = []
    for i, ((ni, mi, cn), (nip, mip, dn)) in enumerate(zip(pre_dims, post_dims)):
        rng = ChaCha20Rng.seed_from_u64(seed)
        rng.set_stream(i)
        precodes.append(gen_code(spec, ni, mi, cn, rng))
        postcodes.append(gen_code(spec, nip, mip, dn, rng))
    return precodes, postcodes


def codeword_length(precodes, postcodes) -> int:
    """encode.rs:18-33."""
    assert precodes and len(precodes) == len(postcodes)
    return (
        precodes[0].n_in
        + postcodes[-1].n_in
        + sum(pc.n_out for pc in precodes[:-1])
        + sum(pc.n_out for pc in postcodes)
    )


def reed_solomon_host(spec: FieldSpec, xi: list[int], n_out: int) -> list[int]:
    """Vandermonde RS at points 1..n_out via Horner (encode.rs:97-110)."""
    p = spec.p
    out = []
    x = 1
    for _ in range(n_out):
        acc = 0
        for j in range(len(xi) - 1, -1, -1):
            acc = (acc * x + xi[j]) % p
        out.append(acc)
        x += 1
    return out


def encode_host(spec: FieldSpec, xi: list[int], precodes, postcodes) -> list[int]:
    """Slow twin of the iterative expander encode (encode.rs:36-94)."""
    p = spec.p
    buf = list(xi)
    assert len(buf) == codeword_length(precodes, postcodes)

    # forward precode SpMVs
    in_start = 0
    for pc in precodes[:-1]:
        in_end = in_start + pc.n_in
        y = pc.apply_host(buf[in_start:in_end], p)
        buf[in_end : in_end + pc.n_out] = y
        in_start = in_end

    # base case RS
    pc = precodes[-1]
    in_end = in_start + pc.n_in
    tmp = pc.apply_host(buf[in_start:in_end], p)
    rs_len = postcodes[-1].n_in
    buf[in_end : in_end + rs_len] = reed_solomon_host(spec, tmp, rs_len)
    out_start = in_end + rs_len
    in_start = in_end + pc.n_out

    # backward postcode SpMVs
    for pc, qc in zip(reversed(precodes), reversed(postcodes)):
        in_start -= pc.n_out
        y = qc.apply_host(buf[in_start:out_start], p)
        buf[out_start : out_start + qc.n_out] = y
        out_start += qc.n_out

    assert in_start == precodes[0].n_in
    assert out_start == len(buf)
    return buf


# ---------------------------------------------------------------------------
# device path
# ---------------------------------------------------------------------------


def _csr_pad(mat: SparseMat) -> tuple[np.ndarray, list[list[int]]]:
    """CSC -> padded CSR: per output row, up to kmax (col, val) slots."""
    rows: list[list[tuple[int, int]]] = [[] for _ in range(mat.n_out)]
    for j in range(mat.n_in):
        for k in range(mat.col_ptr[j], mat.col_ptr[j + 1]):
            rows[mat.row_idx[k]].append((j, mat.vals[k]))
    kmax = max((len(r) for r in rows), default=1)
    kmax = max(kmax, 1)
    cols = np.zeros((mat.n_out, kmax), dtype=np.int32)
    vals = [[0] * kmax for _ in range(mat.n_out)]
    for i, entries in enumerate(rows):
        for s, (j, v) in enumerate(entries):
            cols[i, s] = j
            vals[i][s] = v
    return cols, vals


class _DeviceMat:
    """Padded-CSR device form of a SparseMat."""

    def __init__(self, ops, mat: SparseMat):
        cols, vals = _csr_pad(mat)
        self.n_out = mat.n_out
        self.n_in = mat.n_in
        self.kmax = cols.shape[1]
        # (kmax, n_out) column indices; (kmax, W, n_out) Montgomery limbs
        self.cols = jnp.asarray(cols.T)
        flat = [v for row in vals for v in row]
        enc = ops.encode_host(flat)  # (W, n_out*kmax)
        self.vals = jnp.asarray(
            np.moveaxis(
                np.asarray(enc).reshape(ops.w, self.n_out, self.kmax), 2, 0
            )
        )  # (kmax, W, n_out)


def _apply_mat_device(ops, dm: _DeviceMat, x: jnp.ndarray) -> jnp.ndarray:
    """Y (W, R, n_out) = A X for a batch of rows X (W, R, n_in)."""
    r = x.shape[1]

    def body(acc, slot):
        cols_k, vals_k = slot  # (n_out,), (W, n_out)
        g = jnp.take(x, cols_k, axis=2)  # (W, R, n_out)
        term = ops.mul(g, jnp.broadcast_to(vals_k[:, None, :], g.shape))
        return ops.add(acc, term), None

    acc0 = ops.zeros((r, dm.n_out))
    acc, _ = jax.lax.scan(body, acc0, (dm.cols, dm.vals))
    return acc


def _rs_device(ops, vmont: np.ndarray, x: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """RS base case as a dense scan: vmont (n_in, W, n_out) Montgomery
    Vandermonde columns; x (W, R, n_in) -> (W, R, n_out)."""
    r = x.shape[1]
    n_in = x.shape[2]

    def body(acc, slot):
        v_j, x_j = slot  # (W, n_out), (W, R)
        term = ops.mul(
            jnp.broadcast_to(x_j[:, :, None], (ops.w, r, n_out)),
            jnp.broadcast_to(v_j[:, None, :], (ops.w, r, n_out)),
        )
        return ops.add(acc, term), None

    acc0 = ops.zeros((r, n_out))
    xs = jnp.moveaxis(x, 2, 0)  # (n_in, W, R)
    acc, _ = jax.lax.scan(body, acc0, (jnp.asarray(vmont), xs))
    return acc


class SdigEncoding(LcEncoding):
    """SDIG expander-code encoding (lcpc-brakedown-pc/src/lib.rs:39-176)."""

    def __init__(self, spec: FieldSpec, n_per_row: int, seed: int,
                 code: CodeSpec = CODE3):
        self.spec = spec
        self.code = code
        self.seed = seed
        self.ops = get_ops(spec)
        self.precodes, self.postcodes = generate(spec, code, n_per_row, seed)
        assert n_per_row == self.precodes[0].n_in
        self.n_per_row = n_per_row
        self.n_cols = codeword_length(self.precodes, self.postcodes)
        self._dev = None
        self._encode_jit = None

    # ---- constructors (lib.rs:69-137) ----------------------------------------

    @classmethod
    def _n_col_opens_static(cls, code: CodeSpec) -> int:
        dist_ov_3 = code.dist() / 3.0
        den = math.log2(1.0 - dist_ov_3)
        return math.ceil(-float(LAMBDA) / den)

    @classmethod
    def _n_degree_tests_static(cls, spec: FieldSpec, n_cols: int) -> int:
        return n_degree_tests(LAMBDA, n_cols, spec.flog2)

    @classmethod
    def _new_from_np1(cls, spec: FieldSpec, length: int, np1: int, seed: int,
                      code: CodeSpec):
        np1 = length if np1 > length else np1
        n_col_opens = cls._n_col_opens_static(code)
        nr1 = (length + np1 - 1) // np1
        nd1 = cls._n_degree_tests_static(spec, np1 * 2)  # approximately
        assert np1 * nr1 >= length
        assert np1 * (nr1 - 1) < length
        np2 = np1 // 2
        nr2 = (length + np2 - 1) // np2
        nd2 = cls._n_degree_tests_static(spec, np2 * 2)  # approximately
        assert np2 * nr2 >= length
        assert np2 * (nr2 - 1) < length
        sz1 = n_col_opens * nr1 + (1 + nd1) * np1
        sz2 = n_col_opens * nr2 + (1 + nd2) * np2
        n_per_row = np1 if sz1 < sz2 else np2
        return cls(spec, n_per_row, seed, code)

    @classmethod
    def new(cls, spec: FieldSpec, length: int, seed: int, code: CodeSpec = CODE3):
        lncf = float(cls._n_col_opens_static(code) * length)
        ndt = float(
            cls._n_degree_tests_static(spec, math.ceil(math.sqrt(lncf)) * 2)
        )
        np1 = math.ceil(math.sqrt(lncf / ndt))
        return cls._new_from_np1(spec, length, np1, seed, code)

    @classmethod
    def new_ml(cls, spec: FieldSpec, n_vars: int, seed: int, code: CodeSpec = CODE3):
        n_monomials = 1 << n_vars
        lncf = float(cls._n_col_opens_static(code) * n_monomials)
        ndt = float(
            cls._n_degree_tests_static(spec, math.ceil(math.sqrt(lncf)) * 2)
        )
        base = math.ceil(math.sqrt(lncf / ndt))
        np1 = 1 << (base - 1).bit_length() if base > 1 else 1
        return cls._new_from_np1(spec, n_monomials, np1, seed, code)

    @classmethod
    def new_from_dims(cls, spec: FieldSpec, n_per_row: int, n_cols: int, seed: int,
                      code: CodeSpec = CODE3):
        enc = cls(spec, n_per_row, seed, code)
        assert n_cols == enc.n_cols
        return enc

    # ---- LcEncoding ----------------------------------------------------------

    def get_dims(self, length: int) -> tuple[int, int, int]:
        n_rows = (length + self.n_per_row - 1) // self.n_per_row
        return (n_rows, self.n_per_row, self.n_cols)

    def dims_ok(self, n_per_row: int, n_cols: int) -> bool:
        return (
            n_per_row < n_cols
            and n_per_row == self.n_per_row
            and n_cols == self.n_cols
        )

    def get_n_col_opens(self) -> int:
        return self._n_col_opens_static(self.code)

    def get_n_degree_tests(self) -> int:
        return self._n_degree_tests_static(self.spec, self.n_cols)

    def _device_mats(self):
        if self._dev is None:
            ops = self.ops
            pre = [_DeviceMat(ops, m) for m in self.precodes]
            post = [_DeviceMat(ops, m) for m in self.postcodes]
            # Vandermonde for the RS base case, Montgomery form
            nb = self.precodes[-1].n_out
            rs_len = self.postcodes[-1].n_in
            vm = np.empty((nb, ops.w, rs_len), dtype=np.uint32)
            for j in range(nb):
                row = [pow(x, j, self.spec.p) for x in range(1, rs_len + 1)]
                vm[j] = ops.encode_host(row)
            self._dev = (pre, post, jnp.asarray(vm))
        return self._dev

    def encode_rows(self, rows: jnp.ndarray) -> jnp.ndarray:
        if self._encode_jit is None:
            # materialize the device matrices OUTSIDE the trace (constants
            # cached on self must not be created inside jit)
            self._device_mats()
            self._encode_jit = jax.jit(self._encode_rows_impl)
        return self._encode_jit(rows)

    def _encode_rows_impl(self, rows: jnp.ndarray) -> jnp.ndarray:
        ops = self.ops
        pre, post, vmont = self._device_mats()
        segs = [rows]  # x
        x = rows
        for dm in pre[:-1]:
            x = _apply_mat_device(ops, dm, x)
            segs.append(x)
        # base case
        tmp = _apply_mat_device(ops, pre[-1], x)
        rs_len = post[-1].n_in
        rs = _rs_device(ops, vmont, tmp, rs_len)
        segs.append(rs)
        # backward pass: postcode i input = the encoded sub-codeword starting
        # at segment i+1: [y_{i+1} | ... | rs | v_t | ... | v_{i+2}].
        # back_segs accumulates deepest-first, which IS the buffer order
        # (v_t sits right after rs, then v_{t-1}, ... — encode.rs:76-90).
        back_segs: list[jnp.ndarray] = []
        for i in range(len(post) - 1, -1, -1):
            inp = jnp.concatenate(segs[i + 1 :] + back_segs, axis=2)
            assert inp.shape[2] == post[i].n_in, (inp.shape, post[i].n_in)
            back_segs.append(_apply_mat_device(ops, post[i], inp))
        return jnp.concatenate(segs + back_segs, axis=2)

    def encode_row_host(self, row: list[int]) -> list[int]:
        assert len(row) <= self.n_cols
        buf = list(row) + [0] * (self.n_cols - len(row))
        return encode_host(self.spec, buf, self.precodes, self.postcodes)
