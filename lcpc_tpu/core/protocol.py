"""The 2-D linear-code polynomial commitment: commit / prove / verify.

TPU-native re-implementation of lcpc-2d (lcpc-2d/src/lib.rs:622-1123):

- commit: pad coefficients into an (n_rows x n_per_row) matrix, batch-encode
  every row on device (NTT or expander SpMV), convert to canonical bytes on
  device, hash columns and build the Merkle tree on device
  (lib.rs:622-704).  Rows are independent (row-parallel over a mesh); columns
  are the hash lanes.
- prove: per degree test, draw a ChaCha tensor from the transcript, collapse
  the coefficient matrix (a modular vector-matrix product on device), then
  Fiat-Shamir column sampling and column openings (lib.rs:1004-1123).
- verify: re-derive the challenges, re-encode the proof rows, and check, for
  every opened column, the Merkle path and the degree-test/eval dot products
  (lib.rs:832-1000), batched on device across the opened columns.

Fiat-Shamir order is load-bearing: p_random(s) -> p_eval -> column indices,
with columns sampled WITH replacement (lib.rs:1024-1080).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import FieldSpec
from ..fs.chacha import ChaCha20Rng
from ..fs.merlin import Transcript
from ..fs.sampling import field_random_vec, uniform_indices
from ..ops import blake3_jax
from ..ops.digest import BLAKE3, DeviceDigest
from ..ops.limbs import get_ops
from ..utils import linktime
from .encoding import LcEncoding

ZERO_DIGEST = bytes(32)  # Output::<D>::default() used for padding (lib.rs:665)

# diagnostics: times verify's sibling-digest dedup hit value-inconsistent
# position groups and fell back to by-value dedup (adversarial input only)
_dedup_value_fallbacks = 0


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length() if x > 1 else 1


# ---------------------------------------------------------------------------
# data types
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LcCommit:
    """Prover state (lcpc-2d/src/lib.rs:173-184).

    The Merkle array stays device-resident as digest words (hashes_dev,
    (8, 2*np2-1) u32, leaves first): the host only ever needs the 32-byte
    root and ~n_col_opens*log(n_cols) path nodes per proof, while pulling
    the whole array costs hundreds of ms over the host link at 2^21+.
    The byte view materializes lazily for serialization/inspection.
    """

    enc: LcEncoding
    coeffs: jnp.ndarray  # (W, n_rows, n_per_row) Montgomery limbs
    comm: jnp.ndarray    # (W, n_rows, n_cols) Montgomery limbs
    n_rows: int
    n_per_row: int
    n_cols: int
    hashes_dev: jnp.ndarray  # (8, 2*np2-1) u32 digest words, leaves first
    digest: DeviceDigest = BLAKE3
    _hashes_np: "np.ndarray | None" = None
    _root: "bytes | None" = None

    @property
    def hashes(self) -> np.ndarray:
        """Full flat Merkle array as (2*np2-1, 32) u8 (lib.rs layout)."""
        if self._hashes_np is None:
            self._hashes_np = blake3_jax.digests_to_bytes(
                np.asarray(self.hashes_dev)
            )
        return self._hashes_np

    def get_root(self) -> bytes:
        if self._root is None:
            if self._hashes_np is not None:
                self._root = bytes(self._hashes_np[-1])
            else:
                self._root = blake3_jax.digests_to_bytes(
                    np.asarray(self.hashes_dev[:, -1:])
                )[0].tobytes()
        return self._root

    def get_n_rows(self) -> int:
        return self.n_rows

    def get_n_per_row(self) -> int:
        return self.n_per_row

    def get_n_cols(self) -> int:
        return self.n_cols

    def prove(self, outer_tensor: list[int], tr: Transcript) -> "LcEvalProof":
        return prove(self, outer_tensor, self.enc, tr)


@dataclasses.dataclass
class LcColumn:
    """One opened column + Merkle path (lib.rs:401-408).

    col_mont holds the column values as Montgomery 16-bit limbs (W, n_rows) —
    numerically identical to the Rust wire form, so serialization repacks.
    """

    col_mont: np.ndarray  # (W, n_rows) uint32 16-bit limbs
    path: list[bytes]


@dataclasses.dataclass
class BatchedColumns:
    """All opened columns + paths as two rectangular arrays.

    The fast internal form: the prover's device gather emits exactly these
    arrays, and the verifier uploads them wholesale — materializing
    thousands of per-column LcColumn objects (lists of 32-byte path nodes)
    costs 100s of ms of pure Python at Brakedown's ~6.6k openings, an order
    of magnitude more than every device dispatch of prove combined.
    """

    col_w: np.ndarray  # (W/2, n_rows, k) packed u32 Montgomery words
    paths: np.ndarray  # (k, path_len, 32) uint8 sibling digests


class LcEvalProof:
    """Evaluation proof (lib.rs:491-500).

    The row vectors are held in EITHER of two equivalent forms: packed
    canonical to_repr rows ((n, repr_bytes) uint8, the form the prover's
    device collapse emits and the transcript absorbs) or lists of Python
    ints.  Converting 2^14+ reprs to bigints costs tens of ms, so the prover
    stores rows and the int lists materialize lazily on first access; a
    materialized list may be mutated by the caller (the reference's proof
    structs are plain data), so materializing invalidates the rows and all
    consumers fall back to the int form.

    Columns follow the same two-form pattern: a BatchedColumns array pair
    (the prover emits it, verify/serialize consume it wholesale) or a
    mutable list of LcColumn; materializing the list invalidates the
    batched form.
    """

    def __init__(self, n_cols: int, p_eval=None, p_random_vec=None,
                 columns=None, *, p_eval_rows=None, p_random_rows=None,
                 columns_batched: "BatchedColumns | None" = None):
        self.n_cols = n_cols
        assert (columns is None) != (columns_batched is None)
        self._columns_list: "list[LcColumn] | None" = columns
        self._columns_batched = columns_batched
        assert (p_eval is None) != (p_eval_rows is None)
        assert (p_random_vec is None) != (p_random_rows is None)
        self._p_eval = p_eval
        self._p_eval_rows = p_eval_rows
        self._p_random_vec = p_random_vec
        self._p_random_rows = p_random_rows

    # -- column views ----------------------------------------------------------

    @property
    def columns(self) -> "list[LcColumn]":
        """Mutable per-column view (the reference's pub Vec<LcColumn>);
        materializing invalidates the batched arrays (they may go stale)."""
        if self._columns_list is None:
            b = self._columns_batched
            gathered = _unpack_cols(b.col_w)  # (W, R, k)
            k = b.col_w.shape[2]
            self._columns_list = [
                LcColumn(
                    col_mont=gathered[:, :, j],
                    path=[bytes(b.paths[j, lvl]) for lvl in range(b.paths.shape[1])],
                )
                for j in range(k)
            ]
            self._columns_batched = None
        return self._columns_list

    @columns.setter
    def columns(self, v: "list[LcColumn]") -> None:
        self._columns_list = v
        self._columns_batched = None

    def n_columns(self) -> int:
        if self._columns_batched is not None:
            return self._columns_batched.col_w.shape[2]
        return len(self._columns_list)

    def columns_batched(self) -> "BatchedColumns":
        """Batched array view; built from the list form if needed.

        The list path requires rectangular shapes (an LcColumn list is
        caller-mutable) — callers wanting typed errors on malformed proofs
        must pre-check, as verify() does.
        """
        if self._columns_batched is not None:
            return self._columns_batched
        cols = self._columns_list
        col_mat = np.stack([c.col_mont for c in cols], axis=2)  # (W, R, k)
        col_w = col_mat[0::2] | (col_mat[1::2] << np.uint32(16))
        paths = np.frombuffer(
            b"".join(b"".join(c.path) for c in cols), dtype=np.uint8
        ).reshape(len(cols), len(cols[0].path), 32)
        return BatchedColumns(col_w=col_w, paths=paths)

    # -- lazy int views (mutable, like the reference's pub Vec fields) ---------

    @property
    def p_eval(self) -> list[int]:
        if self._p_eval is None:
            self._p_eval = _repr_rows_to_ints(self._p_eval_rows)
            self._p_eval_rows = None  # the list may be mutated; rows go stale
        return self._p_eval

    @p_eval.setter
    def p_eval(self, v: list[int]) -> None:
        self._p_eval = v
        self._p_eval_rows = None

    @property
    def p_random_vec(self) -> list[list[int]]:
        if self._p_random_vec is None:
            self._p_random_vec = [
                _repr_rows_to_ints(r) for r in self._p_random_rows
            ]
            self._p_random_rows = None
        return self._p_random_vec

    @p_random_vec.setter
    def p_random_vec(self, v: list[list[int]]) -> None:
        self._p_random_vec = v
        self._p_random_rows = None

    # -- repr-row views (fast path for verify/serialize) ------------------------

    def p_eval_as_rows(self, spec) -> np.ndarray:
        if self._p_eval_rows is not None:
            return self._p_eval_rows
        return _ints_to_repr_rows(spec, self._p_eval)

    def n_degree_rows(self) -> int:
        if self._p_random_rows is not None:
            return len(self._p_random_rows)
        return len(self._p_random_vec)

    def p_random_as_rows(self, spec, i: int) -> np.ndarray:
        if self._p_random_rows is not None:
            return self._p_random_rows[i]
        return _ints_to_repr_rows(spec, self._p_random_vec[i])

    def get_n_cols(self) -> int:
        return self.n_cols

    def get_n_per_row(self) -> int:
        if self._p_eval is not None:
            return len(self._p_eval)
        return self._p_eval_rows.shape[0]

    def verify(self, root: bytes, outer_tensor: list[int], inner_tensor: list[int],
               enc: LcEncoding, tr: Transcript,
               digest: "DeviceDigest" = BLAKE3) -> int:
        return verify(root, outer_tensor, inner_tensor, self, enc, tr, digest)


class ProverError(Exception):
    """Typed prover failure (ProverError, lcpc-2d/src/lib.rs:111-132).

    kinds: "TooBig" (encoding cannot produce dims), "Encode" (row encode
    failed), "Commit" (inconsistent commitment fields), "ColumnNumber"
    (opened column out of range), "OuterTensor" (wrong tensor size).
    """

    def __init__(self, kind: str, msg: "str | None" = None):
        super().__init__(msg or kind)
        self.kind = kind


class VerifierError(Exception):
    """Typed verifier failure (VerifierError, lcpc-2d/src/lib.rs:138-169).

    kinds: "NumColOpens", "ColumnPath", "ColumnEval", "ColumnDegree",
    "OuterTensor", "InnerTensor", "EncodingDims", "Encode".
    """

    def __init__(self, kind: str):
        super().__init__(kind)
        self.kind = kind


# ---------------------------------------------------------------------------
# commit (lib.rs:622-785)
# ---------------------------------------------------------------------------


def _pack_words(ops, canon: jnp.ndarray) -> jnp.ndarray:
    """(W, R, C) canonical limbs -> (R*W/2, C) LE u32 words, row-major."""
    w, r, c = canon.shape
    words = canon[0::2] | (canon[1::2] << jnp.uint32(16))  # (W/2, R, C)
    return jnp.swapaxes(words, 0, 1).reshape(r * (w // 2), c)


@functools.lru_cache(maxsize=8)
def _canon_pack_fn(ops):
    # one jit: XLA fuses the canonicalization into the pack, so the peak is
    # codeword + packed words instead of an eager elementwise chain holding
    # several codeword-sized intermediates (OOMed sdig 2^25's 3 GB matrix)
    return jax.jit(lambda c: _pack_words(ops, ops.from_mont(c)))


def _hash_and_merkleize(ops, comm: jnp.ndarray, n_cols_np2: int,
                        digest: DeviceDigest = BLAKE3):
    """Column digests + all Merkle layers; returns list of (8, n) arrays."""
    words = _canon_pack_fn(ops)(comm)
    leaves = digest.hash_word_columns(words)  # (8, n_cols)
    n_cols = comm.shape[2]
    if n_cols_np2 > n_cols:
        leaves = jnp.pad(leaves, [(0, 0), (0, n_cols_np2 - n_cols)])
    layers = [leaves]
    while layers[-1].shape[1] > 1:
        layers.append(digest.merkle_layer(layers[-1]))
    return layers


# Above this many encoded-matrix elements the fused one-dispatch commit
# stops paying: compile time grows with the inlined ladder and the unfused
# path's per-stage dispatches are amortized anyway (dispatch latency is
# ~4 ms on the tunneled link vs >100 ms of device work at 2^21+).
_FUSED_COMMIT_MAX = 1 << 22

_fused_commit_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _commit_fused_fn(enc: LcEncoding, digest: DeviceDigest):
    """One-dispatch commit core: pad -> encode -> hash -> full Merkle.

    Small commits on this rig are dispatch-bound — ~10 sequential device
    calls (encode, canonicalize/pack, column hash, one per Merkle layer)
    put a ~45 ms floor under a 2^13 commit whose device work is ~1 ms
    (baseline 14.9 ms, 20210807_64c_255bit_ligero_dfl.txt:1).  Fusing the
    whole pipeline into one jit leaves one dispatch + the root pull.
    Returns fn(arr (W, len)) -> (mat, comm, flat_hashes).
    """
    key = digest.name
    per_enc = _fused_commit_cache.setdefault(enc, {})
    fn = per_enc.get(key)
    if fn is None:
        ops = get_ops(enc.spec)
        if hasattr(enc, "_device_mats"):
            enc._device_mats()  # materialize device constants outside the trace

        def core(arr, mats):
            length = arr.shape[1]
            npr = enc.n_per_row
            n_rows = -(-length // npr)
            pad = n_rows * npr - length
            if pad:
                arr_p = jnp.pad(arr, [(0, 0), (0, pad)])
            else:
                arr_p = arr
            mat = arr_p.reshape(ops.w, n_rows, npr)
            comm = (enc.encode_rows_core(mat, mats) if mats is not None
                    else enc.encode_rows(mat))
            words = _pack_words(ops, ops.from_mont(comm))
            leaves = digest.hash_word_columns(words)
            n_cols = comm.shape[2]
            np2 = _next_pow2(n_cols)
            if np2 > n_cols:
                leaves = jnp.pad(leaves, [(0, 0), (0, np2 - n_cols)])
            layers = [leaves]
            while layers[-1].shape[1] > 1:
                layers.append(digest.merkle_layer(layers[-1]))
            return mat, comm, jnp.concatenate(layers, axis=1)

        if hasattr(enc, "encode_rows_core"):
            # big device matrices (Brakedown) thread as jit ARGUMENTS —
            # closed over, they embed in the serialized HLO (HTTP 413)
            jitted = jax.jit(core)
            fn = lambda arr: jitted(arr, enc.encode_mats())
        else:
            jitted = jax.jit(lambda arr: core(arr, None))
            fn = jitted
        per_enc[key] = fn
    return fn


def commit(coeffs: "list[int] | np.ndarray | jnp.ndarray", enc: LcEncoding,
           digest: DeviceDigest = BLAKE3) -> LcCommit:
    """Commit to a polynomial (lib.rs:622-671).

    `coeffs` is either a list of canonical Python ints, or a (W, N) uint32
    limb-major array already in Montgomery form (device path for benches).
    `digest` selects the hash (the reference's D: Digest type parameter).
    """
    ops = get_ops(enc.spec)
    if isinstance(coeffs, list):
        length = len(coeffs)
        arr = ops.encode_host(coeffs)  # (W, N) Montgomery
    else:
        arr = jnp.asarray(coeffs)
        assert arr.ndim == 2 and arr.shape[0] == ops.w
        length = arr.shape[1]

    n_rows, n_per_row, n_cols = enc.get_dims(length)
    assert n_rows * n_per_row >= length
    assert (n_rows - 1) * n_per_row < length
    if not enc.dims_ok(n_per_row, n_cols):
        # get_dims produced dims the encoding rejects — the reference's
        # ProverError::TooBig path (lib.rs:627, encoding Err on get_dims)
        raise ProverError("TooBig", "n_cols is too large for this encoding")

    arr = jnp.asarray(arr)
    n_cols_np2 = _next_pow2(n_cols)
    if n_rows * n_cols <= _FUSED_COMMIT_MAX:
        # small shapes: one dispatch for the whole pipeline (dispatch
        # latency dominates sub-2^21 commits on the tunneled link)
        mat, comm_mat, flat = _commit_fused_fn(enc, digest)(arr)
    else:
        pad = n_rows * n_per_row - length
        if pad:
            arr = jnp.pad(arr, [(0, 0), (0, pad)])
        mat = arr.reshape(ops.w, n_rows, n_per_row)
        comm_mat = enc.encode_rows(mat)  # (W, n_rows, n_cols)
        layers = _hash_and_merkleize(ops, comm_mat, n_cols_np2, digest)
        # flatten layers to the reference's hashes vec (leaves first); stays
        # on device — prove gathers the few needed path nodes there, and the
        # full byte view (serialization) materializes lazily
        flat = jnp.concatenate(layers, axis=1)  # (8, 2*np2-1)
    assert flat.shape[1] == 2 * n_cols_np2 - 1

    return LcCommit(
        enc=enc,
        coeffs=mat,
        comm=comm_mat,
        n_rows=n_rows,
        n_per_row=n_per_row,
        n_cols=n_cols,
        hashes_dev=flat,
        digest=digest,
    )


# ---------------------------------------------------------------------------
# prove (lib.rs:1004-1123)
# ---------------------------------------------------------------------------


def _canon_to_repr_rows(canon) -> np.ndarray:
    """(W, n) canonical 16-bit limbs -> (n, 2W) uint8 LE reprs (to_repr)."""
    arr = np.ascontiguousarray(
        np.asarray(canon, dtype=np.uint32).T
    ).astype("<u2")  # (n, W)
    return np.ascontiguousarray(arr).view(np.uint8).reshape(arr.shape[0], -1)


def _repr_rows_to_ints(rows: np.ndarray) -> list[int]:
    return [int.from_bytes(rows[i].tobytes(), "little") for i in range(rows.shape[0])]


def _ints_to_repr_rows(spec, vals: list[int]) -> np.ndarray:
    buf = b"".join(spec.to_repr(v) for v in vals)
    return np.frombuffer(buf, dtype=np.uint8).reshape(len(vals), spec.repr_bytes)


def _words_to_repr_rows(words: np.ndarray) -> np.ndarray:
    """(n, W/2) u32 LE words -> (n, 2W) uint8 repr rows (zero-copy-ish)."""
    w32 = np.ascontiguousarray(words.astype("<u4"))
    return w32.view(np.uint8).reshape(words.shape[0], -1)


def _rows_lt_p(spec, rows: np.ndarray) -> bool:
    """Vectorized canonical-range check: every repr row < p."""
    u16 = rows.view("<u2")  # (n, W)
    n, w = u16.shape
    lt = np.zeros(n, dtype=bool)
    eq = np.ones(n, dtype=bool)
    for i in range(w - 1, -1, -1):
        pi = (spec.p >> (16 * i)) & 0xFFFF
        lt |= eq & (u16[:, i] < pi)
        eq &= u16[:, i] == pi
    return bool(lt.all())


def _collapse(ops, coeffs_mat: jnp.ndarray, tensor_vals: list[int]):
    """tensor (n_rows) . coeffs (n_rows x n_per_row): canonical (ints, reprs).

    The device computes sum_r tensor[r] * coeffs[r, :] with Montgomery dots
    (collapse_columns, lib.rs:1095-1123); returns the canonical values both
    as Python ints and as packed repr rows for batch transcript appends.
    """
    t = ops.encode_host(tensor_vals)           # (W, R)
    prod = ops.dot_mont(t[:, :, None], coeffs_mat, axis=1)  # (W, n_per_row)
    rows = _canon_to_repr_rows(ops.from_mont(prod))
    return _repr_rows_to_ints(rows), rows


def path_node_indices(n_cols: int, cols: list[int]) -> np.ndarray:
    """(k, path_len) flat indices of the sibling nodes for each opened column
    within the leaves-first hashes array (open_column, lib.rs:788-825)."""
    n_cols_np2 = _next_pow2(n_cols)
    path_len = max(0, n_cols_np2.bit_length() - 1)
    # layer offsets within the flat hashes array
    offsets = []
    off = 0
    size = n_cols_np2
    while size >= 1:
        offsets.append(off)
        off += size
        if size == 1:
            break
        size //= 2
    cc = np.asarray(cols, dtype=np.int64)[:, None] >> np.arange(path_len)[None, :]
    return (np.asarray(offsets[:path_len], dtype=np.int64)[None, :] + (cc ^ 1)
            ).astype(np.int32)


def merkle_paths(hashes: np.ndarray, n_cols: int, cols: list[int]) -> list[list[bytes]]:
    """Sibling paths for `cols` out of the flat hashes byte array."""
    idx = path_node_indices(n_cols, cols)
    return [
        [bytes(hashes[idx[k, lvl]]) for lvl in range(idx.shape[1])]
        for k in range(idx.shape[0])
    ]


@jax.jit
def _gather_packed(comm_arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather columns and pack limb pairs to u32 words: halves the bytes on
    the device->host link, which is the prover's bottleneck (~25 MB/s over
    the tunnel this runs behind)."""
    g = jnp.take(comm_arr, idx, axis=2)  # (W, R, k)
    return g[0::2] | (g[1::2] << jnp.uint32(16))  # (W/2, R, k)


@jax.jit
def _gather_open(comm_arr, hashes_dev, col_idx, path_idx):
    """One dispatch for everything prove pulls per opening: packed column
    words + the sibling path digests gathered from the device Merkle array."""
    packed = _gather_packed(comm_arr, col_idx)
    path_digs = jnp.take(hashes_dev, path_idx.reshape(-1), axis=1)  # (8, k*L)
    return packed, path_digs


def _unpack_cols(words: np.ndarray) -> np.ndarray:
    """(W/2, R, k) u32 words -> (W, R, k) u32 16-bit limbs."""
    half, r, k = words.shape
    out = np.empty((2 * half, r, k), dtype=np.uint32)
    out[0::2] = words & np.uint32(0xFFFF)
    out[1::2] = words >> np.uint32(16)
    return out


def _columns_from_parts(gathered_w: np.ndarray, path_digs: np.ndarray,
                        inv: np.ndarray, k: int, path_len: int
                        ) -> BatchedColumns:
    """Assemble the batched column arrays from the fetched packed words +
    unique path digests (`inv` maps flat (k*L) path slots to unique-digest
    rows)."""
    uniq_bytes = blake3_jax.digests_to_bytes(path_digs)  # (n_uniq, 32)
    paths = uniq_bytes[inv].reshape(k, path_len, 32)
    return BatchedColumns(col_w=gathered_w, paths=paths)


def _open_columns(comm: LcCommit, cols: list[int]) -> BatchedColumns:
    """Extract columns + Merkle paths (open_column, lib.rs:788-825).

    Sibling paths of the opened columns share most upper-tree nodes (the
    reference opens 100s..1000s of columns over one tree), so only the
    UNIQUE nodes cross the host link."""
    col_idx = jnp.asarray(np.asarray(cols, dtype=np.int32))
    path_idx = path_node_indices(comm.n_cols, cols)  # (k, L)
    uniq, inv = np.unique(path_idx.reshape(-1), return_inverse=True)
    packed, path_digs = _gather_open(
        comm.comm, comm.hashes_dev, col_idx, jnp.asarray(uniq.astype(np.int32))
    )
    packed, path_digs = linktime.pull_tree((packed, path_digs))
    return _columns_from_parts(
        np.asarray(packed), np.asarray(path_digs), inv,
        len(cols), path_idx.shape[1],
    )


def prove_core(enc: LcEncoding, tr: Transcript, n_rows: int, n_cols: int,
               outer_tensor: list[int], collapse_words_fn, open_columns_fn,
               ) -> LcEvalProof:
    """Fiat-Shamir choreography of prove (lib.rs:1004-1093), backend-agnostic.

    collapse_words_fn: ((W, T, n_rows) Montgomery np tensor stack,
        list of T plain-int tensors) -> (T, n_per_row, W/2) canonical wire
        words (single- or multi-device; the int form feeds MXU kernels that
        digitize host-side).
    open_columns_fn: list of column indices -> BatchedColumns.
    The FS order p_random(s) -> p_eval -> column indices is load-bearing.
    """
    spec = enc.spec
    ops = get_ops(spec)
    if len(outer_tensor) != n_rows:
        raise ProverError("OuterTensor", "outer tensor: wrong size")

    n_degree_tests_ = enc.get_n_degree_tests()
    # the eval collapse rides the final degree-test dispatch, so the loop
    # must run at least once (n_degree_tests >= 1 by construction,
    # lcpc-2d/src/lib.rs:613-616 — ceil of a positive ratio)
    assert n_degree_tests_ >= 1
    outer_limbs = ops.encode_host(outer_tensor)  # (W, R) Montgomery
    p_random_rows: list[np.ndarray] = []
    eval_rows = None
    for i in range(n_degree_tests_):
        key = tr.challenge_bytes(enc.LABEL_DT, 32)
        rng = ChaCha20Rng(key)
        rand_tensor = field_random_vec(spec, rng, n_rows)
        t = ops.encode_host(rand_tensor)
        # the eval collapse has no transcript dependency, so it rides the
        # final degree test's device call: one dispatch, one host pull
        if i == n_degree_tests_ - 1:
            ts = np.stack([t, outer_limbs], axis=1)  # (W, 2, R)
            ts_ints = [rand_tensor, outer_tensor]
        else:
            ts = t[:, None, :]
            ts_ints = [rand_tensor]
        words = collapse_words_fn(ts, ts_ints)  # (T, npr, W/2) canonical words
        rows = _words_to_repr_rows(words[0])
        tr.append_elements(enc.LABEL_PR, rows)
        p_random_rows.append(rows)
        if i == n_degree_tests_ - 1:
            eval_rows = _words_to_repr_rows(words[1])

    tr.append_elements(enc.LABEL_PE, eval_rows)

    n_col_opens = enc.get_n_col_opens()
    key = tr.challenge_bytes(enc.LABEL_CO, 32)
    cols_rng = ChaCha20Rng(key)
    cols_to_open = uniform_indices(n_cols, cols_rng, n_col_opens)
    columns = open_columns_fn(cols_to_open)

    return LcEvalProof(
        n_cols=n_cols,
        p_eval_rows=eval_rows,
        p_random_rows=p_random_rows,
        columns_batched=columns,
    )


def prove(comm: LcCommit, outer_tensor: list[int], enc: LcEncoding,
          tr: Transcript) -> LcEvalProof:
    ops = get_ops(enc.spec)
    from ..ops import mxu_prove

    # the digit-conv collapse wins once the coefficient matrix is large
    # enough to amortize its kernel build + extra dispatches; below ~2^22
    # elements the single-dispatch VPU collapse has lower latency
    if (mxu_prove.mxu_prove_enabled(enc.spec)
            and comm.n_rows * comm.n_per_row >= (1 << 22)):
        mc = mxu_prove.MxuCollapse(enc.spec, comm.n_rows)

        def collapse_words_fn(ts: np.ndarray, ts_ints) -> np.ndarray:
            return linktime.pull(mc(ts_ints, comm.coeffs))
    else:
        def collapse_words_fn(ts: np.ndarray, ts_ints) -> np.ndarray:
            return linktime.pull(
                ops.collapse_words(linktime.push(ts), comm.coeffs)
            )

    return prove_core(
        enc, tr, comm.n_rows, comm.n_cols, outer_tensor,
        collapse_words_fn, functools.partial(_open_columns, comm),
    )


# ---------------------------------------------------------------------------
# verify (lib.rs:832-1000)
# ---------------------------------------------------------------------------


def _unpack_words_dev(words: jnp.ndarray) -> jnp.ndarray:
    """(W/2, ...) u32 words -> (W, ...) u32 16-bit limbs (device)."""
    lo = words & jnp.uint32(0xFFFF)
    hi = words >> jnp.uint32(16)
    return jnp.stack([lo, hi], axis=1).reshape(-1, *words.shape[1:])


# weak-keyed per-encoding cache (encodings are per-size; see streaming.py)
_rows_encode_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _rows_encode_fn(enc: LcEncoding):
    """Jitted: packed repr words (T, npr, W/2) -> encoded rows (W, T, n_cols).

    Kept as its own dispatch (it pipelines with the verify core) because
    inlining the encode ladder into the core graph multiplies compile time.
    """
    fn = _rows_encode_cache.get(enc)
    if fn is None:
        ops = get_ops(enc.spec)
        if hasattr(enc, "_device_mats"):
            enc._device_mats()  # materialize device constants outside the trace

        if hasattr(enc, "encode_rows_core"):
            # encodings with big device matrices (Brakedown) thread them as
            # jit ARGUMENTS: closed-over, they embed in the serialized HLO
            # and blow the remote-compile size limit at 2^23+ (HTTP 413)
            def rows_encode_m(rows_w, mats):
                rows_raw = _unpack_words_dev(jnp.transpose(rows_w, (2, 0, 1)))
                return enc.encode_rows_core(ops.to_mont(rows_raw), mats)

            jitted = jax.jit(rows_encode_m)
            fn = lambda rows_w: jitted(rows_w, enc.encode_mats())
        else:
            def rows_encode(rows_w):
                rows_raw = _unpack_words_dev(jnp.transpose(rows_w, (2, 0, 1)))
                return enc.encode_rows(ops.to_mont(rows_raw))

            fn = jax.jit(rows_encode)
        _rows_encode_cache[enc] = fn
    return fn


@functools.lru_cache(maxsize=8)
def _eval_dot_fn(ops):
    """Jitted: Σ inner_tensor[j] * p_eval[j] mod p on device.

    The reference computes the returned evaluation as a CPU dot over field
    elements (lib.rs:947-951); at npr = 2^16 the Python-bigint equivalent
    costs ~100 ms — more than every device stage of verify combined — so
    the dot rides the already-uploaded proof rows instead.  Takes the
    pushed rows_w (T, npr, W/2 canonical repr words; p_eval is the last
    row) and the inner tensor as canonical words, returns (W,) canonical
    limbs of the evaluation.
    """

    def f(rows_w, inner_w):
        pe = _unpack_words_dev(jnp.transpose(rows_w[-1:], (2, 0, 1)))
        pe_mont = ops.to_mont(pe)                       # (W, 1, npr)
        inner = _unpack_words_dev(jnp.transpose(inner_w[None], (2, 0, 1)))
        inner_mont = ops.to_mont(inner)                 # (W, 1, npr)
        out = ops.collapse_canon(
            inner_mont, jnp.transpose(pe_mont, (0, 2, 1))
        )  # (W, 1, 1)
        return out.reshape(-1)

    return jax.jit(f)


@functools.lru_cache(maxsize=8)
def _rows_to_mont_fn(ops):
    """Jitted: packed repr words (T, npr, W/2) -> (W, T, npr) Montgomery."""

    def f(rows_w):
        raw = _unpack_words_dev(jnp.transpose(rows_w, (2, 0, 1)))
        return ops.to_mont(raw)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _verify_core_cols_fn(ops, digest: DeviceDigest = BLAKE3):
    """_verify_core_fn variant taking the encoded rows AT THE OPENED
    COLUMNS ONLY (packed Montgomery (W/2, T, k) from MxuColumnEval).

    The reference verifier encodes the T proof rows across all n_cols and
    reads k of them (lib.rs:914-920, 985-1000); for RS codes the opened
    values are the row polynomials at w^bitrev(c), so the k needed entries
    come straight off the MXU eval kernel (bit-identical to encode+take —
    the same equivalence prove's column opening relies on) without paying
    the full-width NTT.
    """

    def core(want_w, ts, col_w, uniq_sibs, inv, bits, root_w, eval_w):
        col_mat = _unpack_words_dev(col_w)                # (W, R, k)
        got = ops.collapse_canon(ts, col_mat)             # (W, T, k) canonical
        want = ops.from_mont(_unpack_words_dev(want_w))   # (W, T, k)
        ok_rows = jnp.all(got == want, axis=(0, 2))       # (T,)

        canon = ops.from_mont(col_mat)
        words = _pack_words(ops, canon)
        digs = digest.hash_word_columns(words)            # (8, k)
        for lvl in range(inv.shape[0]):
            s = jnp.take(uniq_sibs, inv[lvl], axis=1)     # (8, k)
            is_right = bits[lvl]
            left = jnp.where(is_right, s, digs)
            right = jnp.where(is_right, digs, s)
            digs = digest.merkle_parent(left, right)
        ok_path = jnp.all(digs == root_w[:, None])
        flags = jnp.concatenate(
            [ok_rows.astype(jnp.uint32),
             ok_path.astype(jnp.uint32)[None],
             jnp.zeros((1,), jnp.uint32),
             eval_w]  # fused evaluation limbs (see _eval_dot_fn)
        )
        return flags

    return jax.jit(core)


@functools.lru_cache(maxsize=None)
def _verify_core_fn(ops, digest: DeviceDigest = BLAKE3):
    """Jitted verifier core for one (field ops, digest) pair.

    Inputs (all device; the big operands ride the host->device link as
    packed u32 words — half the bytes of the u32 limb form, and the link is
    the verifier's bottleneck):
      enc_rows  (W, T, n_cols) Montgomery — encoded [p_random..., p_eval]
      ts        (W, T, R)  Montgomery — [rand_tensors..., outer_tensor]
      col_w     (W/2, R, k) u32 — opened column values, packed Montgomery
      idx       (k,) int32 — opened column indices
      uniq_sibs (8, U) u32 — UNIQUE sibling digests (paths share most
                upper-tree nodes; deduplicating by value before upload cuts
                the verifier's dominant host->device transfer ~4x and is
                exactly equivalent to per-path checks: equal values map to
                one slot, differing values stay distinct)
      inv       (L, k) int32 — per-level map from column to unique digest
      bits      (L, k) bool — is-right bit of the walk at each level
      root_w    (8,) u32 — expected root digest words
    Returns (T+2,) u32 flags: per-row dot check [0..T), path check [T],
    (slot T+1 reserved/unused).
    """

    def core(enc_rows, ts, col_w, idx, uniq_sibs, inv, bits, root_w,
             eval_w):
        col_mat = _unpack_words_dev(col_w)                # (W, R, k)
        got = ops.collapse_canon(ts, col_mat)             # (W, T, k) canonical
        want = ops.from_mont(jnp.take(enc_rows, idx, axis=2))
        ok_rows = jnp.all(got == want, axis=(0, 2))       # (T,)

        canon = ops.from_mont(col_mat)
        words = _pack_words(ops, canon)
        digs = digest.hash_word_columns(words)            # (8, k)
        for lvl in range(inv.shape[0]):
            s = jnp.take(uniq_sibs, inv[lvl], axis=1)     # (8, k)
            is_right = bits[lvl]
            left = jnp.where(is_right, s, digs)
            right = jnp.where(is_right, digs, s)
            digs = digest.merkle_parent(left, right)
        ok_path = jnp.all(digs == root_w[:, None])
        flags = jnp.concatenate(
            [ok_rows.astype(jnp.uint32),
             ok_path.astype(jnp.uint32)[None],
             jnp.zeros((1,), jnp.uint32),
             eval_w]  # fused evaluation limbs (see _eval_dot_fn)
        )
        return flags

    return jax.jit(core)


def verify(root: bytes, outer_tensor: list[int], inner_tensor: list[int],
           proof: LcEvalProof, enc: LcEncoding, tr: Transcript,
           digest: DeviceDigest = BLAKE3) -> int:
    """Verify an evaluation proof; returns the evaluation (lib.rs:832-952).

    `digest` must match the committer's choice (the reference's D: Digest
    type parameter; mismatches fail the Merkle path check)."""
    spec = enc.spec
    ops = get_ops(spec)

    n_col_opens = enc.get_n_col_opens()
    if n_col_opens != proof.n_columns() or n_col_opens == 0:
        raise VerifierError("NumColOpens")
    if proof._columns_batched is not None:
        n_rows = proof._columns_batched.col_w.shape[1]
    else:
        n_rows = proof._columns_list[0].col_mont.shape[1]
    n_cols = proof.get_n_cols()
    n_per_row = proof.get_n_per_row()
    if len(inner_tensor) != n_per_row:
        raise VerifierError("InnerTensor")
    if len(outer_tensor) != n_rows:
        raise VerifierError("OuterTensor")
    if not enc.dims_ok(n_per_row, n_cols):
        raise VerifierError("EncodingDims")

    # structural validation of the (untrusted) proof before any batching:
    # the Rust verifier's typed failures come out of slice indexing / the
    # Merkle walk (lib.rs:862-944); here the batched device core needs
    # rectangular arrays, so malformed shapes must be rejected up front with
    # the same error kinds instead of crashing the array builders.
    n_degree_tests_ = enc.get_n_degree_tests()
    # the reference indexes proof.p_random_vec[0..ndt) (lib.rs:868-894):
    # EXTRA rows are silently ignored; MISSING rows are an index panic
    # there — here a typed failure instead (deliberate graceful deviation)
    if proof.n_degree_rows() < n_degree_tests_:
        raise VerifierError("EncodingDims")
    try:
        # int-backed proofs re-encode here; to_repr's range assert rejects
        # out-of-range elements (row-backed proofs are range-checked below)
        p_random_rows = [
            proof.p_random_as_rows(spec, i) for i in range(n_degree_tests_)
        ]
        p_eval_rows = proof.p_eval_as_rows(spec)
    except (AssertionError, OverflowError):
        raise VerifierError("EncodingDims")
    for rows_i in p_random_rows:
        if rows_i.shape[0] > n_cols:
            # the reference zero-pads each p_random row to n_cols and
            # encodes; a LONGER row fails inside enc.encode ->
            # VerifierError::Encode (lib.rs:882-888)
            raise VerifierError("Encode")
        if not _rows_lt_p(spec, rows_i):
            raise VerifierError("EncodingDims")
    odd_rows = any(r.shape[0] != n_per_row for r in p_random_rows)
    if not _rows_lt_p(spec, p_eval_rows):
        raise VerifierError("EncodingDims")
    expected_path_len = max(0, _next_pow2(n_cols).bit_length() - 1)
    if proof._columns_batched is not None:
        batched = proof._columns_batched
        if batched.col_w.shape != (ops.w // 2, n_rows, n_col_opens):
            raise VerifierError("ColumnDegree")
        if batched.paths.shape != (n_col_opens, expected_path_len, 32):
            raise VerifierError("ColumnPath")
    else:
        # caller-mutated per-column form: re-validate rectangularity with
        # the reference's typed error kinds before stacking
        for col in proof._columns_list:
            if col.col_mont.shape != (ops.w, n_rows):
                raise VerifierError("ColumnDegree")
            if len(col.path) != expected_path_len or any(
                len(h) != 32 for h in col.path
            ):
                raise VerifierError("ColumnPath")
        batched = proof.columns_batched()

    # step 1 (host/transcript only): re-derive degree-test tensors and the
    # column challenge — FS order p_random(s) -> p_eval -> columns
    rand_tensors: list[list[int]] = []
    for i in range(n_degree_tests_):
        key = tr.challenge_bytes(enc.LABEL_DT, 32)
        rng = ChaCha20Rng(key)
        rand_tensors.append(field_random_vec(spec, rng, n_rows))
        tr.append_elements(enc.LABEL_PR, p_random_rows[i])

    tr.append_elements(enc.LABEL_PE, p_eval_rows)

    key = tr.challenge_bytes(enc.LABEL_CO, 32)
    cols_rng = ChaCha20Rng(key)
    cols_to_open = uniform_indices(n_cols, cols_rng, n_col_opens)

    # step 2 (device, one dispatch + one pull): encode the proof rows, check
    # every opened column's degree/eval dot products and Merkle path.  The
    # rows and columns ride the link as packed u32 words (half the bytes).
    T = n_degree_tests_ + 1
    if odd_rows:
        # wrong-LENGTH p_random rows (<= n_cols) are valid inputs to the
        # reference verifier — it zero-pads to n_cols and encodes
        # (lib.rs:882-888), and the mismatch surfaces as a ColumnDegree
        # failure.  The batched device encode needs uniform row lengths, so
        # this adversarial-only shape takes the bit-exact host twin.
        cols_list = []
        for r_ in p_random_rows + [p_eval_rows]:
            cw = enc.encode_row_host(_repr_rows_to_ints(r_))
            cols_list.append(ops.encode_host(cw))
        enc_rows = jnp.asarray(np.stack(cols_list, axis=1))  # (W, T, nc)
    else:
        rows_w = np.stack(
            [np.ascontiguousarray(r).view("<u4") for r in p_random_rows]
            + [np.ascontiguousarray(p_eval_rows).view("<u4")],
            axis=0,
        )  # (T, n_per_row, W/2) canonical repr words

    ts = np.stack(
        [ops.encode_host(t) for t in rand_tensors] + [ops.encode_host(outer_tensor)],
        axis=1,
    )  # (W, T, n_rows) Montgomery
    col_w = batched.col_w  # (W/2, R, k) packed Montgomery words
    idx = np.asarray(cols_to_open, dtype=np.int32)

    # sibling digests dedup by VALUE: honest paths share most upper-tree
    # nodes (~4x fewer uniques at Brakedown's 6.6k openings), and equal
    # values collapsing to one slot is check-for-check equivalent to the
    # reference's independent per-path walks (lib.rs:955-982).  Fast path:
    # group by TREE POSITION (known from the re-derived column indices) and
    # verify the groups are value-consistent with one vectorized compare —
    # byte-record np.unique costs ~70 ms at 86k nodes, position unique ~5 ms.
    # Inconsistent groups (adversarial only) fall back to value dedup.
    path_len = expected_path_len
    flat = np.ascontiguousarray(batched.paths).reshape(-1, 32)
    pos = path_node_indices(n_cols, cols_to_open).reshape(-1)  # (k*L,)
    uniq_pos, first_idx, inv = np.unique(
        pos, return_index=True, return_inverse=True
    )
    uniq_bytes = flat[first_idx]  # (U, 32) representative per position
    if not np.array_equal(uniq_bytes[inv], flat):
        global _dedup_value_fallbacks
        _dedup_value_fallbacks += 1  # adversarial-only; counted for tests
        uniq_v, inv = np.unique(
            flat.view([("v", "V32")]).reshape(-1), return_inverse=True
        )
        uniq_bytes = np.ascontiguousarray(uniq_v.view(np.uint8)).reshape(-1, 32)
    uniq_sibs = blake3_jax.bytes_to_digests(uniq_bytes)  # (8, U)
    inv = np.ascontiguousarray(
        inv.reshape(n_col_opens, path_len).T
    ).astype(np.int32)  # (L, k)

    col_bits = np.asarray(cols_to_open, dtype=np.int64)
    bits = ((col_bits[None, :] >> np.arange(path_len)[:, None]) & 1).astype(bool)
    root_w = np.frombuffer(root, dtype="<u4").astype(np.uint32)

    # RS codes at mid/large N: evaluate the proof rows DIRECTLY at the k
    # opened points on the MXU instead of the full-width re-encode (the
    # encode's other n_cols-k outputs are never read).  Below the gate the
    # fused ladder's single dispatch has lower latency than the eval
    # kernel's build + extra dispatches.
    from ..ops import mxu_prove

    use_eval = (
        not odd_rows
        and getattr(enc, "supports_direct_col_eval", False)
        and mxu_prove.mxu_prove_enabled(spec)
        and (n_cols >= (1 << 17)
             or os.environ.get("LCPC_MXU_VERIFY") == "1")
    )
    # step 4's evaluation Σ inner·p_eval (lib.rs:947-951) fuses into the
    # device core when the rows ride the device path: the Python-bigint dot
    # costs ~1.5 µs/element (~100 ms at npr 2^16), dominating warm verify.
    # Falls back to the host dot for the odd-rows twin path or unreduced
    # inner values.
    fuse_eval = not odd_rows and all(
        0 <= v < spec.p for v in inner_tensor
    )
    if fuse_eval:
        inner_w = ops.encode_repr_words(inner_tensor)  # (npr, W/2)

    if use_eval:
        rows_dev = linktime.push(rows_w)
        ev = mxu_prove.MxuColumnEval(enc)
        ev.set_columns(cols_to_open)
        rows_mont = _rows_to_mont_fn(ops)(rows_dev)
        want_w = ev.eval_block(rows_mont)  # (W/2, T, k) packed Montgomery
        eval_w = (_eval_dot_fn(ops)(rows_dev, linktime.push(inner_w))
                  if fuse_eval else jnp.zeros((ops.w,), jnp.uint32))
        flags = linktime.pull(
            _verify_core_cols_fn(ops, digest)(
                want_w, linktime.push(ts), linktime.push(col_w),
                linktime.push(uniq_sibs), jnp.asarray(inv),
                jnp.asarray(bits), jnp.asarray(root_w), eval_w,
            )
        )
    else:
        if not odd_rows:
            rows_dev = linktime.push(rows_w)
            enc_rows = _rows_encode_fn(enc)(rows_dev)  # async dispatch
            if fuse_eval:
                eval_w = _eval_dot_fn(ops)(rows_dev, linktime.push(inner_w))
            else:
                eval_w = jnp.zeros((ops.w,), jnp.uint32)
        else:
            eval_w = jnp.zeros((ops.w,), jnp.uint32)
        flags = linktime.pull(
            _verify_core_fn(ops, digest)(
                enc_rows, linktime.push(ts), linktime.push(col_w),
                jnp.asarray(idx), linktime.push(uniq_sibs), jnp.asarray(inv),
                jnp.asarray(bits), jnp.asarray(root_w), eval_w,
            )
        )
    for i in range(n_degree_tests_):
        if not flags[i]:
            raise VerifierError("ColumnDegree")
    if not flags[n_degree_tests_]:
        raise VerifierError("ColumnEval")
    if not flags[T]:
        raise VerifierError("ColumnPath")

    if fuse_eval:
        return int.from_bytes(
            np.asarray(flags[T + 2:]).astype("<u2").tobytes(), "little"
        )
    # host twin of the evaluation dot (odd-rows path / unreduced inner)
    acc = 0
    for t_v, e_v in zip(inner_tensor, _repr_rows_to_ints(p_eval_rows)):
        acc = (acc + t_v * e_v) % spec.p
    return acc
