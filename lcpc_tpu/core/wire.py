"""bincode-compatible wire serialization for proofs, roots, and commitments.

Byte-level mirror of the reference's serde layer (lcpc-2d/src/lib.rs:186-268,
352-397,430-487,536-609) under bincode 1.3's default config (little-endian,
fixed-width ints):

- `usize` -> u64 LE;
- `Vec<T>` -> u64 count + items;
- field element -> the ff-derive serde form: the *Montgomery* limb array as
  L u64s LE (the derive serializes the internal repr, not to_repr());
- `WrappedOutput` (digest) -> serde_bytes: u64 len + raw bytes.

Because our device Montgomery form equals ff's (16*W == 64*L), a field
element's wire bytes are exactly the little-endian bytes of its 16-bit limb
vector, so bulk column serialization is a numpy repack.
"""

from __future__ import annotations

import struct

import numpy as np

from ..fields.spec import FieldSpec
from .protocol import LcColumn, LcEvalProof


def _u64(n: int) -> bytes:
    return struct.pack("<Q", n)


def _felem(spec: FieldSpec, v: int) -> bytes:
    return spec.to_mont(v).to_bytes(spec.repr_bytes, "little")


def _felem_vec(spec: FieldSpec, vals: list[int]) -> bytes:
    return _u64(len(vals)) + b"".join(_felem(spec, v) for v in vals)


def _col_mont_bytes(col_mont: np.ndarray) -> bytes:
    """(W, R) u32 16-bit limbs -> R elements' wire bytes (Montgomery LE)."""
    w, r = col_mont.shape
    u16 = np.asarray(col_mont, dtype=np.uint32).T.astype("<u2")  # (R, W)
    return u16.tobytes()


def _digest(b: bytes) -> bytes:
    return _u64(len(b)) + b


def serialize_proof(spec: FieldSpec, proof: LcEvalProof) -> bytes:
    out = [_u64(proof.n_cols)]
    out.append(_felem_vec(spec, proof.p_eval))
    out.append(_u64(len(proof.p_random_vec)))
    for row in proof.p_random_vec:
        out.append(_felem_vec(spec, row))
    out.append(_u64(len(proof.columns)))
    for col in proof.columns:
        n_rows = col.col_mont.shape[1]
        out.append(_u64(n_rows))
        out.append(_col_mont_bytes(col.col_mont))
        out.append(_u64(len(col.path)))
        for p in col.path:
            out.append(_digest(p))
    return b"".join(out)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u64(self) -> int:
        (v,) = struct.unpack_from("<Q", self.data, self.pos)
        self.pos += 8
        return v

    def take(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        assert len(b) == n, "truncated"
        self.pos += n
        return b


def _read_felem_vec(spec: FieldSpec, r: _Reader) -> list[int]:
    n = r.u64()
    out = []
    for _ in range(n):
        m = int.from_bytes(r.take(spec.repr_bytes), "little")
        assert m < spec.p, "non-canonical field element"
        out.append(spec.from_mont(m))
    return out


def deserialize_proof(spec: FieldSpec, data: bytes) -> LcEvalProof:
    r = _Reader(data)
    n_cols = r.u64()
    p_eval = _read_felem_vec(spec, r)
    n_pr = r.u64()
    p_random_vec = [_read_felem_vec(spec, r) for _ in range(n_pr)]
    n_columns = r.u64()
    columns = []
    w = spec.w16
    for _ in range(n_columns):
        n_rows = r.u64()
        raw = r.take(n_rows * spec.repr_bytes)
        u16 = np.frombuffer(raw, dtype="<u2").reshape(n_rows, w)
        col_mont = np.ascontiguousarray(u16.T).astype(np.uint32)
        n_path = r.u64()
        path = []
        for _ in range(n_path):
            ln = r.u64()
            path.append(r.take(ln))
        columns.append(LcColumn(col_mont=col_mont, path=path))
    assert r.pos == len(data), "trailing bytes"
    return LcEvalProof(
        n_cols=n_cols, p_eval=p_eval, p_random_vec=p_random_vec, columns=columns
    )


def serialize_root(root: bytes) -> bytes:
    return _digest(root)


def deserialize_root(data: bytes) -> bytes:
    r = _Reader(data)
    ln = r.u64()
    out = r.take(ln)
    assert r.pos == len(data)
    return out


def proof_size_bytes(spec: FieldSpec, proof: LcEvalProof) -> int:
    """Size of the bincode encoding (comparable to BASELINE proof sizes)."""
    return len(serialize_proof(spec, proof))


# ---------------------------------------------------------------------------
# commitment (prover state) serialization — the reference's checkpoint/resume
# analogue (full serde of LcCommit incl. both matrices, lib.rs:186-268)
# ---------------------------------------------------------------------------


def _mont_matrix_bytes(arr: np.ndarray) -> bytes:
    """(W, R, C) u32 16-bit Montgomery limbs -> row-major element wire bytes."""
    w, r, c = arr.shape
    # element order: row-major over (R, C); limbs LE within each element
    u16 = np.ascontiguousarray(
        np.moveaxis(np.asarray(arr, dtype=np.uint32), 0, 2)
    ).astype("<u2")  # (R, C, W)
    return u16.tobytes()


def serialize_commit(spec: FieldSpec, comm) -> bytes:
    """bincode of WrappedLcCommit { comm, coeffs, n_rows, n_cols, n_per_row,
    hashes } (lcpc-2d/src/lib.rs:186-197)."""
    out = [
        _u64(comm.n_rows * comm.n_cols),
        _mont_matrix_bytes(np.asarray(comm.comm)),
        _u64(comm.n_rows * comm.n_per_row),
        _mont_matrix_bytes(np.asarray(comm.coeffs)),
        _u64(comm.n_rows),
        _u64(comm.n_cols),
        _u64(comm.n_per_row),
        _u64(comm.hashes.shape[0]),
    ]
    for i in range(comm.hashes.shape[0]):
        out.append(_digest(bytes(comm.hashes[i])))
    return b"".join(out)


def deserialize_commit(spec: FieldSpec, data: bytes, enc, digest=None):
    """Rebuild an LcCommit (device arrays included) from serialize_commit.

    The wire bytes are a bincode mirror of WrappedLcCommit<D>, whose digest
    lives in the Rust TYPE, not the byte stream — so the caller declares it
    here (exactly as Rust deserializes into a concrete LcCommit<D, E>),
    defaulting to BLAKE3.  Passing the wrong digest mismatches the hashes
    array the same way the wrong D type parameter would."""
    import jax.numpy as jnp

    from ..ops.digest import BLAKE3
    from .protocol import LcCommit

    if digest is None:
        digest = BLAKE3

    r = _Reader(data)
    w = spec.w16

    def read_matrix(count):
        raw = r.take(count * spec.repr_bytes)
        u16 = np.frombuffer(raw, dtype="<u2").reshape(count, w)
        return np.ascontiguousarray(u16.T).astype(np.uint32)

    n_comm = r.u64()
    comm_flat = read_matrix(n_comm)
    n_coeffs = r.u64()
    coeffs_flat = read_matrix(n_coeffs)
    n_rows = r.u64()
    n_cols = r.u64()
    n_per_row = r.u64()
    n_hashes = r.u64()
    hashes = np.empty((n_hashes, 32), dtype=np.uint8)
    for i in range(n_hashes):
        ln = r.u64()
        hashes[i] = np.frombuffer(r.take(ln), dtype=np.uint8)
    assert r.pos == len(data)
    assert n_comm == n_rows * n_cols and n_coeffs == n_rows * n_per_row
    from ..ops import blake3_jax

    return LcCommit(
        enc=enc,
        coeffs=jnp.asarray(coeffs_flat.reshape(w, n_rows, n_per_row)),
        comm=jnp.asarray(comm_flat.reshape(w, n_rows, n_cols)),
        n_rows=n_rows,
        n_per_row=n_per_row,
        n_cols=n_cols,
        hashes_dev=jnp.asarray(blake3_jax.bytes_to_digests(hashes)),
        digest=digest,
        _hashes_np=hashes,
    )
