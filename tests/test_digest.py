"""Digest genericity: the D: Digest plug point (lcpc-2d/src/lib.rs:34-58).

SHA-256 device kernels twin-tested against hashlib, and a full e2e under the
non-default digest — commitments/proofs must verify with the matching digest
and fail the Merkle path check under a mismatched one.
"""

import hashlib
import random

import numpy as np
import pytest

from lcpc_tpu.core import protocol
from lcpc_tpu.encodings.ligero import LigeroEncoding
from lcpc_tpu.fields import FT63
from lcpc_tpu.fs.merlin import Transcript
from lcpc_tpu.ops import sha256_jax
from lcpc_tpu.ops.digest import BLAKE3, SHA256, DIGESTS_BY_NAME


def _le_words_to_bytes(col_words: np.ndarray) -> bytes:
    return np.asarray(col_words, dtype="<u4").tobytes()


def test_sha256_hash_word_columns_vs_hashlib():
    rng = np.random.default_rng(42)
    for n_words, n_cols in [(1, 3), (7, 5), (8, 4), (56, 130), (120, 7)]:
        words = rng.integers(0, 1 << 32, (n_words, n_cols), dtype=np.uint64)
        words = words.astype(np.uint32)
        digs = np.asarray(sha256_jax.hash_word_columns(words))  # (8, C)
        for c in range(n_cols):
            msg = bytes(32) + _le_words_to_bytes(words[:, c])
            want = hashlib.sha256(msg).digest()
            got = np.asarray(digs[:, c], dtype="<u4").tobytes()
            assert got == want, (n_words, c)


def test_sha256_merkle_parent_vs_hashlib():
    rng = np.random.default_rng(43)
    digs = rng.integers(0, 1 << 32, (8, 6), dtype=np.uint64).astype(np.uint32)
    out = np.asarray(sha256_jax.merkle_layer(digs))
    for i in range(3):
        left = np.asarray(digs[:, 2 * i], dtype="<u4").tobytes()
        right = np.asarray(digs[:, 2 * i + 1], dtype="<u4").tobytes()
        want = hashlib.sha256(left + right).digest()
        assert np.asarray(out[:, i], dtype="<u4").tobytes() == want


def _preamble(enc, root):
    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", root)
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    return tr


def test_e2e_sha256_digest():
    spec = FT63
    rng = random.Random(99)
    length = 300
    coeffs = [rng.randrange(spec.p) for _ in range(length)]
    enc = LigeroEncoding.new(spec, length)

    comm = protocol.commit(coeffs, enc, digest=SHA256)
    comm_b3 = protocol.commit(coeffs, enc, digest=BLAKE3)
    assert comm.get_root() != comm_b3.get_root()

    root = comm.get_root()
    x = rng.randrange(spec.p)
    inner = [pow(x, i, spec.p) for i in range(comm.n_per_row)]
    xr = (x * inner[-1]) % spec.p
    outer = [pow(xr, i, spec.p) for i in range(comm.n_rows)]

    pf = comm.prove(outer, _preamble(enc, root))
    got = protocol.verify(root, outer, inner, pf, enc, _preamble(enc, root),
                          digest=SHA256)
    want = 0
    for c in reversed(coeffs):
        want = (want * x + c) % spec.p
    assert got == want

    # a mismatched digest must fail the Merkle path check
    with pytest.raises(protocol.VerifierError) as ei:
        protocol.verify(root, outer, inner, pf, enc, _preamble(enc, root),
                        digest=BLAKE3)
    assert ei.value.kind == "ColumnPath"


def test_digest_registry():
    assert DIGESTS_BY_NAME["blake3"] is BLAKE3
    assert DIGESTS_BY_NAME["sha256"] is SHA256
    # host twins agree with the device convention on an empty-ish message
    assert BLAKE3.host(b"abc") != SHA256.host(b"abc")
    assert SHA256.host(b"abc") == hashlib.sha256(b"abc").digest()
