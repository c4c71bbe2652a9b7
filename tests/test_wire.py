"""Wire serialization: proof and commitment round trips, malformed input."""

import random

import numpy as np
import pytest

from lcpc_tpu.core import protocol, wire
from lcpc_tpu.encodings.ligero import LigeroEncoding
from lcpc_tpu.fields import FT63
from lcpc_tpu.fs.merlin import Transcript
from lcpc_tpu.utils.tensors import univariate_tensors


@pytest.fixture(scope="module")
def setup():
    spec = FT63
    rng = random.Random(123)
    coeffs = [rng.randrange(spec.p) for _ in range(300)]
    enc = LigeroEncoding.new(spec, len(coeffs))
    comm = protocol.commit(coeffs, enc)
    outer, inner = univariate_tensors(spec, 5, comm.n_per_row, comm.n_rows)
    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", comm.get_root())
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    pf = comm.prove(outer, tr)
    return spec, enc, comm, pf, outer, inner


def test_proof_roundtrip(setup):
    spec, enc, comm, pf, outer, inner = setup
    blob = wire.serialize_proof(spec, pf)
    pf2 = wire.deserialize_proof(spec, blob)
    assert pf2.p_eval == pf.p_eval
    assert pf2.p_random_vec == pf.p_random_vec
    assert pf2.n_cols == pf.n_cols
    for a, b in zip(pf2.columns, pf.columns):
        assert np.array_equal(a.col_mont, b.col_mont)
        assert a.path == b.path
    # deserialized proof verifies
    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", comm.get_root())
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    pf2.verify(comm.get_root(), outer, inner, enc, tr)
    # re-serialization is byte-identical
    assert wire.serialize_proof(spec, pf2) == blob


def test_proof_truncation_rejected(setup):
    spec, _, _, pf, _, _ = setup
    blob = wire.serialize_proof(spec, pf)
    with pytest.raises(AssertionError):
        wire.deserialize_proof(spec, blob[:-1])
    with pytest.raises(AssertionError):
        wire.deserialize_proof(spec, blob + b"\x00")


def test_commit_roundtrip(setup):
    spec, enc, comm, pf, outer, inner = setup
    blob = wire.serialize_commit(spec, comm)
    comm2 = wire.deserialize_commit(spec, blob, enc)
    assert comm2.get_root() == comm.get_root()
    assert np.array_equal(comm2.hashes, comm.hashes)
    assert np.array_equal(np.asarray(comm2.coeffs), np.asarray(comm.coeffs))
    assert np.array_equal(np.asarray(comm2.comm), np.asarray(comm.comm))
    # the restored state can prove, with identical transcript behavior
    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", comm2.get_root())
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    pf2 = comm2.prove(outer, tr)
    assert pf2.p_eval == pf.p_eval


def test_root_roundtrip(setup):
    _, _, comm, _, _, _ = setup
    root = comm.get_root()
    assert wire.deserialize_root(wire.serialize_root(root)) == root
