"""Full multi-device protocol e2e on the virtual CPU mesh.

The sharded commit must yield an openable Merkle state whose flat hashes
array is byte-identical to the serial commit, and the sharded prove must emit
byte-identical proofs (the reference's semantics, lcpc-2d/src/lib.rs:622-1123,
are deterministic given the transcript preamble).
"""

import random

import numpy as np
import pytest
import jax

from lcpc_tpu.core import protocol, wire
from lcpc_tpu.encodings.ligero import LigeroEncoding
from lcpc_tpu.encodings.brakedown import SdigEncoding
from lcpc_tpu.fields import FT63
from lcpc_tpu.fs.merlin import Transcript
from lcpc_tpu.parallel import mesh_protocol

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs an 8-device mesh"
)


def _tensors_for_eval(spec, x, n_per_row, n_rows):
    inner = [pow(x, i, spec.p) for i in range(n_per_row)]
    xr = (x * inner[-1]) % spec.p
    outer = [pow(xr, i, spec.p) for i in range(n_rows)]
    return inner, outer


def _preamble(enc, root):
    tr = Transcript(b"test transcript")
    tr.append_message(b"polycommit", root)
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    return tr


def _run_e2e(spec, enc, length, seed):
    rng = random.Random(seed)
    coeffs = [rng.randrange(spec.p) for _ in range(length)]
    mesh = mesh_protocol.make_mesh(jax.devices()[:8])

    serial = protocol.commit(coeffs, enc)
    sharded = mesh_protocol.sharded_commit(coeffs, enc, mesh)

    # identical Merkle state: every node, not just the root
    assert np.array_equal(sharded.hashes, serial.hashes)
    assert sharded.get_root() == serial.get_root()

    x = rng.randrange(spec.p)
    inner, outer = _tensors_for_eval(spec, x, serial.n_per_row, serial.n_rows)

    pf_serial = serial.prove(outer, _preamble(enc, serial.get_root()))
    pf_sharded = sharded.prove(outer, _preamble(enc, sharded.get_root()))

    # byte-identical proofs
    blob_serial = wire.serialize_proof(spec, pf_serial)
    blob_sharded = wire.serialize_proof(spec, pf_sharded)
    assert blob_serial == blob_sharded

    # and the proof verifies (standard single-device verifier)
    got = protocol.verify(
        sharded.get_root(), outer, inner, pf_sharded, enc,
        _preamble(enc, sharded.get_root()),
    )
    want = 0
    for c in reversed(coeffs):
        want = (want * x + c) % spec.p
    assert got == want


def test_sharded_ligero_e2e():
    spec = FT63
    length = 1000
    enc = LigeroEncoding.new(spec, length)  # non-pow2 n_rows exercises row pad
    _run_e2e(spec, enc, length, seed=101)


def test_sharded_brakedown_e2e():
    spec = FT63
    length = 3000
    enc = SdigEncoding.new(spec, length, seed=0)  # non-pow2 n_cols
    _run_e2e(spec, enc, length, seed=202)


def test_sharded_rows_divisible():
    # n_rows an exact multiple of the mesh: no row padding path
    spec = FT63
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    length = 64 * 16
    _run_e2e(spec, enc, length, seed=303)


def test_sharded_sha256_and_device_resident_coeffs():
    """digest= reaches the mesh path, and a device-resident (jax.Array)
    coefficient input commits without a host round trip."""
    import jax.numpy as jnp

    from lcpc_tpu.ops.digest import SHA256
    from lcpc_tpu.ops.limbs import get_ops

    spec = FT63
    ops = get_ops(spec)
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    length = 64 * 16
    rng = random.Random(404)
    coeffs = [rng.randrange(spec.p) for _ in range(length)]
    mesh = mesh_protocol.make_mesh(jax.devices()[:8])

    serial = protocol.commit(coeffs, enc, digest=SHA256)
    arr = jnp.asarray(np.asarray(ops.encode_host(coeffs)))  # device array
    sharded = mesh_protocol.sharded_commit(arr, enc, mesh, digest=SHA256)

    assert np.array_equal(sharded.hashes, serial.hashes)
    assert sharded.get_root() == serial.get_root()


def test_sharded_wide_rows_e2e():
    """Few-rows/wide-columns regime: the intra-row DistNtt commit path
    (strategy auto-selects it when n_rows < n_devices), byte-identical
    hashes and proofs (VERDICT r2 item 4)."""
    spec = FT63
    enc = LigeroEncoding.new_from_dims(spec, 128, 256)  # A=16, B=16 over 8
    length = 128 * 4  # 4 rows < 8 devices -> wide path
    rng = random.Random(505)
    coeffs = [rng.randrange(spec.p) for _ in range(length)]
    mesh = mesh_protocol.make_mesh(jax.devices()[:8])

    # auto must pick wide here; also pin the explicit strategy
    for strategy in ("auto", "wide"):
        serial = protocol.commit(coeffs, enc)
        sharded = mesh_protocol.sharded_commit(
            coeffs, enc, mesh, strategy=strategy
        )
        assert np.array_equal(sharded.hashes, serial.hashes)

        x = rng.randrange(spec.p)
        inner, outer = _tensors_for_eval(
            spec, x, serial.n_per_row, serial.n_rows
        )
        pf_serial = serial.prove(outer, _preamble(enc, serial.get_root()))
        pf_sharded = sharded.prove(outer, _preamble(enc, sharded.get_root()))
        assert wire.serialize_proof(spec, pf_serial) == wire.serialize_proof(
            spec, pf_sharded
        )
        got = protocol.verify(
            sharded.get_root(), outer, inner, pf_sharded, enc,
            _preamble(enc, sharded.get_root()),
        )
        want = 0
        for c in reversed(coeffs):
            want = (want * x + c) % spec.p
        assert got == want


def test_sharded_wide_many_rows_forced():
    # explicit strategy="wide" with more rows than devices still matches
    spec = FT63
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)  # A=16, B=8 over 8
    length = 64 * 20
    rng = random.Random(606)
    coeffs = [rng.randrange(spec.p) for _ in range(length)]
    mesh = mesh_protocol.make_mesh(jax.devices()[:8])
    serial = protocol.commit(coeffs, enc)
    sharded = mesh_protocol.sharded_commit(coeffs, enc, mesh, strategy="wide")
    assert np.array_equal(sharded.hashes, serial.hashes)
