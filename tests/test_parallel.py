"""Multi-device tests on the virtual CPU mesh: the distributed (all-to-all)
NTT and the sharded collapse vs their single-device twins.  The full sharded
protocol (commit/prove parity) lives in test_mesh_protocol.py."""

import random

import numpy as np
import pytest
import jax

from lcpc_tpu.fields import FT63
from lcpc_tpu.ops.limbs import get_ops
from lcpc_tpu.ops.ntt import get_ntt
from lcpc_tpu.parallel import mesh_protocol
from lcpc_tpu.parallel.dist_ntt import DistNtt

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs a multi-device mesh"
)


def test_dist_ntt_matches_single_device():
    spec = FT63
    ops = get_ops(spec)
    n = 256
    rows = 3
    mesh = mesh_protocol.make_mesh(jax.devices()[:4], axis="c")
    dntt = DistNtt(spec, n, mesh, axis="c")

    rng = random.Random(11)
    mats = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(rows)]
    x = np.stack([ops.encode_host(r) for r in mats], axis=1)  # (W, rows, n)

    got = np.asarray(dntt(dntt.shard_input(x))).reshape(ops.w, rows, n)
    want = np.asarray(get_ntt(spec, n)(np.asarray(x)))
    assert np.array_equal(got, want)


def test_dist_ntt_eight_devices():
    spec = FT63
    ops = get_ops(spec)
    n = 1024
    mesh = mesh_protocol.make_mesh(jax.devices()[:8], axis="c")
    dntt = DistNtt(spec, n, mesh)
    rng = random.Random(12)
    row = [rng.randrange(spec.p) for _ in range(n)]
    x = ops.encode_host(row)[:, None, :]
    got = np.asarray(dntt(dntt.shard_input(np.asarray(x)))).reshape(ops.w, 1, n)
    want = np.asarray(get_ntt(spec, n)(np.asarray(x)))
    assert np.array_equal(got, want)


def test_sharded_collapse_matches_host():
    spec = FT63
    ops = get_ops(spec)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lcpc_tpu.core import protocol
    from lcpc_tpu.encodings.ligero import LigeroEncoding

    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    mesh = mesh_protocol.make_mesh(jax.devices()[:4], axis="r")
    rng = random.Random(13)
    n_rows = 8
    coeffs = [[rng.randrange(spec.p) for _ in range(64)] for _ in range(n_rows)]
    tensor = [rng.randrange(spec.p) for _ in range(n_rows)]

    mat = np.stack([ops.encode_host(r) for r in coeffs], axis=1)  # (W, R, np)
    ts = ops.encode_host(tensor)[:, None, :]  # (W, T=1, R)

    mat_sh = jax.device_put(mat, NamedSharding(mesh, P(None, "r", None)))
    ts_sh = jax.device_put(ts, NamedSharding(mesh, P(None, None, "r")))
    words = np.asarray(mesh_protocol._build_collapse_fn(enc, mesh)(ts_sh, mat_sh))
    got = protocol._repr_rows_to_ints(protocol._words_to_repr_rows(words[0]))

    want = [0] * 64
    for row_vals, tv in zip(coeffs, tensor):
        for c in range(64):
            want[c] = (want[c] + row_vals[c] * tv) % spec.p
    assert got == want
