"""Multi-device tests on the virtual CPU mesh: sharded commit, sharded
collapse, and the distributed (all-to-all) NTT vs their single-device twins."""

import random

import numpy as np
import pytest
import jax

from lcpc_tpu.fields import FT63
from lcpc_tpu.ops.limbs import get_ops
from lcpc_tpu.ops.ntt import get_ntt
from lcpc_tpu.parallel import mesh_commit
from lcpc_tpu.parallel.dist_ntt import DistNtt

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs a multi-device mesh"
)


def test_dist_ntt_matches_single_device():
    spec = FT63
    ops = get_ops(spec)
    n = 256
    rows = 3
    mesh = mesh_commit.make_mesh(jax.devices()[:4], axis="c")
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
    mesh = mesh_commit.make_mesh(jax.devices()[:8], axis="c")
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
    from lcpc_tpu.encodings.ligero import LigeroEncoding

    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    mesh = mesh_commit.make_mesh(jax.devices()[:4], axis="r")
    rng = random.Random(13)
    n_rows = 8
    coeffs = [[rng.randrange(spec.p) for _ in range(64)] for _ in range(n_rows)]
    tensor = [rng.randrange(spec.p) for _ in range(n_rows)]

    mat = np.stack([ops.encode_host(r) for r in coeffs], axis=1)
    t = ops.encode_host(tensor)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mat_sh = mesh_commit.shard_rows(mesh, mat)
    t_sh = jax.device_put(t, NamedSharding(mesh, P(None, "r")))
    fn = mesh_commit.sharded_collapse_fn(enc, mesh)
    got = ops.decode_host(fn(t_sh, mat_sh))

    want = [0] * 64
    for row_vals, tv in zip(coeffs, tensor):
        for c in range(64):
            want[c] = (want[c] + row_vals[c] * tv) % spec.p
    assert got == want
