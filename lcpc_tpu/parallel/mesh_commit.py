"""Mesh-sharded commitment: row-parallel encode, column-parallel hashing.

The TPU-native analogue of the reference's rayon data parallelism
(SURVEY.md §2.2):

- the n_rows independent row encodes are sharded over the mesh's "r" axis
  (zero communication — the analogue of data parallelism);
- the codeword matrix is then resharded row-shards -> column-shards with a
  single all_to_all over ICI, so every device hashes full columns locally
  (the analogue of tensor parallelism along n_cols);
- the Merkle tree is computed as local subtrees plus a replicated top tree
  over the all-gathered per-device subtree roots (log-depth collective);
- prove's collapse_columns is a local modular matvec + psum over "r".

Everything is expressed with shard_map over a 1-D device mesh; XLA lowers the
collectives onto ICI.  The layout reproduces the serial Merkle tree exactly
when n_cols and the device count are powers of two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.encoding import LcEncoding
from ..ops import blake3_jax
from ..ops.limbs import get_ops
from ..core.protocol import _pack_words


def make_mesh(devices=None, axis: str = "r") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def sharded_commit_fn(enc: LcEncoding, mesh: Mesh, n_rows: int):
    """Build a jitted sharded commit: coeffs (W, R, np) -> (root, leaves).

    coeffs must be sharded along the row axis.  Returns the replicated root
    digest (8,) words and the column-sharded leaf digests (8, n_cols).
    """
    ops = get_ops(enc.spec)
    n_dev = mesh.devices.size
    n_cols = enc.n_cols
    assert n_rows % n_dev == 0, "row count must divide the mesh"
    assert n_cols % n_dev == 0 and (n_cols & (n_cols - 1)) == 0, (
        "sharded commit requires power-of-two n_cols divisible by the mesh"
    )

    def local_fn(coeffs_local: jnp.ndarray):
        # 1. row-parallel encode (no communication)
        comm_local = enc.encode_rows(coeffs_local)  # (W, R/n, nc)
        # 2. reshard rows->cols with one all_to_all over ICI
        comm_cols = jax.lax.all_to_all(
            comm_local, "r", split_axis=2, concat_axis=1, tiled=True
        )  # (W, R, nc/n)
        # 3. hash full columns locally
        canon = ops.from_mont(comm_cols)
        words = _pack_words(ops, canon)
        leaves = blake3_jax.hash_word_columns(words)  # (8, nc/n)
        # 4. local Merkle subtree
        digs = leaves
        while digs.shape[1] > 1:
            digs = blake3_jax.merkle_layer(digs)
        # 5. replicated top tree over device subtree roots
        tops = jax.lax.all_gather(digs[:, 0], "r", axis=1)  # (8, n_dev)
        while tops.shape[1] > 1:
            tops = blake3_jax.merkle_layer(tops)
        return tops[:, 0], leaves, comm_cols

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(None, "r", None),
        out_specs=(P(), P(None, "r"), P(None, None, "r")),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_collapse_fn(enc: LcEncoding, mesh: Mesh):
    """tensor (W, R) . coeffs (W, R, np) with a psum over the row axis."""
    ops = get_ops(enc.spec)

    def local_fn(tensor_local, coeffs_local):
        part = ops.mul(
            jnp.broadcast_to(tensor_local[:, :, None], coeffs_local.shape),
            coeffs_local,
        )
        part = ops.sum(part, axis=1)  # (W, np) local partial (Montgomery)
        # modular psum: all_gather partials and tree-add (n_dev is small)
        parts = jax.lax.all_gather(part, "r", axis=1)  # (W, n_dev, np)
        return ops.sum(parts, axis=1)

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, "r"), P(None, "r", None)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_rows(mesh: Mesh, arr: np.ndarray):
    """Place (W, R, np) on the mesh, sharded along the row axis."""
    return jax.device_put(arr, NamedSharding(mesh, P(None, "r", None)))
