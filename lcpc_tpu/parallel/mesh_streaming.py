"""Streaming x mesh: sharded commit for codewords beyond one device's HBM.

Composes the two big-N mechanisms (SURVEY.md §2.2 + §5 long-context):

- ROW BLOCKS (core/streaming.py): the codeword is never materialized; each
  block is encoded and folded into per-column hash carry state.
- MESH SHARDING (mesh_protocol.py): within a block, the independent row
  encodes shard over the mesh's axis (zero communication), one all_to_all
  reshards the block rows->columns, and every device folds its COLUMN SLICE
  of the block into its shard of the hash state.

The column hash carry state (chunk CVs, carry buffer) is elementwise along
the column axis, so the sharded update needs no communication at all — the
state lives as column-sharded jax.Arrays and XLA propagates the sharding
through the same jitted update the single-device path uses.  The finalize +
Merkle top replicate the tiny leaf layer and build the identical serial tree
(lcpc-2d/src/lib.rs:690-785 semantics, like mesh_protocol).

The packed canonical codeword words are retained COLUMN-SHARDED for prove's
column gather — the aggregate-HBM budget scales with the mesh, which is the
point: a codeword that exceeds one chip fits as n_dev shards.
"""

from __future__ import annotations

import dataclasses
import weakref

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import protocol, streaming
from ..core.encoding import LcEncoding
from ..core.protocol import LcEvalProof, _next_pow2, _pack_words
from ..fs.merlin import Transcript
from ..ops import blake3_jax
from ..ops.digest import BLAKE3, DeviceDigest
from ..ops.limbs import get_ops
from . import mesh_protocol
from .mesh_protocol import _round_up


_block_fn_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _block_words_fn(enc: LcEncoding, mesh: Mesh, rb: int, true_rows: int):
    """Jitted: (W, rb, npr) row-sharded block -> (true_rows*wpe, nc_pad)
    column-sharded packed canonical words (pad rows encoded but dropped
    before hashing — the column stream covers exactly n_rows elements)."""
    per_enc = _block_fn_cache.setdefault(enc, {})
    key = (mesh, rb, true_rows)
    if key in per_enc:
        return per_enc[key]

    ops = get_ops(enc.spec)
    n_dev = mesh.devices.size
    nc = enc.n_cols
    nc_pad = _round_up(nc, n_dev)
    axis = mesh.axis_names[0]
    streaming._prepare_encode_constants(enc)

    def local_fn(block_local, mats):
        # the encoding's device tables travel as shard_map ARGUMENTS
        # (closure capture embeds them in the serialized HLO — HTTP 413)
        comm_local = enc.encode_rows_lowmem(
            block_local, mats=mats)  # (W, rb/n, nc)
        if nc_pad > nc:
            comm_local = jnp.pad(
                comm_local, [(0, 0), (0, 0), (0, nc_pad - nc)]
            )
        comm_cols = jax.lax.all_to_all(
            comm_local, axis, split_axis=2, concat_axis=1, tiled=True
        )  # (W, rb, nc_pad/n)
        canon = ops.from_mont(comm_cols[:, :true_rows, :])
        return _pack_words(ops, canon)  # (true_rows*wpe, nc_pad/n)

    mats = streaming._stream_mats(enc, False)
    if mats is None:
        inner = jax.jit(jax.shard_map(
            lambda block: local_fn(block, None), mesh=mesh,
            in_specs=P(None, axis, None), out_specs=P(None, axis),
            check_vma=False,
        ))
        fn = inner
    else:
        mats_specs = jax.tree.map(lambda _: P(), mats)
        inner = jax.jit(jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(None, axis, None), mats_specs),
            out_specs=P(None, axis),
            check_vma=False,
        ))
        fn = lambda block: inner(block, streaming._stream_mats(enc, False))
        fn.jitted = inner
        fn.extra_args = lambda: streaming._stream_mats(enc, False)
    per_enc[key] = fn
    return fn


@dataclasses.dataclass
class ShardedCommitStreaming:
    """Mesh streaming commit state; openable like ShardedCommit."""

    enc: LcEncoding
    mesh: Mesh
    coeffs: jax.Array       # (W, n_rows_pad, npr) row-sharded
    words_dev: jax.Array    # (n_rows*W/2, nc_pad) canonical, column-sharded
    n_rows: int
    n_per_row: int
    n_cols: int
    hashes_dev: jax.Array   # (8, 2*np2-1) replicated
    digest: DeviceDigest = BLAKE3
    _hashes_np: "np.ndarray | None" = None
    _root: "bytes | None" = None

    @property
    def hashes(self) -> np.ndarray:
        if self._hashes_np is None:
            self._hashes_np = blake3_jax.digests_to_bytes(
                jax.device_get(self.hashes_dev)
            )
        return self._hashes_np

    def get_root(self) -> bytes:
        if self._root is None:
            if self._hashes_np is not None:
                self._root = bytes(self._hashes_np[-1])
            else:
                self._root = blake3_jax.digests_to_bytes(
                    jax.device_get(self.hashes_dev[:, -1:])
                )[0].tobytes()
        return self._root

    def get_n_rows(self) -> int:
        return self.n_rows

    def get_n_per_row(self) -> int:
        return self.n_per_row

    def get_n_cols(self) -> int:
        return self.n_cols

    def prove(self, outer_tensor: list[int], tr: Transcript) -> LcEvalProof:
        return sharded_prove_streaming(self, outer_tensor, tr)


def sharded_commit_streaming(coeffs, enc: LcEncoding, mesh: Mesh,
                             row_block: "int | None" = None,
                             digest: DeviceDigest = BLAKE3,
                             ) -> ShardedCommitStreaming:
    """Row-blocked, mesh-sharded commit; hashes byte-identical to serial."""
    ops = get_ops(enc.spec)
    hasher_cls = streaming._STREAM_HASHERS.get(digest.name)
    if hasher_cls is None:
        raise ValueError(f"no streaming hasher for digest {digest.name!r}")
    if isinstance(coeffs, list):
        length = len(coeffs)
        arr = jnp.asarray(np.asarray(ops.encode_host(coeffs)))
    elif isinstance(coeffs, jax.Array):
        arr = coeffs
        length = arr.shape[1]
    else:
        arr = jnp.asarray(np.asarray(coeffs))
        length = arr.shape[1]

    n_rows, n_per_row, n_cols = enc.get_dims(length)
    assert enc.dims_ok(n_per_row, n_cols)
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    n_rows_pad = _round_up(n_rows, n_dev)
    nc_pad = _round_up(n_cols, n_dev)
    wpe = enc.spec.w16 // 2

    pad = n_rows_pad * n_per_row - length
    if pad:
        arr = jnp.pad(arr, [(0, 0), (0, pad)])
    mat = arr.reshape(ops.w, n_rows_pad, n_per_row)
    coeffs_sh = jax.device_put(mat, NamedSharding(mesh, P(None, axis, None)))

    # row block: a multiple of the mesh (even shards); the aggregate budget
    # scales with the device count
    rb = streaming._row_block_for(
        enc.spec, n_rows,
        max(1, n_cols // n_dev),  # per-device column share drives the budget
        row_block,
    )
    rb = max(n_dev, _round_up(rb, n_dev))

    col_sh = NamedSharding(mesh, P(None, axis))
    hasher = hasher_cls(nc_pad, 8 + n_rows * wpe)
    # shard the carry state by columns: every update is elementwise along
    # the column axis, so the jitted single-device update runs shard-local
    hasher.buf = jax.device_put(hasher.buf, col_sh)
    if hasattr(hasher, "cv"):
        hasher.cv = jax.device_put(hasher.cv, col_sh)
    if hasattr(hasher, "chunk_cvs"):
        hasher.chunk_cvs = jax.device_put(
            hasher.chunk_cvs, NamedSharding(mesh, P(None, None, axis))
        )
    if hasattr(hasher, "h"):
        hasher.h = jax.device_put(hasher.h, col_sh)

    words_dev = jax.device_put(
        jnp.zeros((n_rows * wpe, nc_pad), jnp.uint32), col_sh
    )
    write = jax.jit(
        lambda buf, w, i: jax.lax.dynamic_update_slice(buf, w, (i, 0)),
        donate_argnums=0,
    )

    for r0 in range(0, n_rows, rb):
        true_rows = min(rb, n_rows - r0)
        rb_block = _round_up(true_rows, n_dev)
        block = coeffs_sh[:, r0 : r0 + rb_block, :]
        words = _block_words_fn(enc, mesh, rb_block, true_rows)(block)
        words_dev = write(words_dev, words, r0 * wpe)
        hasher.update(words)

    leaves = hasher.finalize()[:, :n_cols]  # (8, nc) column-sharded

    # replicate the tiny leaf layer; build the Merkle top exactly as serial
    leaves = jax.device_put(leaves, NamedSharding(mesh, P()))
    np2 = _next_pow2(n_cols)
    if np2 > n_cols:
        leaves = jnp.pad(leaves, [(0, 0), (0, np2 - n_cols)])
    layers = [leaves]
    while layers[-1].shape[1] > 1:
        layers.append(digest.merkle_layer(layers[-1]))
    flat = jnp.concatenate(layers, axis=1)

    return ShardedCommitStreaming(
        enc=enc, mesh=mesh, coeffs=coeffs_sh, words_dev=words_dev,
        n_rows=n_rows, n_per_row=n_per_row, n_cols=n_cols, hashes_dev=flat,
        digest=digest,
    )


def sharded_prove_streaming(comm: ShardedCommitStreaming,
                            outer_tensor: list[int],
                            tr: Transcript) -> LcEvalProof:
    """prove() against mesh streaming state; bytes match the serial prover."""
    enc = comm.enc
    mesh = comm.mesh
    axis = mesh.axis_names[0]
    ops = get_ops(enc.spec)
    n_rows_pad = comm.coeffs.shape[1]

    def collapse_words_fn(ts: np.ndarray, ts_ints=None) -> np.ndarray:
        w, t, r = ts.shape
        assert r == comm.n_rows
        if n_rows_pad > r:
            ts = np.pad(ts, [(0, 0), (0, 0), (0, n_rows_pad - r)])
        ts_sh = jax.device_put(ts, NamedSharding(mesh, P(None, None, axis)))
        return np.asarray(jax.device_get(
            mesh_protocol._collapse_fn(enc, mesh)(ts_sh, comm.coeffs)
        ))

    def open_columns_fn(cols: list[int]) -> protocol.BatchedColumns:
        idx = jnp.asarray(np.asarray(cols, dtype=np.int32))
        path_idx = protocol.path_node_indices(comm.n_cols, cols)
        uniq, inv = np.unique(path_idx.reshape(-1), return_inverse=True)
        col_w_dev, path_digs = streaming._gather_canon_fn(ops)(
            comm.words_dev, comm.hashes_dev, idx,
            jnp.asarray(uniq.astype(np.int32)),
        )
        return protocol._columns_from_parts(
            np.asarray(jax.device_get(col_w_dev)),
            np.asarray(jax.device_get(path_digs)),
            inv, len(cols), path_idx.shape[1],
        )

    return protocol.prove_core(
        enc, tr, comm.n_rows, comm.n_cols, outer_tensor,
        collapse_words_fn, open_columns_fn,
    )
