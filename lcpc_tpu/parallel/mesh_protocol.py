"""Full multi-device protocol: sharded commit -> openable state -> prove.

The TPU-native analogue of the reference's rayon parallelism
(lcpc-2d/src/lib.rs:622-1123, SURVEY.md §2.2), as a real protocol rather than
a kernel demo:

- commit: the n_rows independent row encodes are sharded over the mesh's "r"
  axis (zero communication); a single all_to_all over ICI reshards the
  codeword rows->columns so each device hashes full columns locally; the leaf
  digests (tiny: n_cols x 32 B) are all_gathered and the Merkle tree above
  them is computed replicated — identical, layer by layer, to the serial
  tree, so the resulting `hashes` array is byte-identical to LcCommit's and
  columns can be opened from it.
- prove: collapse_columns is a local modular vector-matrix product over each
  device's row shard plus a modular reduction across the mesh (the psum
  analogue, exact mod p so the collapsed values — and therefore the whole
  Fiat-Shamir transcript and proof — are bit-identical to single-device);
  column openings gather from the column-sharded codeword.
- verify: unchanged (the verifier is cheap and single-device by design).

Non-power-of-two codeword lengths (Brakedown) are handled by padding the
column axis to a multiple of the mesh for the all_to_all and dropping the pad
leaves before the (replicated) zero-padded Merkle build, reproducing the
serial tree exactly (lib.rs:690-704 pads leaves with default digests).
Row counts that do not divide the mesh are padded with zero rows, which are
sliced off before hashing and contribute zero to every collapse.
"""

from __future__ import annotations

import dataclasses
import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.encoding import LcEncoding
from ..core import protocol
from . import multihost
from ..core.protocol import LcColumn, LcEvalProof, _next_pow2, _pack_words
from ..fs.merlin import Transcript
from ..ops import blake3_jax
from ..ops.digest import BLAKE3, DeviceDigest
from ..ops.limbs import get_ops


def make_mesh(devices=None, axis: str = "r") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class ShardedCommit:
    """Prover state living on a device mesh; openable like LcCommit."""

    enc: LcEncoding
    mesh: Mesh
    coeffs: jax.Array     # (W, n_rows_pad, n_per_row), rows sharded
    comm_cols: jax.Array  # (W, n_rows_pad, nc_pad), columns sharded
    n_rows: int           # true row count (pad rows are zero)
    n_per_row: int
    n_cols: int           # true codeword length (pad columns dropped)
    hashes_dev: jax.Array  # (8, 2*np2-1) u32 digest words, replicated
    digest: DeviceDigest = BLAKE3
    _hashes_np: "np.ndarray | None" = None
    _root: "bytes | None" = None

    @property
    def hashes(self) -> np.ndarray:
        """Flat Merkle byte array, byte-identical to the serial commit."""
        if self._hashes_np is None:
            self._hashes_np = blake3_jax.digests_to_bytes(
                jax.device_get(self.hashes_dev)
            )
        return self._hashes_np

    def get_root(self) -> bytes:
        if self._root is None:
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
        return sharded_prove(self, outer_tensor, tr)


# ---------------------------------------------------------------------------
# commit
# ---------------------------------------------------------------------------


# Per-encoding jit caches keyed WEAKLY on the encoding instance (encodings
# are built per polynomial size; strong keys would pin them — see streaming.py)
_commit_fn_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_collapse_fn_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _commit_fn(enc: LcEncoding, mesh: Mesh, n_rows: int, n_rows_pad: int,
               digest: DeviceDigest):
    per_enc = _commit_fn_cache.setdefault(enc, {})
    key = (mesh, n_rows, n_rows_pad, digest.name)
    if key not in per_enc:
        per_enc[key] = _build_commit_fn(enc, mesh, n_rows, n_rows_pad, digest)
    return per_enc[key]


def _commit_fn_wide(enc: LcEncoding, mesh: Mesh, n_rows: int,
                    digest: DeviceDigest):
    per_enc = _commit_fn_cache.setdefault(enc, {})
    key = ("wide", mesh, n_rows, digest.name)
    if key not in per_enc:
        per_enc[key] = _build_commit_fn_wide(enc, mesh, n_rows, digest)
    return per_enc[key]


def _wide_split(n_cols: int) -> tuple[int, int]:
    """The DistNtt A*B factorization of a power-of-two codeword width."""
    log = n_cols.bit_length() - 1
    a = 1 << (log // 2 + log % 2)
    return a, n_cols // a


def _build_commit_fn_wide(enc: LcEncoding, mesh: Mesh, n_rows: int,
                          digest: DeviceDigest):
    """Wide-row commit: ONE ROW'S transform sharded across the mesh.

    The intra-row regime (SURVEY.md §2.2 "sequence parallel" analogue; the
    reference's 2-adicity-capped wide rows, lcpc-ligero-pc/src/lib.rs:79-83):
    every device holds ALL rows but only a B-slice of each, the DistNtt
    4-step runs the length-n_cols transform with one all_to_all, and its
    A-sharded output IS a contiguous column sharding — so column hashing is
    local with no reshard, and the Merkle top builds replicated exactly as
    the row-parallel path does.  Output hashes are byte-identical to the
    serial merkleize (DistNtt is bit-exact vs the serial ladder).
    """
    from .dist_ntt import DistNtt

    ops = get_ops(enc.spec)
    axis = mesh.axis_names[0]
    nc = enc.n_cols
    assert nc & (nc - 1) == 0, "wide path requires a power-of-two codeword"
    dn = DistNtt(enc.spec, nc, mesh, axis=axis)

    def hash_local(y_local):
        # y_local: (W, R, A/n_dev, B) — a contiguous slice of the codeword
        w = y_local.shape[0]
        flat = y_local.reshape(w, n_rows, -1)
        canon = ops.from_mont(flat)
        words = _pack_words(ops, canon)
        leaves_local = digest.hash_word_columns(words)
        leaves = jax.lax.all_gather(leaves_local, axis, axis=1, tiled=True)
        layers = [leaves]  # nc is a power of two: no pad leaves
        while layers[-1].shape[1] > 1:
            layers.append(digest.merkle_layer(layers[-1]))
        return jnp.concatenate(layers, axis=1)  # (8, 2*nc-1)

    hash_fn = jax.jit(jax.shard_map(
        hash_local, mesh=mesh,
        in_specs=P(None, None, axis, None), out_specs=P(),
        check_vma=False,
    ))

    def commit(x_bsharded):
        y = dn(x_bsharded)  # (W, R, A, B), A-sharded
        flat_hashes = hash_fn(y)
        comm_flat = y.reshape(y.shape[0], n_rows, nc)  # fft_io flat layout
        return flat_hashes, comm_flat

    return commit, dn


def _build_commit_fn(enc: LcEncoding, mesh: Mesh, n_rows: int, n_rows_pad: int,
                     digest: DeviceDigest):
    """Jitted sharded commit: coeffs (W, Rp, np) row-sharded ->
    (flat hash layers (8, 2*np2-1) replicated, comm_cols column-sharded)."""
    ops = get_ops(enc.spec)
    n_dev = mesh.devices.size
    nc = enc.n_cols
    nc_pad = _round_up(nc, n_dev)
    np2 = _next_pow2(nc)
    axis = mesh.axis_names[0]

    def local_fn(coeffs_local: jnp.ndarray, mats):
        # 1. row-parallel encode (zero communication); the encoding's
        # device tables (expander matrices / NTT twiddles) travel as
        # shard_map ARGUMENTS — closure capture embeds them in the
        # serialized HLO (the HTTP 413 remote-compile failure at 2^23+)
        if mats is not None:
            comm_local = enc.encode_rows_core(coeffs_local, mats)
        else:
            comm_local = enc.encode_rows(coeffs_local)  # (W, Rp/n, nc)
        if nc_pad > nc:
            comm_local = jnp.pad(comm_local, [(0, 0), (0, 0), (0, nc_pad - nc)])
        # 2. reshard rows -> columns with one all_to_all over ICI
        comm_cols = jax.lax.all_to_all(
            comm_local, axis, split_axis=2, concat_axis=1, tiled=True
        )  # (W, Rp, nc_pad/n)
        # 3. hash full columns locally (pad rows sliced off: the column hash
        #    covers exactly n_rows elements, lib.rs:706-745)
        canon = ops.from_mont(comm_cols[:, :n_rows, :])
        words = _pack_words(ops, canon)
        leaves_local = digest.hash_word_columns(words)  # (8, nc_pad/n)
        # 4. replicate the tiny leaf layer and build the full Merkle tree on
        #    every device — identical layers to the serial merkleize
        leaves = jax.lax.all_gather(
            leaves_local, axis, axis=1, tiled=True
        )  # (8, nc_pad)
        leaves = leaves[:, :nc]
        if np2 > nc:
            leaves = jnp.pad(leaves, [(0, 0), (0, np2 - nc)])
        layers = [leaves]
        while layers[-1].shape[1] > 1:
            layers.append(digest.merkle_layer(layers[-1]))
        flat = jnp.concatenate(layers, axis=1)  # (8, 2*np2-1)
        return flat, comm_cols

    if hasattr(enc, "_device_mats"):
        enc._device_mats()  # materialize device constants outside the trace
    if not hasattr(enc, "encode_mats"):
        jitted = jax.jit(jax.shard_map(
            lambda c: local_fn(c, None), mesh=mesh,
            in_specs=P(None, axis, None),
            out_specs=(P(), P(None, None, axis)),
            check_vma=False,
        ))
        return jitted
    mats_specs = jax.tree.map(lambda _: P(), enc.encode_mats())
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), mats_specs),
        out_specs=(P(), P(None, None, axis)),
        check_vma=False,
    )
    jitted = jax.jit(fn)
    wrapper = lambda coeffs_sh: jitted(coeffs_sh, enc.encode_mats())
    # exposed for the dryrun's embedded-constant audit (__graft_entry__):
    # the jit's OWN jaxpr must not close over megabyte tables
    wrapper.jitted = jitted
    wrapper.extra_args = enc.encode_mats
    return wrapper


def sharded_commit(coeffs, enc: LcEncoding, mesh: Mesh,
                   digest: DeviceDigest = BLAKE3,
                   strategy: str = "auto") -> ShardedCommit:
    """Commit over the mesh; `hashes` is byte-identical to protocol.commit.

    `coeffs` is a list of canonical ints or a (W, N) uint32 Montgomery limb
    array (same contract as protocol.commit, lib.rs:622-671).  A jax.Array
    stays on device: padding/reshape run there and device_put reshards it
    onto the mesh directly (at 2^26 a host round trip would push ~2 GB
    through the host link; already-placed arrays must never leave device).

    `strategy`: "rows" shards the independent row encodes (the default
    regime); "wide" shards each row's transform across the mesh via the
    distributed 4-step NTT (the few-rows/wide-columns regime — the
    reference's 2-adicity-capped shape); "auto" picks "wide" when the mesh
    has more devices than there are rows and the encoding supports it.
    """
    ops = get_ops(enc.spec)
    if isinstance(coeffs, list):
        length = len(coeffs)
        arr = jnp.asarray(np.asarray(ops.encode_host(coeffs)))
    elif isinstance(coeffs, jax.Array):
        arr = coeffs
        length = arr.shape[1]
    else:
        arr = jnp.asarray(np.asarray(coeffs))
        length = arr.shape[1]
    assert arr.ndim == 2 and arr.shape[0] == ops.w

    n_rows, n_per_row, n_cols = enc.get_dims(length)
    assert enc.dims_ok(n_per_row, n_cols)
    n_dev = mesh.devices.size
    n_rows_pad = _round_up(n_rows, n_dev)
    axis = mesh.axis_names[0]

    wide = False
    if strategy in ("auto", "wide"):
        from ..encodings.ligero import LigeroEncoding

        a, b = _wide_split(n_cols)
        ntt_ok = (
            isinstance(enc, LigeroEncoding)
            and n_cols & (n_cols - 1) == 0
            and a % n_dev == 0 and b % n_dev == 0
        )
        if strategy == "wide":
            assert ntt_ok, "wide strategy needs an NTT encoding with A, B " \
                           "each divisible by the mesh"
            wide = True
        else:
            wide = ntt_ok and n_rows < n_dev

    pad = n_rows_pad * n_per_row - length
    if pad:
        arr = jnp.pad(arr, [(0, 0), (0, pad)])
    mat = arr.reshape(ops.w, n_rows_pad, n_per_row)
    # coeffs stay row-sharded either way: the collapse (prove) partials are
    # row-local and pad rows contribute zero
    coeffs_sh = multihost.put_sharded(mat, mesh, P(None, axis, None))

    if wide:
        a, b = _wide_split(n_cols)
        x = jnp.pad(mat[:, :n_rows, :], [(0, 0), (0, 0),
                                         (0, n_cols - n_per_row)])
        x = x.reshape(ops.w, n_rows, a, b)
        x_sh = multihost.put_sharded(
            x, mesh, P(None, None, None, axis)
        )
        flat, comm_cols = _commit_fn_wide(enc, mesh, n_rows, digest)[0](x_sh)
    else:
        flat, comm_cols = _commit_fn(enc, mesh, n_rows, n_rows_pad, digest)(
            coeffs_sh
        )

    return ShardedCommit(
        enc=enc, mesh=mesh, coeffs=coeffs_sh, comm_cols=comm_cols,
        n_rows=n_rows, n_per_row=n_per_row, n_cols=n_cols, hashes_dev=flat,
        digest=digest,
    )


# ---------------------------------------------------------------------------
# prove
# ---------------------------------------------------------------------------


def _collapse_fn(enc: LcEncoding, mesh: Mesh):
    # jit itself re-traces per T shape, so one entry per mesh suffices
    per_enc = _collapse_fn_cache.setdefault(enc, {})
    if mesh not in per_enc:
        per_enc[mesh] = _build_collapse_fn(enc, mesh)
    return per_enc[mesh]


def _build_collapse_fn(enc: LcEncoding, mesh: Mesh):
    """Jitted sharded collapse: ts (W, T, Rp) row-sharded x coeffs (W, Rp, np)
    row-sharded -> (T, np, W/2) canonical wire words, replicated.

    Local partial collapse (fused lazy-reduction kernel) + modular tree-add
    across the mesh — the exact field value, so bit-identical to the
    single-device ops.collapse_words (collapse_columns, lib.rs:1095-1123).
    """
    ops = get_ops(enc.spec)
    axis = mesh.axis_names[0]

    def local_fn(ts_local, coeffs_local):
        part = ops.collapse_canon(ts_local, coeffs_local)  # (W, T, np) canonical
        parts = jax.lax.all_gather(part, axis, axis=1, tiled=False)
        tot = ops.sum(parts, axis=1)  # modular tree-add of canonical partials
        words = tot[0::2] | (tot[1::2] << jnp.uint32(16))  # (W/2, T, np)
        return jnp.transpose(words, (1, 2, 0))

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis, None)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _gather_fn(mesh: Mesh):
    def gather(comm_cols, hashes_dev, col_idx, path_idx):
        g = jnp.take(comm_cols, col_idx, axis=2)
        packed = g[0::2] | (g[1::2] << jnp.uint32(16))  # halve link bytes
        path_digs = jnp.take(hashes_dev, path_idx.reshape(-1), axis=1)
        return packed, path_digs

    return jax.jit(
        gather,
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )


def sharded_prove(comm: ShardedCommit, outer_tensor: list[int],
                  tr: Transcript) -> LcEvalProof:
    """prove() against a ShardedCommit; proof bytes match the serial prover."""
    enc = comm.enc
    mesh = comm.mesh
    axis = mesh.axis_names[0]
    n_rows_pad = comm.coeffs.shape[1]

    def collapse_words_fn(ts: np.ndarray, ts_ints=None) -> np.ndarray:
        w, t, r = ts.shape
        assert r == comm.n_rows
        if n_rows_pad > r:
            ts = np.pad(ts, [(0, 0), (0, 0), (0, n_rows_pad - r)])
        ts_sh = multihost.put_sharded(ts, mesh, P(None, None, axis))
        return np.asarray(
            jax.device_get(_collapse_fn(enc, mesh)(ts_sh, comm.coeffs))
        )

    def open_columns_fn(cols: list[int]) -> protocol.BatchedColumns:
        col_idx = jnp.asarray(np.asarray(cols, dtype=np.int32))
        path_idx = protocol.path_node_indices(comm.n_cols, cols)  # (k, L)
        uniq, inv = np.unique(path_idx.reshape(-1), return_inverse=True)
        packed, path_digs = jax.device_get(
            _gather_fn(mesh)(
                comm.comm_cols, comm.hashes_dev, col_idx,
                jnp.asarray(uniq.astype(np.int32)),
            )
        )
        packed = np.asarray(packed)[:, : comm.n_rows, :]  # drop pad rows
        return protocol._columns_from_parts(
            packed, np.asarray(path_digs), inv, len(cols), path_idx.shape[1]
        )

    return protocol.prove_core(
        enc, tr, comm.n_rows, comm.n_cols, outer_tensor,
        collapse_words_fn, open_columns_fn,
    )
