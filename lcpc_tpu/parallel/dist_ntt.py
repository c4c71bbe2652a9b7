"""Distributed NTT: a single row's transform sharded across the mesh.

The analogue of sequence parallelism (SURVEY.md §2.2: "intra-row NTT
sharding"): when one codeword row exceeds a chip (or to use all chips on few
rows), the length-n transform runs as the 4-step decomposition n = A*B with
the B axis sharded over the mesh:

  phase 1: local DFT_A along the unsharded A axis (each device owns all of A
           for its jB slice) - zero communication;
  twiddle: elementwise multiply with the device's slice of the twiddle table;
  all_to_all over ICI: reshard from jB-sharded to kA-sharded;
  phase 2: local DFT_B along the now-unsharded B axis.

Output ordering equals fft_io's (out[rev(k)] = X_k), sharded in contiguous
n-blocks; bit-reversals are inherited from the local fft_io ladders plus the
baked-in twiddle indexing (same identity as ops/mxu_ntt.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.spec import FieldSpec
from ..ops.limbs import get_ops
from ..ops.ntt import BatchedNtt, bit_reverse_indices, get_ntt


class DistNtt:
    """n = A*B NTT over a 1-D mesh axis "c" sharding the B axis."""

    def __init__(self, spec: FieldSpec, n: int, mesh: Mesh, axis: str = "c"):
        assert n & (n - 1) == 0
        self.spec = spec
        self.n = n
        self.mesh = mesh
        self.axis = axis
        n_dev = mesh.devices.size
        log = n.bit_length() - 1
        a = 1 << (log // 2 + log % 2)
        self.a, self.b = a, n // a
        assert self.b % n_dev == 0, "B axis must divide the mesh"
        assert self.a % n_dev == 0, "A axis must divide the mesh"
        self.ops = get_ops(spec)
        self.ntt_a = get_ntt(spec, self.a)
        self.ntt_b = get_ntt(spec, self.b)

        # twiddle table tw[u, jB] = w_n^(rev_a(u) * jB) * R, sharded over jB
        p = spec.p
        w_n = spec.root_for_log_len(log)
        rev_a = bit_reverse_indices(self.a)
        tw = np.zeros((self.ops.w, self.a, self.b), dtype=np.uint32)
        for u in range(self.a):
            base = pow(w_n, int(rev_a[u]), p)
            acc = spec.R % p
            for jb in range(self.b):
                for i in range(self.ops.w):
                    tw[i, u, jb] = (acc >> (16 * i)) & 0xFFFF
                acc = (acc * base) % p
        self.tw = jax.device_put(
            tw, NamedSharding(mesh, P(None, None, axis))
        )

        ops = self.ops
        ntt_a, ntt_b = self.ntt_a, self.ntt_b

        def local_fn(x_local, tw_local, a_mats, b_mats):
            # x_local: (W, rows, A, B/n_dev).  The local ladders' twiddle
            # tables travel as shard_map ARGUMENTS (closure capture embeds
            # them in the serialized HLO — the remote-compile size failure).
            w, rows, a_, bl = x_local.shape
            # phase 1: DFT_A along axis 2
            y = jnp.moveaxis(x_local, 2, 3)          # (W, rows, B_loc, A)
            y = ntt_a.apply(y.reshape(w, rows * bl, a_), a_mats)
            y = jnp.moveaxis(y.reshape(w, rows, bl, a_), 3, 2)  # (W,rows,A,Bl)
            # twiddle (device-local slice)
            y = ops.mul(y, jnp.broadcast_to(tw_local[:, None], y.shape))
            # all_to_all: jB-sharded -> u-sharded
            y = jax.lax.all_to_all(y, axis, split_axis=2, concat_axis=3,
                                   tiled=True)       # (W, rows, A_loc, B)
            # phase 2: DFT_B along the last axis
            al = y.shape[2]
            z = ntt_b.apply(y.reshape(w, rows * al, self.b), b_mats)
            return z.reshape(w, rows, al, self.b)

        a_specs = jax.tree.map(lambda _: P(), ntt_a.mats())
        b_specs = jax.tree.map(lambda _: P(), ntt_b.mats())
        self._fn = jax.jit(jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(None, None, None, axis), P(None, None, axis),
                      a_specs, b_specs),
            out_specs=P(None, None, axis, None),
            check_vma=False,
        ))

    def shard_input(self, x: np.ndarray):
        """(W, rows, n) host -> device array viewed (W, rows, A, B), B sharded."""
        w, rows, n = x.shape
        xr = np.asarray(x).reshape(w, rows, self.a, self.b)
        return jax.device_put(
            xr, NamedSharding(self.mesh, P(None, None, None, self.axis))
        )

    def __call__(self, x_sharded) -> jnp.ndarray:
        """Returns (W, rows, A, B) with the A (output-block) axis sharded;
        reshape to (W, rows, n) for the flat fft_io layout."""
        return self._fn(x_sharded, self.tw, self.ntt_a.mats(),
                        self.ntt_b.mats())
