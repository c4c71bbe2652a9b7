"""Multi-host entry: jax.distributed init + DCN-aware mesh construction.

The reference is single-process (rayon threads; SURVEY.md §2.3 calls the
distributed backend out as a required TPU-native addition).  This module is
the process-level entry:

- `initialize()` wraps jax.distributed.initialize with env-variable
  resolution (LCPC_COORDINATOR / LCPC_NUM_PROCESSES / LCPC_PROCESS_ID), so
  a multi-host launcher only exports three variables per process.
- `make_multihost_mesh()` builds the 1-D protocol mesh over ALL global
  devices in HOST-MAJOR order: each host's row shard is a contiguous row
  range, so the row-parallel encode is DCN-free and only the codeword
  reshard (one all_to_all) and the tiny leaf all_gather cross hosts.
- `make_hybrid_mesh()` exposes the 2-D (dcn, ici) mesh for callers that
  want to lay collectives onto the hierarchy explicitly.
- `put_sharded()` is the multihost-safe device_put the mesh protocol paths
  use: in a single process it is jax.device_put; across processes each host
  places only its addressable shards (jax.make_array_from_callback) from
  the same host-replicated numpy value.

Tested by tests/test_multihost.py: two coordinated CPU processes (4 virtual
devices each) run sharded_commit/prove over the 8-device global mesh and
the proof bytes must equal the single-process prover's.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(coordinator_address: "str | None" = None,
               num_processes: "int | None" = None,
               process_id: "int | None" = None,
               local_device_count: "int | None" = None,
               platform: "str | None" = None) -> None:
    """jax.distributed.initialize with LCPC_* env fallbacks.

    No-op when neither arguments nor env variables request distribution
    (single-process runs need no coordinator).  `platform` (or
    LCPC_PLATFORM) pins the backend via jax.config BEFORE the distributed
    client starts — required in environments whose sitecustomize registers
    another platform (the JAX_PLATFORMS env alone does not win there).
    Must be called before anything initializes the XLA backend.
    """
    import jax

    platform = platform or os.environ.get("LCPC_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    coordinator_address = coordinator_address or os.environ.get(
        "LCPC_COORDINATOR")
    if num_processes is None and "LCPC_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["LCPC_NUM_PROCESSES"])
    if process_id is None and "LCPC_PROCESS_ID" in os.environ:
        process_id = int(os.environ["LCPC_PROCESS_ID"])
    if coordinator_address is None:
        return  # single-process
    kwargs = {}
    if local_device_count is not None:
        kwargs["num_local_devices"] = local_device_count
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def make_multihost_mesh(axis: str = "r"):
    """1-D mesh over all global devices, host-major (see module docstring)."""
    import jax
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), (axis,))


def make_hybrid_mesh(dcn_axis: str = "h", ici_axis: str = "r"):
    """2-D (hosts, devices-per-host) mesh: the DCN axis leads, so
    PartitionSpecs can keep bandwidth-heavy collectives on the ICI axis."""
    import jax
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = jax.process_count()
    per_host = len(devs) // n_proc
    assert per_host * n_proc == len(devs), (len(devs), n_proc)
    grid = np.asarray(devs).reshape(n_proc, per_host)
    return Mesh(grid, (dcn_axis, ici_axis))


def put_sharded(arr, mesh, spec):
    """Multihost-safe device_put of a host-replicated value.

    `arr` must hold the SAME full value in every process (the protocol's
    inputs are host-replicated: coefficients, tensors).  Single-process:
    plain device_put (zero-copy for device-resident arrays).  Multi-process:
    each host materializes only its addressable shards.
    """
    import jax
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sh)
    arr_np = np.asarray(arr)
    return jax.make_array_from_callback(
        arr_np.shape, sh, lambda idx: arr_np[idx]
    )
