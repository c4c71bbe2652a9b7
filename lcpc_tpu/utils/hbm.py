"""HBM budget resolution for the streaming commit paths.

One module owns every memory constant the streaming row-block sizing uses,
so the encode transient reserve (`ligero.encode_rows_lowmem`) and the
block sizing (`core/streaming._row_block_for`) can never silently
desynchronize.  The usable-HBM figure comes from the backend's
`memory_stats()` where supported, else a device-kind table (v2..v6), else
a conservative 10 GiB default with a warning; the result is cached for the
process.  Env overrides (all bytes):

  LCPC_HBM_BYTES          usable device memory (skips the probe)
  LCPC_STREAM_BYTES       cap on the per-row-block transient budget
  LCPC_STREAM_KEEP_BYTES  cap on the retained packed codeword
  LCPC_MXU_STREAM_BYTES   MXU streaming-NTT sub-chunk transient
"""

from __future__ import annotations

import os

# Default transient budget for the MXU streaming NTT's digit planes
# (768 MiB).  ligero.encode_rows_lowmem sizes its row sub-chunks from this,
# and commit_streaming reserves the same amount when sizing row blocks.
MXU_STREAM_BYTES_DEFAULT = 3 << 28

# Per-row-block transient cap (the NTT/SpMV ladder's working set).
STREAM_BYTES_DEFAULT = 6 << 30

_probed_hbm: "int | None" = None


def mxu_stream_bytes() -> int:
    return int(os.environ.get("LCPC_MXU_STREAM_BYTES",
                              str(MXU_STREAM_BYTES_DEFAULT)))


def stream_bytes() -> int:
    return int(os.environ.get("LCPC_STREAM_BYTES", str(STREAM_BYTES_DEFAULT)))


def keep_bytes_budget(usable: "int | None" = None) -> int:
    """Cap on the retained packed canonical codeword.

    Defaults to half the usable HBM (the other half must hold coefficients,
    hasher state, and block transients) — on the 16 GB v5e this resolves to
    the same 5 GiB the old hardwired default used, but scales with the SKU.
    """
    env = os.environ.get("LCPC_STREAM_KEEP_BYTES")
    if env is not None:
        return int(env)
    if usable is None:
        usable = usable_hbm_bytes()
    return usable // 2


def usable_hbm_bytes() -> int:
    """Usable device-memory budget in bytes.

    Resolution order: LCPC_HBM_BYTES env, backend memory_stats(), allocation
    probe.  The result is cached for the process (the probe allocates).
    """
    env = os.environ.get("LCPC_HBM_BYTES")
    if env is not None:
        return int(env)
    global _probed_hbm
    if _probed_hbm is None:
        _probed_hbm = _probe()
    return _probed_hbm


# physical HBM by TPU device kind (GiB); usable fraction below covers the
# runtime/framework reserve and transient fragmentation, calibrated on the
# v5e (usable ~10 of 16 GiB: a 12.4 GB peak OOMs, 8.6 GB fits)
_TPU_HBM_GIB = (
    ("v5 lite", 16), ("v5e", 16), ("v5p", 95), ("v6", 32), ("v4", 32),
    ("v3", 32), ("v2", 16),
)
_USABLE_FRACTION = 0.625


def _probe() -> int:
    import jax

    dev = jax.devices()[0]
    # 1) backend-reported limit (runtimes that support memory_stats; the
    #    axon/v5e tunnel returns None)
    try:
        stats = dev.memory_stats()
        if stats:
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit"
            )
            if limit:
                in_use = stats.get("bytes_in_use", 0)
                # leave ~6% headroom for runtime/framework scratch
                return int((limit - in_use) * 0.94)
    except Exception:
        pass
    # 2) platform-default for host/CPU runs (tests): pretend a 16 GB chip so
    #    block sizing behaves as on the real device without probing host RAM
    if dev.platform == "cpu":
        return 10 << 30
    # 3) device-kind table.  (An allocation-ladder probe was tried and
    #    rejected: on the axon backend a failed RESOURCE_EXHAUSTED grant
    #    poisons subsequent allocations in the live process.)
    kind = (getattr(dev, "device_kind", "") or "").lower()
    for tag, gib in _TPU_HBM_GIB:
        if tag in kind:
            return int((gib << 30) * _USABLE_FRACTION)
    import warnings

    warnings.warn(
        f"unknown device kind {kind!r}: assuming 10 GiB of usable device "
        "memory; set LCPC_HBM_BYTES to the real figure (physical HBM minus "
        "the runtime reserve; ~62% of physical is a safe start)"
    )
    return 10 << 30
