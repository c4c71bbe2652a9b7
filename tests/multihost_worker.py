"""Worker for tests/test_multihost.py: one process of a 2-process CPU mesh.

Env (set by the test): LCPC_COORDINATOR, LCPC_NUM_PROCESSES,
LCPC_PROCESS_ID.  Runs sharded commit+prove over the GLOBAL 8-device mesh
(4 virtual CPU devices per process) and prints the root and proof digest;
the proof must be bit-identical to the single-process prover's.
"""

import os
import sys

os.environ["LCPC_PLATFORM"] = "cpu"  # sitecustomize overrides JAX_PLATFORMS
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import hashlib
    import random

    from lcpc_tpu.parallel import multihost

    multihost.initialize()

    import jax

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    from lcpc_tpu.core import protocol, wire
    from lcpc_tpu.fields import FT63
    from lcpc_tpu.encodings.ligero import LigeroEncoding
    from lcpc_tpu.fs.merlin import Transcript
    from lcpc_tpu.parallel import mesh_protocol

    spec = FT63
    rng = random.Random(21)
    enc = LigeroEncoding.new_from_dims(spec, 64, 128)
    length = 64 * 16 - 7
    coeffs = [rng.randrange(spec.p) for _ in range(length)]

    mesh = multihost.make_multihost_mesh()
    hybrid = multihost.make_hybrid_mesh()
    assert hybrid.devices.shape == (2, 4)

    def preamble(root):
        tr = Transcript(b"test transcript")
        tr.append_message(b"polycommit", root)
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
        return tr

    sharded = mesh_protocol.sharded_commit(coeffs, enc, mesh)
    root = sharded.get_root()

    x = rng.randrange(spec.p)
    inner = [pow(x, i, spec.p) for i in range(sharded.n_per_row)]
    xr = (x * inner[-1]) % spec.p
    outer = [pow(xr, i, spec.p) for i in range(sharded.n_rows)]

    pf = sharded.prove(outer, preamble(root))
    blob = wire.serialize_proof(spec, pf)

    # single-process twin computed locally (plain jnp ops, default device)
    serial = protocol.commit(coeffs, enc)
    assert serial.get_root() == root, "sharded root != serial root"
    pf_serial = serial.prove(outer, preamble(serial.get_root()))
    assert wire.serialize_proof(spec, pf_serial) == blob, \
        "multihost proof != single-process proof"

    got = protocol.verify(root, outer, inner, pf, enc, preamble(root))
    want = 0
    for c in reversed(coeffs):
        want = (want * x + c) % spec.p
    assert got == want

    print(f"MULTIHOST_OK pid={jax.process_index()} root={root.hex()} "
          f"proof_sha={hashlib.sha256(blob).hexdigest()}", flush=True)


if __name__ == "__main__":
    main()
