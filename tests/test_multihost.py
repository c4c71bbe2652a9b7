"""Two-process CPU mesh: the multi-host entry produces bit-identical proofs.

SURVEY.md §2.3: the reference has no distributed backend (single process,
rayon); the TPU-native build's multi-host layer is jax.distributed + a
host-major global mesh (lcpc_tpu/parallel/multihost.py).  This test runs the
real thing: two coordinated processes, 4 virtual CPU devices each, a global
8-device mesh, sharded commit+prove, proof bytes asserted identical to the
single-process prover inside each worker and across the two workers.
"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_cpu_mesh():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # worker sets its own
        env.update(
            LCPC_COORDINATOR=f"127.0.0.1:{port}",
            LCPC_NUM_PROCESSES="2",
            LCPC_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        ok = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert ok, f"no OK line:\n{out}\n{err}"
        outs.append(ok[0])
    # both processes must agree on root and proof bytes
    tail0 = outs[0].split("root=")[1]
    tail1 = outs[1].split("root=")[1]
    assert tail0 == tail1, (outs[0], outs[1])
