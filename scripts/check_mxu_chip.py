"""On-chip MXU-NTT vs VPU-ladder equivalence at the lifted sizes.

The CPU test suite twin-tests the lifted A=2048 contraction on ft63 (ft255's
digit conv is too expensive to interpret on CPU); this script closes the gap
on the real chip: bit-equality of the int8-conv NTT against the VPU ladder at
n = 2^21 and 2^22 over ft255, compared entirely on device (one scalar pull).

Run: python scripts/check_mxu_chip.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from lcpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lcpc_tpu.fields import FT255
    from lcpc_tpu.ops.limbs import get_ops
    from lcpc_tpu.ops.ntt import get_ntt
    from lcpc_tpu.ops.mxu_ntt import get_mxu_ntt

    spec = FT255
    ops = get_ops(spec)
    rng = np.random.default_rng(0)
    for logn in (21, 22):
        n = 1 << logn
        raw = rng.integers(0, 1 << 16, (ops.w, 2, n), dtype=np.uint32)
        x = ops.to_mont(jax.device_put(raw))
        jax.block_until_ready(x)

        t0 = time.time()
        ref = get_ntt(spec, n)(x)
        jax.block_until_ready(ref)
        t_vpu = time.time() - t0

        mxu = get_mxu_ntt(spec, n)
        got = mxu(x)  # compile
        jax.block_until_ready(got)
        t0 = time.time()
        got = mxu(x)
        jax.block_until_ready(got)
        t_mxu = time.time() - t0

        equal = bool(jax.jit(lambda a, b: jnp.all(a == b))(got, ref))
        print(f"2^{logn}: equal={equal}  vpu={t_vpu:.3f}s mxu={t_mxu:.3f}s "
              f"(a={mxu.plan.a}, b={mxu.plan.b})", flush=True)
        assert equal, f"MXU/VPU mismatch at n=2^{logn}"
    print("OK")


if __name__ == "__main__":
    main()
