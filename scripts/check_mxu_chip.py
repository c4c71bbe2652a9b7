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
    sizes = [int(s) for s in
             os.environ.get("LCPC_MXU_CHECK_SIZES", "21,22").split(",")]

    def log(m):
        print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

    for logn in sizes:
        n = 1 << logn
        raw = rng.integers(0, 1 << 16, (ops.w, 2, n), dtype=np.uint32)
        x = ops.to_mont(jax.device_put(raw))
        jax.block_until_ready(x)
        log(f"2^{logn}: input ready")

        t0 = time.time()
        vpu = get_ntt(spec, n)
        log(f"2^{logn}: vpu plan built ({time.time()-t0:.1f}s)")
        ref = vpu(x)
        jax.block_until_ready(ref)
        log(f"2^{logn}: vpu compile+run ({time.time()-t0:.1f}s)")
        t0 = time.time()
        ref = vpu(x)
        jax.block_until_ready(ref)
        t_vpu = time.time() - t0

        t0 = time.time()
        mxu = get_mxu_ntt(spec, n)
        log(f"2^{logn}: mxu tables built ({time.time()-t0:.1f}s)")
        got = mxu(x)  # compile
        jax.block_until_ready(got)
        log(f"2^{logn}: mxu compile+run ({time.time()-t0:.1f}s)")
        t0 = time.time()
        got = mxu(x)
        jax.block_until_ready(got)
        t_mxu = time.time() - t0

        equal = bool(jax.jit(lambda a, b: jnp.all(a == b))(got, ref))
        print(f"2^{logn}: equal={equal}  vpu={t_vpu:.3f}s mxu={t_mxu:.3f}s "
              f"(a={mxu.plan.a}, b={mxu.plan.b})", flush=True)
        assert equal, f"MXU/VPU mismatch at n=2^{logn}"

        # zero-padded-input (rate-1/4) plan: rectangular step-1 kernel must
        # match the full plan fed the padded block, on the real chip
        in_len = n // 4
        xs = x[:, :, :in_len]
        rect = get_mxu_ntt(spec, n, in_len)
        padded = jnp.pad(xs, [(0, 0), (0, 0), (0, n - in_len)])
        ref_r = mxu(padded)
        t0 = time.time()
        got_r = rect(xs)
        jax.block_until_ready(got_r)
        log(f"2^{logn}: rect compile+run ({time.time()-t0:.1f}s)")
        t0 = time.time()
        got_r = rect(xs)
        jax.block_until_ready(got_r)
        t_rect = time.time() - t0
        equal_r = bool(jax.jit(lambda a, b: jnp.all(a == b))(got_r, ref_r))
        print(f"2^{logn} rect(in=2^{logn-2}): equal={equal_r} "
              f"rect={t_rect:.3f}s vs full-mxu={t_mxu:.3f}s "
              f"(a_nz={rect.plan.a_nz}, a={rect.plan.a}, b={rect.plan.b})",
              flush=True)
        assert equal_r, f"rect/full mismatch at n=2^{logn}"
    print("OK")


if __name__ == "__main__":
    main()
