"""Per-stage breakdown of the streaming commit at LCPC_BENCH_LOGN.

Times the encode+pack dispatch, the hasher update, the retained-codeword
write, and the finalize/Merkle separately so streaming-commit optimization
targets are measured, not guessed.  Run on the chip:
    python scripts/profile_streaming.py [--logn N] [--field ft255] [--packed]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int,
                    default=int(os.environ.get("LCPC_BENCH_LOGN", "23")))
    ap.add_argument("--field", default="ft255")
    ap.add_argument("--rho", default="1/4")
    ap.add_argument("--packed", action="store_true",
                    help="hold coefficients packed (the 2^27 corpus config)")
    ap.add_argument("--row-block", type=int, default=None)
    args = ap.parse_args()

    from lcpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lcpc_tpu.fields import FIELDS_BY_NAME
    from lcpc_tpu.encodings.ligero import LigeroEncoding
    from lcpc_tpu.core import streaming
    from lcpc_tpu.ops.limbs import get_ops
    from lcpc_tpu.utils import hbm as hbm_budget

    spec = FIELDS_BY_NAME[args.field]
    ops = get_ops(spec)
    n = 1 << args.logn
    rn, rd = (int(v) for v in args.rho.split("/"))
    enc = LigeroEncoding.new(spec, n, rho_num=rn, rho_den=rd)
    n_rows, n_per_row, n_cols = enc.get_dims(n)
    wpe = spec.w16 // 2

    # resident accounting mirrors commit_streaming
    coeff_bytes = n_rows * n_per_row * 4 * (wpe if args.packed else spec.w16)
    keep_bytes = n_rows * wpe * n_cols * 4
    keep = keep_bytes <= hbm_budget.keep_bytes_budget()
    total_words = 8 + n_rows * wpe
    n_chunks = max(1, (total_words + 255) // 256)
    resident = (coeff_bytes + (keep_bytes if keep else 0)
                + (n_chunks + 2) * 8 * n_cols * 4 + 256 * n_cols * 4)
    if hasattr(enc, "_stream_mxu_ntt") and enc._stream_mxu_ntt() is not None:
        resident += hbm_budget.mxu_stream_bytes()
    rb = args.row_block or streaming._row_block_for(
        spec, n_rows, n_cols, None, resident)
    log(f"device={jax.devices()[0]} N=2^{args.logn} dims {n_rows}x{n_per_row}"
        f"->{n_cols} row_block={rb} packed={args.packed} keep={keep} "
        f"resident={resident/2**30:.2f}GiB")

    key = jax.random.PRNGKey(0)
    if args.packed:
        chunk = min(n, 1 << 24)

        def gen(k, buf, i):
            raw = jax.random.bits(
                k, (ops.w, chunk), dtype=jnp.uint32) & jnp.uint32(0xFFFF)
            m = ops.to_mont(raw)
            w = m[0::2] | (m[1::2] << jnp.uint32(16))
            return jax.lax.dynamic_update_slice(buf, w, (0, i))

        gen_jit = jax.jit(gen, donate_argnums=1)
        coeffs = jnp.zeros((wpe, n), jnp.uint32)
        for i in range(0, n, chunk):
            coeffs = gen_jit(jax.random.fold_in(key, i), coeffs, i)
    else:
        raw = jax.random.bits(key, (ops.w, n), dtype=jnp.uint32) & jnp.uint32(0xFFFF)
        coeffs = ops.to_mont(raw)
    jax.block_until_ready(coeffs)
    mat = coeffs.reshape(coeffs.shape[0], n_rows, n_per_row)

    encode_pack = (streaming._encode_pack_packed_fn(enc) if args.packed
                   else streaming._encode_pack_fn(enc))

    blocks = list(range(0, n_rows, rb))
    # warm up the (single) block shape
    jax.block_until_ready(encode_pack(mat[:, 0:min(rb, n_rows), :]))

    # stage 1: encode+pack alone (block results discarded, not retained —
    # measures pure encode throughput)
    t0 = time.time()
    for r0 in blocks:
        r1 = min(r0 + rb, n_rows)
        w = encode_pack(mat[:, r0:r1, :])
    jax.block_until_ready(w)
    t_encode = time.time() - t0
    log(f"encode+pack ({len(blocks)} blocks of {rb}): {t_encode:.3f}s")

    # stage 2: hasher updates alone (one block's words reused — residency-
    # safe at 2^27 where all blocks would be 16 GiB)
    hasher = streaming.StreamingColumnHasher(n_cols, total_words)
    wblk = encode_pack(mat[:, 0:rb, :])
    jax.block_until_ready(wblk)
    hasher.update(wblk)  # warm
    jax.block_until_ready((hasher.cv, hasher.chunk_cvs, hasher.buf))
    hasher = streaming.StreamingColumnHasher(n_cols, total_words)
    t0 = time.time()
    for _ in blocks:
        hasher.update(wblk)
    jax.block_until_ready((hasher.cv, hasher.chunk_cvs, hasher.buf))
    t_hash = time.time() - t0
    log(f"hash updates: {t_hash:.3f}s")

    t0 = time.time()
    leaves = hasher.finalize()
    jax.block_until_ready(leaves)
    log(f"finalize(chunk merge): {time.time() - t0:.3f}s")

    # stage 3: retained-codeword writes
    if keep:
        write = jax.jit(
            lambda buf, w, i: jax.lax.dynamic_update_slice(buf, w, (i, 0)),
            donate_argnums=0,
        )
        buf = jnp.zeros((n_rows * wpe, n_cols), jnp.uint32)
        buf = write(buf, wblk, 0)  # warm
        jax.block_until_ready(buf)
        t0 = time.time()
        for i in blocks:
            buf = write(buf, wblk, i * wpe)
        jax.block_until_ready(buf)
        log(f"retained-codeword writes: {time.time() - t0:.3f}s "
            f"({keep_bytes / 1e9:.2f} GB)")
        del buf

    # end to end for reference
    t0 = time.time()
    comm = streaming.commit_streaming(coeffs, enc)
    _ = comm.get_root()
    log(f"commit_streaming end-to-end (warm): {time.time() - t0:.3f}s")


if __name__ == "__main__":
    main()
