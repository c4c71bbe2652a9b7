"""Per-stage breakdown of the streaming commit at LCPC_BENCH_LOGN.

Times the encode+pack dispatch, the hasher update, the retained-codeword
write, and the finalize/Merkle separately so streaming-commit optimization
targets are measured, not guessed.  Run on the chip:
    python scripts/profile_streaming.py [--logn N] [--field ft255]
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
    args = ap.parse_args()

    from lcpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lcpc_tpu.fields import FIELDS_BY_NAME
    from lcpc_tpu.encodings.ligero import LigeroEncoding
    from lcpc_tpu.core import streaming
    from lcpc_tpu.ops.limbs import get_ops

    spec = FIELDS_BY_NAME[args.field]
    ops = get_ops(spec)
    n = 1 << args.logn
    rn, rd = (int(v) for v in args.rho.split("/"))
    enc = LigeroEncoding.new(spec, n, rho_num=rn, rho_den=rd)
    n_rows, n_per_row, n_cols = enc.get_dims(n)
    rb = streaming._row_block_for(spec, n_rows, n_cols, None)
    log(f"device={jax.devices()[0]} N=2^{args.logn} dims {n_rows}x{n_per_row}"
        f"->{n_cols} row_block={rb}")

    key = jax.random.PRNGKey(0)
    raw = jax.random.bits(key, (ops.w, n), dtype=jnp.uint32) & jnp.uint32(0xFFFF)
    coeffs = ops.to_mont(raw)
    jax.block_until_ready(coeffs)
    mat = coeffs.reshape(ops.w, n_rows, n_per_row)

    wpe = spec.w16 // 2
    encode_pack = streaming._encode_pack_fn(enc)

    # warm up all block shapes
    blocks = list(range(0, n_rows, rb))
    for r0 in blocks:
        r1 = min(r0 + rb, n_rows)
        jax.block_until_ready(encode_pack(mat[:, r0:r1, :]))

    # stage 1: encode+pack alone
    t0 = time.time()
    words_blocks = []
    for r0 in blocks:
        r1 = min(r0 + rb, n_rows)
        words_blocks.append(encode_pack(mat[:, r0:r1, :]))
    jax.block_until_ready(words_blocks)
    t_encode = time.time() - t0
    log(f"encode+pack ({len(blocks)} blocks): {t_encode:.3f}s")

    # stage 2: hasher updates alone (inputs already resident)
    total_words = 8 + n_rows * wpe
    hasher = streaming.StreamingColumnHasher(n_cols, total_words)
    for w in words_blocks:  # warm the update shapes
        hasher.update(w)
    leaves_warm = hasher.finalize()
    jax.block_until_ready(leaves_warm)
    hasher = streaming.StreamingColumnHasher(n_cols, total_words)
    t0 = time.time()
    for w in words_blocks:
        hasher.update(w)
    jax.block_until_ready((hasher.cv, hasher.chunk_cvs, hasher.buf))
    t_hash = time.time() - t0
    log(f"hash updates: {t_hash:.3f}s")

    t0 = time.time()
    leaves = hasher.finalize()
    jax.block_until_ready(leaves)
    t_fin = time.time() - t0
    log(f"finalize(chunk merge): {t_fin:.3f}s")

    # stage 3: retained-codeword writes
    keep_bytes = n_rows * wpe * n_cols * 4
    if keep_bytes <= int(os.environ.get("LCPC_STREAM_KEEP_BYTES", str(5 << 30))):
        write = jax.jit(
            lambda buf, w, i: jax.lax.dynamic_update_slice(buf, w, (i, 0)),
            donate_argnums=0,
        )
        buf = jnp.zeros((n_rows * wpe, n_cols), jnp.uint32)
        buf = write(buf, words_blocks[0], 0)  # warm
        jax.block_until_ready(buf)
        t0 = time.time()
        for i, w in zip(blocks, words_blocks):
            buf = write(buf, w, i * wpe)
        jax.block_until_ready(buf)
        log(f"retained-codeword writes: {time.time() - t0:.3f}s "
            f"({keep_bytes / 1e9:.2f} GB)")

    # end to end for reference
    t0 = time.time()
    comm = streaming.commit_streaming(coeffs, enc)
    _ = comm.get_root()
    log(f"commit_streaming end-to-end (warm): {time.time() - t0:.3f}s")


if __name__ == "__main__":
    main()
