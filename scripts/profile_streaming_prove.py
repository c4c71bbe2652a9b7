"""Per-stage breakdown of prove_streaming at LCPC_BENCH_LOGN (default 27).

The 2^27+ corpus configs hold packed resident coefficients with NO retained
codeword, so prove pays (a) the MXU collapse over the packed matrix and
(b) the direct MXU column evaluation; at 2^29 the coefficients are seeded
and regenerate per block on top.  This times every stage separately so the
optimization targets are measured, not guessed.  Run on the chip:
    python scripts/profile_streaming_prove.py [--logn N] [--seeded]
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
                    default=int(os.environ.get("LCPC_BENCH_LOGN", "27")))
    ap.add_argument("--field", default="ft255")
    ap.add_argument("--rho", default="1/4")
    ap.add_argument("--seeded", action="store_true",
                    help="SeededCoeffSource (the 2^29 corpus config)")
    ap.add_argument("--row-block", type=int, default=None)
    args = ap.parse_args()

    from lcpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lcpc_tpu.fields import FIELDS_BY_NAME
    from lcpc_tpu.encodings.ligero import LigeroEncoding
    from lcpc_tpu.core import streaming, protocol
    from lcpc_tpu.core.coeffs import SeededCoeffSource
    from lcpc_tpu.ops.limbs import get_ops
    from lcpc_tpu.ops import mxu_prove
    from lcpc_tpu.fs.merlin import Transcript
    from lcpc_tpu.fs.chacha import ChaCha20Rng
    from lcpc_tpu.fs.sampling import field_random_vec, uniform_indices
    from lcpc_tpu.utils.tensors import univariate_tensors

    spec = FIELDS_BY_NAME[args.field]
    ops = get_ops(spec)
    n = 1 << args.logn
    rn, rd = (int(v) for v in args.rho.split("/"))
    enc = LigeroEncoding.new(spec, n, rho_num=rn, rho_den=rd)
    n_rows, n_per_row, n_cols = enc.get_dims(n)
    wpe = spec.w16 // 2
    log(f"device={jax.devices()[0]} N=2^{args.logn} dims {n_rows}x{n_per_row}"
        f"->{n_cols} seeded={args.seeded}")

    key = jax.random.PRNGKey(0)
    if args.seeded:
        coeffs = SeededCoeffSource(spec, n, seed=0)
    else:
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
        jax.block_until_ready(coeffs)

    t0 = time.time()
    comm = streaming.commit_streaming(coeffs, enc)
    root = comm.get_root()
    log(f"commit (cold, incl compile): {time.time()-t0:.2f}s  "
        f"row_block={comm.row_block} words_dev={comm.words_dev is not None}")

    outer, inner = univariate_tensors(spec, 7, n_per_row, n_rows)

    def preamble():
        tr = Transcript(b"test transcript")
        tr.append_message(b"polycommit", root)
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
        return tr

    # one full prove to warm compiles
    t0 = time.time()
    comm.prove(outer, preamble())
    log(f"prove (cold, incl compile): {time.time()-t0:.2f}s")

    for it in range(2):
        log(f"--- staged prove iteration {it} ---")
        tr = preamble()
        ndt = enc.get_n_degree_tests()
        use_mxu = mxu_prove.mxu_prove_enabled(spec)
        mc = (mxu_prove.MxuCollapse(spec, comm.n_rows, packed=comm.packed)
              if use_mxu else None)
        outer_limbs = ops.encode_host(outer)
        T0 = time.time()
        for i in range(ndt):
            keyb = tr.challenge_bytes(enc.LABEL_DT, 32)
            rand_tensor = field_random_vec(spec, ChaCha20Rng(keyb), comm.n_rows)
            t = ops.encode_host(rand_tensor)
            t1 = time.time(); log(f"  FS challenge + tensors: {t1-T0:.3f}s")
            if i == ndt - 1:
                ts_ints = [rand_tensor, outer]
            else:
                ts_ints = [rand_tensor]
            prove_rb = streaming._prove_row_block(comm)
            if comm.coeffs is not None:
                words_dev = mc(ts_ints, comm.coeffs)
            else:
                mc_src = mxu_prove.MxuCollapse(spec, comm.n_rows, packed=False)
                words_dev = mc_src.collapse_source(
                    ts_ints, comm.source.block, comm.n_rows, prove_rb)
            jax.block_until_ready(words_dev)
            t2 = time.time(); log(f"  collapse dispatch+compute: {t2-t1:.3f}s")
            words = np.asarray(words_dev)
            t3 = time.time(); log(f"  collapse pull ({words.nbytes} B): {t3-t2:.3f}s")
            rows = protocol._words_to_repr_rows(words[0])
            tr.append_elements(enc.LABEL_PR, rows)
            if i == ndt - 1:
                eval_rows = protocol._words_to_repr_rows(words[1])
            T0 = time.time()
        tr.append_elements(enc.LABEL_PE, eval_rows)
        keyb = tr.challenge_bytes(enc.LABEL_CO, 32)
        cols_to_open = uniform_indices(
            comm.n_cols, ChaCha20Rng(keyb), enc.get_n_col_opens())
        t4 = time.time(); log(f"  FS append + column sampling: {t4-T0:.3f}s")

        idx = jnp.asarray(np.asarray(cols_to_open, dtype=np.int32))
        path_idx = protocol.path_node_indices(comm.n_cols, cols_to_open)
        uniq, inv = np.unique(path_idx.reshape(-1), return_inverse=True)
        path_digs = jnp.take(comm.hashes_dev, jnp.asarray(uniq), axis=1)
        t5 = time.time(); log(f"  path idx + dedup: {t5-t4:.3f}s")

        k = len(cols_to_open)
        if comm.coeffs is not None and comm.packed:
            get_block = lambda r0, r1: protocol._unpack_words_dev(
                comm.coeffs[:, r0:r1, :])
        elif comm.coeffs is not None:
            get_block = lambda r0, r1: comm.coeffs[:, r0:r1, :]
        else:
            get_block = comm.source.block
        ev = mxu_prove.MxuColumnEval(enc)
        t5a = time.time()
        ev.set_columns(cols_to_open)
        jax.block_until_ready((ev._k7, ev._s))
        t6 = time.time(); log(f"  v7 build (set_columns): {t6-t5a:.3f}s")

        rb = streaming._prove_row_block(comm)
        log(f"  prove_rb={rb}")
        buf = jnp.zeros((wpe, comm.n_rows, k), jnp.uint32)
        wr = jax.jit(
            lambda b, w, i: jax.lax.dynamic_update_slice(b, w, (0, i, 0)),
            donate_argnums=0)
        for r0 in range(0, comm.n_rows, rb):
            r1 = min(r0 + rb, comm.n_rows)
            buf = wr(buf, ev.eval_block(get_block(r0, r1)), r0)
        jax.block_until_ready(buf)
        t7 = time.time(); log(f"  column eval ({(comm.n_rows+rb-1)//rb} blocks"
                              f" of {rb}): {t7-t6:.3f}s")
        col_w = np.asarray(buf)
        t8 = time.time(); log(f"  column pull ({col_w.nbytes} B): {t8-t7:.3f}s")
        log(f"  STAGED PROVE TOTAL: {t8-(T0 if ndt==1 else t1):.3f}s")

    # isolate the eval_block contraction vs the per-block source
    log("--- kernel isolates ---")
    blk = get_block(0, min(rb, n_rows))
    jax.block_until_ready(blk)
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(get_block(0, min(rb, n_rows)))
    log(f"  get_block alone (x3): {time.time()-t0:.3f}s")
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(ev.eval_block(blk))
    log(f"  eval_block alone (x3, resident block): {time.time()-t0:.3f}s")
    if comm.coeffs is not None:
        tens = [outer, outer]
        t0 = time.time()
        jax.block_until_ready(mc(tens, comm.coeffs))
        log(f"  collapse alone (T=2): {time.time()-t0:.3f}s")


if __name__ == "__main__":
    main()
