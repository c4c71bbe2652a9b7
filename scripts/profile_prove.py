"""Stage-by-stage prove/verify breakdown at LCPC_BENCH_LOGN (default 21).

Times every host and device stage of prove() and verify() on the real chip
so the optimization targets are data, not guesses.  Run:
    python scripts/profile_prove.py [--enc ligero|brakedown] [--logn N]
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
    ap.add_argument("--enc", default="ligero", choices=["ligero", "brakedown"])
    ap.add_argument("--logn", type=int,
                    default=int(os.environ.get("LCPC_BENCH_LOGN", "21")))
    ap.add_argument("--field", default=os.environ.get("LCPC_BENCH_FIELD", "ft255"))
    args = ap.parse_args()

    from lcpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lcpc_tpu.fields import FIELDS_BY_NAME
    from lcpc_tpu.encodings.ligero import LigeroEncoding
    from lcpc_tpu.encodings.brakedown import SdigEncoding
    from lcpc_tpu.core import protocol
    from lcpc_tpu.ops.limbs import get_ops
    from lcpc_tpu.fs.merlin import Transcript
    from lcpc_tpu.fs.chacha import ChaCha20Rng
    from lcpc_tpu.fs.sampling import field_random_vec, uniform_indices

    spec = FIELDS_BY_NAME[args.field]
    ops = get_ops(spec)
    n = 1 << args.logn

    if args.enc == "ligero":
        enc = LigeroEncoding.new(spec, n, rho_num=1, rho_den=4)
    else:
        enc = SdigEncoding.new(spec, n, seed=0)
    n_rows, n_per_row, n_cols = enc.get_dims(n)
    log(f"enc={args.enc} dims: {n_rows} x {n_per_row} -> {n_cols}; "
        f"n_col_opens={enc.get_n_col_opens()} ndt={enc.get_n_degree_tests()}")

    rng0 = np.random.default_rng(0)
    raw = rng0.integers(0, 1 << 16, (ops.w, n), dtype=np.uint32)
    coeffs = ops.to_mont(jax.device_put(raw))
    jax.block_until_ready(coeffs)

    comm = protocol.commit(coeffs, enc)
    jax.block_until_ready(comm.comm)

    x = 7
    outer = [pow(x, i * n_per_row, spec.p) for i in range(n_rows)]
    ndt = enc.get_n_degree_tests()

    # one full prove to warm compiles
    tr = Transcript(b"t")
    tr.append_message(b"polycommit", comm.get_root())
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    comm.prove(outer, tr)

    # --- staged prove ---------------------------------------------------------
    for it in range(2):
        log(f"--- prove iteration {it} ---")
        tr = Transcript(b"t")
        tr.append_message(b"polycommit", comm.get_root())
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))

        t0 = time.perf_counter()
        outer_limbs = ops.encode_host(outer)
        rows = eval_rows = None
        p_random_rows = []
        for i in range(ndt):
            key = tr.challenge_bytes(enc.LABEL_DT, 32)
            rng = ChaCha20Rng(key)
            rand_tensor = field_random_vec(spec, rng, comm.n_rows)
            t1 = time.perf_counter(); log(f"challenge+field_random_vec: {(t1-t0)*1e3:.2f} ms")

            t = ops.encode_host(rand_tensor)
            t2 = time.perf_counter(); log(f"encode_host tensors: {(t2-t1)*1e3:.2f} ms")

            if i == ndt - 1:
                ts = np.stack([t, outer_limbs], axis=1)
            else:
                ts = t[:, None, :]
            ts_dev = jnp.asarray(ts)
            words_dev = ops.collapse_words(ts_dev, comm.coeffs)
            jax.block_until_ready(words_dev)
            t3 = time.perf_counter(); log(f"collapse dispatch+compute: {(t3-t2)*1e3:.2f} ms")

            words = np.asarray(words_dev)
            t4 = time.perf_counter(); log(f"collapse host pull ({words.nbytes} B): {(t4-t3)*1e3:.2f} ms")

            rows = protocol._words_to_repr_rows(words[0])
            if i == ndt - 1:
                eval_rows = protocol._words_to_repr_rows(words[1])
            t5 = time.perf_counter(); log(f"words->repr rows: {(t5-t4)*1e3:.2f} ms")

            tr.append_elements(enc.LABEL_PR, rows)
            p_random_rows.append(rows)
            t6 = time.perf_counter(); log(f"append_elements PR ({rows.shape[0]} rows): {(t6-t5)*1e3:.2f} ms")
            t0 = t6

        tr.append_elements(enc.LABEL_PE, eval_rows)
        t8 = time.perf_counter(); log(f"append PE: {(t8-t0)*1e3:.2f} ms")

        n_col_opens = enc.get_n_col_opens()
        key = tr.challenge_bytes(enc.LABEL_CO, 32)
        cols_rng = ChaCha20Rng(key)
        cols_to_open = uniform_indices(comm.n_cols, cols_rng, n_col_opens)
        t9 = time.perf_counter(); log(f"column challenge+sampling ({n_col_opens}): {(t9-t8)*1e3:.2f} ms")

        # open_columns, staged
        col_idx = jnp.asarray(np.asarray(cols_to_open, dtype=np.int32))
        path_idx = protocol.path_node_indices(comm.n_cols, cols_to_open)
        uniq, inv = np.unique(path_idx.reshape(-1), return_inverse=True)
        t9b = time.perf_counter(); log(f"  open: path idx + unique ({uniq.size} uniq): {(t9b-t9)*1e3:.2f} ms")
        packed, path_digs = protocol._gather_open(
            comm.comm, comm.hashes_dev, col_idx, jnp.asarray(uniq.astype(np.int32))
        )
        jax.block_until_ready((packed, path_digs))
        t9c = time.perf_counter(); log(f"  open: gather dispatch+compute: {(t9c-t9b)*1e3:.2f} ms")
        packed, path_digs = jax.device_get((packed, path_digs))
        nbytes = packed.nbytes + path_digs.nbytes
        t9d = time.perf_counter(); log(f"  open: host pull ({nbytes} B): {(t9d-t9c)*1e3:.2f} ms")
        columns = protocol._columns_from_parts(
            np.asarray(packed), np.asarray(path_digs), inv,
            len(cols_to_open), path_idx.shape[1],
        )
        t10 = time.perf_counter(); log(f"  open: assemble batched columns: {(t10-t9d)*1e3:.2f} ms")
        log(f"PROVE TOTAL: {(t10-t0)*1e3:.2f} ms (+ earlier stages)")

    pf = protocol.LcEvalProof(
        n_cols=comm.n_cols, p_eval_rows=eval_rows,
        p_random_rows=p_random_rows, columns_batched=columns,
    )
    inner = [pow(x, i, spec.p) for i in range(n_per_row)]
    root = comm.get_root()

    # warm verify compiles
    tr = Transcript(b"t")
    tr.append_message(b"polycommit", root)
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    protocol.verify(root, outer, inner, pf, enc, tr)

    # --- staged verify ---------------------------------------------------------
    for it in range(2):
        log(f"--- verify iteration {it} ---")
        tr = Transcript(b"t")
        tr.append_message(b"polycommit", root)
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))

        t0 = time.perf_counter()
        p_random_rows_v = [pf.p_random_as_rows(spec, i) for i in range(ndt)]
        p_eval_rows_v = pf.p_eval_as_rows(spec)
        t1 = time.perf_counter(); log(f"rows views: {(t1-t0)*1e3:.2f} ms")
        for rows_i in p_random_rows_v:
            protocol._rows_lt_p(spec, rows_i)
        protocol._rows_lt_p(spec, p_eval_rows_v)
        t2 = time.perf_counter(); log(f"range checks: {(t2-t1)*1e3:.2f} ms")

        rand_tensors = []
        for i in range(ndt):
            key = tr.challenge_bytes(enc.LABEL_DT, 32)
            rng = ChaCha20Rng(key)
            rand_tensors.append(field_random_vec(spec, rng, n_rows))
            tr.append_elements(enc.LABEL_PR, p_random_rows_v[i])
        tr.append_elements(enc.LABEL_PE, p_eval_rows_v)
        key = tr.challenge_bytes(enc.LABEL_CO, 32)
        cols_rng = ChaCha20Rng(key)
        cols_to_open_v = uniform_indices(n_cols, cols_rng, enc.get_n_col_opens())
        t3 = time.perf_counter(); log(f"FS re-derive (tensors+cols): {(t3-t2)*1e3:.2f} ms")

        rows_w = np.stack(
            [np.ascontiguousarray(r).view("<u4") for r in p_random_rows_v]
            + [np.ascontiguousarray(p_eval_rows_v).view("<u4")], axis=0)
        ts = np.stack(
            [ops.encode_host(t) for t in rand_tensors] + [ops.encode_host(outer)],
            axis=1)
        t4 = time.perf_counter(); log(f"rows_w + ts build: {(t4-t3)*1e3:.2f} ms")

        batched = pf.columns_batched()
        col_w = batched.col_w
        t5 = time.perf_counter(); log(f"column batched view ({col_w.nbytes} B): {(t5-t4)*1e3:.2f} ms")

        path_len = batched.paths.shape[1]
        from lcpc_tpu.ops import blake3_jax
        col_bits = np.asarray(cols_to_open_v, dtype=np.int64)
        flat = np.ascontiguousarray(batched.paths).reshape(-1, 32)
        uniq_v, inv = np.unique(
            flat.view([("v", "V32")]).reshape(-1), return_inverse=True)
        uniq_bytes = np.ascontiguousarray(uniq_v.view(np.uint8)).reshape(-1, 32)
        uniq_sibs = blake3_jax.bytes_to_digests(uniq_bytes)
        inv = np.ascontiguousarray(
            inv.reshape(col_w.shape[2], path_len).T
        ).astype(np.int32)
        bits = ((col_bits[None, :] >> np.arange(path_len)[:, None]) & 1).astype(bool)
        root_w = np.frombuffer(root, dtype="<u4").astype(np.uint32)
        t6 = time.perf_counter(); log(f"sibs dedup ({uniq_sibs.nbytes + inv.nbytes} B): {(t6-t5)*1e3:.2f} ms")

        enc_rows = protocol._rows_encode_fn(enc)(jnp.asarray(rows_w))
        t7 = time.perf_counter(); log(f"rows_encode dispatch: {(t7-t6)*1e3:.2f} ms")
        jax.block_until_ready(enc_rows)
        t7b = time.perf_counter(); log(f"rows_encode compute ({rows_w.nbytes} B up): {(t7b-t7)*1e3:.2f} ms")

        idx = np.asarray(cols_to_open_v, dtype=np.int32)
        flags = protocol._verify_core_fn(ops)(
            enc_rows, jnp.asarray(ts), jnp.asarray(col_w), jnp.asarray(idx),
            jnp.asarray(uniq_sibs), jnp.asarray(inv), jnp.asarray(bits),
            jnp.asarray(root_w))
        jax.block_until_ready(flags)
        upl = col_w.nbytes + uniq_sibs.nbytes + inv.nbytes + ts.nbytes
        t8 = time.perf_counter(); log(f"verify core ({upl} B up): {(t8-t7b)*1e3:.2f} ms")

        np.asarray(flags)
        acc = 0
        for t_v, e_v in zip(inner, protocol._repr_rows_to_ints(p_eval_rows_v)):
            acc = (acc + t_v * e_v) % spec.p
        t9 = time.perf_counter(); log(f"flags pull + eval dot: {(t9-t8)*1e3:.2f} ms")
        log(f"VERIFY TOTAL: {(t9-t0)*1e3:.2f} ms")

    log(f"verify result ok (eval={hex(acc)[:18]}...)")


if __name__ == "__main__":
    main()
