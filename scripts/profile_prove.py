"""Stage-by-stage prove/verify breakdown at LCPC_BENCH_LOGN (default 21).

Times every host and device stage of prove() on the real chip so the
optimization targets are data, not guesses.  Run:
    python scripts/profile_prove.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from lcpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lcpc_tpu.fields import FIELDS_BY_NAME
    from lcpc_tpu.encodings.ligero import LigeroEncoding
    from lcpc_tpu.core import protocol
    from lcpc_tpu.ops.limbs import get_ops
    from lcpc_tpu.fs.merlin import Transcript
    from lcpc_tpu.fs.chacha import ChaCha20Rng
    from lcpc_tpu.fs.sampling import field_random_vec, uniform_indices

    logn = int(os.environ.get("LCPC_BENCH_LOGN", "21"))
    field = os.environ.get("LCPC_BENCH_FIELD", "ft255")
    spec = FIELDS_BY_NAME[field]
    ops = get_ops(spec)
    n = 1 << logn

    enc = LigeroEncoding.new(spec, n, rho_num=1, rho_den=4)
    n_rows, n_per_row, n_cols = enc.get_dims(n)
    log(f"dims: {n_rows} x {n_per_row} -> {n_cols}")

    rng0 = np.random.default_rng(0)
    raw = rng0.integers(0, 1 << 16, (ops.w, n), dtype=np.uint32)
    coeffs = ops.to_mont(jax.device_put(raw))
    jax.block_until_ready(coeffs)

    comm = protocol.commit(coeffs, enc)
    jax.block_until_ready(comm.comm)

    x = 7
    outer = [pow(x, i * n_per_row, spec.p) for i in range(n_rows)]

    # one full prove to warm compiles
    tr = Transcript(b"t")
    tr.append_message(b"polycommit", comm.get_root())
    tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
    comm.prove(outer, tr)

    # --- staged run -----------------------------------------------------------
    for it in range(2):
        log(f"--- iteration {it} ---")
        tr = Transcript(b"t")
        tr.append_message(b"polycommit", comm.get_root())
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))

        t0 = time.perf_counter()
        key = tr.challenge_bytes(enc.LABEL_DT, 32)
        rng = ChaCha20Rng(key)
        rand_tensor = field_random_vec(spec, rng, comm.n_rows)
        t1 = time.perf_counter(); log(f"challenge+field_random_vec: {(t1-t0)*1e3:.2f} ms")

        t = ops.encode_host(rand_tensor)
        outer_limbs = ops.encode_host(outer)
        t2 = time.perf_counter(); log(f"encode_host tensors: {(t2-t1)*1e3:.2f} ms")

        ts = np.stack([t, outer_limbs], axis=1)
        ts_dev = jnp.asarray(ts)
        words_dev = ops.collapse_words(ts_dev, comm.coeffs)
        jax.block_until_ready(words_dev)
        t3 = time.perf_counter(); log(f"collapse dispatch+compute: {(t3-t2)*1e3:.2f} ms")

        words = np.asarray(words_dev)
        t4 = time.perf_counter(); log(f"collapse host pull ({words.nbytes} B): {(t4-t3)*1e3:.2f} ms")

        rows = protocol._words_to_repr_rows(words[0])
        eval_rows = protocol._words_to_repr_rows(words[1])
        t5 = time.perf_counter(); log(f"words->repr rows: {(t5-t4)*1e3:.2f} ms")

        tr.append_elements(enc.LABEL_PR, rows)
        t6 = time.perf_counter(); log(f"append_elements PR ({rows.shape[0]} rows): {(t6-t5)*1e3:.2f} ms")

        p_random = protocol._repr_rows_to_ints(rows)
        t7 = time.perf_counter(); log(f"repr_rows_to_ints PR: {(t7-t6)*1e3:.2f} ms")

        tr.append_elements(enc.LABEL_PE, eval_rows)
        p_eval = protocol._repr_rows_to_ints(eval_rows)
        t8 = time.perf_counter(); log(f"append PE + to_ints: {(t8-t7)*1e3:.2f} ms")

        n_col_opens = enc.get_n_col_opens()
        key = tr.challenge_bytes(enc.LABEL_CO, 32)
        cols_rng = ChaCha20Rng(key)
        cols_to_open = uniform_indices(comm.n_cols, cols_rng, n_col_opens)
        t9 = time.perf_counter(); log(f"column challenge+sampling ({n_col_opens}): {(t9-t8)*1e3:.2f} ms")

        columns = protocol._open_columns(comm, cols_to_open)
        t10 = time.perf_counter(); log(f"open_columns: {(t10-t9)*1e3:.2f} ms")
        log(f"TOTAL: {(t10-t0)*1e3:.2f} ms")

    # --- verify timing ---------------------------------------------------------
    pf = protocol.LcEvalProof(
        n_cols=comm.n_cols, p_eval=p_eval, p_random_vec=[p_random],
        columns=columns,
    )
    inner = [pow(x, i, spec.p) for i in range(n_per_row)]
    root = comm.get_root()

    for it in range(3):
        tr = Transcript(b"t")
        tr.append_message(b"polycommit", root)
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
        t0 = time.perf_counter()
        res = protocol.verify(root, outer, inner, pf, enc, tr)
        t1 = time.perf_counter()
        log(f"verify[{it}]: {(t1-t0)*1e3:.2f} ms")

    want = 0
    for i, c in enumerate([int(v) for v in np.zeros(1)] if False else []):
        pass
    log(f"verify result ok (eval={hex(res)[:18]}...)")


if __name__ == "__main__":
    main()
