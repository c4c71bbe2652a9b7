"""Benchmark driver: Ligero ft255 rho=1/4 commit on the real TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

vs_baseline compares against the reference's 64-core CPU numbers from
BASELINE.md (rough_bench commit times, 20210807_64c_255bit_ligero_dfl.txt);
values > 1 mean the TPU build is faster.  Details go to stderr.

Config via env: LCPC_BENCH_LOGN (default 25), LCPC_BENCH_FIELD (ft255),
LCPC_BENCH_STREAM_FROM (default 23: sizes >= this use the streaming commit —
the 2^25 ft255 codeword alone is ~10 GB, past what the plain path's
temporaries allow on a 16 GB chip).
"""

import json
import os
import sys
import time

import numpy as np


# reference 64-core commit times (seconds) for Ligero rho=1/4 ft255
BASELINE_64C = {13: 0.0149, 15: 0.0314, 17: 0.0949, 19: 0.245, 21: 0.646,
                23: 1.92, 25: 5.73, 27: 21.6, 29: 94.6}
# reference 64-core prove/verify (seconds), same files (_pvs)
BASELINE_PVS = {21: (0.0187, 0.0273), 23: (0.0735, 0.0447),
                25: (0.140, 0.0752), 27: (0.421, 0.136), 29: (1.513, 0.278)}
# reference 64-core Brakedown (SDIG Code3) commit times
# (20210807_64c_255bit_sdig.txt) and prove/verify (_pvs)
BASELINE_SDIG_64C = {13: 0.0118, 15: 0.0161, 17: 0.0243, 19: 0.0747,
                     21: 0.234, 23: 0.835, 25: 2.243, 27: 10.69, 29: 38.8}
BASELINE_SDIG_PVS = {19: (0.067, 0.120), 21: (0.105, 0.270),
                     23: (0.189, 0.558), 25: (0.281, 0.551),
                     27: (0.931, 2.371), 29: (2.047, 2.401)}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from lcpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    logn = int(os.environ.get("LCPC_BENCH_LOGN", "25"))
    try:
        result = _bench(logn)
    except Exception as e:  # large-N OOM safety: never leave the driver empty
        if logn <= 21:
            raise
        msg = str(e)
        is_oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
        if not is_oom:
            # a non-OOM failure at large N is a real regression: record it
            # in the JSON rather than demoting it to a clean 2^21 line
            raise
        log(f"2^{logn} OOM ({type(e).__name__}: {msg[:200]}); retrying at 2^21")
        result = _bench(21)
        result["failed_at"] = logn
    print(json.dumps(result))


def _bench(logn):
    import jax
    import jax.numpy as jnp

    from lcpc_tpu.fields import FIELDS_BY_NAME
    from lcpc_tpu.encodings.ligero import LigeroEncoding
    from lcpc_tpu.encodings.brakedown import SdigEncoding
    from lcpc_tpu.core import protocol, streaming
    from lcpc_tpu.ops.limbs import get_ops

    field = os.environ.get("LCPC_BENCH_FIELD", "ft255")
    enc_name = os.environ.get("LCPC_BENCH_ENC", "ligero")
    stream_default = "23" if enc_name == "ligero" else "26"
    stream_from = int(os.environ.get("LCPC_BENCH_STREAM_FROM", stream_default))
    spec = FIELDS_BY_NAME[field]
    ops = get_ops(spec)
    n = 1 << logn

    dev = jax.devices()[0]
    use_streaming = logn >= stream_from
    log(f"device: {dev}; enc={enc_name}; field={field}; N=2^{logn}; "
        f"path={'streaming' if use_streaming else 'plain'}")

    if enc_name == "ligero":
        enc = LigeroEncoding.new(spec, n, rho_num=1, rho_den=4)
    else:
        enc = SdigEncoding.new(spec, n, seed=0)
    n_rows, n_per_row, n_cols = enc.get_dims(n)
    log(f"dims: {n_rows} x {n_per_row} -> {n_cols}")

    # random coefficients generated ON DEVICE: random 16-bit limbs reduced
    # into the field by to_mont (distribution irrelevant for timing; a host
    # upload at 2^25 is ~2.4 GB through the tunnel)
    key = jax.random.PRNGKey(0)
    raw = jax.random.bits(key, (ops.w, n), dtype=jnp.uint32) & jnp.uint32(0xFFFF)
    coeffs = ops.to_mont(raw)
    jax.block_until_ready(coeffs)

    if use_streaming:
        def do_commit():
            return streaming.commit_streaming(coeffs, enc)
    else:
        def do_commit():
            return protocol.commit(coeffs, enc)

    # warm up compiles
    t0 = time.time()
    comm = do_commit()
    _ = comm.get_root()
    log(f"commit compile+1st: {time.time() - t0:.2f}s")

    times = []
    for _ in range(3):
        comm = None  # release the previous commit's retained codeword
        t0 = time.time()
        comm = do_commit()
        _ = comm.get_root()  # includes the host transfer of the root
        times.append(time.time() - t0)
    commit_s = sorted(times)[1]
    log(f"commit times: {[f'{t:.3f}' for t in times]} -> median {commit_s:.3f}s")

    # prove timing (stderr only for now)
    from lcpc_tpu.fs.merlin import Transcript

    x = 7
    outer = [pow(x, i * n_per_row, spec.p) for i in range(n_rows)]

    def run_prove():
        tr = Transcript(b"test transcript")
        tr.append_message(b"polycommit", comm.get_root())
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
        return comm.prove(outer, tr)

    base_pvs = (BASELINE_PVS if enc_name == "ligero"
                else BASELINE_SDIG_PVS).get(logn)
    t0 = time.time()
    pf = run_prove()
    log(f"prove compile+1st: {time.time() - t0:.3f}s")
    t0 = time.time()
    pf = run_prove()
    prove_s = time.time() - t0
    log(f"prove warm: {prove_s:.3f}s"
        + (f" (baseline 64c 2^{logn}: {base_pvs[0]}s)" if base_pvs else ""))

    inner = [pow(x, i, spec.p) for i in range(n_per_row)]
    root = comm.get_root()

    def run_verify(proof):
        tr = Transcript(b"test transcript")
        tr.append_message(b"polycommit", root)
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "big"))
        return protocol.verify(root, outer, inner, proof, enc, tr)

    t0 = time.time()
    run_verify(pf)
    log(f"verify compile+1st: {time.time() - t0:.3f}s")
    t0 = time.time()
    run_verify(pf)
    verify_s = time.time() - t0
    log(f"verify warm: {verify_s:.3f}s"
        + (f" (baseline 64c 2^{logn}: {base_pvs[1]}s)" if base_pvs else ""))

    from lcpc_tpu.core import wire

    t0 = time.time()
    blob = wire.serialize_proof(spec, pf)
    log(f"proof size: {len(blob)} bytes (serialize {time.time() - t0:.2f}s)")

    baseline = (BASELINE_64C if enc_name == "ligero"
                else BASELINE_SDIG_64C).get(logn)
    vs = (baseline / commit_s) if baseline else None
    metric = (f"ligero_{field}_rho1-4_commit_2^{logn}"
              if enc_name == "ligero"
              else f"sdig_{field}_commit_2^{logn}")
    return {
        "metric": metric,
        "value": round(commit_s, 4),
        "unit": "s",
        "vs_baseline": round(vs, 3) if vs else None,
    }


if __name__ == "__main__":
    main()
