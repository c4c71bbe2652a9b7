"""Benchmark sweep in the reference's output format (scripts/microbench.sh).

Emits `loglen: commit_ns` (rough_bench) and `loglen: prove_ns verify_ns
proof_bytes` (prove_verify_size_bench) lines so results are directly
comparable with doc/benchmark-results in the reference repo.

Usage:
    python scripts/microbench.py [--enc ligero|brakedown] [--field ft255]
        [--rho 1/4] [--min 13] [--max 21] [--step 2] [--iters 3] [--pvs]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--enc", default="ligero", choices=["ligero", "brakedown"])
    ap.add_argument("--field", default="ft255")
    ap.add_argument("--rho", default="1/4")
    ap.add_argument("--min", type=int, default=13)
    ap.add_argument("--max", type=int, default=21)
    ap.add_argument("--step", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--pvs", action="store_true",
                    help="also run prove/verify/size lines")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--stream-from", type=int, default=None,
                    help="use the streaming commit path for logn >= this "
                         "(bounds the encode's HBM temporaries); default 23 "
                         "for ligero (4x codeword expansion at rho=1/4), 26 "
                         "for brakedown (~1.6x expansion fits HBM longer, "
                         "and its streaming ladder is slow to compile)")
    ap.add_argument("--packed-from", type=int, default=27,
                    help="hold coefficients packed (W/2 u32 words, half the "
                         "resident bytes) for logn >= this; needs the "
                         "streaming path")
    ap.add_argument("--seeded-from", type=int, default=29,
                    help="for logn >= this, coefficients come from a "
                         "SeededCoeffSource (regenerated on device per "
                         "block, zero resident bytes) — the only way 2^29 "
                         "ft255 fits a 16 GB chip; prove regenerates them "
                         "for the collapse")
    ap.add_argument("--row-block", type=int, default=None,
                    help="override the auto row-block sizing (streaming)")
    ap.add_argument("--util", action="store_true",
                    help="emit #util lines (algorithmic Mmul/s per stage; "
                         "lcpc_tpu/utils/flops.py)")
    ap.add_argument("--spill", default="auto",
                    choices=["auto", "device", "host", "none"],
                    help="streaming codeword retention policy")
    args = ap.parse_args()

    from lcpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lcpc_tpu.fields import FIELDS_BY_NAME
    from lcpc_tpu.encodings.ligero import LigeroEncoding
    from lcpc_tpu.encodings.brakedown import SdigEncoding
    from lcpc_tpu.core import protocol, wire
    from lcpc_tpu.fs.merlin import Transcript
    from lcpc_tpu.ops.limbs import get_ops
    from lcpc_tpu.utils.tensors import univariate_tensors

    spec = FIELDS_BY_NAME[args.field]
    ops = get_ops(spec)
    rn, rd = (int(v) for v in args.rho.split("/"))

    print(f"# device={jax.devices()[0]} enc={args.enc} field={args.field}",
          file=sys.stderr, flush=True)

    com = pf = coeffs = None
    for lgl in range(args.min, args.max + 1, args.step):
        n = 1 << lgl
        # release the previous size's state BEFORE generating this one's:
        # a retained 2^25 codeword (4.3 GB) alive next to a 2^27 packed
        # coefficient buffer OOMs the chip
        com = pf = coeffs = None
        # random coefficients generated ON DEVICE (random 16-bit limbs
        # reduced by to_mont; distribution irrelevant for timing) — a host
        # upload at 2^25 is ~2.4 GB through the tunnel
        key = jax.random.PRNGKey(args.seed)
        if lgl >= args.seeded_from:
            # beyond-HBM sizes: nothing resident, blocks regenerate from
            # the seed inside commit/prove (core/coeffs.SeededCoeffSource)
            from lcpc_tpu.core.coeffs import SeededCoeffSource

            coeffs = SeededCoeffSource(spec, n, seed=args.seed)
        elif lgl >= args.packed_from:
            # packed resident form: generate valid Montgomery elements by
            # chunks and pack limb pairs into u32 words (half the bytes; the
            # 2^27 ft255 limb form alone would be 8 GB)
            wpe = ops.w // 2
            chunk = min(n, 1 << 24)
            assert n % chunk == 0

            def gen(k, buf, i):
                raw = jax.random.bits(
                    k, (ops.w, chunk), dtype=jnp.uint32
                ) & jnp.uint32(0xFFFF)
                m = ops.to_mont(raw)
                w = m[0::2] | (m[1::2] << jnp.uint32(16))
                return jax.lax.dynamic_update_slice(buf, w, (0, i))

            gen_jit = jax.jit(gen, donate_argnums=1)
            coeffs = jnp.zeros((wpe, n), jnp.uint32)
            for i in range(0, n, chunk):
                coeffs = gen_jit(jax.random.fold_in(key, i), coeffs, i)
        else:
            raw = jax.random.bits(
                key, (ops.w, n), dtype=jnp.uint32
            ) & jnp.uint32(0xFFFF)
            coeffs = ops.to_mont(raw)
        if isinstance(coeffs, jnp.ndarray):  # sources have nothing resident
            jax.block_until_ready(coeffs)
        if args.enc == "ligero":
            enc = LigeroEncoding.new(spec, n, rho_num=rn, rho_den=rd)
        else:
            enc = SdigEncoding.new(spec, n, seed=0)

        stream_from = args.stream_from
        if stream_from is None:
            stream_from = 23 if args.enc == "ligero" else 26
        # packed (W/2-word) and source-backed coefficients are only
        # understood by the streaming path; force the threshold down rather
        # than handing them to protocol.commit
        stream_from = min(stream_from, args.packed_from, args.seeded_from)
        if lgl >= stream_from:
            from lcpc_tpu.core import streaming

            def do_commit():
                # row block auto-sized from the HBM budget (streaming.py)
                return streaming.commit_streaming(
                    coeffs, enc, row_block=args.row_block, spill=args.spill
                )
        else:

            def do_commit():
                return protocol.commit(coeffs, enc)

        # warm-up (compiles)
        com = do_commit()
        _ = com.get_root()
        times = []
        for _ in range(args.iters):
            # release the previous commit BEFORE the next one: its retained
            # codeword (~4 GB at 2^25) would otherwise be live alongside the
            # new commit's, doubling resident HBM and OOMing large sizes
            com = None
            t0 = time.time()
            com = do_commit()
            _ = com.get_root()
            times.append(time.time() - t0)
        commit_ns = int(sorted(times)[len(times) // 2] * 1e9)
        print(f"{lgl}: {commit_ns}", flush=True)
        if args.util:
            from lcpc_tpu.utils import flops

            print(flops.util_line(
                "commit", lgl, flops.commit_modmuls(enc, com.get_n_rows()),
                commit_ns * 1e-9, args.field,
            ), flush=True)

        if args.pvs:
            outer, inner = univariate_tensors(
                spec, 7, com.get_n_per_row(), com.get_n_rows()
            )

            def preamble():
                tr = Transcript(b"test transcript")
                tr.append_message(b"polycommit", com.get_root())
                tr.append_message(
                    b"ncols", enc.get_n_col_opens().to_bytes(8, "big")
                )
                return tr

            # median-of-3 (single-shot lines let one retrace/compile
            # contaminate the corpus — a 6x verify outlier at 2^17 did)
            from lcpc_tpu.utils import linktime

            # wall times from UNMEASURED runs (link measurement makes the
            # transfers synchronous, which costs overlap at small sizes);
            # compute-only twins from separate measured runs
            pf = com.prove(outer, preamble())  # warm-up
            p_times, p_comp = [], []
            for _ in range(3):
                t0 = time.time()
                pf = com.prove(outer, preamble())
                p_times.append(time.time() - t0)
            for _ in range(3):
                t0 = time.time()
                with linktime.measure() as lm:
                    pf = com.prove(outer, preamble())
                p_comp.append(time.time() - t0 - lm.ns * 1e-9)
            prove_ns = int(sorted(p_times)[1] * 1e9)
            blob = wire.serialize_proof(spec, pf)
            pf.verify(com.get_root(), outer, inner, enc, preamble())  # warm
            v_times, v_comp = [], []
            for _ in range(3):
                t0 = time.time()
                pf.verify(com.get_root(), outer, inner, enc, preamble())
                v_times.append(time.time() - t0)
            for _ in range(3):
                t0 = time.time()
                with linktime.measure() as lm:
                    pf.verify(com.get_root(), outer, inner, enc, preamble())
                v_comp.append(time.time() - t0 - lm.ns * 1e-9)
            verify_ns = int(sorted(v_times)[1] * 1e9)
            print(f"{lgl}: {prove_ns} {verify_ns} {len(blob)}", flush=True)
            # compute-only twins: wall minus the measured host<->device
            # transfer time (the ~30 MB/s tunnel's share; see
            # benchmarks/README.md) — what a PCIe-attached host would see
            print(f"#compute {lgl}: {int(sorted(p_comp)[1] * 1e9)} "
                  f"{int(sorted(v_comp)[1] * 1e9)} {len(blob)}", flush=True)
            if args.util:
                from lcpc_tpu.utils import flops

                # rates over the compute-only medians: kernel efficiency,
                # not the tunnel's share
                print(flops.util_line(
                    "prove", lgl,
                    flops.prove_modmuls(enc, com.get_n_rows(),
                                        com.get_n_per_row()),
                    sorted(p_comp)[1], args.field,
                ), flush=True)
                print(flops.util_line(
                    "verify", lgl,
                    flops.verify_modmuls(enc, com.get_n_rows()),
                    sorted(v_comp)[1], args.field,
                ), flush=True)


if __name__ == "__main__":
    main()
