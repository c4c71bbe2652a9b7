"""Analytic field-operation counts for utilization reporting.

The corpus records wall/compute times; these counters turn them into
modular-multiply throughput (Mmul/s) so kernel-efficiency regressions are
visible between rounds without re-deriving the algebra.  Counts are the
ALGORITHMIC modmul counts of the reference's formulation (what a CPU
implementation would execute — lib.rs:622-688, 1004-1123, 832-1000,
encode.rs:36-110), independent of how the TPU kernels factor the work
(the MXU digit convolutions execute more int8 MACs than one modmul each;
that ratio is the kernel's business, the Mmul/s figure tracks end-to-end
efficiency at fixed algorithmic work).

Peak context for % figures: the measured single-dispatch VPU modmul rates
on one v5e chip (PARITY.md): 622 Mmul/s ft63, 97 Mmul/s ft255.  MXU-path
stages routinely exceed "100% of VPU peak" — that is the point of the MXU
kernels.
"""

from __future__ import annotations


# measured sustained VPU elementwise modmul rates, one v5e chip (Mmul/s);
# used only as the denominator of the vs_vpu_peak column
VPU_PEAK_MMUL_S = {"ft63": 622e6, "ft127": 310e6, "ft191": 150e6,
                   "ft255": 97e6}


def ligero_encode_modmuls(enc, n_rows: int) -> int:
    """Radix-2 NTT butterflies: one modmul each, (n/2)*log2(n) per row.

    The production kernels skip stages whose inputs are known zero
    (rectangular plans encode only n_per_row live inputs), but the
    algorithmic count stays the reference's full-length fft_io
    (lcpc-ligero-pc/src/lib.rs:162-164): comparable across rounds and
    against CPU baselines.
    """
    n = enc.n_cols
    return n_rows * (n // 2) * max(1, n.bit_length() - 1)


def sdig_encode_modmuls(enc, n_rows: int) -> int:
    """Expander encode: one modmul per sparse nonzero per row, plus the
    Vandermonde base case (encode.rs:36-110)."""
    nnz = sum(int(m.row_idx.shape[0]) for m in enc.precodes)
    nnz += sum(int(m.row_idx.shape[0]) for m in enc.postcodes)
    nb = enc.precodes[-1].n_out
    rs_len = enc.postcodes[-1].n_in
    return n_rows * (nnz + nb * rs_len)


def encode_modmuls(enc, n_rows: int) -> int:
    if hasattr(enc, "precodes"):
        return sdig_encode_modmuls(enc, n_rows)
    return ligero_encode_modmuls(enc, n_rows)


def commit_modmuls(enc, n_rows: int) -> int:
    """Commit = the row encodes (hashing is not field work)."""
    return encode_modmuls(enc, n_rows)


def prove_modmuls(enc, n_rows: int, n_per_row: int) -> int:
    """collapse_columns madds: (ndt degree tests + the eval row) x R x npr
    (lib.rs:1024-1068).  Column opening is a gather when the codeword is
    retained (0 modmuls); the direct-eval / re-encode fallbacks do extra
    kernel work that this algorithmic count deliberately excludes.
    """
    ndt = enc.get_n_degree_tests()
    return (ndt + 1) * n_rows * n_per_row


def verify_modmuls(enc, n_rows: int) -> int:
    """(ndt+1) row encodes + per-opened-column madds (lib.rs:832-1000)."""
    ndt = enc.get_n_degree_tests()
    k = enc.get_n_col_opens()
    return (ndt + 1) * (encode_modmuls(enc, 1) + k * n_rows)


def util_line(stage: str, lgl: int, modmuls: int, seconds: float,
              field_name: str) -> str:
    """One `#util` corpus line: Mmul/s and share of the VPU elementwise
    peak (MXU stages legitimately exceed 1.0)."""
    rate = modmuls / seconds if seconds > 0 else float("inf")
    peak = VPU_PEAK_MMUL_S.get(field_name)
    vs = f" vs_vpu_peak={rate / peak:.2f}" if peak else ""
    return (f"#util {lgl}: {stage} mmul={modmuls} "
            f"mmul_per_s={rate / 1e6:.1f}M{vs}")
