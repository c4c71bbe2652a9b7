"""NTT vs slow-twin DFT, linearity, batch behavior, head/tail split."""

import random

import numpy as np
import pytest

from lcpc_tpu.fields import FT63, FT255, ALL_FIELDS
from lcpc_tpu.ops.limbs import get_ops
from lcpc_tpu.ops.ntt import get_ntt, ntt_host, ntt_reference_host


def test_host_fast_matches_reference():
    spec = FT63
    rng = random.Random(31)
    for n in [2, 16, 128]:
        coeffs = [rng.randrange(spec.p) for _ in range(n)]
        assert ntt_host(spec, coeffs) == ntt_reference_host(spec, coeffs)


_CASES = [(FT63, 2), (FT63, 8), (FT63, 64), (FT255, 8)]


@pytest.mark.parametrize(
    "spec,n", _CASES, ids=[f"{s.name}-{n}" for s, n in _CASES]
)
def test_ntt_matches_reference(spec, n):
    rng = random.Random(17)
    coeffs = [rng.randrange(spec.p) for _ in range(n)]
    ops = get_ops(spec)
    ntt = get_ntt(spec, n)
    got = ops.decode_host(ntt(ops.encode_host(coeffs)[:, None, :])[:, 0, :])
    assert got == ntt_reference_host(spec, coeffs)


def test_ntt_matches_reference_across_tail_split():
    # n = 512 > TAIL_C exercises both head and tail phases
    spec = FT63
    rng = random.Random(29)
    n = 512
    coeffs = [rng.randrange(spec.p) for _ in range(n)]
    ops = get_ops(spec)
    ntt = get_ntt(spec, n)
    got = ops.decode_host(ntt(ops.encode_host(coeffs)[:, None, :])[:, 0, :])
    assert got == ntt_reference_host(spec, coeffs)


@pytest.mark.parametrize("spec", [FT63], ids=lambda s: s.name)
def test_ntt_linearity_and_batch(spec):
    rng = random.Random(23)
    n = 32
    rows = 4
    ops = get_ops(spec)
    ntt = get_ntt(spec, n)
    mats = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(rows)]
    x = np.stack([ops.encode_host(r) for r in mats], axis=1)  # (W, rows, n)
    y = ntt(x)
    for r in range(rows):
        single = ntt(x[:, r : r + 1, :])[:, 0, :]
        assert ops.decode_host(y[:, r, :]) == ops.decode_host(single)
    s = ops.add(x[:, 0, :], x[:, 1, :])
    lhs = ops.decode_host(ntt(s[:, None, :])[:, 0, :])
    rhs = ops.decode_host(ops.add(y[:, 0, :], y[:, 1, :]))
    assert lhs == rhs


def test_ntt_constant_poly():
    # NTT of [c, 0, ..., 0] is c everywhere (evaluations of a constant)
    spec = FT63
    ops = get_ops(spec)
    n = 16
    ntt = get_ntt(spec, n)
    coeffs = [12345] + [0] * (n - 1)
    got = ops.decode_host(ntt(ops.encode_host(coeffs)[:, None, :])[:, 0, :])
    assert got == [12345] * n


# ---------------------------------------------------------------------------
# inverse NTT (ifft_oi semantics) + the reference's FFT-consistency identity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("spec", [FT63, FT255], ids=lambda s: s.name)
def test_intt_roundtrip_host(spec):
    from lcpc_tpu.ops.ntt import intt_host, ntt_host

    rng = random.Random(31)
    for n in (2, 8, 64, 256):
        coeffs = [rng.randrange(spec.p) for _ in range(n)]
        assert intt_host(spec, ntt_host(spec, coeffs)) == coeffs


@pytest.mark.parametrize("spec", [FT63, FT255], ids=lambda s: s.name)
def test_intt_device_matches_host(spec):
    from lcpc_tpu.ops.ntt import get_intt, intt_host

    rng = random.Random(32)
    n = 128
    rows = 3
    ops = get_ops(spec)
    intt = get_intt(spec, n)
    mats = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(rows)]
    x = np.stack([ops.encode_host(r) for r in mats], axis=1)
    y = intt(x)
    for r in range(rows):
        assert ops.decode_host(y[:, r, :]) == intt_host(spec, mats[r])


def test_intt_inverts_device_ntt():
    from lcpc_tpu.ops.ntt import get_intt

    spec = FT63
    ops = get_ops(spec)
    n = 256
    rng = random.Random(33)
    coeffs = [rng.randrange(spec.p) for _ in range(n)]
    x = ops.encode_host(coeffs)[:, None, :]
    back = get_intt(spec, n)(get_ntt(spec, n)(x))
    assert ops.decode_host(back[:, 0, :]) == coeffs


def test_fft_consistency_identity():
    """Port of the reference's commit() test (lcpc-2d/src/tests.rs:194-236):

    collapse-then-encode == encode-then-collapse-then-iFFT, with all
    coefficients above n_per_row zero — the strongest in-environment check
    that the NTT convention matches fffft's fft_io/ifft_oi pair.
    """
    from lcpc_tpu.core import protocol
    from lcpc_tpu.encodings.ligero import LigeroEncoding
    from lcpc_tpu.ops.ntt import get_intt
    from lcpc_tpu.utils.tensors import univariate_tensors, univariate_eval

    spec = FT63
    ops = get_ops(spec)
    rng = random.Random(34)
    length = 300
    coeffs = [rng.randrange(spec.p) for _ in range(length)]
    enc = LigeroEncoding.new(spec, length)
    comm = protocol.commit(coeffs, enc)

    x = rng.randrange(spec.p)
    outer, inner = univariate_tensors(spec, x, comm.n_per_row, comm.n_rows)
    eval1 = univariate_eval(spec, coeffs, x)

    # eval_outer (lib.rs:1177-1201): collapse the coefficient matrix
    outer_mont = ops.encode_host(outer)
    flat = ops.collapse_canon(
        np.asarray(outer_mont)[:, None, :], comm.coeffs
    )  # (W, 1, n_per_row) canonical
    coeffs_flattened = ops.decode_host(flat[:, 0, :], from_mont=False)
    eval2 = sum(c * r for c, r in zip(coeffs_flattened, inner)) % spec.p
    assert eval1 == eval2

    # eval_outer_fft (lib.rs:1229-1249): collapse the ENCODED matrix, iFFT it
    poly_fft_mont = ops.dot_mont(
        np.asarray(outer_mont)[:, :, None], comm.comm, axis=1
    )  # (W, n_cols) Montgomery, bit-reversed evaluation order
    back = get_intt(spec, comm.n_cols)(poly_fft_mont[:, None, :])
    poly = ops.decode_host(back[:, 0, :])
    assert all(v == 0 for v in poly[comm.n_per_row:]), (
        "high coefficients nonzero: NTT convention mismatch"
    )
    eval3 = sum(c * r for c, r in zip(poly[: comm.n_per_row], inner)) % spec.p
    assert eval2 == eval3


def test_fft_io_fixed_vectors():
    """Committed constants pinning the full convention chain: generator ->
    ROOT_OF_UNITY = g^t_odd -> w_n = ROOT^(2^(s-log n)) -> out[rev(k)] =
    sum_j x_j w_n^(jk) (fffft's documented fft_io contract: in-order input,
    "out-of-order" bit-reversed output, forward root).  A regression in any
    link (root derivation, reversal, stage order) breaks these exact values.
    """
    assert FT63.root_of_unity == 4256681863234029612
    assert FT63.s == 41 and FT63.t_odd == 2320443
    got = ntt_host(FT63, list(range(1, 17)))
    assert got == [
        136, 5102708120182849529, 2880931767225701037, 2221776352957148484,
        2430371459602828169, 3331492074848573905, 1771216045334275616,
        2672336660580021352, 3124238125812841050, 1736504793392815288,
        1770817141808650094, 4892167007888497716, 210541112294351805,
        3331890978374199427, 3366203326790034233, 1978469994370008471,
    ]

    assert FT255.root_of_unity == 0x5425e2a66fd9cbf775273db316b7e0c89a2e5ce2899cbfc2748b4ceb2108eb11
    got = ntt_host(FT255, list(range(1, 9)))
    assert got == [
        0x24,
        0x663c799b6e4d2900fda9df04b9575969ef73c79086595f3002a4f1fffffffffd,
        0x249de590a68a80f70186ead732f51337de45943ab5d813646a16630ba830d2b0,
        0x419e940ac7c2a809fc22f42d86624632112e3355d0814bcb988e8ef457cf2d49,
        0x66373e0b48b580f3ad6c466661ddb1ac7b896558b34512c8697a7b554f766e1d,
        0x494106b172aca9fb534b6e4cbd63ce2d30758aad3ec473306d573cc200eb3744,
        0x1cfb72e9fba07f05aa5e70b7fbf38b3cbefe3ce34794ebff954db53dff14c8b5,
        0x53b902597a80d503d989e5779a7bd73ea6237d3144c67992a76aab08991dc,
    ]
