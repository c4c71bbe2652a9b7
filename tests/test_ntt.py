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
