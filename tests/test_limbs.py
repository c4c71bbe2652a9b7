"""Device limb arithmetic vs host Python-int twins (the serial-twin pattern
from the reference's test strategy, lcpc-2d/src/tests.rs:137-165).

Arrays are limb-major: (W, n)."""

import random

import numpy as np
import pytest

from lcpc_tpu.fields import ALL_FIELDS
from lcpc_tpu.ops.limbs import get_ops


def _rand_vals(spec, n, seed):
    rng = random.Random(seed)
    vals = [0, 1, spec.p - 1, spec.p - 2]
    vals += [rng.randrange(spec.p) for _ in range(n - len(vals))]
    return vals


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_encode_decode_roundtrip(spec):
    ops = get_ops(spec)
    vals = _rand_vals(spec, 16, 0)
    arr = ops.encode_host(vals)
    assert arr.dtype == np.uint32 and arr.shape == (spec.w16, 16)
    assert ops.decode_host(arr) == vals


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_add_sub_mul_vs_host(spec):
    ops = get_ops(spec)
    n = 64
    a_vals = _rand_vals(spec, n, 1)
    b_vals = _rand_vals(spec, n, 2)
    a = ops.encode_host(a_vals)
    b = ops.encode_host(b_vals)

    got_add = ops.decode_host(ops.add(a, b))
    got_sub = ops.decode_host(ops.sub(a, b))
    got_mul = ops.decode_host(ops.mul(a, b))

    for i in range(n):
        assert got_add[i] == spec.add(a_vals[i], b_vals[i]), i
        assert got_sub[i] == spec.sub(a_vals[i], b_vals[i]), i
        assert got_mul[i] == spec.mul(a_vals[i], b_vals[i]), i


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_to_from_mont_device(spec):
    ops = get_ops(spec)
    vals = _rand_vals(spec, 32, 3)
    canon = ops.encode_host(vals, to_mont=False)
    mont = ops.to_mont(canon)
    back = ops.from_mont(mont)
    assert ops.decode_host(back, from_mont=False) == vals
    # to_mont also fully reduces unreduced (< 2^(16W)) inputs
    big = np.full((spec.w16, 2), 0xFFFF, dtype=np.uint32)  # value 2^(16W)-1
    got = ops.decode_host(ops.to_mont(big))
    assert got == [((1 << (16 * spec.w16)) - 1) % spec.p] * 2


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_sum_and_dot(spec):
    ops = get_ops(spec)
    n = 9  # odd length exercises the tree tail
    a_vals = _rand_vals(spec, n, 4)
    b_vals = _rand_vals(spec, n, 5)
    a = ops.encode_host(a_vals)
    b = ops.encode_host(b_vals)
    got_sum = ops.decode_host(ops.sum(a, axis=1))[0]
    assert got_sum == sum(a_vals) % spec.p
    got_dot = ops.decode_host(ops.dot_mont(a, b, axis=1))[0]
    want = sum(av * bv for av, bv in zip(a_vals, b_vals)) % spec.p
    assert got_dot == want


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_neg_and_identities(spec):
    ops = get_ops(spec)
    vals = _rand_vals(spec, 16, 6)
    a = ops.encode_host(vals)
    zero = ops.decode_host(ops.add(a, ops.neg(a)))
    assert zero == [0] * 16
    one = ops.encode_host([1] * 16)
    assert ops.decode_host(ops.mul(a, one)) == vals
