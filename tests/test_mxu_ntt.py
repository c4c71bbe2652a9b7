"""MXU int8-conv NTT vs the VPU ladder: bit-exact equivalence."""

import random

import numpy as np
import pytest

from lcpc_tpu.fields import FT63, FT255
from lcpc_tpu.ops.limbs import get_ops
from lcpc_tpu.ops.ntt import get_ntt
from lcpc_tpu.ops.mxu_ntt import get_mxu_ntt

_CASES = [(FT63, 16), (FT63, 256), (FT255, 64)]


@pytest.mark.parametrize(
    "spec,n", _CASES, ids=[f"{s.name}-{n}" for s, n in _CASES]
)
def test_mxu_matches_vpu(spec, n):
    rng = random.Random(5)
    ops = get_ops(spec)
    rows = 2
    mats = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(rows)]
    x = np.stack([ops.encode_host(r) for r in mats], axis=1)
    ref = get_ntt(spec, n)(np.asarray(x))
    got = get_mxu_ntt(spec, n)(np.asarray(x))
    assert ops.decode_host(got) == ops.decode_host(ref)


def test_mxu_plan_bounds():
    # the extended radix must guarantee a single conditional subtract
    from lcpc_tpu.ops.mxu_ntt import MxuNttPlan

    for spec, n in [(FT63, 1024), (FT255, 65536)]:
        plan = MxuNttPlan(spec, n)
        r7 = 1 << (7 * plan.w7r)
        assert plan.a * spec.p * spec.p // r7 < spec.p
        assert plan.a * plan.b == n
