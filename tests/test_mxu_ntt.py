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


def test_pick_ntt_falls_back_beyond_mxu_cap():
    # n > 2^20 exceeds the single-level contraction cap (A > 1024); the
    # encoding must pick the VPU ladder instead of crashing (VERDICT #9)
    from lcpc_tpu.ops.mxu_ntt import mxu_supported
    from lcpc_tpu.encodings.ligero import _pick_ntt
    from lcpc_tpu.ops.ntt import BatchedNtt
    from lcpc_tpu.fields import FT255

    assert mxu_supported(1 << 20)
    assert not mxu_supported(1 << 21)
    import os
    old = os.environ.pop("LCPC_MXU_NTT", None)
    try:
        ntt = _pick_ntt(FT255, 1 << 21)
        assert isinstance(ntt, BatchedNtt)
    finally:
        if old is not None:
            os.environ["LCPC_MXU_NTT"] = old
