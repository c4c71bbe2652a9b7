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
    # the extended radix must guarantee a single conditional subtract,
    # including at the lifted A=2048 contraction length (ft255 n<=2^22)
    from lcpc_tpu.ops.mxu_ntt import MxuNttPlan, conv_cap

    # (4096, a=2048) exercises the same extended radix as the balanced
    # n=2^22 split (w7r is sized by max(a, b)) without its table build cost
    for spec, n, a in [(FT63, 1024, None), (FT255, 65536, None),
                       (FT255, 4096, 2048)]:
        plan = MxuNttPlan(spec, n, a)
        r7 = 1 << (7 * plan.w7r)
        amax = max(plan.a, plan.b)
        assert amax * spec.p * spec.p // r7 < spec.p
        assert plan.a * plan.b == n
        # int32 conv accumulator headroom at the longest contraction
        assert amax * plan.w7 * 127 * 127 < (1 << 31)
        assert amax <= conv_cap(spec)


def test_mxu_a2048_matches_vpu():
    # A=2048 exceeds the old 1024 cap: exercise the lifted contraction and
    # its wider reduction radix via an explicit unbalanced split (the
    # balanced equivalent, n=2^22, is too large for a CPU test).  ft63 only:
    # the conv cost scales with taps^2 and ft255's A=2048 case is ~4.5e13
    # int8 MACs on CPU — its on-chip equivalence is checked by
    # scripts/check_mxu_chip.py instead.
    from lcpc_tpu.ops.mxu_ntt import MxuNtt

    rng = random.Random(9)
    spec, n = FT63, 4096
    ops = get_ops(spec)
    mats = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(2)]
    x = np.stack([ops.encode_host(r) for r in mats], axis=1)
    ref = get_ntt(spec, n)(np.asarray(x))
    got = MxuNtt(spec, n, a=2048)(np.asarray(x))
    assert ops.decode_host(got) == ops.decode_host(ref)


def test_pick_ntt_falls_back_beyond_mxu_cap():
    # n beyond the int8-conv contraction cap (2^22 for ft255) must fall
    # back to the VPU ladder instead of crashing (VERDICT r1 #9, r2 #5)
    from lcpc_tpu.ops.mxu_ntt import mxu_supported
    from lcpc_tpu.encodings.ligero import _pick_ntt
    from lcpc_tpu.ops.ntt import BatchedNtt
    from lcpc_tpu.fields import FT255

    assert mxu_supported(FT255, 1 << 20)
    assert mxu_supported(FT255, 1 << 22)   # lifted cap (VERDICT r2 #5)
    assert not mxu_supported(FT255, 1 << 23)
    assert mxu_supported(FT63, 1 << 26)
    assert not mxu_supported(FT63, 1 << 27)
    import os
    old = os.environ.pop("LCPC_MXU_NTT", None)
    try:
        ntt = _pick_ntt(FT255, 1 << 23)
        assert isinstance(ntt, BatchedNtt)
    finally:
        if old is not None:
            os.environ["LCPC_MXU_NTT"] = old


def test_stream_mxu_lowmem_encode_matches_ladder(monkeypatch):
    # the streaming path's sub-chunked lax.map MXU encode must be
    # bit-identical to the VPU-ladder encode it replaces
    import jax.numpy as jnp

    from lcpc_tpu.encodings.ligero import LigeroEncoding
    from lcpc_tpu.ops.mxu_ntt import MxuNtt

    monkeypatch.setenv("LCPC_MXU_NTT", "1")       # force MXU off-TPU
    # tiny sub-chunk budget: 6 rows split as 3 sub-chunks of 2
    spec = FT63
    enc = LigeroEncoding.new_from_dims(spec, 32, 64)
    assert isinstance(enc._ntt, MxuNtt)
    monkeypatch.setenv(
        "LCPC_MXU_STREAM_BYTES", str(LigeroEncoding._MXU_STREAM_BPE * 64 * 2)
    )
    assert enc._stream_mxu_ntt() is not None
    ops = get_ops(spec)
    rng = random.Random(7)
    rows = [[rng.randrange(spec.p) for _ in range(32)] for _ in range(6)]
    x = np.stack([ops.encode_host(r) for r in rows], axis=1)
    got = enc.encode_rows_lowmem(jnp.asarray(x))

    monkeypatch.setenv("LCPC_STREAM_MXU", "0")    # ladder twin
    want = enc.encode_rows_lowmem(jnp.asarray(x))
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_mxu_zero_padded_input_plan():
    # the rate-1/m encode plan (in_len < n: rectangular step-1 kernel over
    # the nonzero channels only) must be bit-identical to pad + full NTT
    from lcpc_tpu.ops.mxu_ntt import MxuNtt, mxu_supported

    rng = random.Random(11)
    for spec, n, in_len in [(FT63, 256, 64), (FT63, 512, 256),
                            (FT255, 128, 32)]:
        ops = get_ops(spec)
        rows = [[rng.randrange(spec.p) for _ in range(in_len)]
                for _ in range(3)]
        x = np.stack([ops.encode_host(r) for r in rows], axis=1)
        padded = np.pad(x, [(0, 0), (0, 0), (0, n - in_len)])
        want = np.asarray(MxuNtt(spec, n)(np.asarray(padded)))
        got = np.asarray(MxuNtt(spec, n, in_len=in_len)(np.asarray(x)))
        assert np.array_equal(got, want), (spec.name, n, in_len)
        assert mxu_supported(spec, n, in_len)
    # the rectangular plan extends the cap by the expansion factor
    assert mxu_supported(FT255, 1 << 23, 1 << 21)
    assert mxu_supported(FT255, 1 << 24, 1 << 22)
    assert not mxu_supported(FT255, 1 << 23)


def test_mxu_canonical_out_plan():
    # canonical_out folds R^-1 into the step-3 kernel: output must equal
    # from_mont of the Montgomery plan's output, bit for bit
    import jax.numpy as jnp

    from lcpc_tpu.ops.mxu_ntt import get_mxu_ntt, get_mxu_ntt_canonical

    rng = random.Random(21)
    for spec, n, in_len in [(FT63, 256, 64), (FT63, 128, None)]:
        ops = get_ops(spec)
        ln = in_len or n
        x = np.stack(
            [ops.encode_host([rng.randrange(spec.p) for _ in range(ln)])
             for _ in range(2)], axis=1)
        mont = np.asarray(get_mxu_ntt(spec, n, in_len)(jnp.asarray(x)))
        canon = np.asarray(get_mxu_ntt_canonical(spec, n, in_len)(jnp.asarray(x)))
        want = np.asarray(ops.from_mont(jnp.asarray(mont)))
        assert np.array_equal(canon, want), (spec.name, n, in_len)
