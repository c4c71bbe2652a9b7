"""Field-spec tests: constants, Montgomery round-trips, repr semantics."""

import pytest

from lcpc_tpu.fields import ALL_FIELDS


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_constants(spec):
    # generator is a quadratic non-residue (required by ff derive)
    assert pow(spec.generator, (spec.p - 1) // 2, spec.p) == spec.p - 1
    # 2-adicity (survey: 41/40/41/41)
    assert (spec.p - 1) % (1 << spec.s) == 0
    assert ((spec.p - 1) >> spec.s) % 2 == 1
    w = spec.root_of_unity
    assert pow(w, 1 << spec.s, spec.p) == 1
    assert pow(w, 1 << (spec.s - 1), spec.p) != 1
    assert spec.shave_bits == 1  # all four test primes sit just below a power of 2
    assert 16 * spec.w16 == 64 * spec.limbs64


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_montgomery_roundtrip(spec):
    for v in [0, 1, 2, spec.p - 1, spec.p // 3, 12345678901234567 % spec.p]:
        assert spec.from_mont(spec.to_mont(v)) == v
        limbs = spec.mont_limbs_u64(v)
        assert len(limbs) == spec.limbs64
        assert spec.from_mont_limbs_u64(limbs) == v


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_repr_roundtrip(spec):
    for v in [0, 1, spec.p - 1, (spec.p * 2) // 3]:
        b = spec.to_repr(v)
        assert len(b) == spec.repr_bytes
        assert spec.from_repr(b) == v


def test_adicity_values():
    assert [f.s for f in ALL_FIELDS] == [41, 40, 41, 41]
    assert [f.num_bits for f in ALL_FIELDS] == [63, 127, 191, 255]
