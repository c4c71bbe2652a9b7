"""Known-answer and cross-validation tests for the Fiat-Shamir substrate.

These gate the bit-exactness story: keccak vs hashlib's SHA3, ChaCha20 vs the
`cryptography` package (exact rand_chacha state layout), merlin vs the
published merlin crate test vector, and BlockRng edge-case semantics.
"""

import hashlib

import numpy as np
import pytest

from lcpc_tpu.fs.keccak import keccak_f1600_bytes
from lcpc_tpu.fs.chacha import ChaCha20Rng, chacha20_blocks
from lcpc_tpu.fs.merlin import Transcript
from lcpc_tpu.fs.sampling import (
    UniformUsize,
    field_random_scalar,
    field_random_vec,
    uniform_indices,
)
from lcpc_tpu.fields import ALL_FIELDS, FT63


def _sha3_256(msg: bytes) -> bytes:
    rate = 136
    st = bytearray(200)
    m = bytearray(msg)
    m.append(0x06)
    while len(m) % rate:
        m.append(0)
    m[-1] |= 0x80
    for off in range(0, len(m), rate):
        for i in range(rate):
            st[i] ^= m[off + i]
        keccak_f1600_bytes(st)
    return bytes(st[:32])


def test_keccak_vs_hashlib():
    for m in [b"", b"abc", b"x" * 200, bytes(range(256)), b"q" * 135, b"q" * 136]:
        assert _sha3_256(m) == hashlib.sha3_256(m).digest()


def test_chacha_block_vs_cryptography():
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    key = bytes(range(32))
    keyw = np.frombuffer(key, dtype="<u4").astype(np.uint32)
    for ctr, stream in [(0, 0), (1, 0), (5, 0xDEADBEEFCAFEBABE), (2**33, 7)]:
        nonce16 = (ctr & (2**64 - 1)).to_bytes(8, "little") + stream.to_bytes(
            8, "little"
        )
        ks = Cipher(algorithms.ChaCha20(key, nonce16), mode=None).encryptor().update(
            bytes(64)
        )
        ours = chacha20_blocks(
            keyw,
            ctr,
            np.array([stream & 0xFFFFFFFF, stream >> 32], dtype=np.uint32),
            1,
        )
        assert ours.reshape(-1).astype("<u4").tobytes() == ks


def test_chacha_zero_key_classic_vector():
    z = chacha20_blocks(
        np.zeros(8, dtype=np.uint32), 0, np.zeros(2, dtype=np.uint32), 1
    )[0]
    assert int(z[0]) == 0xADE0B876 and int(z[1]) == 0x903DF1A0


def test_chacha_bulk_matches_scalar():
    r1 = ChaCha20Rng(bytes(range(32)))
    vals = [r1.next_u64() for _ in range(100)]
    r2 = ChaCha20Rng(bytes(range(32)))
    assert vals == [int(v) for v in r2.next_u64_array(100)]
    # continue drawing after a bulk draw
    assert r1.next_u64() == int(r2.next_u64_array(1)[0])


def test_chacha_set_stream():
    r = ChaCha20Rng.seed_from_u64(0)
    r.set_stream(3)
    a = r.next_u64()
    r2 = ChaCha20Rng.seed_from_u64(0)
    r2.set_stream(3)
    assert a == r2.next_u64()
    # different stream gives a different draw
    r3 = ChaCha20Rng.seed_from_u64(0)
    r3.set_stream(4)
    assert a != r3.next_u64()


def test_merlin_published_vector():
    # merlin crate README/test vector
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    assert (
        t.challenge_bytes(b"challenge", 32).hex()
        == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_stateful_challenges_differ():
    t = Transcript(b"test transcript")
    c1 = t.challenge_bytes(b"$l//DT", 32)
    c2 = t.challenge_bytes(b"$l//DT", 32)
    assert c1 != c2  # transcript state advances


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_field_random_vec_matches_scalar(spec):
    r1 = ChaCha20Rng.seed_from_u64(42)
    vec = field_random_vec(spec, r1, 50)
    r2 = ChaCha20Rng.seed_from_u64(42)
    scalars = [field_random_scalar(spec, r2) for _ in range(50)]
    assert vec == scalars
    assert all(0 <= v < spec.p for v in vec)


def test_uniform_usize_in_range_and_deterministic():
    r = ChaCha20Rng.seed_from_u64(7)
    dist = UniformUsize(1000)
    xs = [dist.sample(r) for _ in range(1000)]
    assert all(0 <= x < 1000 for x in xs)
    r2 = ChaCha20Rng.seed_from_u64(7)
    assert xs == [dist.sample(r2) for _ in range(1000)]
    # rough uniformity
    assert len(set(xs)) > 500


def test_uniform_indices_rejection_rewind_path():
    """Force the Lemire rejection zone so rewind_u64 actually fires.

    For n just above 2^63 the rejection zone covers ~half of the u64 space
    (ints_to_reject = (2^64 - n) % n ~ 2^63), so the vectorized
    uniform_indices hits rejections constantly.  Its output AND the final
    stream position must match the serial one-at-a-time sampler, which is the
    Rust-exact form (rand 0.8 UniformInt::sample)."""
    n = (1 << 63) + 12345
    count = 64
    r_vec = ChaCha20Rng.seed_from_u64(1234)
    got = uniform_indices(n, r_vec, count)

    r_ser = ChaCha20Rng.seed_from_u64(1234)
    dist = UniformUsize(n)
    want = [dist.sample(r_ser) for _ in range(count)]
    assert got == want
    # stream consumption identical: next draws agree
    assert [r_vec.next_u64() for _ in range(8)] == [
        r_ser.next_u64() for _ in range(8)
    ]
    # sanity: the zone actually rejected something for this seed/count
    r_chk = ChaCha20Rng.seed_from_u64(1234)
    draws = [r_chk.next_u64() for _ in range(count * 2)]
    assert any((d * n) & ((1 << 64) - 1) > dist.zone for d in draws)


def test_rewind_u64_across_buffer_boundary():
    """rewind_u64 past the current buffer start must recompute blocks."""
    a = ChaCha20Rng.seed_from_u64(77)
    b = ChaCha20Rng.seed_from_u64(77)
    # advance a to an almost-consumed buffer: 31 u64 = 62 of 64 words
    for _ in range(31):
        a.next_u64()
    # bulk draw takes the 2 leftover words + a fresh refill (index becomes 4)
    a.next_u64_array(3)
    # rewind 3 u64 (6 words) > index (4): crosses the buffer boundary
    a.rewind_u64(3)
    # a is now at absolute position 31; b consumed naturally
    for _ in range(31):
        b.next_u64()
    assert [a.next_u64() for _ in range(10)] == [b.next_u64() for _ in range(10)]


def test_uniform_indices_matches_serial_small_n():
    # the common protocol regime (tiny rejection zone): bulk path, no rewind
    for seed in (1, 2, 3):
        rv = ChaCha20Rng.seed_from_u64(seed)
        rs = ChaCha20Rng.seed_from_u64(seed)
        dist = UniformUsize(65536)
        assert uniform_indices(65536, rv, 309) == [
            dist.sample(rs) for _ in range(309)
        ]
        assert rv.next_u64() == rs.next_u64()
