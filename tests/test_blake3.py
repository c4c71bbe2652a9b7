"""BLAKE3: known vectors for the host twin; device path vs host twin."""

import numpy as np

from lcpc_tpu.ops.blake3_ref import blake3
from lcpc_tpu.ops.blake3_jax import (
    bytes_to_digests,
    digests_to_bytes,
    hash_word_columns,
    merkle_layer,
)


def test_known_vectors():
    assert (
        blake3(b"").hex()
        == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    assert (
        blake3(b"abc").hex()
        == "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"
    )


def _host_column_hash(words_col: np.ndarray) -> bytes:
    msg = bytes(32) + words_col.astype("<u4").tobytes()
    return blake3(msg)


def test_device_columns_vs_host():
    rng = np.random.default_rng(0)
    # several lengths: sub-block, block-boundary, multi-block, multi-chunk,
    # odd chunk counts (exercise the tree merge incl. promotion)
    for n_words in [1, 8, 24, 56, 248, 504, 1016, 2040, 760]:
        n_cols = 5
        words = rng.integers(0, 2**32, size=(n_words, n_cols), dtype=np.uint32)
        dig = hash_word_columns(words)
        got = digests_to_bytes(dig)
        for c in range(n_cols):
            assert bytes(got[c]) == _host_column_hash(words[:, c]), (n_words, c)


def test_merkle_layer_vs_host():
    rng = np.random.default_rng(1)
    leaves = rng.integers(0, 2**32, size=(8, 6), dtype=np.uint32)
    out = merkle_layer(leaves)
    lb = digests_to_bytes(leaves)
    ob = digests_to_bytes(out)
    for i in range(3):
        want = blake3(bytes(lb[2 * i]) + bytes(lb[2 * i + 1]))
        assert bytes(ob[i]) == want


def test_digest_bytes_roundtrip():
    rng = np.random.default_rng(2)
    d = rng.integers(0, 2**32, size=(8, 7), dtype=np.uint32)
    assert np.array_equal(bytes_to_digests(digests_to_bytes(d)), d)
