"""BLAKE3 host reference implementation (plain hash mode, 32-byte output).

Used as the digest for column hashing and Merkle trees, matching the
reference's test/bench configuration (`blake3::Hasher` with traits-preview,
lcpc-ligero-pc/src/tests.rs:12, lcpc-2d column hashing lib.rs:706-785).

This is the slow, obviously-correct twin; the device path
(lcpc_tpu.ops.blake3_jax) vectorizes the same compression function over
columns and is twin-tested against this module.
"""

from __future__ import annotations

import struct

IV = (
    0x6A09E667,
    0xBB67AE85,
    0x3C6EF372,
    0xA54FF53A,
    0x510E527F,
    0x9B05688C,
    0x1F83D9AB,
    0x5BE0CD19,
)

MSG_PERMUTATION = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

CHUNK_START = 1 << 0
CHUNK_END = 1 << 1
PARENT = 1 << 2
ROOT = 1 << 3

BLOCK_LEN = 64
CHUNK_LEN = 1024

_MASK = 0xFFFFFFFF


def _rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & _MASK


def _g(state, a, b, c, d, mx, my):
    state[a] = (state[a] + state[b] + mx) & _MASK
    state[d] = _rotr(state[d] ^ state[a], 16)
    state[c] = (state[c] + state[d]) & _MASK
    state[b] = _rotr(state[b] ^ state[c], 12)
    state[a] = (state[a] + state[b] + my) & _MASK
    state[d] = _rotr(state[d] ^ state[a], 8)
    state[c] = (state[c] + state[d]) & _MASK
    state[b] = _rotr(state[b] ^ state[c], 7)


def compress(cv, block_words, counter, block_len, flags):
    """BLAKE3 compression; returns all 16 output words."""
    state = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        IV[0], IV[1], IV[2], IV[3],
        counter & _MASK, (counter >> 32) & _MASK, block_len, flags,
    ]
    m = list(block_words)
    for r in range(7):
        _g(state, 0, 4, 8, 12, m[0], m[1])
        _g(state, 1, 5, 9, 13, m[2], m[3])
        _g(state, 2, 6, 10, 14, m[4], m[5])
        _g(state, 3, 7, 11, 15, m[6], m[7])
        _g(state, 0, 5, 10, 15, m[8], m[9])
        _g(state, 1, 6, 11, 12, m[10], m[11])
        _g(state, 2, 7, 8, 13, m[12], m[13])
        _g(state, 3, 4, 9, 14, m[14], m[15])
        if r != 6:
            m = [m[MSG_PERMUTATION[i]] for i in range(16)]
    out = [0] * 16
    for i in range(8):
        out[i] = state[i] ^ state[i + 8]
        out[i + 8] = state[i + 8] ^ cv[i]
    return out


def _block_words(block: bytes) -> list[int]:
    block = block + b"\x00" * (BLOCK_LEN - len(block))
    return list(struct.unpack("<16I", block))


def _chunk_output(chunk: bytes, counter: int):
    """Process a chunk; returns (cv_words_before_last, last_block_words,
    last_block_len, last_flags) so the caller can decide on the ROOT flag."""
    blocks = [chunk[i : i + BLOCK_LEN] for i in range(0, len(chunk), BLOCK_LEN)]
    if not blocks:
        blocks = [b""]
    cv = list(IV)
    for i, blk in enumerate(blocks[:-1]):
        flags = CHUNK_START if i == 0 else 0
        cv = compress(cv, _block_words(blk), counter, BLOCK_LEN, flags)[:8]
    last = blocks[-1]
    flags = CHUNK_END | (CHUNK_START if len(blocks) == 1 else 0)
    return cv, _block_words(last), len(last), flags


def _chunk_cv(chunk: bytes, counter: int) -> list[int]:
    cv, words, blen, flags = _chunk_output(chunk, counter)
    return compress(cv, words, counter, blen, flags)[:8]


def _left_len(n_chunks: int) -> int:
    """Left subtree = largest power of two strictly less than n_chunks."""
    p = 1
    while p * 2 < n_chunks:
        p *= 2
    return p


def blake3(data: bytes) -> bytes:
    """Plain BLAKE3 hash, 32-byte output."""
    chunks = [data[i : i + CHUNK_LEN] for i in range(0, len(data), CHUNK_LEN)]
    if not chunks:
        chunks = [b""]

    if len(chunks) == 1:
        cv, words, blen, flags = _chunk_output(chunks[0], 0)
        out = compress(cv, words, 0, blen, flags | ROOT)
        return struct.pack("<8I", *out[:8])

    def subtree(lo: int, hi: int) -> list[int]:
        if hi - lo == 1:
            return _chunk_cv(chunks[lo], lo)
        mid = lo + _left_len(hi - lo)
        left = subtree(lo, mid)
        right = subtree(mid, hi)
        return compress(list(IV), left + right, 0, BLOCK_LEN, PARENT)[:8]

    mid = _left_len(len(chunks))
    left = subtree(0, mid)
    right = subtree(mid, len(chunks))
    out = compress(list(IV), left + right, 0, BLOCK_LEN, PARENT | ROOT)
    return struct.pack("<8I", *out[:8])
