"""Vectorized SHA-256 on device: the second digest behind the generic hash
interface (the reference is generic over `D: Digest`, lcpc-2d/src/lib.rs:34-58;
BLAKE3 is the TPU-first default, SHA-256 demonstrates the plug point).

Maps the same way BLAKE3 does (ops/blake3_jax.py): columns are independent
streams, so every 64-byte block compression runs as 32-bit add/xor/rot VPU
ops vectorized over the column axis, with the sequential block chain as one
lax.scan.  SHA-256 is big-endian word oriented, so the little-endian column
words byteswap on device first.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
], dtype=np.uint32)

_H0 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
], dtype=np.uint32)


def _rotr(x, n):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


def _bswap32(x):
    return (
        (x << jnp.uint32(24))
        | ((x & jnp.uint32(0xFF00)) << jnp.uint32(8))
        | ((x >> jnp.uint32(8)) & jnp.uint32(0xFF00))
        | (x >> jnp.uint32(24))
    )


def _compress(h, m):
    """One SHA-256 compression, vectorized over the batch (minor) axes.

    h: (8, ...batch) u32; m: (16, ...batch) u32 big-endian words.
    The schedule extension and the 64 rounds run under lax.fori_loop with
    stacked state: a fully unrolled round DAG trips the same exponential
    compile-time pathology in the XLA CPU pipeline that blake3_jax documents
    (the TPU backend handles either form).
    """
    batch = m.shape[1:]
    w = jnp.concatenate(
        [m, jnp.zeros((48, *batch), jnp.uint32)], axis=0
    )

    def ext(t, w):
        w15 = w[t - 15]
        w2 = w[t - 2]
        s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> jnp.uint32(3))
        s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> jnp.uint32(10))
        return w.at[t].set(w[t - 16] + s0 + w[t - 7] + s1)

    w = jax.lax.fori_loop(16, 64, ext, w)
    k = jnp.asarray(_K)

    def rnd(t, st):
        a, b, c, d, e, f, g, hh = (st[i] for i in range(8))
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = hh + S1 + ch + k[t] + w[t]
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        return jnp.stack([t1 + S0 + maj, a, b, c, d + t1, e, f, g], axis=0)

    st = jax.lax.fori_loop(0, 64, rnd, h)
    return h + st


def hash_word_columns(words: jnp.ndarray, prefix_words: int = 8) -> jnp.ndarray:
    """SHA-256 of each column of an LE word matrix with a zero-word prefix.

    words: (L, C) u32 little-endian column words; the message per column is
    `prefix_words` zero words then the column bytes.  Returns (8, C) digests
    as LITTLE-ENDIAN u32 words of the big-endian digest bytes (the same
    (8, C)-word convention the rest of the pipeline uses: word i holds
    digest bytes 4i..4i+4 in LE order).
    """
    total_words = prefix_words + words.shape[0]
    n_cols = words.shape[1]
    msg_bits = total_words * 32
    # SHA padding: 0x80 byte, zeros, 8-byte BE length — in whole words here
    # (message is word-aligned): one 0x80000000 BE word, zeros, 2 length words
    n_blocks = (total_words + 3 + 15) // 16  # +1 pad word +2 length words
    buf = jnp.pad(words, [(prefix_words, n_blocks * 16 - total_words), (0, 0)])
    be = _bswap32(buf)  # message words as big-endian values
    pad_word = jnp.full((1, n_cols), 0x80000000, jnp.uint32)
    be = jax.lax.dynamic_update_slice(be, pad_word, (total_words, 0))
    hi = jnp.full((1, n_cols), msg_bits >> 32, jnp.uint32)
    lo = jnp.full((1, n_cols), msg_bits & 0xFFFFFFFF, jnp.uint32)
    be = jax.lax.dynamic_update_slice(be, hi, (n_blocks * 16 - 2, 0))
    be = jax.lax.dynamic_update_slice(be, lo, (n_blocks * 16 - 1, 0))

    h0 = jnp.broadcast_to(jnp.asarray(_H0, jnp.uint32)[:, None], (8, n_cols))
    if n_blocks == 1:
        h = _compress(h0, be[:16])
    else:
        def body(carry, block):
            return _compress(carry, block), None

        blocks = be.reshape(n_blocks, 16, n_cols)
        h, _ = jax.lax.scan(body, h0, blocks)
    # back to the pipeline's LE-word digest convention
    return _bswap32(h)


def merkle_parent(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """parent = sha256(left_digest_bytes || right_digest_bytes), (8, n) each."""
    m_le = jnp.concatenate([left, right], axis=0)  # (16, n) LE words
    n = m_le.shape[1]
    be = _bswap32(m_le)
    h0 = jnp.broadcast_to(jnp.asarray(_H0, jnp.uint32)[:, None], (8, n))
    h = _compress(h0, be)
    # second block: padding + length (512-bit message)
    pad_np = np.zeros(16, dtype=np.uint32)
    pad_np[0] = 0x80000000
    pad_np[15] = 512
    pad = jnp.broadcast_to(jnp.asarray(pad_np)[:, None], (16, n))
    h = _compress(h, pad)
    return _bswap32(h)


@jax.jit
def merkle_layer(digests: jnp.ndarray) -> jnp.ndarray:
    """One Merkle layer over digest pairs: (8, n) with n even -> (8, n//2)."""
    return merkle_parent(digests[:, 0::2], digests[:, 1::2])


def digest_host(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()
