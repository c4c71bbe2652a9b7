"""Vectorized BLAKE3 on device: column hashing + Merkle layers.

Implements the reference's column-hash convention
(lcpc-2d/src/lib.rs:706-745): each column digest is
blake3(32 zero bytes || canonical LE repr of column elements, row-major down
the column), and Merkle nodes are blake3(left_digest || right_digest)
(lib.rs:762-785).

TPU mapping: columns are independent, so every compression runs as 32-bit
add/xor/rotate VPU ops vectorized over the column axis (the minor, 128-lane
axis).  Within one column the 64-byte blocks are sequential by construction,
so the block loop is a lax.fori_loop whose body is one fused compression
graph; blake3's chunk tree (1024-byte chunks) actually *helps* here, since
chunk CVs merge in log-depth batched compressions.

The byte/word layout is little-endian u32 words throughout, which coincides
with the packed 16-bit limb pairs of the field representation, so packing a
field element into hash input is `lo | hi << 16`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .blake3_ref import IV, MSG_PERMUTATION, CHUNK_START, CHUNK_END, PARENT, ROOT

_IV = np.array(IV, dtype=np.uint32)
_PERM = np.array(MSG_PERMUTATION, dtype=np.int32)


def _rotr(x, n):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


def _compress_words(cv, m, counter_lo, counter_hi, block_len, flags):
    """Vectorized BLAKE3 compression.

    cv: (8, ...), m: (16, ...); counter/block_len/flags scalars or arrays
    broadcastable to the batch shape.  Returns the 8-word output CV.

    The 7 rounds run under lax.fori_loop with the message permutation as a
    static gather: a fully unrolled round DAG triggers an exponential-time
    pathology in this XLA CPU build (the TPU backend handles either form).
    """
    batch = cv.shape[1:]

    def bc(v):
        return jnp.broadcast_to(jnp.asarray(v, jnp.uint32), batch)

    tail = jnp.stack(
        [bc(_IV[0]), bc(_IV[1]), bc(_IV[2]), bc(_IV[3]),
         bc(counter_lo), bc(counter_hi), bc(block_len), bc(flags)],
        axis=0,
    )
    state0 = jnp.concatenate([cv, tail], axis=0)  # (16, ...)
    perm = jnp.asarray(_PERM)

    def round_fn(_, carry):
        state, msg = carry

        def g(state, a, b, c, d, mx, my):
            sa, sb, sc, sd = state[a], state[b], state[c], state[d]
            sa = sa + sb + msg[mx]
            sd = _rotr(sd ^ sa, 16)
            sc = sc + sd
            sb = _rotr(sb ^ sc, 12)
            sa = sa + sb + msg[my]
            sd = _rotr(sd ^ sa, 8)
            sc = sc + sd
            sb = _rotr(sb ^ sc, 7)
            return state.at[a].set(sa).at[b].set(sb).at[c].set(sc).at[d].set(sd)

        state = g(state, 0, 4, 8, 12, 0, 1)
        state = g(state, 1, 5, 9, 13, 2, 3)
        state = g(state, 2, 6, 10, 14, 4, 5)
        state = g(state, 3, 7, 11, 15, 6, 7)
        state = g(state, 0, 5, 10, 15, 8, 9)
        state = g(state, 1, 6, 11, 12, 10, 11)
        state = g(state, 2, 7, 8, 13, 12, 13)
        state = g(state, 3, 4, 9, 14, 14, 15)
        return (state, jnp.take(msg, perm, axis=0))

    state, _ = jax.lax.fori_loop(0, 7, round_fn, (state0, m))
    return state[:8] ^ state[8:16]


def _hash_words_streams(buf: jnp.ndarray, total_words: int) -> jnp.ndarray:
    """blake3 of many equal-length word streams.

    buf: (n_blocks*16, C) u32, already zero-padded past `total_words`.
    Returns digests (8, C).  The per-stream byte length is 4*total_words.
    """
    n_cols = buf.shape[1]
    n_blocks = max(1, (total_words + 15) // 16)
    n_chunks = max(1, (total_words + 255) // 256)
    last_len = (total_words % 16) * 4
    if last_len == 0:
        last_len = 64 if total_words > 0 else 0
    single_chunk = n_chunks == 1

    iv_cv = jnp.broadcast_to(
        jnp.asarray(_IV, jnp.uint32)[:, None], (8, n_cols)
    )

    def body(k, carry):
        cv, chunk_cvs = carry
        pos = k % 16
        chunk_idx = k // 16
        is_start = pos == 0
        is_last_block = k == n_blocks - 1
        is_end = (pos == 15) | is_last_block
        block_len = jnp.where(is_last_block, jnp.uint32(last_len), jnp.uint32(64))
        flags = (
            jnp.where(is_start, jnp.uint32(CHUNK_START), jnp.uint32(0))
            | jnp.where(is_end, jnp.uint32(CHUNK_END), jnp.uint32(0))
            | (jnp.uint32(ROOT) if single_chunk else jnp.uint32(0))
            * jnp.where(is_last_block, jnp.uint32(1), jnp.uint32(0))
        )
        m = jax.lax.dynamic_slice(buf, (k * 16, 0), (16, n_cols))
        cv_in = jnp.where(is_start, iv_cv, cv)
        out = _compress_words(
            cv_in, m, chunk_idx.astype(jnp.uint32), jnp.uint32(0), block_len, flags
        )
        chunk_cvs = jax.lax.dynamic_update_slice(
            chunk_cvs, out[None], (chunk_idx, 0, 0)
        )
        return out, chunk_cvs

    chunk_cvs0 = jnp.zeros((n_chunks, 8, n_cols), dtype=jnp.uint32)
    _, chunk_cvs = jax.lax.fori_loop(0, n_blocks, body, (iv_cv, chunk_cvs0))

    if single_chunk:
        return chunk_cvs[0]

    # merge chunk CVs: pair-adjacent with odd-last promotion reproduces
    # blake3's largest-power-of-two-left tree shape
    cvs = chunk_cvs  # (n, 8, C)
    n = n_chunks
    while n > 1:
        pairs = n // 2
        left = cvs[0 : 2 * pairs : 2]
        right = cvs[1 : 2 * pairs : 2]
        m = jnp.concatenate([left, right], axis=1)  # (pairs, 16, C)
        is_root = n == 2
        flags = PARENT | (ROOT if is_root else 0)
        cv = jnp.broadcast_to(
            jnp.asarray(_IV, jnp.uint32)[:, None, None], (8, pairs, n_cols)
        )
        out = _compress_words(
            cv,
            jnp.moveaxis(m, 1, 0),
            jnp.uint32(0), jnp.uint32(0), jnp.uint32(64), jnp.uint32(flags),
        )  # (8, pairs, C)
        out = jnp.moveaxis(out, 1, 0)  # (pairs, 8, C)
        if n % 2:
            out = jnp.concatenate([out, cvs[2 * pairs : 2 * pairs + 1]], axis=0)
        cvs = out
        n = out.shape[0]
    return cvs[0]


@functools.partial(jax.jit, static_argnames=("prefix_words",))
def hash_word_columns(words: jnp.ndarray, prefix_words: int = 8) -> jnp.ndarray:
    """Hash each column of a word matrix with a zero-word prefix.

    words: (L, C) u32 — per-column message words (LE). The actual message per
    column is `prefix_words` zero words followed by words[:, c].
    Returns (8, C) digests.
    """
    total = prefix_words + words.shape[0]
    n_blocks = max(1, (total + 15) // 16)
    pad_lo = prefix_words
    pad_hi = n_blocks * 16 - total
    buf = jnp.pad(words, [(pad_lo, pad_hi), (0, 0)])
    return _hash_words_streams(buf, total)


@jax.jit
def merkle_layer(digests: jnp.ndarray) -> jnp.ndarray:
    """One Merkle layer: parent = blake3(left || right) over digest pairs.

    digests: (8, n) with n even -> (8, n//2).
    """
    left = digests[:, 0::2]
    right = digests[:, 1::2]
    m = jnp.concatenate([left, right], axis=0)  # (16, n/2)
    cv = jnp.broadcast_to(jnp.asarray(_IV, jnp.uint32)[:, None], left.shape)
    return _compress_words(
        cv, m, jnp.uint32(0), jnp.uint32(0), jnp.uint32(64),
        jnp.uint32(CHUNK_START | CHUNK_END | ROOT),
    )


def digests_to_bytes(digests) -> np.ndarray:
    """(8, n) u32 -> (n, 32) uint8 (little-endian words)."""
    d = np.asarray(digests)
    return np.ascontiguousarray(d.T.astype("<u4")).view(np.uint8).reshape(d.shape[1], 32)


def bytes_to_digests(b: np.ndarray) -> np.ndarray:
    """(n, 32) uint8 -> (8, n) u32."""
    b = np.ascontiguousarray(b, dtype=np.uint8)
    return b.view("<u4").reshape(-1, 8).T.astype(np.uint32)
