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


_G_SCHEDULE = [
    (0, 4, 8, 12, 0, 1), (1, 5, 9, 13, 2, 3), (2, 6, 10, 14, 4, 5),
    (3, 7, 11, 15, 6, 7), (0, 5, 10, 15, 8, 9), (1, 6, 11, 12, 10, 11),
    (2, 7, 8, 13, 12, 13), (3, 4, 9, 14, 14, 15),
]


def _compress_list(cv, msg, counter_lo, counter_hi, block_len, flags, batch):
    """BLAKE3 compression with fully unrolled rounds over unstacked state.

    cv: list of 8 arrays, msg: list of 16 arrays (all batch-shaped).  The
    unrolled DAG of ~700 elementwise ops fuses into one VPU kernel on TPU —
    ~9x faster than the stacked fori_loop form of _compress_words.  MUST only
    be traced inside a lax.scan/fori body: at top level the XLA *CPU*
    pipeline hits an exponential-time pathology on this DAG shape.
    """
    def bc(x):
        return jnp.broadcast_to(jnp.asarray(x, jnp.uint32), batch)

    v = list(cv) + [bc(_IV[0]), bc(_IV[1]), bc(_IV[2]), bc(_IV[3]),
                    bc(counter_lo), bc(counter_hi), bc(block_len), bc(flags)]
    msg = list(msg)
    for r in range(7):
        for (a, b, c, d, x, y) in _G_SCHEDULE:
            va, vb, vc, vd = v[a], v[b], v[c], v[d]
            va = va + vb + msg[x]
            vd = _rotr(vd ^ va, 16)
            vc = vc + vd
            vb = _rotr(vb ^ vc, 12)
            va = va + vb + msg[y]
            vd = _rotr(vd ^ va, 8)
            vc = vc + vd
            vb = _rotr(vb ^ vc, 7)
            v[a], v[b], v[c], v[d] = va, vb, vc, vd
        if r < 6:
            msg = [msg[p] for p in MSG_PERMUTATION]
    return [v[i] ^ v[i + 8] for i in range(8)]


def chunk_chain_scan(blocks, is_start, is_end, blen, flags, cidx, cv0, ccvs0,
                     chunk_base=0):
    """Run the sequential per-block compression chain as one lax.scan.

    blocks: (n_blocks, 16, C) message words; is_start/is_end (n_blocks,) bool;
    blen/flags/cidx (n_blocks,) u32 per-block parameters.  cv0: (8, C) chain
    state; ccvs0: (n_chunks, 8, C) chunk-CV store; chunk-end outputs are
    written at slot chunk_base + cidx.  Returns (final cv (8, C), ccvs).
    """
    C = blocks.shape[2]

    def body(carry, xs):
        cv, ccvs = carry
        m, st, en, bl, fl, ci = xs
        ci = ci + jnp.uint32(chunk_base)  # global chunk index (blake3 counter)
        cv_in = [jnp.where(st, jnp.uint32(_IV[i]), cv[i]) for i in range(8)]
        out = _compress_list(cv_in, [m[i] for i in range(16)],
                             ci, jnp.uint32(0), bl, fl, (C,))
        slot = ci.astype(jnp.int32)
        upd = jnp.where(en, jnp.stack(out), ccvs[slot])
        ccvs = jax.lax.dynamic_update_slice(ccvs, upd[None], (slot, 0, 0))
        return (tuple(out), ccvs), None

    cv0_t = tuple(cv0[i] for i in range(8))
    (cv, ccvs), _ = jax.lax.scan(
        body, (cv0_t, ccvs0), (blocks, is_start, is_end, blen, flags, cidx)
    )
    return jnp.stack(cv), ccvs


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

    ks = np.arange(n_blocks)
    pos = ks % 16
    is_start = pos == 0
    is_last = ks == n_blocks - 1
    is_end = (pos == 15) | is_last
    blen = np.where(is_last, last_len, 64).astype(np.uint32)
    flags = (
        np.where(is_start, CHUNK_START, 0)
        | np.where(is_end, CHUNK_END, 0)
        | (ROOT if single_chunk else 0) * np.where(is_last, 1, 0)
    ).astype(np.uint32)
    cidx = (ks // 16).astype(np.uint32)

    chunk_cvs0 = jnp.zeros((n_chunks, 8, n_cols), dtype=jnp.uint32)
    if n_blocks >= 8:
        # hot path: one lax.scan whose body is the unrolled compression
        _, chunk_cvs = chunk_chain_scan(
            buf.reshape(n_blocks, 16, n_cols),
            jnp.asarray(is_start), jnp.asarray(is_end), jnp.asarray(blen),
            jnp.asarray(flags), jnp.asarray(cidx), iv_cv, chunk_cvs0,
        )
    else:
        # tiny inputs: XLA unrolls short scans, which trips the CPU
        # pathology _compress_list documents — use the stacked fori form
        def body(k, carry):
            cv, ccvs = carry
            m = jax.lax.dynamic_slice(buf, (k * 16, 0), (16, n_cols))
            st = jnp.asarray(is_start)[k]
            cv_in = jnp.where(st, iv_cv, cv)
            out = _compress_words(
                cv_in, m, jnp.asarray(cidx)[k], jnp.uint32(0),
                jnp.asarray(blen)[k], jnp.asarray(flags)[k],
            )
            ccvs = jax.lax.dynamic_update_slice(
                ccvs, out[None], (jnp.asarray(cidx, np.int32)[k], 0, 0)
            )
            return out, ccvs

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


def merkle_parent(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """parent = blake3(left_digest_bytes || right_digest_bytes), (8, n) each."""
    m = jnp.concatenate([left, right], axis=0)  # (16, n)
    cv = jnp.broadcast_to(jnp.asarray(_IV, jnp.uint32)[:, None], left.shape)
    return _compress_words(
        cv, m, jnp.uint32(0), jnp.uint32(0), jnp.uint32(64),
        jnp.uint32(CHUNK_START | CHUNK_END | ROOT),
    )


@jax.jit
def merkle_layer(digests: jnp.ndarray) -> jnp.ndarray:
    """One Merkle layer: parent = blake3(left || right) over digest pairs.

    digests: (8, n) with n even -> (8, n//2).
    """
    return merkle_parent(digests[:, 0::2], digests[:, 1::2])


def digests_to_bytes(digests) -> np.ndarray:
    """(8, n) u32 -> (n, 32) uint8 (little-endian words)."""
    d = np.asarray(digests)
    return np.ascontiguousarray(d.T.astype("<u4")).view(np.uint8).reshape(d.shape[1], 32)


def bytes_to_digests(b: np.ndarray) -> np.ndarray:
    """(n, 32) uint8 -> (8, n) u32."""
    b = np.ascontiguousarray(b, dtype=np.uint8)
    return b.view("<u4").reshape(-1, 8).T.astype(np.uint32)
