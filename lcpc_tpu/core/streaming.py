"""Streaming commit: encode+hash by row blocks without materializing the
codeword matrix.

For large polynomials the encoded matrix exceeds HBM (2^26 coefficients over
ft255 at rho=1/4 is a 17 GB codeword on a 16 GB chip), and the MXU NTT's
digit-plane temporaries add ~5x transient pressure.  This module runs the
commit pipeline over row blocks: each block is encoded and folded into
per-column BLAKE3 chunk state, then discarded; only the coefficient matrix
(needed by prove's collapse) and the Merkle array persist.  Proof generation
re-encodes blocks and gathers just the opened columns.

The column hash state is exact: BLAKE3 chunks never align with element rows
(the 32-byte zero prefix shifts everything by 8 words), so the hasher keeps
a carry buffer of sub-chunk words.  Choosing the row block so its word count
is a multiple of the 256-word chunk keeps every update shape static (one
compiled program for all blocks).
"""

from __future__ import annotations

import dataclasses
import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from ..fs.chacha import ChaCha20Rng
from ..fs.merlin import Transcript
from ..fs.sampling import field_random_vec, uniform_indices
from ..ops import blake3_jax, sha256_jax
from ..ops.digest import BLAKE3, DeviceDigest
from ..ops.limbs import get_ops
from ..utils import linktime
from .encoding import LcEncoding
from . import protocol
from .protocol import (
    LcEvalProof,
    ProverError,
    _next_pow2,
    _pack_words,
    _words_to_repr_rows,
)


@functools.lru_cache(maxsize=64)
def _update_fn(n_cols: int, buf_len: int, n_full: int):
    """Jitted hasher update for static (n_cols, buf_len, n_full).

    Module-level cache: hashers are created per commit call, so per-instance
    jits would retrace every commit (seconds per trace dominated the
    streaming path before this cache).
    """

    def fn(cv, chunk_cvs, buf, words, chunks_done):
        data = jnp.concatenate([buf[:buf_len], words], axis=0)
        n_blocks = n_full * 16

        ks = np.arange(n_blocks)
        pos = ks % 16
        is_start = pos == 0
        is_end = pos == 15
        blen = np.full(n_blocks, 64, dtype=np.uint32)
        flags = (
            np.where(is_start, blake3_jax.CHUNK_START, 0)
            | np.where(is_end, blake3_jax.CHUNK_END, 0)
        ).astype(np.uint32)
        cidx = (ks // 16).astype(np.uint32)

        cv, chunk_cvs = blake3_jax.chunk_chain_scan(
            data[: n_blocks * 16].reshape(n_blocks, 16, n_cols),
            jnp.asarray(is_start), jnp.asarray(is_end), jnp.asarray(blen),
            jnp.asarray(flags), jnp.asarray(cidx), cv, chunk_cvs,
            chunk_base=chunks_done,
        )
        new_buf = jax.lax.dynamic_slice(
            jnp.pad(data, [(0, 256), (0, 0)]), (n_full * 256, 0),
            (256, n_cols),
        )
        return cv, chunk_cvs, new_buf

    # donate the carry state: chunk_cvs alone is 2.2 GB at 2^29 (65 chunk
    # CVs x 2^20 columns), and without aliasing every update holds old+new
    # copies — the difference between fitting and OOM at the largest sizes
    return jax.jit(fn, donate_argnums=(0, 1, 2))


@functools.lru_cache(maxsize=64)
def _finalize_fn(n_cols: int, rem_words: int, chunks_done: int):
    """Jitted final-partial-chunk processor (static shapes, cached)."""

    def fin(cv, chunk_cvs, buf):
        n_blocks = (rem_words + 15) // 16
        last_len = (rem_words % 16) * 4 or 64

        def body(k, carry):
            # buf starts at a chunk boundary (update() keeps processed
            # words 256-aligned), so block k of the final chunk is k
            cv, ccvs = carry
            is_last = k == n_blocks - 1
            flags = (
                jnp.where(k == 0, jnp.uint32(blake3_jax.CHUNK_START), jnp.uint32(0))
                | jnp.where(is_last, jnp.uint32(blake3_jax.CHUNK_END), jnp.uint32(0))
            )
            blen = jnp.where(is_last, jnp.uint32(last_len), jnp.uint32(64))
            m = jax.lax.dynamic_slice(buf, (k * 16, 0), (16, n_cols))
            iv = jnp.broadcast_to(
                jnp.asarray(blake3_jax._IV, jnp.uint32)[:, None], (8, n_cols)
            )
            cv_in = jnp.where(k == 0, iv, cv)
            out = blake3_jax._compress_words(
                cv_in, m, jnp.uint32(chunks_done), jnp.uint32(0), blen, flags,
            )
            ccvs2 = jax.lax.dynamic_update_slice(
                ccvs, out[None], (chunks_done, 0, 0)
            )
            return out, ccvs2

        cv, chunk_cvs = jax.lax.fori_loop(0, n_blocks, body, (cv, chunk_cvs))
        return chunk_cvs

    return jax.jit(fin, donate_argnums=(1,))


@functools.lru_cache(maxsize=64)
def _merge_fn(n_cols: int, n_chunks: int):
    """Jitted pair-adjacent chunk-CV merge (blake3's tree shape).

    One executable with the chunk-CV array DONATED: the eager per-level
    version held the (n_chunks, 8, n_cols) array plus level transients live
    simultaneously, which OOMed the 2^29 finalize (2.2 GB of chunk CVs).
    """

    def merge(cvs):
        n = n_chunks
        while n > 1:
            pairs = n // 2
            left = cvs[0 : 2 * pairs : 2]
            right = cvs[1 : 2 * pairs : 2]
            m = jnp.moveaxis(jnp.concatenate([left, right], axis=1), 1, 0)
            cv = jnp.broadcast_to(
                jnp.asarray(blake3_jax._IV, jnp.uint32)[:, None, None],
                (8, pairs, n_cols),
            )
            flags = blake3_jax.PARENT | (blake3_jax.ROOT if n == 2 else 0)
            out = blake3_jax._compress_words(
                cv, m, jnp.uint32(0), jnp.uint32(0), jnp.uint32(64),
                jnp.uint32(flags),
            )
            out = jnp.moveaxis(out, 1, 0)
            if n % 2:
                out = jnp.concatenate(
                    [out, cvs[2 * pairs : 2 * pairs + 1]], axis=0
                )
            cvs = out
            n = out.shape[0]
        return cvs[0]

    return jax.jit(merge, donate_argnums=(0,))


# Per-encoding jit caches keyed WEAKLY on the encoding instance: encodings
# are constructed per polynomial size, so a strong (lru_cache) key would pin
# every encoding (plus its jitted executables and, for SdigEncoding, device
# expander matrices) for process lifetime — a slow HBM/host leak in
# long-running provers.  Weak keys: entries die with the encoding.
_encode_pack_cache = weakref.WeakKeyDictionary()
_encode_gather_cache = weakref.WeakKeyDictionary()


def _prepare_encode_constants(enc: LcEncoding) -> None:
    """Materialize the encoding's device constants OUTSIDE any jit trace
    (lazily-built twiddle tables / expander matrices would otherwise leak
    tracers into the cache)."""
    if hasattr(enc, "_device_mats"):
        enc._device_mats()
    if hasattr(enc, "_lowmem_ntt"):
        # the MXU streaming path's tables are device-resident at MxuNtt
        # construction; only build the VPU ladder's twiddles if it will run
        mx = enc._stream_mxu_ntt() if hasattr(enc, "_stream_mxu_ntt") else None
        if mx is None:
            enc._lowmem_ntt()
        else:
            # the canonical-out variant the pack path uses must also build
            # its (k2) table outside the trace
            from ..ops.mxu_ntt import get_mxu_ntt_canonical

            in_len = None if mx.in_len == enc.n_cols else mx.in_len
            get_mxu_ntt_canonical(enc.spec, enc.n_cols, in_len)


def _stream_mats(enc: LcEncoding, canonical: bool):
    """The table pytree encode_rows_lowmem(mats=...) expects, or None.

    Ligero's streaming NTT differs from its plain-path NTT (canonical-out
    MXU variant / VPU ladder), so it exposes stream_encode_mats; other
    encodings (Brakedown) stream through encode_rows_core with the plain
    encode_mats.
    """
    if hasattr(enc, "stream_encode_mats"):
        return enc.stream_encode_mats(canonical=canonical)
    if hasattr(enc, "encode_mats"):
        return enc.encode_mats()
    return None


def _encode_pack_fn(enc: LcEncoding):
    fn = _encode_pack_cache.get(enc)
    if fn is None:
        ops = get_ops(enc.spec)
        _prepare_encode_constants(enc)
        # pack runs as the encode's `post` so it fuses INSIDE any sub-chunk
        # map (the unpacked codeword block never materializes — 2+ GB at
        # 2^29 with 8-row blocks), and canonical=True folds the Montgomery
        # R^-1 into the NTT kernel (no separate from_mont pass).  The
        # encoding's device tables thread as jit ARGUMENTS (HTTP 413
        # otherwise; see encode_mats/stream_encode_mats).
        post = lambda out: _pack_words(ops, out)
        if _stream_mats(enc, True) is not None:
            jitted = jax.jit(lambda block, mats: enc.encode_rows_lowmem(
                block, post=post, canonical=True, mats=mats))
            fn = lambda block: jitted(block, _stream_mats(enc, True))
        else:
            fn = jax.jit(lambda block: enc.encode_rows_lowmem(
                block, post=post, canonical=True))
        _encode_pack_cache[enc] = fn
    return fn


def _encode_gather_fn(enc: LcEncoding):
    fn = _encode_gather_cache.get(enc)
    if fn is None:
        _prepare_encode_constants(enc)

        if _stream_mats(enc, False) is not None:
            def gather_m(block, idx, mats):
                g = jnp.take(
                    enc.encode_rows_lowmem(block, mats=mats), idx, axis=2
                )
                return g[0::2] | (g[1::2] << jnp.uint32(16))
            jitted = jax.jit(gather_m)
            fn = lambda block, idx: jitted(block, idx, _stream_mats(enc, False))
        else:
            def gather(block, idx):
                g = jnp.take(enc.encode_rows_lowmem(block), idx, axis=2)
                return g[0::2] | (g[1::2] << jnp.uint32(16))  # packed words
            fn = jax.jit(gather)
        _encode_gather_cache[enc] = fn
    return fn


# ---- packed-coefficient variants --------------------------------------------
#
# The coefficient matrix itself dominates prover residency at the largest
# sizes (2^27 ft255 is 8 GB as u32 limbs — more than half the chip).  These
# paths keep coefficients PACKED (16-bit limb pairs in u32 words, half the
# bytes) and unpack per row block inside the jitted call, bounding the
# unpacked form to one block transient.  Packing is representation-agnostic
# (the Montgomery limbs are 16-bit either way), so results are bit-identical
# to the unpacked path — twin-tested in tests/test_streaming.py.

_encode_pack_packed_cache = weakref.WeakKeyDictionary()
_encode_gather_packed_cache = weakref.WeakKeyDictionary()


def _encode_pack_packed_fn(enc: LcEncoding):
    fn = _encode_pack_packed_cache.get(enc)
    if fn is None:
        ops = get_ops(enc.spec)
        _prepare_encode_constants(enc)
        post = lambda out: _pack_words(ops, out)
        # same mats-as-jit-arguments rule as _encode_pack_fn: without it a
        # packed Brakedown sweep re-embeds the expander matrices as HLO
        # constants (HTTP 413 at 2^27+)
        if _stream_mats(enc, True) is not None:
            jitted = jax.jit(lambda block, mats: enc.encode_rows_lowmem(
                protocol._unpack_words_dev(block), post=post,
                canonical=True, mats=mats))
            fn = lambda block: jitted(block, _stream_mats(enc, True))
        else:
            fn = jax.jit(
                lambda block: enc.encode_rows_lowmem(
                    protocol._unpack_words_dev(block), post=post,
                    canonical=True
                )
            )
        _encode_pack_packed_cache[enc] = fn
    return fn


def _encode_gather_packed_fn(enc: LcEncoding):
    fn = _encode_gather_packed_cache.get(enc)
    if fn is None:
        _prepare_encode_constants(enc)

        if _stream_mats(enc, False) is not None:
            def gather_m(block, idx, mats):
                rows = enc.encode_rows_lowmem(
                    protocol._unpack_words_dev(block), mats=mats)
                g = jnp.take(rows, idx, axis=2)
                return g[0::2] | (g[1::2] << jnp.uint32(16))
            jitted = jax.jit(gather_m)
            fn = lambda block, idx: jitted(block, idx, _stream_mats(enc, False))
        else:
            def gather(block, idx):
                rows = enc.encode_rows_lowmem(
                    protocol._unpack_words_dev(block))
                g = jnp.take(rows, idx, axis=2)
                return g[0::2] | (g[1::2] << jnp.uint32(16))  # packed words
            fn = jax.jit(gather)
        _encode_gather_packed_cache[enc] = fn
    return fn


@functools.lru_cache(maxsize=8)
def _collapse_packed_fns(ops):
    """Jitted helpers for the packed-coefficient collapse: per-block partial
    (canonical limbs), modular accumulate, and final word packing."""

    def block(ts_blk, cblk):
        return ops.collapse_canon(ts_blk, protocol._unpack_words_dev(cblk))

    def pack_tc(canon):  # (W, T, C) -> (T, C, W/2) wire words
        words = canon[0::2] | (canon[1::2] << jnp.uint32(16))
        return jnp.transpose(words, (1, 2, 0))

    return jax.jit(block), jax.jit(ops.add), jax.jit(pack_tc)


@functools.lru_cache(maxsize=8)
def _gather_canon_fn(ops):
    """Jitted: opened columns out of the retained canonical word buffer.

    Gathers the column words, unpacks to canonical limbs, converts to
    Montgomery form (the proof wire form, lib.rs:401-408) and repacks, plus
    the unique Merkle path digests — one dispatch, one pull."""
    wpe = ops.w // 2

    def g(words, hashes_dev, idx, path_uniq):
        cols = jnp.take(words, idx, axis=1)              # (R*wpe, k)
        k = cols.shape[1]
        c = cols.reshape(-1, wpe, k)                     # (R, wpe, k)
        lo = c & jnp.uint32(0xFFFF)
        hi = c >> jnp.uint32(16)
        canon = jnp.stack([lo, hi], axis=2).reshape(c.shape[0], 2 * wpe, k)
        mont = ops.to_mont(jnp.transpose(canon, (1, 0, 2)))  # (W, R, k)
        packed = mont[0::2] | (mont[1::2] << jnp.uint32(16))
        path_digs = jnp.take(hashes_dev, path_uniq, axis=1)
        return packed, path_digs

    return jax.jit(g)


class StreamingColumnHasher:
    """Per-column BLAKE3 over row blocks with a sub-chunk carry buffer."""

    def __init__(self, n_cols: int, total_words: int):
        self.n_cols = n_cols
        self.total_words = total_words  # includes the 8-word zero prefix
        self.n_chunks = max(1, (total_words + 255) // 256)
        assert self.n_chunks > 1, "streaming hasher expects multi-chunk columns"
        self.chunk_cvs = jnp.zeros((self.n_chunks, 8, n_cols), dtype=jnp.uint32)
        self.cv = jnp.broadcast_to(
            jnp.asarray(blake3_jax._IV, jnp.uint32)[:, None], (8, n_cols)
        )
        self.buf = jnp.zeros((256, n_cols), dtype=jnp.uint32)
        self.buf_len = 8  # the zero prefix
        self.words_done = 0
        self.chunks_done = 0

    def update(self, words: jnp.ndarray) -> None:
        """words: (L, n_cols) u32 appended to every column's stream."""
        l = words.shape[0]
        total = self.buf_len + l
        n_full = total // 256
        # never consume the final chunk here; finalize() handles its flags
        is_final = self.words_done + l + 8 == self.total_words
        if is_final and total % 256 == 0 and n_full > 0:
            n_full -= 1
        fn = _update_fn(self.n_cols, self.buf_len, n_full)
        self.cv, self.chunk_cvs, self.buf = fn(
            self.cv, self.chunk_cvs, self.buf, words,
            jnp.int32(self.chunks_done),
        )
        self.buf_len = total - n_full * 256
        self.words_done += l
        self.chunks_done += n_full

    def finalize(self) -> jnp.ndarray:
        """Process the final partial chunk and merge the chunk tree."""
        assert self.words_done + 8 == self.total_words, (
            self.words_done, self.total_words
        )
        rem_words = self.buf_len
        assert rem_words > 0

        fin = _finalize_fn(self.n_cols, rem_words, self.chunks_done)
        chunk_cvs = fin(self.cv, self.chunk_cvs, self.buf)
        assert self.chunks_done + 1 == self.n_chunks
        # the carry state is dead now; at 2^29 buf+cv hold >1 GB the merge
        # transients need
        self.cv = self.buf = self.chunk_cvs = None
        return _merge_fn(self.n_cols, self.n_chunks)(chunk_cvs)


@functools.lru_cache(maxsize=64)
def _sha_update_fn(n_cols: int, buf_len: int, n_full: int):
    """Jitted SHA-256 block absorber for static (n_cols, buf_len, n_full)."""

    def fn(h, buf, words):
        data = jnp.concatenate([buf[:buf_len], words], axis=0)
        blocks = sha256_jax._bswap32(data[: n_full * 16]).reshape(
            n_full, 16, n_cols
        )
        h, _ = jax.lax.scan(
            lambda c, b: (sha256_jax._compress(c, b), None), h, blocks
        )
        new_buf = jax.lax.dynamic_slice(
            jnp.pad(data, [(0, 16), (0, 0)]), (n_full * 16, 0), (16, n_cols)
        )
        return h, new_buf

    return jax.jit(fn, donate_argnums=(0, 1))


@functools.lru_cache(maxsize=64)
def _sha_finalize_fn(n_cols: int, rem: int, total_words: int):
    """Jitted final-block processor: padding + 64-bit length (static shapes)."""

    msg_bits = total_words * 32
    n_blocks = 1 if rem + 3 <= 16 else 2  # pad word + 2 length words must fit

    def fin(h, buf):
        be = sha256_jax._bswap32(buf[:rem])
        tail = jnp.zeros((n_blocks * 16 - rem, n_cols), jnp.uint32)
        be = jnp.concatenate([be, tail], axis=0)
        be = be.at[rem].set(jnp.uint32(0x80000000))
        be = be.at[n_blocks * 16 - 2].set(jnp.uint32(msg_bits >> 32))
        be = be.at[n_blocks * 16 - 1].set(jnp.uint32(msg_bits & 0xFFFFFFFF))
        for b in range(n_blocks):
            h = sha256_jax._compress(h, be[b * 16 : (b + 1) * 16])
        return sha256_jax._bswap32(h)

    return jax.jit(fin)


class StreamingSha256Hasher:
    """Per-column SHA-256 over row blocks (Merkle-Damgard carry buffer).

    Same update/finalize interface as StreamingColumnHasher and bit-identical
    to sha256_jax.hash_word_columns over the concatenated stream; SHA-256 has
    no chunk tree, so the carry state is just (h, <16 buffered words)."""

    def __init__(self, n_cols: int, total_words: int):
        self.n_cols = n_cols
        self.total_words = total_words  # includes the 8-word zero prefix
        self.h = jnp.broadcast_to(
            jnp.asarray(sha256_jax._H0, jnp.uint32)[:, None], (8, n_cols)
        )
        self.buf = jnp.zeros((16, n_cols), dtype=jnp.uint32)
        self.buf_len = 8  # the zero prefix
        self.words_done = 0

    def update(self, words: jnp.ndarray) -> None:
        l = words.shape[0]
        total = self.buf_len + l
        n_full = total // 16
        fn = _sha_update_fn(self.n_cols, self.buf_len, n_full)
        self.h, self.buf = fn(self.h, self.buf, words)
        self.buf_len = total - n_full * 16
        self.words_done += l

    def finalize(self) -> jnp.ndarray:
        assert self.words_done + 8 == self.total_words, (
            self.words_done, self.total_words
        )
        fn = _sha_finalize_fn(self.n_cols, self.buf_len, self.total_words)
        return fn(self.h, self.buf)


# streaming hashers by digest name (the digest= plug point of the streaming
# path; protocol.commit covers the non-streaming one)
_STREAM_HASHERS = {
    "blake3": StreamingColumnHasher,
    "sha256": StreamingSha256Hasher,
}


@dataclasses.dataclass
class LcCommitStreaming:
    """Commit state without the Montgomery codeword matrix.

    When the packed CANONICAL codeword fits the HBM budget it is retained
    (words_dev, (n_rows*W/2, n_cols) u32 — half the bytes of the Montgomery
    limb form), so prove gathers opened columns directly; with
    spill="host" it is retained in host RAM instead (words_host) and prove
    gathers there; otherwise prove re-encodes the coefficient blocks on
    demand (the trade the reference never faces: its LcCommit always holds
    the codeword, lib.rs:173-184).  Coefficients live behind a CoeffSource
    (device array / host RAM / seeded regeneration — see core/coeffs.py);
    `coeffs` is the device matrix view when the source is array-backed,
    else None.  Like LcCommit, the Merkle array stays on device as digest
    words; the byte view (serialization) materializes lazily.
    """

    enc: LcEncoding
    source: "object"  # CoeffSource
    coeffs: "jnp.ndarray | None"  # (W or W/2, n_rows, n_per_row) if array-backed
    n_rows: int
    n_per_row: int
    n_cols: int
    hashes_dev: jnp.ndarray  # (8, 2*np2-1) u32 digest words, leaves first
    row_block: int
    digest: DeviceDigest = BLAKE3
    words_dev: "jnp.ndarray | None" = None  # (n_rows*W/2, n_cols) canonical
    words_off: int = 0  # words_dev holds columns [words_off:] only (tail keep)
    words_host: "np.ndarray | None" = None  # same layout, host RAM spill
    packed: bool = False  # coeffs held as (W/2, n_rows, n_per_row) u32 words
    _hashes_np: "np.ndarray | None" = None
    _root: "bytes | None" = None

    @property
    def hashes(self) -> np.ndarray:
        if self._hashes_np is None:
            self._hashes_np = blake3_jax.digests_to_bytes(
                np.asarray(self.hashes_dev)
            )
        return self._hashes_np

    def get_root(self) -> bytes:
        if self._root is None:
            if self._hashes_np is not None:
                self._root = bytes(self._hashes_np[-1])
            else:
                self._root = blake3_jax.digests_to_bytes(
                    np.asarray(self.hashes_dev[:, -1:])
                )[0].tobytes()
        return self._root

    def get_n_rows(self) -> int:
        return self.n_rows

    def get_n_per_row(self) -> int:
        return self.n_per_row

    def get_n_cols(self) -> int:
        return self.n_cols

    def prove(self, outer_tensor: list[int], tr: Transcript) -> LcEvalProof:
        return prove_streaming(self, outer_tensor, self.enc, tr)


def _row_block_for(spec, n_rows: int, n_cols: int,
                   requested: int | None, resident_bytes: int = 0) -> int:
    """Pick the encode/hash row block.

    Sized from an HBM budget: the block's transient footprint is ~3
    codeword-block copies for the NTT/SpMV ladder plus the packed word
    block.  The budget is min(LCPC_STREAM_BYTES, usable HBM minus the
    RESIDENT arrays — coefficients, the retained canonical codeword, hasher
    carry state): at 2^25 ft255 those already hold ~6.5 GB, and sizing
    blocks from a fixed 6 GiB on top of that OOMs the chip.  Large blocks
    are rounded so the per-column word count is 256-aligned (the hasher's
    carry buffer stays empty — one compiled update); small blocks fall back
    to a power of two, whose carry length cycles through <= 8 values (a
    handful of cached traces) — this is what lets 2^25 ft255 codewords
    (10 GB per 256 rows) stream on a 16 GB chip with 32..128-row blocks.
    """
    from ..utils import hbm as hbm_budget

    wpe = spec.w16 // 2
    if requested is None:
        budget = hbm_budget.stream_bytes()
        hbm = hbm_budget.usable_hbm_bytes()
        if hbm - resident_bytes < 512 << 20:
            import warnings

            warnings.warn(
                f"streaming commit: resident arrays ({resident_bytes >> 20}"
                f" MiB) leave under 512 MiB of the {hbm >> 20} MiB usable "
                "HBM for block transients; falling back to minimum-size row "
                "blocks (throughput will suffer). Consider packed "
                "coefficients or a host-resident CoeffSource."
            )
        budget = max(min(budget, hbm - resident_bytes), 512 << 20)
        per_row = n_cols * (12 * spec.w16 + 4 * wpe) + 1
        requested = max(32, budget // per_row)
    rb = max(1, min(requested, n_rows))
    align = 256 // np.gcd(256, wpe)  # rows per 256-word boundary
    if rb >= align:
        return (rb // align) * align
    # sub-alignment fallback: largest power of two NOT exceeding the budget
    # (rounding up here once OOMed a 2^29-scale commit), floor 8 rows so the
    # carry-buffer shape set stays small
    return 1 << max(3, rb.bit_length() - 1)


def commit_streaming(coeffs, enc: LcEncoding, row_block: int | None = None,
                     digest: DeviceDigest = BLAKE3,
                     packed: "bool | None" = None,
                     spill: str = "auto") -> LcCommitStreaming:
    """Streaming commit over row blocks (see module docstring).

    `coeffs` is a list of ints, a limb-major uint32 array in Montgomery
    form, or a CoeffSource (core/coeffs.py — host-RAM or seeded device
    generation for beyond-HBM sizes).  For arrays the leading axis selects
    the layout: W rows = one 16-bit limb per row; W/2 rows = PACKED (limb
    pairs in u32 words, half the resident bytes).  The layout is inferred
    from that shape unless `packed=` is passed explicitly, which also
    asserts the shape matches.

    `spill` controls where the packed canonical codeword is retained for
    prove's column gather:
      "auto"   device when it fits the HBM keep budget, else dropped;
      "device" force device-resident (may OOM);
      "host"   spill per-block to host RAM (prove gathers there — the
               right mode on PCIe-attached hosts for >HBM codewords);
      "none"   never retain (prove re-encodes blocks on demand).
    """
    from . import coeffs as coeffs_mod

    ops = get_ops(enc.spec)
    hasher_cls = _STREAM_HASHERS.get(digest.name)
    if hasher_cls is None:
        raise ValueError(f"no streaming hasher for digest {digest.name!r}")
    assert spill in ("auto", "device", "host", "none"), spill
    source = coeffs_mod.as_source(coeffs, enc.spec, packed=packed)
    length = source.length

    n_rows, n_per_row, n_cols = enc.get_dims(length)
    assert enc.dims_ok(n_per_row, n_cols)
    source.set_dims(n_rows, n_per_row)
    array_backed = isinstance(source, coeffs_mod.ArrayCoeffSource)
    src_packed = bool(getattr(source, "packed", False))

    wpe = enc.spec.w16 // 2
    total_words = 8 + n_rows * wpe

    # retain the packed canonical codeword when it fits the budget: prove
    # then gathers columns in one dispatch instead of re-encoding every
    # block (at 2^25 ligero the re-encode costs ~a full commit per proof)
    from ..utils import hbm as hbm_budget

    keep_bytes = n_rows * wpe * n_cols * 4
    if spill == "auto":
        keep = keep_bytes <= hbm_budget.keep_bytes_budget()
    else:
        keep = spill == "device"
    host_spill = spill == "host"
    # tail keep: systematic encodings (Brakedown: codeword = [x | z | v],
    # encode.rs:36-94) don't need the first n_per_row columns retained —
    # those ARE the coefficients, which prove can gather from the resident
    # matrix / regenerate from the source.  When the full codeword misses
    # the keep budget, retaining just the non-systematic tail (~35% of the
    # sdig codeword) turns prove's column opening from a full re-encode of
    # every block (~a second commit) into two gathers.
    words_off = 0
    sys_pref = getattr(enc, "systematic_prefix", 0)
    if (spill == "auto" and not keep and sys_pref
            and not isinstance(source, coeffs_mod.HostCoeffSource)):
        tail_bytes = n_rows * wpe * (n_cols - sys_pref) * 4
        if tail_bytes <= hbm_budget.keep_bytes_budget():
            keep = True
            words_off = sys_pref
            keep_bytes = tail_bytes

    # arrays resident for the whole commit, which the block transients must
    # fit alongside: coefficients, the retained codeword, hasher carry state
    n_chunks = max(1, (total_words + 255) // 256)
    resident = (source.resident_bytes + (keep_bytes if keep else 0)
                + (n_chunks + 2) * 8 * n_cols * 4 + 256 * n_cols * 4)
    # the MXU streaming encode adds its own bounded sub-chunk transient
    # (LCPC_MXU_STREAM_BYTES, see ligero.encode_rows_lowmem) on top of the
    # per-row-block footprint — reserve it here so block sizing stays honest
    if hasattr(enc, "_stream_mxu_ntt") and enc._stream_mxu_ntt() is not None:
        resident += hbm_budget.mxu_stream_bytes()
    rb = _row_block_for(enc.spec, n_rows, n_cols, row_block, resident)
    hasher = hasher_cls(n_cols, total_words)

    if array_backed:
        # fused path: the (possibly packed) resident block feeds the jit
        # directly, unpacking inside the trace
        encode_pack = (_encode_pack_packed_fn(enc) if src_packed
                       else _encode_pack_fn(enc))
        get_block = source.raw_block
    else:
        encode_pack = _encode_pack_fn(enc)
        get_block = source.block
    words_dev = (jnp.zeros((n_rows * wpe, n_cols - words_off), jnp.uint32)
                 if keep else None)
    words_host = (np.empty((n_rows * wpe, n_cols), np.uint32)
                  if host_spill else None)
    write = jax.jit(
        lambda buf, w, i: jax.lax.dynamic_update_slice(
            buf, w[:, words_off:], (i, 0)),
        donate_argnums=0,
    )

    prev_words = None
    for r0 in range(0, n_rows, rb):
        r1 = min(r0 + rb, n_rows)
        words = encode_pack(get_block(r0, r1))
        hasher.update(words)  # async dispatch; overlaps any host spill below
        if keep:
            words_dev = write(words_dev, words, r0 * wpe)
        elif host_spill:
            words_host[r0 * wpe : r1 * wpe] = np.asarray(words)
        # bound dispatch run-ahead to a two-block pipeline: without this the
        # host queues many blocks of encode transients before the device
        # retires any, and the aggregate live footprint OOMs at 2^29 even
        # though each block alone fits comfortably
        if prev_words is not None:
            prev_words.block_until_ready()
        prev_words = words

    leaves = hasher.finalize()  # (8, n_cols)

    n_cols_np2 = _next_pow2(n_cols)
    if n_cols_np2 > n_cols:
        leaves = jnp.pad(leaves, [(0, 0), (0, n_cols_np2 - n_cols)])
    layers = [leaves]
    while layers[-1].shape[1] > 1:
        layers.append(digest.merkle_layer(layers[-1]))
    flat = jnp.concatenate(layers, axis=1)

    return LcCommitStreaming(
        enc=enc, source=source,
        coeffs=source._mat if array_backed else None,
        n_rows=n_rows, n_per_row=n_per_row,
        n_cols=n_cols, hashes_dev=flat, row_block=rb, digest=digest,
        words_dev=words_dev, words_off=words_off, words_host=words_host,
        packed=src_packed,
    )


@functools.lru_cache(maxsize=8)
def _collapse_block_fns(ops):
    """Jitted helpers for the generic blocked collapse over UNPACKED limb
    blocks (CoeffSource path): per-block canonical partial, modular
    accumulate, and final wire-word packing."""

    def block(ts_blk, cblk):
        return ops.collapse_canon(ts_blk, cblk)

    def pack_tc(canon):  # (W, T, C) -> (T, C, W/2) wire words
        words = canon[0::2] | (canon[1::2] << jnp.uint32(16))
        return jnp.transpose(words, (1, 2, 0))

    return jax.jit(block), jax.jit(ops.add), jax.jit(pack_tc)


@functools.lru_cache(maxsize=8)
def _sys_pack_fn(ops):
    """Jitted: Montgomery limb block -> packed proof words of taken columns.

    Systematic column c < n_per_row of a Brakedown codeword IS coefficient
    column c (encode.rs:36-94 layout [x | z | v]), already in the proof's
    Montgomery form — no canonicalize/to_mont round trip."""

    def g(block, idx):
        cols = jnp.take(block, idx, axis=2)  # (W, m, k)
        return cols[0::2] | (cols[1::2] << jnp.uint32(16))

    return jax.jit(g)


@functools.lru_cache(maxsize=8)
def _merge_sys_tail_fn(ops):
    return jax.jit(
        lambda sys_w, tail_w, is_sys: jnp.where(
            is_sys[None, None, :], sys_w, tail_w
        )
    )


@functools.lru_cache(maxsize=8)
def _host_cols_to_proof_fn(ops):
    """Jitted: host-gathered canonical column words -> packed Montgomery
    proof words (the wire form).  Mirrors _gather_canon_fn minus the
    on-device gather (numpy did it against the host-spilled codeword)."""
    wpe = ops.w // 2

    def g(cols):  # (R*wpe, k) canonical words
        k = cols.shape[1]
        c = cols.reshape(-1, wpe, k)
        lo = c & jnp.uint32(0xFFFF)
        hi = c >> jnp.uint32(16)
        canon = jnp.stack([lo, hi], axis=2).reshape(c.shape[0], 2 * wpe, k)
        mont = ops.to_mont(jnp.transpose(canon, (1, 0, 2)))  # (W, R, k)
        return mont[0::2] | (mont[1::2] << jnp.uint32(16))

    return jax.jit(g)


def _prove_row_block(comm: LcCommitStreaming, bytes_per_elem: int) -> int:
    """Row block for prove's collapse/column-eval passes.

    The commit's row_block is sized for the NTT/SpMV encode transients
    (~12x codeword bytes per row); prove's passes only hold one coefficient
    block (`bytes_per_elem` in its in-flight layout) plus small
    digit/accumulator transients, so much larger blocks fit — and block
    size is MXU efficiency here (the eval conv's batch dim is the row
    count; 32-row blocks measured ~21 int8-Tops vs >100 at 256).  Sized so
    two blocks (dispatch pipeline) fit beside the resident arrays with
    1 GiB slack.
    """
    from ..utils import hbm as hbm_budget

    resident = comm.hashes_dev.nbytes
    if comm.coeffs is not None:
        resident += comm.coeffs.nbytes
    if comm.words_dev is not None:
        resident += comm.words_dev.nbytes
    free = hbm_budget.usable_hbm_bytes() - resident - (1 << 30)
    per_row = comm.n_per_row * bytes_per_elem
    rb = max(comm.row_block, free // (2 * per_row))
    rb = min(rb, comm.n_rows)
    if rb > comm.row_block:
        rb = 1 << (rb.bit_length() - 1)  # pow2: small trace-shape set
    return max(1, rb)


def _prove_block_source(comm: LcCommitStreaming):
    """(get_block, in_form, bytes_per_elem) for prove's MXU passes.

    Picks the cheapest in-flight layout the commit state supports: digit
    planes from a digit-generating CoeffSource (no digitization pass at
    all), the packed resident matrix sliced as-is (unpacked per chunk
    in-kernel), or plain limb blocks.
    """
    ops = get_ops(comm.enc.spec)
    if comm.coeffs is not None and comm.packed:
        return (lambda r0, r1: comm.coeffs[:, r0:r1, :]), "packed", ops.w * 2
    if comm.coeffs is not None:
        return (lambda r0, r1: comm.coeffs[:, r0:r1, :]), "limbs", ops.w * 4
    if hasattr(comm.source, "block_digits"):
        # in-flight bytes per element: the at-rest digit planes (w7) plus
        # the generator's bounded transients — lax.map batching caps the
        # threefry halves at a batch's share, but the post-map transpose
        # still copies the whole span once, so budget ~3x the plane bytes
        # (sized at 2^29: 128-row blocks, ~1.2 GB at rest + ~2.5 GB gen)
        w7 = (comm.enc.spec.num_bits + 6) // 7
        return comm.source.block_digits, "digits", 3 * w7
    return comm.source.block, "limbs", ops.w * 4


def prove_streaming(comm: LcCommitStreaming, outer_tensor: list[int],
                    enc: LcEncoding, tr: Transcript) -> LcEvalProof:
    import os

    from ..ops import mxu_prove

    spec = enc.spec
    ops = get_ops(spec)
    if len(outer_tensor) != comm.n_rows:
        raise ProverError("OuterTensor", "outer tensor: wrong size")

    # same size gate as protocol.prove: below ~2^22 elements the
    # single-dispatch VPU collapse has lower latency than the digit kernel's
    # build + extra dispatches (LCPC_MXU_PROVE=1 forces, for the twin tests)
    use_mxu = mxu_prove.mxu_prove_enabled(spec) and (
        comm.n_rows * comm.n_per_row >= (1 << 22)
        or os.environ.get("LCPC_MXU_PROVE") == "1"
    )
    mc = (mxu_prove.MxuCollapse(spec, comm.n_rows, packed=comm.packed)
          if use_mxu else None)
    blk_src, blk_form, blk_bpe = _prove_block_source(comm)
    prove_rb = _prove_row_block(comm, blk_bpe)

    # fused collapse: one device dispatch + one pull per FS round, with the
    # eval collapse riding the final degree test (see protocol.prove)
    n_degree_tests_ = enc.get_n_degree_tests()
    assert n_degree_tests_ >= 1  # eval collapse rides the last iteration
    outer_limbs = ops.encode_host(outer_tensor)
    p_random_rows: list[np.ndarray] = []
    eval_rows = None
    for i in range(n_degree_tests_):
        key = tr.challenge_bytes(enc.LABEL_DT, 32)
        rand_tensor = field_random_vec(spec, ChaCha20Rng(key), comm.n_rows)
        t = ops.encode_host(rand_tensor)
        if i == n_degree_tests_ - 1:
            ts = np.stack([t, outer_limbs], axis=1)
            ts_ints = [rand_tensor, outer_tensor]
        else:
            ts = t[:, None, :]
            ts_ints = [rand_tensor]
        if mc is not None and comm.coeffs is not None:
            # MXU digit-conv collapse over the resident (possibly packed)
            # coefficient matrix — contraction chunked to the conv cap
            words = linktime.pull(mc(ts_ints, comm.coeffs))
        elif mc is not None:
            # CoeffSource path: same kernel, rows streamed per block in
            # the source's cheapest layout (digit planes for seeded)
            mc_src = mxu_prove.MxuCollapse(spec, comm.n_rows,
                                           in_form=blk_form)
            words = linktime.pull(mc_src.collapse_source(
                ts_ints, blk_src, comm.n_rows, prove_rb
            ))
        elif comm.coeffs is not None and not comm.packed:
            words = linktime.pull(
                ops.collapse_words(linktime.push(ts), comm.coeffs)
            )
        elif comm.coeffs is not None:
            # per-block collapse with modular accumulation: each block's
            # partial is canonical (< p), so ops.add combines them exactly;
            # only one block's unpacked limbs are ever transient
            blk, acc_add, pack_tc = _collapse_packed_fns(ops)
            ts_dev = linktime.push(ts)
            acc = None
            rb_c = comm.row_block
            for r0 in range(0, comm.n_rows, rb_c):
                r1 = min(r0 + rb_c, comm.n_rows)
                part = blk(ts_dev[:, :, r0:r1], comm.coeffs[:, r0:r1, :])
                acc = part if acc is None else acc_add(acc, part)
            words = linktime.pull(pack_tc(acc))
        else:
            # CoeffSource path (host-resident or seeded): same blocked
            # accumulation over regenerated/uploaded unpacked blocks.
            # collapse_canon wants (W, R, C); a block arrives (W, m, npr).
            blk, acc_add, pack_tc = _collapse_block_fns(ops)
            ts_dev = linktime.push(ts)
            acc = None
            rb_c = comm.row_block
            for r0 in range(0, comm.n_rows, rb_c):
                r1 = min(r0 + rb_c, comm.n_rows)
                part = blk(ts_dev[:, :, r0:r1], comm.source.block(r0, r1))
                acc = part if acc is None else acc_add(acc, part)
            words = linktime.pull(pack_tc(acc))
        rows = _words_to_repr_rows(words[0])
        tr.append_elements(enc.LABEL_PR, rows)
        p_random_rows.append(rows)
        if i == n_degree_tests_ - 1:
            eval_rows = _words_to_repr_rows(words[1])

    tr.append_elements(enc.LABEL_PE, eval_rows)

    key = tr.challenge_bytes(enc.LABEL_CO, 32)
    cols_to_open = uniform_indices(
        comm.n_cols, ChaCha20Rng(key), enc.get_n_col_opens()
    )

    # gather the opened columns: from the retained canonical codeword in one
    # dispatch when device-resident, from the host-spilled copy by numpy
    # gather when spill="host", else by re-encoding coefficient blocks; the
    # Merkle path nodes gather from the device hash array either way
    idx = jnp.asarray(np.asarray(cols_to_open, dtype=np.int32))
    path_idx = protocol.path_node_indices(comm.n_cols, cols_to_open)
    uniq, inv = np.unique(path_idx.reshape(-1), return_inverse=True)
    if comm.words_dev is not None and comm.words_off:
        # tail keep: words_dev holds only the non-systematic columns.
        # Opened systematic columns gather straight from the (resident or
        # regenerated) Montgomery coefficients; the rest from the retained
        # canonical tail; one where() merges and one pull ships the proof.
        off = comm.words_off
        idx_np = np.asarray(cols_to_open, dtype=np.int64)
        tail_idx = jnp.asarray(np.maximum(idx_np - off, 0).astype(np.int32))
        tail_w, path_digs = _gather_canon_fn(ops)(
            comm.words_dev, comm.hashes_dev, tail_idx,
            jnp.asarray(uniq.astype(np.int32)),
        )
        sys_idx = jnp.asarray(np.minimum(idx_np, off - 1).astype(np.int32))
        if comm.coeffs is not None and comm.packed:
            sys_w = jax.jit(lambda c, i: jnp.take(c, i, axis=2))(
                comm.coeffs, sys_idx)
        elif comm.coeffs is not None:
            sys_w = _sys_pack_fn(ops)(comm.coeffs, sys_idx)
        else:
            # source-backed: regenerate limb blocks (commit-sized blocks —
            # the limb form is ~2x the digit planes) and take columns
            k = len(cols_to_open)
            buf = jnp.zeros((ops.w // 2, comm.n_rows, k), jnp.uint32)
            wr = jax.jit(
                lambda b, w, i: jax.lax.dynamic_update_slice(b, w, (0, i, 0)),
                donate_argnums=0,
            )
            for r0 in range(0, comm.n_rows, comm.row_block):
                r1 = min(r0 + comm.row_block, comm.n_rows)
                buf = wr(buf, _sys_pack_fn(ops)(
                    comm.source.block(r0, r1), sys_idx), r0)
            sys_w = buf
        is_sys = jnp.asarray(idx_np < off)
        col_w = linktime.pull(
            _merge_sys_tail_fn(ops)(sys_w, tail_w, is_sys))
    elif comm.words_dev is not None:
        col_w_dev, path_digs = _gather_canon_fn(ops)(
            comm.words_dev, comm.hashes_dev, idx,
            jnp.asarray(uniq.astype(np.int32)),
        )
        col_w = linktime.pull(col_w_dev)
    elif comm.words_host is not None:
        path_digs = jnp.take(comm.hashes_dev, jnp.asarray(uniq), axis=1)
        cols_np = np.ascontiguousarray(
            comm.words_host[:, np.asarray(cols_to_open, dtype=np.int64)]
        )
        col_w = linktime.pull(_host_cols_to_proof_fn(ops)(
            linktime.push(cols_np)))
        col_w = col_w.reshape(ops.w // 2, comm.n_rows, len(cols_to_open))
    else:
        path_digs = jnp.take(comm.hashes_dev, jnp.asarray(uniq), axis=1)
        # direct MXU column evaluation (RS codes): opened column c is the
        # row polynomial at w^bitrev(c), so the k columns come from one
        # digit-conv contraction per row block instead of re-encoding the
        # whole codeword (a re-encode gather costs ~a full commit)
        k = len(cols_to_open)
        use_eval = use_mxu and getattr(enc, "supports_direct_col_eval", False)
        pieces = []
        rb = comm.row_block
        if use_eval:
            ev = mxu_prove.MxuColumnEval(enc)
            ev.set_columns(cols_to_open)
            # accumulate per-block columns ON DEVICE and pull once: at 2^29
            # the 256 tiny per-block pulls cost ~30 ms of link latency EACH
            wpe2 = get_ops(spec).w // 2
            buf = jnp.zeros((wpe2, comm.n_rows, k), jnp.uint32)
            wr = jax.jit(
                lambda b, w, i: jax.lax.dynamic_update_slice(b, w, (0, i, 0)),
                donate_argnums=0,
            )
            # prove-sized row blocks (MXU batch efficiency) in the source's
            # cheapest layout; two-deep dispatch pipeline so queued block
            # transients stay bounded
            prev = None
            for r0 in range(0, comm.n_rows, prove_rb):
                r1 = min(r0 + prove_rb, comm.n_rows)
                part = ev.eval_block(blk_src(r0, r1), in_form=blk_form)
                buf = wr(buf, part, r0)
                if prev is not None:
                    prev.block_until_ready()
                prev = part
            col_w = linktime.pull(buf)
        else:
            if comm.coeffs is not None:
                gather = (_encode_gather_packed_fn(enc) if comm.packed
                          else _encode_gather_fn(enc))
                get_block = lambda r0, r1: comm.coeffs[:, r0:r1, :]
            else:
                gather = _encode_gather_fn(enc)
                get_block = comm.source.block
            for r0 in range(0, comm.n_rows, rb):
                r1 = min(r0 + rb, comm.n_rows)
                pieces.append(linktime.pull(gather(get_block(r0, r1), idx)))
            col_w = np.concatenate(pieces, axis=1)  # (W/2, n_rows, k)

    return LcEvalProof(
        n_cols=comm.n_cols, p_eval_rows=eval_rows, p_random_rows=p_random_rows,
        columns_batched=protocol._columns_from_parts(
            col_w, linktime.pull(path_digs), inv,
            len(cols_to_open), path_idx.shape[1],
        ),
    )
