"""Block-wise coefficient sources for beyond-HBM commits.

At the reference's headline size (2^29 ft255,
doc/benchmark-results/20210807_64c_255bit_ligero_dfl.txt:21) the coefficient
vector alone is 16 GiB packed — larger than the chip's HBM — so the
streaming commit cannot hold coefficients device-resident at all.  A
CoeffSource supplies Montgomery limb blocks on demand:

- ArrayCoeffSource: wraps a device-resident array (the small-N fast path;
  identical behavior to passing the array directly).
- HostCoeffSource: coefficients live in host RAM (numpy); each block is
  uploaded on request.  The right choice on PCIe-attached hardware; on a
  tunneled link the upload dominates.
- SeededCoeffSource: blocks are (re)generated on device from a fixed PRNG
  key — deterministic per element index, independent of the block
  partitioning.  Commit streams the blocks through encode+hash, prove
  regenerates them for the collapse, and nothing is ever resident beyond
  one block.  This is what lets a 16 GB chip commit to 2^29 coefficients.

All sources emit (W, m, n_per_row)-shaped Montgomery 16-bit-limb blocks for
row ranges, zero-padded past `length` (the commit matrix padding,
lib.rs:640-645).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.spec import FieldSpec
from ..ops.limbs import get_ops


class CoeffSource:
    """Interface: supplies Montgomery coefficient blocks by row range."""

    length: int  # number of coefficients (pre-padding)
    spec: FieldSpec

    def set_dims(self, n_rows: int, n_per_row: int) -> None:
        """Called once by commit with the matrix shape before any block()."""
        self.n_rows = n_rows
        self.n_per_row = n_per_row

    def block(self, r0: int, r1: int) -> jnp.ndarray:
        """Rows [r0, r1) as (W, r1-r0, n_per_row) Montgomery limbs (padded)."""
        raise NotImplementedError

    @property
    def resident_bytes(self) -> int:
        """Device-resident footprint commit must budget around."""
        return 0


class ArrayCoeffSource(CoeffSource):
    """Device-resident coefficients; block() is a slice of the padded matrix.

    Accepts (W, N) unpacked limbs or (W/2, N) packed words (u32); the packed
    form stays packed at rest (half the bytes) and unpacks per block.
    """

    def __init__(self, arr, spec: FieldSpec, packed: "bool | None" = None):
        self.spec = spec
        ops = get_ops(spec)
        self.arr = jnp.asarray(arr)
        self.length = self.arr.shape[1]
        if packed is None:
            packed = self.arr.shape[0] == ops.w // 2
        expect = ops.w // 2 if packed else ops.w
        assert self.arr.shape[0] == expect, (self.arr.shape, packed)
        self.packed = packed
        self._mat = None

    def set_dims(self, n_rows: int, n_per_row: int) -> None:
        super().set_dims(n_rows, n_per_row)
        pad = n_rows * n_per_row - self.length
        arr = self.arr
        if pad:
            arr = jnp.pad(arr, [(0, 0), (0, pad)])
        self._mat = arr.reshape(arr.shape[0], n_rows, n_per_row)

    def block(self, r0: int, r1: int) -> jnp.ndarray:
        blk = self._mat[:, r0:r1, :]
        if self.packed:
            from .protocol import _unpack_words_dev

            blk = _unpack_words_dev(blk)
        return blk

    def raw_block(self, r0: int, r1: int) -> jnp.ndarray:
        """Native-layout slice (packed stays packed) for fused jit callees."""
        return self._mat[:, r0:r1, :]

    @property
    def resident_bytes(self) -> int:
        return int(self.arr.nbytes)


class HostCoeffSource(CoeffSource):
    """Host-RAM-resident coefficients, uploaded per block.

    `arr` is a numpy (W, N) or packed (W/2, N) uint32 array (or a list of
    ints, converted once).  128 GB of host RAM holds 2^29 ft255 easily; the
    upload cost is the link's, not HBM's.
    """

    def __init__(self, arr, spec: FieldSpec, packed: "bool | None" = None):
        self.spec = spec
        ops = get_ops(spec)
        if isinstance(arr, list):
            self.length = len(arr)
            arr = ops.encode_host(arr)
        self.arr = np.asarray(arr)
        self.length = self.arr.shape[1]
        if packed is None:
            packed = self.arr.shape[0] == ops.w // 2
        expect = ops.w // 2 if packed else ops.w
        assert self.arr.shape[0] == expect, (self.arr.shape, packed)
        self.packed = packed

    def block(self, r0: int, r1: int) -> jnp.ndarray:
        npr = self.n_per_row
        i0, i1 = r0 * npr, r1 * npr
        piece = self.arr[:, i0:min(i1, self.length)]
        if piece.shape[1] < i1 - i0:  # zero-pad the tail block
            piece = np.pad(piece, [(0, 0), (0, i1 - i0 - piece.shape[1])])
        dev = jnp.asarray(piece)
        if self.packed:
            from .protocol import _unpack_words_dev

            dev = _unpack_words_dev(dev)
        return dev.reshape(-1, r1 - r0, npr)


# concurrent chunk draws per generator step (see _gen_span_fn)
_GEN_BATCH = 64


@functools.lru_cache(maxsize=32)
def _gen_span_fn(spec: FieldSpec, chunk: int, n_chunks: int):
    """Digit-plane generator: (W7, n_chunks*chunk) uint8 7-bit digits.

    The coefficient VALUE is sum(d_i * 2^(7i)), read as the Montgomery
    representation directly (i.e. the field element is value * R^-1 mod p —
    a uniform-ish random element, which is all the bench methodology needs).
    The top digit is masked so the value stays < 2^(num_bits - 1) <= p, i.e.
    canonical-range.  Digit-major form is what the MXU prove kernels consume
    natively (no to7 pass), and from7 to 16-bit limbs for the NTT is far
    cheaper than the to_mont modmul the old u16-limb generator paid.

    One jit generates the whole span: chunk c's digits are a pure function
    of fold_in(key, c), vmapped across chunks — the generator only reaches
    full rate with many concurrent chunk draws (measured 44 GB/s at 64-way
    vs 8 GB/s sequential on v5e).  The top-digit range mask is a broadcast
    AND (an .at[].set rewrote the whole block, 3x slower end to end).
    """
    w7 = (spec.num_bits + 6) // 7
    top_bits = (spec.num_bits - 1) - 7 * (w7 - 1)
    mask = np.full((w7, 1), 0x7F, dtype=np.uint8)
    mask[w7 - 1] = (1 << max(0, top_bits)) - 1
    mask_np = mask

    def one(key, c):
        k = jax.random.fold_in(key, c)
        raw = jax.random.bits(k, (w7, chunk), dtype=jnp.uint8)
        return raw & jnp.asarray(mask_np)

    def gen(key, c0):
        if n_chunks <= _GEN_BATCH:
            ds = jax.vmap(lambda c: one(key, c), out_axes=1)(
                c0 + jnp.arange(n_chunks)
            )  # (w7, n_chunks, chunk)
        else:
            # big spans (prove regenerates 128+-row blocks in one call):
            # an unbatched vmap materializes threefry's u32 halves for the
            # WHOLE span at once — ~6x the u8 output, 30 GB at a 5 GB span —
            # so batch the draw; 64-way keeps the generator at full rate
            # (rate saturates by 64 concurrent chunk draws, see above) while
            # bounding the transient to the batch's share
            ds = jax.lax.map(
                lambda c: one(key, c), c0 + jnp.arange(n_chunks),
                batch_size=_GEN_BATCH,
            )  # (n_chunks, w7, chunk)
            ds = jnp.transpose(ds, (1, 0, 2))
        return ds.reshape(w7, n_chunks * chunk)

    return jax.jit(gen)


@functools.lru_cache(maxsize=8)
def _digits_to_limbs_fn(spec: FieldSpec):
    from ..ops.mxu_ntt import _from7

    ops = get_ops(spec)
    return jax.jit(lambda d: _from7(d, ops.w))


@functools.lru_cache(maxsize=8)
def _rbg_key(seed: int):
    # threefry, NOT rbg: rbg lanes under vmap are not pure per-lane
    # functions of their key (lane 1 of a width-2 batch differs from the
    # same chunk generated at another width/offset), which breaks the
    # partition-independence contract block()/block_digits() rely on.
    # Threefry is counter-based per key and vmap-pure (verified empirically;
    # ~22 GB/s of digit planes at 128-way chunk parallelism on v5e).
    return jax.random.PRNGKey(seed)


class SeededCoeffSource(CoeffSource):
    """Deterministic device-generated coefficients, regenerated per block.

    Element i lives in generation chunk i // chunk; chunk c is a pure
    function of (seed, c) — uniform 7-bit digit planes from
    bits(fold_in(key, c)) (see _gen_chunk_fn) — so any block partitioning
    sees identical values (twin-tested against a materialized array).
    `block` serves the standard 16-bit-limb form (one cheap from7 per
    block); `block_digits` serves the digit planes natively, which the MXU
    prove kernels contract without any digitization pass.  Keeps zero
    coefficients resident — what lets a 16 GB chip run 2^29 ft255.
    """

    def __init__(self, spec: FieldSpec, length: int, seed: int = 0,
                 chunk: int = 1 << 18):
        # chunk 2^18 (not 2^20): generator rate scales with the number of
        # concurrent vmapped chunk draws, and commit regenerates in small
        # (32-row) blocks where 2^20 chunks left it 8-way parallel
        self.spec = spec
        self.length = length
        self.key = _rbg_key(seed)
        self.chunk = chunk
        self.w7 = (spec.num_bits + 6) // 7

    def _digit_block(self, i0: int, i1: int) -> jnp.ndarray:
        c0 = i0 // self.chunk
        c1 = (i1 - 1) // self.chunk + 1
        gen = _gen_span_fn(self.spec, self.chunk, c1 - c0)
        span = gen(self.key, jnp.uint32(c0))
        s0 = i0 - c0 * self.chunk
        s1 = i1 - c0 * self.chunk
        blk = span if (s0 == 0 and s1 == span.shape[1]) else span[:, s0:s1]
        if self.length < i1:  # zero the padding tail
            n = blk.shape[1]
            keep = max(0, self.length - i0)
            mask = (jnp.arange(n, dtype=jnp.uint32) < keep)[None, :]
            blk = jnp.where(mask, blk, jnp.uint8(0))
        return blk

    def block(self, r0: int, r1: int) -> jnp.ndarray:
        ops = get_ops(self.spec)
        npr = self.n_per_row
        d = self._digit_block(r0 * npr, r1 * npr)
        limbs = _digits_to_limbs_fn(self.spec)(d)
        return limbs.reshape(ops.w, r1 - r0, npr)

    def block_digits(self, r0: int, r1: int) -> jnp.ndarray:
        """(W7, r1-r0, n_per_row) uint8 digit planes (MXU prove fast path)."""
        npr = self.n_per_row
        d = self._digit_block(r0 * npr, r1 * npr)
        return d.reshape(self.w7, r1 - r0, npr)

    def materialize(self) -> jnp.ndarray:
        """Full (W, length) array — test helper for twin checks at small N."""
        self.n_per_row = self.length
        return self.block(0, 1)[:, 0, :]


def as_source(coeffs, spec: FieldSpec, packed: "bool | None" = None
              ) -> CoeffSource:
    """Coerce the commit API's coeffs argument into a CoeffSource."""
    if isinstance(coeffs, CoeffSource):
        return coeffs
    if isinstance(coeffs, list):
        ops = get_ops(spec)
        return ArrayCoeffSource(
            jnp.asarray(ops.encode_host(coeffs)), spec, packed=False
        )
    if isinstance(coeffs, np.ndarray):
        return HostCoeffSource(coeffs, spec, packed=packed)
    return ArrayCoeffSource(coeffs, spec, packed=packed)
