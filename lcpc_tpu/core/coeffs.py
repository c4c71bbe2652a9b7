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


@functools.lru_cache(maxsize=8)
def _gen_chunk_fn(spec: FieldSpec, chunk: int):
    ops = get_ops(spec)

    def gen(key):
        raw = jax.random.bits(key, (ops.w, chunk), dtype=jnp.uint32)
        return ops.to_mont(raw & jnp.uint32(0xFFFF))

    return jax.jit(gen)


@functools.lru_cache(maxsize=8)
def _rbg_key(seed: int):
    # the counter-based rbg generator is ~10x cheaper per word than the
    # default threefry on TPU; regeneration cost shows up in every seeded
    # commit AND prove, so this matters at 2^29 (coefficient regen was
    # ~25 s of the commit with threefry)
    try:
        return jax.random.key(seed, impl="rbg")
    except Exception:  # older jax without impl= support
        return jax.random.PRNGKey(seed)


class SeededCoeffSource(CoeffSource):
    """Deterministic device-generated coefficients, regenerated per block.

    Element i lives in generation chunk i // chunk; chunk c is
    to_mont(bits(fold_in(key, c)) & 0xFFFF) — a pure function of (seed, c),
    so any block partitioning sees identical values (twin-tested against a
    materialized array).  Matches the bench methodology the corpus already
    uses (random 16-bit limbs reduced by to_mont; distribution is irrelevant
    for timing) while keeping zero coefficients resident.
    """

    def __init__(self, spec: FieldSpec, length: int, seed: int = 0,
                 chunk: int = 1 << 20):
        self.spec = spec
        self.length = length
        self.key = _rbg_key(seed)
        self.chunk = chunk

    def block(self, r0: int, r1: int) -> jnp.ndarray:
        ops = get_ops(self.spec)
        npr = self.n_per_row
        i0, i1 = r0 * npr, r1 * npr
        gen = _gen_chunk_fn(self.spec, self.chunk)
        pieces = []
        for c in range(i0 // self.chunk, (i1 - 1) // self.chunk + 1):
            lo, hi = c * self.chunk, (c + 1) * self.chunk
            piece = gen(jax.random.fold_in(self.key, c))
            s0 = max(i0, lo) - lo
            s1 = min(i1, hi) - lo
            if s0 > 0 or s1 < self.chunk:
                piece = piece[:, s0:s1]
            pieces.append(piece)
        blk = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
        if self.length < i1:  # zero the padding tail
            n = blk.shape[1]
            keep = max(0, self.length - i0)
            mask = (jnp.arange(n, dtype=jnp.uint32) < keep)[None, :]
            blk = jnp.where(mask, blk, jnp.uint32(0))
        return blk.reshape(ops.w, r1 - r0, npr)

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
