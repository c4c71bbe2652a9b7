"""Pluggable digest interface — the TPU analogue of the reference's
`D: Digest` genericity (lcpc-2d/src/lib.rs:34-58).

The commitment pipeline needs exactly three digest operations, all expressed
over (8, C) u32 LE digest-word arrays on device:

- hash_word_columns: leaf digests of per-column word streams (zero prefix +
  canonical element bytes, lib.rs:706-745);
- merkle_layer: parent = digest(left_bytes || right_bytes) (lib.rs:762-785);
- host: byte-level twin for tests.

BLAKE3 is the default (fastest on the VPU: no message schedule, 7 rounds);
SHA256 demonstrates the plug point with a second, unrelated construction.
Protocol entry points accept a `digest=` parameter; proofs do not record the
digest (as in the reference, prover and verifier must agree out of band).
"""

from __future__ import annotations

import dataclasses

from . import blake3_jax, sha256_jax
from .blake3_ref import blake3 as _blake3_host


@dataclasses.dataclass(frozen=True)
class DeviceDigest:
    name: str
    hash_word_columns: callable  # (L, C) u32 words, prefix_words -> (8, C)
    merkle_layer: callable       # (8, 2n) -> (8, n)
    merkle_parent: callable      # (8, n), (8, n) -> (8, n)
    host: callable               # bytes -> 32-byte digest


BLAKE3 = DeviceDigest(
    name="blake3",
    hash_word_columns=blake3_jax.hash_word_columns,
    merkle_layer=blake3_jax.merkle_layer,
    merkle_parent=blake3_jax.merkle_parent,
    host=_blake3_host,
)

SHA256 = DeviceDigest(
    name="sha256",
    hash_word_columns=sha256_jax.hash_word_columns,
    merkle_layer=sha256_jax.merkle_layer,
    merkle_parent=sha256_jax.merkle_parent,
    host=sha256_jax.digest_host,
)

DIGESTS_BY_NAME = {d.name: d for d in (BLAKE3, SHA256)}
