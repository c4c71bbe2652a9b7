"""Field specifications and host-side scalar arithmetic.

Mirrors the semantics of `ff` 0.12's `PrimeField` derive as used by the
reference (`/root/reference/lcpc-test-fields/src/lib.rs:13-59`):

- internal representation is Montgomery form with R = 2^(64*L), L = #u64 limbs;
- `to_repr()` is the canonical value in little-endian bytes (8*L bytes);
- `Field::random(rng)` rejection-samples L u64 words (masked to NUM_BITS) and
  *interprets the accepted integer as the Montgomery representation*, i.e. the
  sampled field value is X * R^{-1} mod p;
- `S` (2-adicity) and `ROOT_OF_UNITY = g^((p-1)/2^S)` drive the NTT.

All host arithmetic here is exact Python-int math; the device layer
(`lcpc_tpu.ops.limbs`) must agree with it bit-for-bit (twin-tested).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """A prime field p with a chosen multiplicative generator.

    Derived constants replicate ff 0.12's derive:
    `num_bits` = bit length of p, `shave_bits` = 64*L - num_bits,
    `s` = 2-adicity of p-1, `root_of_unity` = generator^t with p-1 = 2^s * t.
    """

    name: str
    p: int
    generator: int

    # ---- size / limb constants -------------------------------------------------
    @cached_property
    def num_bits(self) -> int:
        return self.p.bit_length()

    @cached_property
    def limbs64(self) -> int:
        """Number of u64 limbs in the Rust `ff` representation."""
        return (self.num_bits + 63) // 64

    @cached_property
    def repr_bytes(self) -> int:
        """Size of the canonical little-endian repr (== 8 * limbs64)."""
        return 8 * self.limbs64

    @cached_property
    def shave_bits(self) -> int:
        """ff derive's REPR_SHAVE_BITS: high bits masked off in random()."""
        return 64 * self.limbs64 - self.num_bits

    @cached_property
    def w16(self) -> int:
        """Number of 16-bit device limbs (16*w16 == 64*limbs64)."""
        return 4 * self.limbs64

    # ---- log2 cardinality (lcpc-2d/src/lib.rs:61-71 SizedField) ----------------
    @cached_property
    def clog2(self) -> int:
        return self.num_bits

    @cached_property
    def flog2(self) -> int:
        return self.num_bits - 1

    # ---- Montgomery constants --------------------------------------------------
    @cached_property
    def R(self) -> int:
        """Montgomery radix 2^(64*L) mod p (same for the 16-bit device base)."""
        return pow(2, 64 * self.limbs64, self.p)

    @cached_property
    def R2(self) -> int:
        return pow(2, 128 * self.limbs64, self.p)

    @cached_property
    def Rinv(self) -> int:
        return pow(self.R, -1, self.p)

    @cached_property
    def n0inv16(self) -> int:
        """-p^{-1} mod 2^16 (device CIOS constant)."""
        return (-pow(self.p, -1, 1 << 16)) % (1 << 16)

    @cached_property
    def n0inv64(self) -> int:
        """-p^{-1} mod 2^64 (host/u64 CIOS constant)."""
        return (-pow(self.p, -1, 1 << 64)) % (1 << 64)

    @cached_property
    def n0inv_full(self) -> int:
        """-p^{-1} mod R (full-width Montgomery constant, R = 2^(16*w16))."""
        r = 1 << (16 * self.w16)
        return (-pow(self.p, -1, r)) % r

    # ---- 2-adicity / roots of unity (NTT) --------------------------------------
    @cached_property
    def s(self) -> int:
        """2-adicity: largest s with 2^s | p-1 (ff derive's `S`)."""
        t = self.p - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        return s

    @cached_property
    def t_odd(self) -> int:
        return (self.p - 1) >> self.s

    @cached_property
    def root_of_unity(self) -> int:
        """g^t mod p: a primitive 2^s-th root of unity (ff's ROOT_OF_UNITY)."""
        return pow(self.generator, self.t_odd, self.p)

    def root_for_log_len(self, log_len: int) -> int:
        """Primitive 2^log_len-th root of unity: ROOT_OF_UNITY^(2^(s - log_len))."""
        assert 0 <= log_len <= self.s, (log_len, self.s)
        return pow(self.root_of_unity, 1 << (self.s - log_len), self.p)

    # ---- scalar ops (host) -----------------------------------------------------
    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def inv(self, a: int) -> int:
        return pow(a, -1, self.p)

    def to_mont(self, v: int) -> int:
        return (v * self.R) % self.p

    def from_mont(self, m: int) -> int:
        return (m * self.Rinv) % self.p

    # ---- canonical serialization (ff to_repr / FieldHash) ----------------------
    def to_repr(self, v: int) -> bytes:
        """Canonical little-endian bytes of value v (lcpc-2d/src/lib.rs:52-58)."""
        assert 0 <= v < self.p
        return v.to_bytes(self.repr_bytes, "little")

    def from_repr(self, b: bytes) -> int:
        assert len(b) == self.repr_bytes
        v = int.from_bytes(b, "little")
        assert v < self.p
        return v

    def mont_limbs_u64(self, v: int) -> list[int]:
        """Internal (wire) form: Montgomery limbs as u64 list, little-endian.

        This is what serde/bincode emits for a field element (the ff derive
        serializes the Montgomery-form limb array directly).
        """
        m = self.to_mont(v)
        return [(m >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(self.limbs64)]

    def from_mont_limbs_u64(self, limbs: list[int]) -> int:
        m = 0
        for i, l in enumerate(limbs):
            m |= l << (64 * i)
        assert m < self.p, "non-canonical Montgomery limbs"
        return self.from_mont(m)

    # ---- ff 0.12 Field::random semantics ---------------------------------------
    def random_from_u64_draws(self, draw: "callable") -> int:
        """Sample a field element exactly as ff 0.12's derived `random`.

        `draw()` must return the next u64 from the RNG.  Each attempt consumes
        exactly L u64s; the top limb is masked by shave_bits; accepted when the
        masked integer X < p.  The resulting field VALUE is X * R^{-1} mod p
        (X is interpreted as the Montgomery representation).
        """
        mask_top = (1 << 64) - 1 >> self.shave_bits
        while True:
            limbs = [draw() for _ in range(self.limbs64)]
            limbs[-1] &= mask_top
            x = 0
            for i, l in enumerate(limbs):
                x |= l << (64 * i)
            if x < self.p:
                return self.from_mont(x)


# The four test fields (lcpc-test-fields/src/lib.rs:13-59).
FT63 = FieldSpec("ft63", 5102708120182849537, 10)
FT127 = FieldSpec("ft127", 146823888364060453008360742206866194433, 3)
FT191 = FieldSpec(
    "ft191", 1697146272512170708389931801544665676545308500647389167617, 5
)
FT255 = FieldSpec(
    "ft255",
    46242760681095663677370860714659204618859642560429202607213929836750194081793,
    5,
)

ALL_FIELDS = (FT63, FT127, FT191, FT255)
FIELDS_BY_NAME = {f.name: f for f in ALL_FIELDS}
