"""The LcEncoding plugin interface (mirrors lcpc-2d/src/lib.rs:74-104).

An encoding supplies the field, dimension logic, soundness counts, and the
row-encoding function in two flavors: a batched device implementation
(`encode_rows`, the hot path) and a host slow twin (`encode_row_host`) used
by the serial reference implementation and tests.

Note on Fiat-Shamir labels: the reference's `def_labels!` macro
(lcpc-2d/src/macros.rs:29-36) interpolates `$l` inside a byte-string literal,
which Rust macros do NOT substitute — so every encoding actually shares the
literal labels b"$l//DT" / b"$l//PR" / b"$l//PE" / b"$l//CO".  We replicate
that faithfully for bit-compatibility.
"""

from __future__ import annotations

import abc

import jax.numpy as jnp

from ..fields.spec import FieldSpec

LABEL_DT = b"$l//DT"
LABEL_PR = b"$l//PR"
LABEL_PE = b"$l//PE"
LABEL_CO = b"$l//CO"


class LcEncoding(abc.ABC):
    """A linear code usable by the 2-D polynomial commitment."""

    spec: FieldSpec

    LABEL_DT = LABEL_DT
    LABEL_PR = LABEL_PR
    LABEL_PE = LABEL_PE
    LABEL_CO = LABEL_CO

    @abc.abstractmethod
    def get_dims(self, length: int) -> tuple[int, int, int]:
        """(n_rows, n_per_row, n_cols) for a coefficient vector of `length`."""

    @abc.abstractmethod
    def dims_ok(self, n_per_row: int, n_cols: int) -> bool:
        ...

    @abc.abstractmethod
    def get_n_col_opens(self) -> int:
        ...

    @abc.abstractmethod
    def get_n_degree_tests(self) -> int:
        ...

    @abc.abstractmethod
    def encode_rows(self, rows: jnp.ndarray) -> jnp.ndarray:
        """Batched systematic encode: (W, R, n_per_row) -> (W, R, n_cols).

        Input/output in Montgomery limb form (limb-major).
        """

    def encode_rows_lowmem(self, rows: jnp.ndarray, post=None,
                           canonical: bool = False,
                           mats=None) -> jnp.ndarray:
        """encode_rows variant preferring minimal HBM transients.

        The streaming commit encodes by row blocks precisely because memory
        is the constraint there; encodings whose fastest kernel trades HBM
        for throughput (the MXU digit-conv NTT holds ~600 B/element of digit
        planes vs the VPU ladder's ~250 B) override this with the lean path.
        Results must be bit-identical to encode_rows.  `post` (optional)
        transforms the encoded block to its consumer form as deep inside
        the kernel as the encoding can push it (see LigeroEncoding).
        `canonical=True` asks for canonical limbs instead of Montgomery.
        `mats` (optional) carries the encoding's device matrices as traced
        arguments when this runs inside a caller's jit (see
        SdigEncoding.encode_mats — closure-captured matrices embed in the
        HLO and blow the remote-compile size limit).
        """
        if mats is not None and hasattr(self, "encode_rows_core"):
            out = self.encode_rows_core(rows, mats)
        else:
            out = self.encode_rows(rows)
        if canonical:
            from ..ops.limbs import get_ops

            out = get_ops(self.spec).from_mont(out)
        return post(out) if post is not None else out

    @abc.abstractmethod
    def encode_row_host(self, row: list[int]) -> list[int]:
        """Slow twin of encode_rows on one row of canonical Python ints."""
