"""Evaluation-tensor helpers (the caller-side conventions of the reference).

The 2-D scheme evaluates <outer (x) inner, coeffs>:
- univariate p(x): inner = (1, x, ..., x^(n_per_row-1)),
  outer = (1, x^n_per_row, x^(2*n_per_row), ...)  (lcpc-ligero-pc/src/tests.rs:232-240);
- multilinear in v variables (monomial basis, 2^v coefficients row-major):
  inner/outer are tensor products of (1, x_i) over the low/high variables
  (tests.rs:228-231 note; new_ml dims guarantee power-of-two tiling).
"""

from __future__ import annotations

from ..fields.spec import FieldSpec


def univariate_tensors(spec: FieldSpec, x: int, n_per_row: int, n_rows: int):
    inner = [pow(x, i, spec.p) for i in range(n_per_row)]
    xr = (x * inner[-1]) % spec.p
    outer = [pow(xr, i, spec.p) for i in range(n_rows)]
    return outer, inner


def _monomial_tensor(spec: FieldSpec, point: list[int]) -> list[int]:
    out = [1]
    for x in point:
        out = out + [(v * x) % spec.p for v in out]
    return out


def multilinear_tensors(spec: FieldSpec, point: list[int], n_per_row: int,
                        n_rows: int):
    """Monomial-basis multilinear evaluation tensors.

    point = (x_0, ..., x_{v-1}) with x_0 the fastest-varying (lowest) bit of
    the coefficient index; requires n_per_row and n_rows powers of two with
    n_per_row * n_rows == 2^v.
    """
    v = len(point)
    assert n_per_row * n_rows == 1 << v
    k = n_per_row.bit_length() - 1
    assert 1 << k == n_per_row
    inner = _monomial_tensor(spec, point[:k])
    outer = _monomial_tensor(spec, point[k:])
    return outer, inner


def univariate_eval(spec: FieldSpec, coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % spec.p
    return acc


def multilinear_eval(spec: FieldSpec, coeffs: list[int], point: list[int]) -> int:
    t = _monomial_tensor(spec, point)
    assert len(t) >= len(coeffs)
    return sum(c * v for c, v in zip(coeffs, t)) % spec.p
