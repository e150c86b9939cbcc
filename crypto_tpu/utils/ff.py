"""Host field-vector helpers (reference `utils/src/ff.rs`, `utils/src/poly.rs`)."""

from __future__ import annotations

from ..fields.host import Field, Fp


def inner_product(a, b) -> Fp:
    assert len(a) == len(b) and len(a) > 0
    acc = a[0] * b[0]
    for x, y in zip(a[1:], b[1:]):
        acc = acc + x * y
    return acc


def hadamard_product(a, b):
    return [x * y for x, y in zip(a, b)]


def powers(x: Fp, n: int):
    """[1, x, x^2, ..., x^(n-1)]"""
    out = [x.f.one()]
    for _ in range(n - 1):
        out.append(out[-1] * x)
    return out


def powers_starting_from(start: Fp, x: Fp, n: int):
    out = [start]
    for _ in range(n - 1):
        out.append(out[-1] * x)
    return out


def scale(vec, s: Fp):
    return [v * s for v in vec]


def add_vecs(a, b):
    return [x + y for x, y in zip(a, b)]


def sum_vec(vec):
    acc = vec[0]
    for v in vec[1:]:
        acc = acc + v
    return acc


# -- polynomial utilities (coefficient form, low degree first) --

def poly_eval(coeffs, x: Fp) -> Fp:
    acc = x.f.zero()
    for c in reversed(coeffs):
        acc = acc * x + c
    return acc


def multiply_poly(a, b):
    """Schoolbook polynomial multiplication (reference `utils/src/poly.rs:10-24`;
    large products go through the device NTT)."""
    F = a[0].f
    out = [F.zero()] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            out[i + j] = out[i + j] + x * y
    return out


def poly_from_roots(roots):
    """prod (X - r_i) by divide and conquer (reference `utils/src/poly.rs:26-64`)."""
    F = roots[0].f
    if len(roots) == 1:
        return [-roots[0], F.one()]
    mid = len(roots) // 2
    return multiply_poly(poly_from_roots(roots[:mid]), poly_from_roots(roots[mid:]))
