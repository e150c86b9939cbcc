"""NTT correctness vs naive host evaluation."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.ops.ntt import domain_for, poly_mul_ntt

RNG = random.Random(21)


def _naive_dft(vals, w, p):
    n = len(vals)
    return [sum(vals[j] * pow(w, i * j, p) for j in range(n)) % p
            for i in range(n)]


@pytest.mark.parametrize("n", [8, 32])
def test_ntt_matches_naive(n):
    dom = domain_for(b.Fr, n)
    vals = [RNG.randrange(b.R) for _ in range(n)]
    out = dom.ntt_ints(vals)
    assert out == _naive_dft(vals, dom.w, b.R)


def test_ntt_roundtrip():
    n = 64
    dom = domain_for(b.Fr, n)
    vals = [RNG.randrange(b.R) for _ in range(n)]
    assert dom.ntt_ints(dom.ntt_ints(vals), inverse=True) == vals


def test_coset_roundtrip_and_semantics():
    n = 16
    dom = domain_for(b.Fr, n)
    vals = [RNG.randrange(b.R) for _ in range(n)]
    # coset NTT evaluates poly at g*w^i
    out = dom.ntt_ints(vals, coset=True)
    g = b.Fr.generator
    expected = [sum(vals[j] * pow(g * pow(dom.w, i, b.R) % b.R, j, b.R)
                    for j in range(n)) % b.R for i in range(n)]
    assert out == expected
    back = dom.ntt_ints(out, inverse=True, coset=True)
    assert back == vals


def test_poly_mul():
    deg_a, deg_b = 7, 12
    a = [RNG.randrange(b.R) for _ in range(deg_a + 1)]
    c = [RNG.randrange(b.R) for _ in range(deg_b + 1)]
    out = poly_mul_ntt(b.Fr, a, c)
    # naive
    ref = [0] * (deg_a + deg_b + 1)
    for i, x in enumerate(a):
        for j, y in enumerate(c):
            ref[i + j] = (ref[i + j] + x * y) % b.R
    assert out == ref


def test_batched_ntt():
    import numpy as np
    n = 16
    dom = domain_for(b.Fr, n)
    batch = [[RNG.randrange(b.R) for _ in range(n)] for _ in range(3)]
    packed = dom.J.pack(batch)          # (3, n, L)
    out = dom.ntt(packed)
    for i in range(3):
        row = [int(v) for v in np.atleast_1d(dom.J.unpack(out[i]))]
        assert row == _naive_dft(batch[i], dom.w, b.R)
