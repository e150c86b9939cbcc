"""Device extension towers (`fields/jtower.py`) vs host towers.

Parity anchor: arkworks Fq2/Fq6/Fq12 arithmetic the reference inherits
(SURVEY.md §2.2 extension-tower row)."""

import random

import numpy as np
import pytest

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.fields.jtower import jquad_for, jcubic_for, jfield12_for

rng = random.Random(0)
N = 4


@pytest.fixture(scope="module")
def j2():
    return jquad_for(bls.Fq2)


@pytest.fixture(scope="module")
def j6():
    return jcubic_for(bls.Fq6)


@pytest.fixture(scope="module")
def j12():
    return jfield12_for(bls.Fq12)


def test_fq2_ops(j2):
    a = [bls.Fq2.rand(rng) for _ in range(N)]
    b = [bls.Fq2.rand(rng) for _ in range(N)]
    A, B = j2.pack(a), j2.pack(b)
    assert list(j2.unpack(j2.mul(A, B))) == [x * y for x, y in zip(a, b)]
    assert list(j2.unpack(j2.add(A, B))) == [x + y for x, y in zip(a, b)]
    assert list(j2.unpack(j2.sub(A, B))) == [x - y for x, y in zip(a, b)]
    assert list(j2.unpack(j2.square(A))) == [x.square() for x in a]
    assert list(j2.unpack(j2.neg(A))) == [-x for x in a]
    assert list(j2.unpack(j2.inv(A))) == [x.inverse() for x in a]
    assert list(j2.unpack(j2.conjugate(A))) == [x.conjugate() for x in a]
    assert list(j2.unpack(j2.frobenius(A, 1))) == [x.frobenius(1) for x in a]
    # zero maps to zero under inv
    Z = j2.zeros((2,))
    assert bool(np.all(np.asarray(j2.inv(Z)) == 0))
    assert list(j2.unpack(j2.ones((2,)))) == [bls.Fq2.one()] * 2


def test_fq6_ops(j6):
    a = [bls.Fq6.rand(rng) for _ in range(N)]
    b = [bls.Fq6.rand(rng) for _ in range(N)]
    A, B = j6.pack(a), j6.pack(b)
    assert list(j6.unpack(j6.mul(A, B))) == [x * y for x, y in zip(a, b)]
    assert list(j6.unpack(j6.square(A))) == [x.square() for x in a]
    assert list(j6.unpack(j6.mul_by_v(A))) == [x.mul_by_v() for x in a]
    assert list(j6.unpack(j6.inv(A))) == [x.inverse() for x in a]
    for pw in (1, 2, 3):
        assert list(j6.unpack(j6.frobenius(A, pw))) == [x.frobenius(pw) for x in a]
    s = [bls.Fq2.rand(rng) for _ in range(N)]
    S = j6.fq2.pack(s)
    assert list(j6.unpack(j6.mul_fq2(A, S))) == \
        [x * y for x, y in zip(a, s)]


def test_fq12_ops(j12):
    a = [bls.Fq12.rand(rng) for _ in range(N)]
    b = [bls.Fq12.rand(rng) for _ in range(N)]
    A, B = j12.pack(a), j12.pack(b)
    assert list(j12.unpack(j12.mul(A, B))) == [x * y for x, y in zip(a, b)]
    assert list(j12.unpack(j12.square(A))) == [x.square() for x in a]
    assert list(j12.unpack(j12.inv(A))) == [x.inverse() for x in a]
    assert list(j12.unpack(j12.conjugate(A))) == [x.conjugate() for x in a]
    for pw in (1, 2, 6):
        assert list(j12.unpack(j12.frobenius(A, pw))) == \
            [x.frobenius(pw) for x in a]


def test_fq12_cyclotomic_square(j12):
    # cyclotomic elements: z^(p^6-1)(p^2+1) for random z
    zs = [bls.Fq12.rand(rng) for _ in range(2)]
    cyc = []
    for z in zs:
        t = z.conjugate() * z.inverse()
        cyc.append(t.frobenius(2) * t)
    C = j12.pack(cyc)
    got = list(j12.unpack(j12.cyclotomic_square(C)))
    exp = [c.cyclotomic_square() for c in cyc]
    assert got == exp
    # and cyclotomic_square == square on the cyclotomic subgroup
    assert exp == [c.square() for c in cyc]
