"""Device batched curve ops vs host ground truth."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.curves.jcurve import jcurve_for

RNG = random.Random(11)


@pytest.fixture(scope="module")
def jc():
    return jcurve_for(b.G1)


def _rand_points(n):
    return [b.G1.rand(RNG) for _ in range(n)]


def test_pack_unpack_roundtrip(jc):
    pts = _rand_points(4) + [b.G1.infinity()]
    J = jc.pack_points(pts)
    back = jc.unpack(J)
    assert all(x == y for x, y in zip(back, pts))


def test_batched_add(jc):
    n = 8
    ps, qs = _rand_points(n), _rand_points(n)
    out = jc.unpack(jc.jit_add(jc.pack_points(ps), jc.pack_points(qs)))
    for i in range(n):
        assert out[i] == ps[i] + qs[i]


def test_batched_double(jc):
    ps = _rand_points(6)
    out = jc.unpack(jc.jit_double(jc.pack_points(ps)))
    for i, p in enumerate(ps):
        assert out[i] == p.double()


def test_add_edge_cases(jc):
    p = _rand_points(1)[0]
    inf = b.G1.infinity()
    cases_p = [p, inf, p, p, inf]
    cases_q = [p, p, inf, -p, inf]
    expect = [p.double(), p, p, inf, inf]
    out = jc.unpack(jc.jit_add(jc.pack_points(cases_p), jc.pack_points(cases_q)))
    for o, e in zip(out, expect):
        assert o == e


def test_double_infinity(jc):
    out = jc.unpack(jc.jit_double(jc.pack_points([b.G1.infinity()])))
    assert out[0].is_infinity()


def test_eq_and_select(jc):
    p, q = _rand_points(2)
    # same point different Z: compute p+q-q vs p? use double/add mix
    a = jc.pack_points([p, p, b.G1.infinity()])
    bb = jc.pack_points([p, q, b.G1.infinity()])
    eq = np.asarray(jc.eq(a, bb))
    assert list(eq) == [True, False, True]


def test_to_affine(jc):
    ps = _rand_points(3) + [b.G1.infinity()]
    J = jc.pack_points(ps)
    # un-normalize by adding then subtracting
    J2 = jc.jit_add(J, jc.pack_points(_rand_points(1) * 4))
    aff = jc.to_affine(jc.jit_add(J2, jc.neg(jc.pack_points(_rand_points(1) * 4))))
    del aff  # just exercise; now real check:
    aff2 = jc.to_affine(J)
    xs = np.atleast_1d(jc.F.unpack(aff2.X))
    for i, p in enumerate(ps):
        if p.is_infinity():
            assert bool(np.asarray(aff2.inf)[i])
        else:
            assert int(xs[i]) == int(p.to_affine()[0])


def test_scalar_mul(jc):
    ps = _rand_points(4)
    ks = [RNG.randrange(b.R) for _ in range(4)]
    nbits = 64  # keep the scan short for test speed
    ks = [k % (1 << nbits) for k in ks]
    bits = np.zeros((4, nbits), dtype=np.int32)
    for i, k in enumerate(ks):
        for j in range(nbits):
            bits[i, j] = (k >> (nbits - 1 - j)) & 1
    out = jc.unpack(jc.scalar_mul(jc.pack_points(ps), jnp.asarray(bits)))
    for i in range(4):
        assert out[i] == ps[i] * ks[i]


def test_associativity_batch(jc):
    """(p+q)+r == p+(q+r) elementwise on device."""
    n = 5
    P, Q, R_ = (jc.pack_points(_rand_points(n)) for _ in range(3))
    lhs = jc.jit_add(jc.jit_add(P, Q), R_)
    rhs = jc.jit_add(P, jc.jit_add(Q, R_))
    assert bool(np.asarray(jc.eq(lhs, rhs)).all())
