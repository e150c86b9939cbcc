"""Device (JAX limb-tensor) field arithmetic vs host Python-int ground truth."""

import random

import numpy as np
import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.fields.jfield import jfield_for, int_to_limbs, limbs_to_int


@pytest.fixture(scope="module", params=["Fr", "Fq"])
def setup(request):
    F = {"Fr": b.Fr, "Fq": b.Fq}[request.param]
    return F, jfield_for(F)


RNG = random.Random(42)


def _rand_batch(F, n):
    return [RNG.randrange(F.p) for _ in range(n)]


def test_limb_roundtrip(setup):
    F, J = setup
    v = RNG.randrange(F.p)
    assert limbs_to_int(int_to_limbs(v, J.L)) == v


def test_pack_unpack(setup):
    F, J = setup
    vals = _rand_batch(F, 8)
    arr = J.pack(vals)
    out = J.unpack(arr)
    assert [int(x) for x in out] == vals


def test_add_sub_neg(setup):
    F, J = setup
    n = 16
    xs, ys = _rand_batch(F, n), _rand_batch(F, n)
    X, Y = J.pack(xs), J.pack(ys)
    add = J.unpack(J.add(X, Y))
    sub = J.unpack(J.sub(X, Y))
    neg = J.unpack(J.neg(X))
    for i in range(n):
        assert int(add[i]) == (xs[i] + ys[i]) % F.p
        assert int(sub[i]) == (xs[i] - ys[i]) % F.p
        assert int(neg[i]) == (-xs[i]) % F.p
    # edge cases: zero / p-1
    E = J.pack([0, F.p - 1, 1])
    assert [int(v) for v in J.unpack(J.neg(E))] == [0, 1, F.p - 1]
    assert [int(v) for v in J.unpack(J.add(E, E))] == [0, F.p - 2, 2]
    assert [int(v) for v in J.unpack(J.sub(J.pack([0, 0, 0]), E))] == [0, 1, F.p - 1]


def test_mul(setup):
    F, J = setup
    n = 16
    xs, ys = _rand_batch(F, n), _rand_batch(F, n)
    X, Y = J.pack(xs), J.pack(ys)
    out = J.unpack(J.mul(X, Y))
    for i in range(n):
        assert int(out[i]) == xs[i] * ys[i] % F.p
    sq = J.unpack(J.square(X))
    for i in range(n):
        assert int(sq[i]) == xs[i] * xs[i] % F.p
    # worst case operands
    W = J.pack([F.p - 1, F.p - 1])
    w = J.unpack(J.mul(W, W))
    assert int(w[0]) == (F.p - 1) ** 2 % F.p


def test_mul_broadcasting(setup):
    F, J = setup
    xs = _rand_batch(F, 6)
    X = J.pack(xs).reshape(2, 3, J.L)
    y = _rand_batch(F, 1)[0]
    Y = J.pack([y])[0]
    out = J.unpack(J.mul(X, Y))
    flat = np.asarray(out).reshape(-1)
    for i in range(6):
        assert int(flat[i]) == xs[i] * y % F.p


def test_inv_pow(setup):
    F, J = setup
    xs = _rand_batch(F, 8)
    X = J.pack(xs)
    inv = J.unpack(J.inv(X))
    for i in range(8):
        assert int(inv[i]) == pow(xs[i], -1, F.p)
    p5 = J.unpack(J.pow_fixed(X, 5))
    for i in range(8):
        assert int(p5[i]) == pow(xs[i], 5, F.p)
    # zero maps to zero under inv
    assert int(J.unpack(J.inv(J.pack([0])))[0]) == 0


def test_mont_conversion(setup):
    F, J = setup
    xs = _rand_batch(F, 4)
    X_raw = J.pack(xs, mont=False)
    X_mont = J.to_mont(X_raw)
    back = J.from_mont(X_mont)
    assert [int(v) for v in J.unpack(back, mont=False)] == xs
    assert [int(v) for v in J.unpack(X_mont)] == xs


def test_predicates(setup):
    F, J = setup
    X = J.pack([0, 1, F.p - 1])
    z = np.asarray(J.is_zero(X))
    assert list(z) == [True, False, False]
    assert bool(J.eq(X, X).all())


def test_rand_uniform_range(setup):
    import jax
    F, J = setup
    key = jax.random.PRNGKey(0)
    r = J.rand(key, (32,))
    vals = [int(v) for v in J.unpack(r)]
    assert all(0 <= v < F.p for v in vals)
    assert len(set(vals)) == 32
