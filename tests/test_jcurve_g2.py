"""Device G2 (curve over Fq2) arithmetic + MSM vs host ground truth.

Closes the round-1 gap "G2 explicitly unsupported" (`VERDICT.md` missing #2);
reference parity anchor: arkworks G2 ops used by every pairing-based verifier
(e.g. `bbs_plus/src/proof.rs:494-525`) and G2 MSMs in accumulator `Omega`
computation (`vb_accumulator/src/batch_utils.rs:486-710`).
"""

import random

import pytest

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jcurve import jcurve_for
from crypto_tpu.ops.pippenger import msm_pippenger

rng = random.Random(7)


@pytest.fixture(scope="module")
def jc2():
    return jcurve_for(bls.G2)


def test_g2_pack_roundtrip(jc2):
    pts = [bls.G2.rand(rng) for _ in range(3)] + [bls.G2.infinity()]
    packed = jc2.pack_points([p.normalize() for p in pts])
    back = jc2.unpack(packed)
    for p, q in zip(pts, back):
        assert p.normalize() == q.normalize()


def test_g2_add_double(jc2):
    a = [bls.G2.rand(rng) for _ in range(4)]
    b = [bls.G2.rand(rng) for _ in range(4)]
    A = jc2.pack_points([p.normalize() for p in a])
    B = jc2.pack_points([p.normalize() for p in b])
    got = jc2.unpack(jc2.add(A, B))
    for g, (x, y) in zip(got, zip(a, b)):
        assert g.normalize() == (x + y).normalize()
    got_d = jc2.unpack(jc2.double(A))
    for g, x in zip(got_d, a):
        assert g.normalize() == x.double().normalize()
    # edge cases: P + (-P) = inf, P + inf = P, doubling infinity
    C = jc2.add(A, jc2.neg(A))
    assert all(p.is_infinity() for p in jc2.unpack(C))
    inf = jc2.infinity((4,))
    got_i = jc2.unpack(jc2.add(A, inf))
    for g, x in zip(got_i, a):
        assert g.normalize() == x.normalize()
    assert all(p.is_infinity() for p in jc2.unpack(jc2.double(inf)))


def test_g2_to_affine(jc2):
    a = [bls.G2.rand(rng) for _ in range(3)]
    A = jc2.pack_points([p.normalize() for p in a])
    D = jc2.double(A)
    aff = jc2.to_affine(D)
    xs = jc2.F.unpack_host(aff.X)
    ys = jc2.F.unpack_host(aff.Y)
    for x, y, p in zip(xs, ys, a):
        hx, hy = p.double().to_affine()
        assert x == hx and y == hy


def test_g2_msm_vs_host(jc2):
    n = 8
    pts = [bls.G2.rand(rng).normalize() for _ in range(n)]
    # 32-bit scalars: full-width digit handling is covered by the G1 tests;
    # this covers the Fq2 curve-op path (signs, buckets, tail) at 1/4 cost
    scs = [rng.randrange(1, 1 << 32) for _ in range(n)]
    got = msm_pippenger(bls.G2, pts, scs, nbits=32)
    exp = bls.G2.infinity()
    for p, s in zip(pts, scs):
        exp = exp + p * s
    assert got.normalize() == exp.normalize()
