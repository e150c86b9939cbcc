"""BN254 curve + pairing (reference second curve, `Cargo.toml:50`;
circom bn128 fixtures depend on it)."""

import random

import pytest

from crypto_tpu.curves import bn254 as bn

rng = random.Random(99)


def test_curve_sanity():
    g1 = bn.G1.generator()
    g2 = bn.G2.generator()
    assert g1.is_on_curve() and g2.is_on_curve()
    # prime-order subgroup: r*G = infinity (mul_raw avoids scalar reduction)
    assert g1.mul_raw(bn.R).is_infinity()
    assert g2.mul_raw(bn.R).is_infinity()


def test_tower_sanity():
    a = bn.Fq12.rand(rng)
    assert a * a.inverse() == bn.Fq12.one()
    # frobenius via power map: a^(p) == frobenius(1)
    b = bn.Fq2.rand(rng)
    assert b.frobenius(1) == b ** bn.P


def test_pairing_bilinearity():
    g1 = bn.G1.generator()
    g2 = bn.G2.generator()
    e = bn.pairing(g1, g2)
    assert e != bn.Fq12.one()
    # e(aP, bQ) == e(P, Q)^(ab)
    a, b = 127, 523
    lhs = bn.pairing((g1 * a).normalize(), (g2 * b).normalize())
    assert lhs == e ** (a * b)
    # product-is-one: e(aP, Q) * e(-aP, Q) == 1
    out = bn.multi_pairing([((g1 * a).normalize(), g2),
                            (-(g1 * a).normalize(), g2)])
    assert out == bn.Fq12.one()


def test_pairing_nondegenerate_order():
    g1 = bn.G1.generator()
    g2 = bn.G2.generator()
    e = bn.pairing(g1, g2)
    assert e ** bn.R == bn.Fq12.one()


def test_device_field_bn254():
    """The generic device field layer covers BN254 out of the box."""
    from crypto_tpu.fields.jfield import jfield_for
    J = jfield_for(bn.Fq)
    xs = [bn.Fq.rand(rng) for _ in range(4)]
    ys = [bn.Fq.rand(rng) for _ in range(4)]
    got = J.unpack_host(J.mul(J.pack([int(v) for v in xs]),
                              J.pack([int(v) for v in ys])))
    assert list(got) == [x * y for x, y in zip(xs, ys)]


def test_device_curve_bn254_g1():
    from crypto_tpu.curves.jcurve import jcurve_for
    jc = jcurve_for(bn.G1)
    pts = [bn.G1.rand(rng).normalize() for _ in range(4)]
    qts = [bn.G1.rand(rng).normalize() for _ in range(4)]
    got = jc.unpack(jc.add(jc.pack_points(pts), jc.pack_points(qts)))
    for g, (p, q) in zip(got, zip(pts, qts)):
        assert g.normalize() == (p + q).normalize()


def test_bn254_ntt_roundtrip():
    """The radix-2 NTT is field-generic: BN254 Fr (two-adicity 28)."""
    from crypto_tpu.ops.ntt import domain_for
    d = domain_for(bn.Fr, 16)
    vals = [rng.randrange(bn.R) for _ in range(16)]
    out = d.ntt_ints(vals)
    assert d.ntt_ints(out, inverse=True) == vals


def test_bn254_device_msm():
    from crypto_tpu.ops.msm_v2 import msm_device_scheduled
    pts = [bn.G1.rand(rng).normalize() for _ in range(8)]
    scs = [rng.randrange(1, 1 << 32) for _ in range(8)]
    got = msm_device_scheduled(bn.G1, pts, scs, c=8, nbits=32)
    exp = bn.G1.infinity()
    for p, s in zip(pts, scs):
        exp = exp + p * s
    assert got.normalize() == exp.normalize()
