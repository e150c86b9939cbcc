"""Device batched pairing vs host optimal-ate (bit-exact parity).

Reference anchors: arkworks `Pairing::multi_miller_loop` +
`final_exponentiation` as used by `utils/src/randomized_pairing_check.rs:204-215`
and BBS+ verification (`bbs_plus/src/signature.rs:272-295`).
"""

import random

import pytest

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jpairing import jpairing_for

rng = random.Random(3)


@pytest.fixture(scope="module")
def jp():
    return jpairing_for("bls12_381")


def test_single_pairing_matches_host(jp):
    p = bls.G1.rand(rng).normalize()
    q = bls.G2.rand(rng).normalize()
    assert jp.pairing(p, q) == bls.pairing(p, q)


def test_multi_pairing_matches_host(jp):
    pairs = [(bls.G1.rand(rng).normalize(), bls.G2.rand(rng).normalize())
             for _ in range(3)]
    # include an infinity pair: must contribute identity
    pairs.append((bls.G1.infinity(), bls.G2.rand(rng).normalize()))
    assert jp.multi_pairing(pairs) == bls.multi_pairing(pairs)


@pytest.mark.slow
def test_bilinearity_on_device(jp):
    p = bls.G1.generator()
    q = bls.G2.generator()
    a, b = 1234567, 891011
    lhs = jp.pairing((p * a).normalize(), (q * b).normalize())
    rhs = jp.pairing((p * (a * b)).normalize(), q.normalize())
    assert lhs == rhs
    # product-is-one form used by the verifiers:
    # e(aP, Q) * e(-aP, Q) == 1
    out = jp.multi_pairing([((p * a).normalize(), q),
                            ((-(p * a)).normalize(), q)])
    assert out == bls.Fq12.one()


# ---------------------------------------------------------------------------
# BN254 device pairing (D-twist ate loop, `curves/jpairing.py` JPairingBN)
# ---------------------------------------------------------------------------

def test_bn254_device_pairing_matches_host():
    from crypto_tpu.curves import bn254 as bn
    jp = jpairing_for("bn254")
    p = (bn.G1.generator() * 97).normalize()
    q = (bn.G2.generator() * 31).normalize()
    assert jp.pairing(p, q) == bn.pairing(p, q)


def test_bn254_device_multi_pairing():
    import random as _r
    from crypto_tpu.curves import bn254 as bn
    r2 = _r.Random(6)
    jp = jpairing_for("bn254")
    pairs = [(bn.G1.rand(r2).normalize(), bn.G2.rand(r2).normalize())
             for _ in range(2)]
    pairs.append((bn.G1.infinity(), bn.G2.generator()))
    assert jp.multi_pairing(pairs) == bn.multi_pairing(pairs)
    # product-is-one form
    a = (bn.G1.generator() * 5).normalize()
    out = jp.multi_pairing([(a, bn.G2.generator()),
                            ((-a).normalize(), bn.G2.generator())])
    assert out == bn.Fq12.one()
