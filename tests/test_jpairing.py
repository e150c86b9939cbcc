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
