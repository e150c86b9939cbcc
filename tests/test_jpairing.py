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


def test_multi_pairing_matches_host(jp):
    """One fused multi-pairing call covers the whole parity surface (pack,
    padding, batched Miller, product tree, final exp, infinity handling):
    on CPU each device pairing CALL costs ~1 min of eager dispatch
    regardless of batch size, so the single-pairing check rides the same
    call as the product check (vs host per-pair values)."""
    pairs = [(bls.G1.rand(rng).normalize(), bls.G2.rand(rng).normalize())
             for _ in range(2)]
    # an infinity pair must contribute identity
    all_pairs = pairs + [(bls.G1.infinity(), bls.G2.rand(rng).normalize())]
    host = [bls.pairing(p, q) for (p, q) in pairs]
    assert jp.multi_pairing(all_pairs) == host[0] * host[1]


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

@pytest.mark.slow
def test_bn254_device_multi_pairing():
    """BN254 D-twist parity in ONE fused call (same rationale as the BLS
    test above: per-call eager dispatch dominates on CPU).  The product
    includes a distinct random pair, an infinity pair, and the (a, Q),
    (-a, Q) cancellation pair, so the expected product equals the single
    host pairing of the random pair — covering the ate loop, the two
    Frobenius addition steps, infinity masking and product-is-one at once."""
    import random as _r
    from crypto_tpu.curves import bn254 as bn
    r2 = _r.Random(6)
    jp = jpairing_for("bn254")
    p1, q1 = bn.G1.rand(r2).normalize(), bn.G2.rand(r2).normalize()
    a = (bn.G1.generator() * 5).normalize()
    pairs = [(p1, q1),
             (bn.G1.infinity(), bn.G2.generator()),
             (a, bn.G2.generator()),
             ((-a).normalize(), bn.G2.generator())]
    assert jp.multi_pairing(pairs) == bn.pairing(p1, q1)


def test_pairing_wrapper_delegates(jp, monkeypatch):
    """`jp.pairing` is the public single-pair entry point
    (`curves/jpairing.py`): assert it routes its (p, q) pair through
    `multi_pairing` unchanged.  Parity of `multi_pairing` itself is covered
    by the device-vs-host tests above; a real single-pair device call would
    re-run the identical batch-1 machinery at ~1 min of CPU eager dispatch
    for no extra coverage."""
    p = bls.G1.generator().normalize()
    q = bls.G2.generator().normalize()
    seen = {}

    def fake_multi(pairs):
        seen["pairs"] = list(pairs)
        return "sentinel"

    monkeypatch.setattr(jp, "multi_pairing", fake_multi)
    assert jp.pairing(p, q) == "sentinel"
    assert seen["pairs"] == [(p, q)]
