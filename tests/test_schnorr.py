"""Schnorr PoK end-to-end (BASELINE.md parity config #1).

Mirrors the reference tests in `schnorr_pok/src/discrete_log.rs:288-426` and
`pok_generalized_pedersen.rs` tests.
"""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.schnorr.discrete_log import (
    PokDiscreteLogProtocol, PokPedersenCommitmentProtocol)
from crypto_tpu.schnorr.generalized import SchnorrCommitment
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge
from crypto_tpu.utils.checkers import RandomizedMultChecker
from crypto_tpu.utils.msm import msm


@pytest.fixture(params=["G1", "G2"])
def curve(request):
    return {"G1": b.G1, "G2": b.G2}[request.param]


def test_pok_discrete_log(curve):
    rng = random.Random(0)
    base = curve.rand(rng).normalize()
    witness = b.Fr.rand(rng)
    y = (base * int(witness)).normalize()
    blinding = b.Fr.rand(rng)

    protocol = PokDiscreteLogProtocol.init(witness, blinding, base)
    w = ByteWriter()
    protocol.challenge_contribution(base, y, w)
    challenge_p = compute_random_oracle_challenge(b.Fr, w.bytes())
    proof = protocol.gen_proof(challenge_p)

    w2 = ByteWriter()
    proof.challenge_contribution(base, y, w2)
    challenge_v = compute_random_oracle_challenge(b.Fr, w2.bytes())
    assert w.bytes() == w2.bytes()
    assert challenge_p == challenge_v
    assert proof.verify(y, base, challenge_v)
    # soundness: wrong y fails
    assert not proof.verify(base, y, challenge_v)

    rmc = RandomizedMultChecker(b.Fr.rand(rng))
    proof.verify_with_randomized_mult_checker(y, base, challenge_v, rmc)
    assert rmc.verify()
    rmc2 = RandomizedMultChecker(b.Fr.rand(rng))
    proof.verify_with_randomized_mult_checker(base, y, challenge_v, rmc2)
    assert not rmc2.verify()


def test_pok_pedersen_commitment(curve):
    rng = random.Random(0)
    base1, base2 = curve.rand(rng).normalize(), curve.rand(rng).normalize()
    w1, w2_ = b.Fr.rand(rng), b.Fr.rand(rng)
    y = (base1 * int(w1) + base2 * int(w2_)).normalize()

    protocol = PokPedersenCommitmentProtocol.init(
        w1, b.Fr.rand(rng), base1, w2_, b.Fr.rand(rng), base2)
    w = ByteWriter()
    protocol.challenge_contribution(base1, base2, y, w)
    c = compute_random_oracle_challenge(b.Fr, w.bytes())
    proof = protocol.gen_proof(c)
    assert proof.verify(y, base1, base2, c)
    assert not proof.verify(y, base2, base1, c)

    rmc = RandomizedMultChecker(b.Fr.rand(rng))
    proof.verify_with_randomized_mult_checker(y, base1, base2, c, rmc)
    assert rmc.verify()


def test_generalized_schnorr():
    rng = random.Random(1)
    n = 8
    bases = [b.G1.rand(rng).normalize() for _ in range(n)]
    witnesses = [b.Fr.rand(rng) for _ in range(n)]
    y = msm(bases, witnesses).normalize()
    blindings = [b.Fr.rand(rng) for _ in range(n)]

    comm = SchnorrCommitment.new(bases, blindings)
    w = ByteWriter()
    comm.challenge_contribution(w)
    c = compute_random_oracle_challenge(b.Fr, w.bytes())
    resp = comm.response(witnesses, c)
    assert resp.is_valid(bases, y, comm.t, c)
    # tampered response fails
    resp.responses[0] = resp.responses[0] + b.Fr(1)
    assert not resp.is_valid(bases, y, comm.t, c)


def test_msm_against_naive():
    rng = random.Random(2)
    for n in (1, 5, 33, 70):
        pts = [b.G1.rand(rng) for _ in range(n)]
        sc = [b.Fr.rand(rng) for _ in range(n)]
        naive = b.G1.infinity()
        for p, s in zip(pts, sc):
            naive = naive + p * int(s)
        assert msm(pts, sc) == naive


def test_window_table():
    from crypto_tpu.utils.msm import WindowTable
    rng = random.Random(5)
    base = b.G1.rand(rng)
    t = WindowTable(64, base)
    for _ in range(5):
        s = b.Fr.rand(rng)
        assert t.mul(s) == base * int(s)


def test_pedersen_commitment_key():
    from crypto_tpu.utils.commitment import PedersenCommitmentKey
    rng = random.Random(6)
    ck = PedersenCommitmentKey.new(b.G1, b"test-ck")
    m, r = b.Fr.rand(rng), b.Fr.rand(rng)
    c = ck.commit(m, r)
    assert c == (ck.g * int(m) + ck.h * int(r)).normalize()


def test_randomized_pairing_checker():
    from crypto_tpu.utils.checkers import RandomizedPairingChecker
    rng = random.Random(7)
    P, Q = b.G1.generator(), b.G2.generator()
    for lazy in (False, True):
        ch = RandomizedPairingChecker(b.Fr.rand(rng), lazy=lazy)
        s = b.Fr.rand(rng)
        # e(sP, Q) == e(P, sQ)
        ch.add_sources((P * int(s)).normalize(), Q, P, (Q * int(s)).normalize())
        # e(sP, Q) == target
        target = b.pairing(P, Q) ** int(s)
        ch.add_sources_and_target((P * int(s)).normalize(), Q, target)
        assert ch.verify()

        bad = RandomizedPairingChecker(b.Fr.rand(rng), lazy=lazy)
        bad.add_sources((P * int(s)).normalize(), Q, P, Q)
        assert not bad.verify()
