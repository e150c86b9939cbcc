"""KB universal accumulator + keyed-verification proofs."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.accumulator.setup import AccumKeypair, AccumSetupParams
from crypto_tpu.accumulator.core import PositiveAccumulator, AccumulatorError
from crypto_tpu.accumulator.persistence import InMemoryState
from crypto_tpu.accumulator.kb_universal import KBUniversalAccumulator
from crypto_tpu.accumulator.keyed import (KeyedMembershipProofProtocol)
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge

F = b.Fr
RNG = random.Random(1010)


def test_kb_universal():
    params = AccumSetupParams.new(b"kb-accum")
    kp = AccumKeypair.generate(RNG, params)
    sk, pk = kp.secret_key, kp.public_key
    domain = [F.rand(RNG) for _ in range(6)]
    ms, nms = InMemoryState(), InMemoryState()
    acc = KBUniversalAccumulator.initialize(params, sk, domain, ms, nms)

    # initially everything is a non-member
    for d in domain:
        wit = acc.get_non_membership_witness(d, sk, nms)
        assert acc.verify_non_membership(d, wit, pk, params)

    acc2 = acc.add(domain[0], sk, ms, nms)
    mwit = acc2.get_membership_witness(domain[0], sk, ms)
    assert acc2.verify_membership(domain[0], mwit, pk, params)
    with pytest.raises(AccumulatorError):
        acc2.get_non_membership_witness(domain[0], sk, nms)
    # other elements still non-members
    w1 = acc2.get_non_membership_witness(domain[1], sk, nms)
    assert acc2.verify_non_membership(domain[1], w1, pk, params)

    # removal restores non-membership
    acc3 = acc2.remove(domain[0], sk, ms, nms)
    w0 = acc3.get_non_membership_witness(domain[0], sk, nms)
    assert acc3.verify_non_membership(domain[0], w0, pk, params)

    # element outside the domain cannot be added
    with pytest.raises(AccumulatorError):
        acc3.add(F.rand(RNG), sk, ms, nms)


def test_keyed_membership_proof():
    params = AccumSetupParams.new(b"kv-accum")
    kp = AccumKeypair.generate(RNG, params)
    sk, pk = kp.secret_key, kp.public_key
    state = InMemoryState()
    acc = PositiveAccumulator.initialize(params)
    y = F.rand(RNG)
    acc = acc.add(y, sk, state)
    wit = acc.get_membership_witness(y, sk, state)

    prot = KeyedMembershipProofProtocol.init(RNG, y, None, wit, acc.value())
    w = ByteWriter()
    prot.challenge_contribution(acc.value(), w)
    c = compute_random_oracle_challenge(F, w.bytes())
    proof = prot.gen_proof(c)
    w2 = ByteWriter()
    proof.challenge_contribution(acc.value(), w2)
    assert compute_random_oracle_challenge(F, w2.bytes()) == c
    # keyed verification (no pairings anywhere)
    assert proof.verify(acc.value(), c, sk)
    from crypto_tpu.accumulator.setup import AccumSecretKey
    assert not proof.verify(acc.value(), c, AccumSecretKey.generate(RNG))

    # delegation: hand (C', C_bar) to the key holder
    keyed = proof.keyed_part()
    assert keyed.verify(sk)
    pov = keyed.create_proof_of_validity(RNG, sk, params.P_tilde, pk.Q_tilde)
    assert pov.verify(keyed, params.P_tilde, pk.Q_tilde)
