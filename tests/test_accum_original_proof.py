"""Original 2020/777 section-7 accumulator membership proof (GT element
inside the Schnorr commitment)."""
import random
from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.accumulator.setup import AccumKeypair, AccumSetupParams
from crypto_tpu.accumulator.core import PositiveAccumulator
from crypto_tpu.accumulator.persistence import InMemoryState
from crypto_tpu.accumulator.proofs_original import (MembershipProvingKey,
                                                    MembershipProofProtocol)
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge

F = b.Fr
RNG = random.Random(1818)

def test_original_membership_proof():
    params = AccumSetupParams.new(b"orig-accum")
    kp = AccumKeypair.generate(RNG, params)
    prk = MembershipProvingKey.new(b"orig-prk")
    st = InMemoryState()
    acc = PositiveAccumulator.initialize(params)
    y = F.rand(RNG)
    acc = acc.add(y, kp.secret_key, st)
    wit = acc.get_membership_witness(y, kp.secret_key, st)
    prot = MembershipProofProtocol.init(
        RNG, y, None, wit, acc.value(), kp.public_key, params, prk)
    w = ByteWriter()
    prot.challenge_contribution(acc.value(), kp.public_key, params, prk, w)
    c = compute_random_oracle_challenge(F, w.bytes())
    proof = prot.gen_proof(c)
    w2 = ByteWriter()
    proof.challenge_contribution(acc.value(), kp.public_key, params, prk, w2)
    assert compute_random_oracle_challenge(F, w2.bytes()) == c
    assert proof.verify(acc.value(), c, kp.public_key, params, prk)
    assert not proof.verify((acc.value() * 3).normalize(), c,
                            kp.public_key, params, prk)
    proof.s_y = proof.s_y + F(1)
    assert not proof.verify(acc.value(), c, kp.public_key, params, prk)


def test_original_non_membership_proof():
    """Original universal-accumulator non-membership proof with the E_d /
    E_d_inv commitments (reference `proofs.rs:1100-1560`)."""
    from crypto_tpu.accumulator.core import UniversalAccumulator
    from crypto_tpu.accumulator.persistence import InMemoryInitialElements
    from crypto_tpu.accumulator.proofs_original import (
        NonMembershipProofProtocol, NonMembershipProvingKey)

    params = AccumSetupParams.new(b"orig-nm-accum")
    kp = AccumKeypair.generate(RNG, params)
    prk = NonMembershipProvingKey.new(b"orig-nm-prk")
    st = InMemoryState()
    acc = UniversalAccumulator.initialize(RNG, params, 10, kp.secret_key,
                                          InMemoryInitialElements())
    members = [F.rand(RNG) for _ in range(4)]
    acc = acc.add_batch(members, kp.secret_key, st)
    y = F.rand(RNG)
    wit = acc.get_non_membership_witness(y, kp.secret_key, st, params)

    prot = NonMembershipProofProtocol.init(
        RNG, y, None, wit, acc.value(), kp.public_key, params, prk)
    w = ByteWriter()
    prot.challenge_contribution(acc.value(), kp.public_key, params, prk, w)
    c = compute_random_oracle_challenge(F, w.bytes())
    proof = prot.gen_proof(c)
    w2 = ByteWriter()
    proof.challenge_contribution(acc.value(), kp.public_key, params, prk,
                                 w2)
    assert compute_random_oracle_challenge(F, w2.bytes()) == c
    assert proof.verify(acc.value(), c, kp.public_key, params, prk)
    # tampered accumulator value rejected
    assert not proof.verify((acc.value() * 5).normalize(), c,
                            kp.public_key, params, prk)
    # tampered E_d rejected
    import copy
    bad = copy.deepcopy(proof)
    bad.E_d = (bad.E_d + params.P).normalize()
    assert not bad.verify(acc.value(), c, kp.public_key, params, prk)
    # response shared with equality framework
    assert proof.response_for_element() == proof.mem.s_y
