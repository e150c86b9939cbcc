"""VB accumulator tests (BASELINE.md parity config #3).

Mirrors reference tests in `vb_accumulator/src/{positive,universal,witness}.rs`
and `proofs_cdh.rs`.
"""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.accumulator.setup import (AccumKeypair, AccumSetupParams)
from crypto_tpu.accumulator.core import (PositiveAccumulator,
                                         UniversalAccumulator,
                                         AccumulatorError)
from crypto_tpu.accumulator.persistence import (InMemoryState,
                                                InMemoryInitialElements)
from crypto_tpu.accumulator import witness as W
from crypto_tpu.accumulator.batch_utils import (Omega, poly_d_eval,
                                                poly_v_A_coeffs, poly_v_A_eval,
                                                poly_v_D_coeffs, poly_v_D_eval,
                                                poly_v_AD_coeffs, poly_v_AD_eval)
from crypto_tpu.accumulator import proofs_cdh as P
from crypto_tpu.utils.ff import poly_eval
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge, group_elem_from_try_and_incr

RNG = random.Random(9)


@pytest.fixture(scope="module")
def setup():
    params = AccumSetupParams.new(b"accum-test")
    keypair = AccumKeypair.generate(RNG, params)
    return params, keypair


def test_positive_accumulator_lifecycle(setup):
    params, kp = setup
    sk, pk = kp.secret_key, kp.public_key
    state = InMemoryState()
    accum = PositiveAccumulator.initialize(params)

    elems = [b.Fr.rand(RNG) for _ in range(6)]
    for e in elems[:3]:
        accum = accum.add(e, sk, state)
    accum = accum.add_batch(elems[3:], sk, state)

    # witnesses verify
    for e in elems:
        wit = accum.get_membership_witness(e, sk, state)
        assert accum.verify_membership(e, wit, pk, params)
    # batch witnesses
    wits = accum.get_membership_witnesses_for_batch(elems, sk, state)
    for e, wit in zip(elems, wits):
        assert accum.verify_membership(e, wit, pk, params)

    # non-member fails
    stranger = b.Fr.rand(RNG)
    fake_wit = wits[0]
    assert not accum.verify_membership(stranger, fake_wit, pk, params)

    # duplicate add / absent remove errors
    with pytest.raises(AccumulatorError):
        accum.add(elems[0], sk, state)
    with pytest.raises(AccumulatorError):
        accum.remove(stranger, sk, state)

    # removal invalidates witness
    accum2 = accum.remove(elems[0], sk, state)
    wit0 = wits[0]
    assert not accum2.verify_membership(elems[0], wit0, pk, params)


def test_batch_polynomials_consistency():
    alpha = b.Fr.rand(RNG)
    adds = [b.Fr.rand(RNG) for _ in range(5)]
    rems = [b.Fr.rand(RNG) for _ in range(3)]
    x = b.Fr.rand(RNG)
    assert poly_eval(poly_v_A_coeffs(adds, alpha), x) == poly_v_A_eval(adds, alpha, x)
    assert poly_eval(poly_v_D_coeffs(rems, alpha), x) == poly_v_D_eval(rems, alpha, x)
    assert poly_eval(poly_v_AD_coeffs(adds, rems, alpha), x) == \
        poly_v_AD_eval(adds, rems, alpha, x)


def test_single_witness_updates(setup):
    params, kp = setup
    sk, pk = kp.secret_key, kp.public_key
    state = InMemoryState()
    accum = PositiveAccumulator.initialize(params)
    y = b.Fr.rand(RNG)
    accum = accum.add(y, sk, state)
    wit = accum.get_membership_witness(y, sk, state)

    # addition
    z = b.Fr.rand(RNG)
    old_V = accum.value()
    accum2 = accum.add(z, sk, state)
    wit2 = W.update_membership_after_addition(wit, y, z, old_V)
    assert accum2.verify_membership(y, wit2, pk, params)

    # removal
    accum3 = accum2.remove(z, sk, state)
    wit3 = W.update_membership_after_removal(wit2, y, z, accum3.value())
    assert accum3.verify_membership(y, wit3, pk, params)


def test_batch_witness_updates_with_sk(setup):
    params, kp = setup
    sk, pk = kp.secret_key, kp.public_key
    state = InMemoryState()
    accum = PositiveAccumulator.initialize(params)
    members = [b.Fr.rand(RNG) for _ in range(4)]
    accum = accum.add_batch(members, sk, state)
    wits = accum.get_membership_witnesses_for_batch(members, sk, state)

    adds = [b.Fr.rand(RNG) for _ in range(3)]
    rems = members[2:3] + []  # remove member 2? No - keep members; remove fresh
    # do additions + removals of other elements
    extra = [b.Fr.rand(RNG) for _ in range(2)]
    accum_mid = accum.add_batch(extra, sk, state)
    old_V = accum_mid.value()
    accum_new = accum_mid.batch_updates(adds, extra, sk, state)

    new_wits = W.update_membership_batch_with_sk(
        adds, extra, members, wits_mid := W.update_membership_batch_with_sk(
            extra, [], members, wits, accum.value(), sk),
        old_V, sk)
    for m, wit in zip(members, new_wits):
        assert accum_new.verify_membership(m, wit, pk, params)


def test_witness_update_with_public_info(setup):
    params, kp = setup
    sk, pk = kp.secret_key, kp.public_key
    state = InMemoryState()
    accum = PositiveAccumulator.initialize(params)
    members = [b.Fr.rand(RNG) for _ in range(3)]
    accum = accum.add_batch(members, sk, state)
    wit = accum.get_membership_witness(members[0], sk, state)

    adds = [b.Fr.rand(RNG) for _ in range(4)]
    rems = members[1:2]
    omega = Omega.new(adds, rems, accum.value(), sk)
    accum_new = accum.batch_updates(adds, rems, sk, state)

    wit_new = W.update_membership_with_public_info(
        wit, members[0], adds, rems, omega)
    assert accum_new.verify_membership(members[0], wit_new, pk, params)
    # stale witness fails
    assert not accum_new.verify_membership(members[0], wit, pk, params)


def test_universal_accumulator(setup):
    params, kp = setup
    sk, pk = kp.secret_key, kp.public_key
    state = InMemoryState()
    initial = InMemoryInitialElements()
    accum = UniversalAccumulator.initialize(RNG, params, 10, sk, initial)

    members = [b.Fr.rand(RNG) for _ in range(4)]
    accum = accum.add_batch(members, sk, state)
    # membership
    wit = accum.get_membership_witness(members[0], sk, state)
    assert accum.verify_membership(members[0], wit, pk, params)
    # non-membership
    stranger = b.Fr.rand(RNG)
    nm_wit = accum.get_non_membership_witness(stranger, sk, state, params)
    assert accum.verify_non_membership(stranger, nm_wit, pk, params)
    # a member has no valid non-membership witness
    with pytest.raises(AccumulatorError):
        accum.get_non_membership_witness(members[0], sk, state, params)

    # non-membership witness updates across accumulator changes
    z = b.Fr.rand(RNG)
    old_V = accum.value()
    accum2 = accum.add(z, sk, state)
    nm_wit2 = W.update_non_membership_after_addition(nm_wit, stranger, z, old_V)
    assert accum2.verify_non_membership(stranger, nm_wit2, pk, params)
    accum3 = accum2.remove(z, sk, state)
    nm_wit3 = W.update_non_membership_after_removal(nm_wit2, stranger, z, accum3.value())
    assert accum3.verify_non_membership(stranger, nm_wit3, pk, params)


def test_membership_proof_cdh(setup):
    params, kp = setup
    sk, pk = kp.secret_key, kp.public_key
    state = InMemoryState()
    accum = PositiveAccumulator.initialize(params)
    y = b.Fr.rand(RNG)
    accum = accum.add(y, sk, state)
    wit = accum.get_membership_witness(y, sk, state)

    prot = P.MembershipProofProtocol.init(RNG, y, None, wit, accum.value())
    w = ByteWriter()
    prot.challenge_contribution(accum.value(), w)
    c = compute_random_oracle_challenge(b.Fr, w.bytes())
    proof = prot.gen_proof(c)

    w2 = ByteWriter()
    proof.challenge_contribution(accum.value(), w2)
    c2 = compute_random_oracle_challenge(b.Fr, w2.bytes())
    assert c == c2
    assert proof.verify(accum.value(), c2, pk, params)
    # wrong accumulator fails
    other = (accum.value() * 7).normalize()
    assert not proof.verify(other, c2, pk, params)


def test_non_membership_proof_cdh(setup):
    params, kp = setup
    sk, pk = kp.secret_key, kp.public_key
    state = InMemoryState()
    initial = InMemoryInitialElements()
    accum = UniversalAccumulator.initialize(RNG, params, 10, sk, initial)
    accum = accum.add_batch([b.Fr.rand(RNG) for _ in range(3)], sk, state)
    stranger = b.Fr.rand(RNG)
    nm_wit = accum.get_non_membership_witness(stranger, sk, state, params)
    Q = group_elem_from_try_and_incr(b.G1, b"accum-Q").normalize()

    prot = P.NonMembershipProofProtocol.init(
        RNG, stranger, None, nm_wit, accum.value(), params, Q)
    w = ByteWriter()
    prot.challenge_contribution(accum.value(), params, Q, w)
    c = compute_random_oracle_challenge(b.Fr, w.bytes())
    proof = prot.gen_proof(c)
    w2 = ByteWriter()
    proof.challenge_contribution(accum.value(), params, Q, w2)
    assert compute_random_oracle_challenge(b.Fr, w2.bytes()) == c
    assert proof.verify(accum.value(), c, pk, params, Q)

    from crypto_tpu.utils.checkers import RandomizedPairingChecker
    ch = RandomizedPairingChecker(b.Fr.rand(RNG), lazy=False)
    assert proof.verify_with_pairing_checker(accum.value(), c, pk, params, Q, ch)
    assert ch.verify()
