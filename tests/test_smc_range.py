"""CCS set-membership and perfect-range proof tests."""

import random

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.smc_range_proof.ccs import (
    MemberCommitmentKey, SetMembershipCheckParams, SetMembershipProtocol,
    CCSPerfectRangeProtocol, find_l_for_perfect_range)
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge
from crypto_tpu.utils.checkers import RandomizedPairingChecker

F = b.Fr
RNG = random.Random(707)


def test_set_membership():
    members = [F(10), F(25), F(77), F(130)]
    params = SetMembershipCheckParams.new(RNG, b"smc-set", members)
    ck = MemberCommitmentKey.new(b"smc-ck")
    member, r = F(25), F.rand(RNG)
    comm = ck.commit(member, r)
    prot = SetMembershipProtocol.init(RNG, member, r, ck, params)
    w = ByteWriter()
    prot.challenge_contribution(comm, ck, params, w)
    c = compute_random_oracle_challenge(F, w.bytes())
    proof = prot.gen_proof(c)
    w2 = ByteWriter()
    proof.challenge_contribution(comm, ck, params, w2)
    assert compute_random_oracle_challenge(F, w2.bytes()) == c
    assert proof.verify(comm, c, ck, params)
    # wrong commitment fails
    other = ck.commit(F(77), r)
    assert not proof.verify(other, c, ck, params)


def test_perfect_range():
    base = 4
    params = SetMembershipCheckParams.new_for_range_proof(RNG, b"smc-range", base)
    ck = MemberCommitmentKey.new(b"smc-ck2")
    max_val = base ** 5  # 1024
    value = 357
    r = F.rand(RNG)
    comm = ck.commit(F(value), r)
    prot = CCSPerfectRangeProtocol.init(RNG, value, r, max_val, base, ck, params)
    w = ByteWriter()
    prot.challenge_contribution(comm, ck, params, w)
    c = compute_random_oracle_challenge(F, w.bytes())
    proof = prot.gen_proof(c)
    assert proof.verify(comm, c, max_val, ck, params)

    # randomized pairing checker path
    chk = RandomizedPairingChecker(F.rand(RNG), lazy=True)
    assert proof.verify(comm, c, max_val, ck, params, pairing_checker=chk)
    assert chk.verify()

    # commitment to out-of-range value cannot be proven (digits don't exist)
    import pytest
    from crypto_tpu.smc_range_proof.ccs import SmcError
    with pytest.raises(SmcError):
        CCSPerfectRangeProtocol.init(RNG, max_val + 5, r, max_val, base, ck, params)
    # proof doesn't verify against a different commitment
    comm2 = ck.commit(F(value + 1), r)
    assert not proof.verify(comm2, c, max_val, ck, params)
