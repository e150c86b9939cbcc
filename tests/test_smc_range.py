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


def test_ccs_arbitrary_range():
    from crypto_tpu.smc_range_proof.ranges_extra import (
        CCSArbitraryRangeProtocol)
    base = 4
    params = SetMembershipCheckParams.new_for_range_proof(
        RNG, b"ccs-arb", base)
    ck = MemberCommitmentKey.new(b"ccs-arb-ck")
    value, lo, hi = 513, 100, 1000
    r = F.rand(RNG)
    commitment = ck.commit(F(value), r)
    prot = CCSArbitraryRangeProtocol.init(RNG, value, r, lo, hi, base, ck,
                                          params)
    w = ByteWriter()
    prot.challenge_contribution(commitment, ck, params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    w2 = ByteWriter()
    proof.challenge_contribution(commitment, ck, params, w2)
    assert bytes(w2.buf) == bytes(w.buf)
    assert proof.verify(commitment, c, lo, hi, ck, params)
    assert not proof.verify(commitment, c, lo, 512, ck, params)
    other = ck.commit(F(value + 1), r)
    assert not proof.verify(other, c, lo, hi, ck, params)
    # out-of-range value rejected at init
    try:
        CCSArbitraryRangeProtocol.init(RNG, 50, r, lo, hi, base, ck, params)
        assert False
    except Exception:
        pass


def test_cls_sumset_range():
    from crypto_tpu.smc_range_proof.ranges_extra import (
        CLSRangeProtocol, decompose_for_sumset, find_number_of_digits,
        find_sumset_boundaries)
    # sumset decomposition sanity (reference `util.rs` sumsets_check)
    for base in (2, 3, 5, 10):
        rng = random.Random(base)
        for _ in range(10):
            mx = rng.randrange(2, 1 << 32) * (base - 1) if base > 2 \
                else rng.randrange(2, 1 << 32)
            l = find_number_of_digits(mx, base)
            G = find_sumset_boundaries(mx, base, l)
            for v in {0, 1, mx, mx - 1, rng.randrange(mx)}:
                sigma = decompose_for_sumset(v, G, base)
                assert sum(s * g for s, g in zip(sigma, G)) == v
                assert all(s < base for s in sigma)

    base = 5
    params = SetMembershipCheckParams.new_for_range_proof(
        RNG, b"cls", base)
    ck = MemberCommitmentKey.new(b"cls-ck")
    value, lo, hi = 7777, 1000, 20000
    r = F.rand(RNG)
    commitment = ck.commit(F(value), r)
    prot = CLSRangeProtocol.init(RNG, value, r, lo, hi, base, ck, params)
    w = ByteWriter()
    prot.challenge_contribution(commitment, ck, params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    assert proof.verify(commitment, c, lo, hi, ck, params)
    assert not proof.verify(commitment, c, lo + 1, hi, ck, params)


def test_bpp_arbitrary_range():
    from crypto_tpu.bulletproofs_pp.range_proof import SetupParams
    from crypto_tpu.bulletproofs_pp.arbitrary_range import (
        ProofArbitraryRange)
    from crypto_tpu.transcript.transcript import Transcript
    bpp = SetupParams.new_for_perfect_range_proof(b"bpp-arb", 2, 16, 4)
    vb = [(100, 50, 200), (65000, 60000, 65536)]
    rand = [b.Fr.rand(RNG) for _ in range(4)]
    proof = ProofArbitraryRange.new(RNG, 16, vb, rand, bpp,
                                    Transcript(b"arb"))
    assert proof.verify(16, bpp, Transcript(b"arb"))
    assert not proof.verify(16, bpp, Transcript(b"other"))
    comms = proof.get_commitments_to_values([(50, 200), (60000, 65536)], bpp)
    # lower-leg recovered commitment opens to (v, r)
    assert comms[0][0] == (bpp.G * 100 + bpp.H_vec[0] * int(rand[0])).normalize()


def test_kv_range_proofs():
    from crypto_tpu.smc_range_proof.kv import (
        CCSArbitraryRangeKVProtocol, CCSPerfectRangeKVProtocol,
        SetMembershipCheckParamsKV)
    base = 4
    params = SetMembershipCheckParamsKV.new_for_range_proof(
        RNG, b"kv-range", base)
    ck = MemberCommitmentKey.new(b"kv-ck")
    # perfect range [0, base^3)
    value, mx = 37, base ** 3
    r = F.rand(RNG)
    commitment = ck.commit(F(value), r)
    prot = CCSPerfectRangeKVProtocol.init(RNG, value, r, mx, base, ck,
                                          params)
    w = ByteWriter()
    prot.challenge_contribution(commitment, ck, params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    assert proof.verify(commitment, c, mx, ck, params, params.sk)
    from crypto_tpu.short_group_sig.weak_bb import WeakBBSecretKey
    assert not proof.verify(commitment, c, mx, ck, params,
                            WeakBBSecretKey.generate(RNG))
    # arbitrary range
    lo, hi = 10, 200
    value2 = 137
    r2 = F.rand(RNG)
    commitment2 = ck.commit(F(value2), r2)
    prot2 = CCSArbitraryRangeKVProtocol.init(RNG, value2, r2, lo, hi, base,
                                             ck, params)
    w = ByteWriter()
    prot2.challenge_contribution(commitment2, ck, params, w)
    c2 = compute_random_oracle_challenge(F, bytes(w.buf))
    proof2 = prot2.gen_proof(c2)
    assert proof2.verify(commitment2, c2, lo, hi, ck, params, params.sk)
    assert not proof2.verify(commitment2, c2, 140, hi, ck, params,
                             params.sk)


def test_set_membership_cdh_batch_kv():
    """CDH, batch, and keyed-verification set-membership variants
    (reference `ccs_set_membership/{single_member_cdh,batch_members,
    kv_single}.rs`)."""
    from crypto_tpu.smc_range_proof.set_membership import (
        SetMembershipBatchCheckProtocol, SetMembershipCheckCDHProtocol,
        SetMembershipCheckWithKVProtocol)
    from crypto_tpu.smc_range_proof.ccs import (MemberCommitmentKey,
                                                SetMembershipCheckParams)
    from crypto_tpu.smc_range_proof.kv import SetMembershipCheckParamsKV

    rng = random.Random(31)
    members = [F.rand(rng) for _ in range(6)]
    ck = MemberCommitmentKey.new(b"sm-ck")
    params = SetMembershipCheckParams.new(rng, b"sm-params", members)

    # CDH single
    member, r = members[2], F.rand(rng)
    comm = ck.commit(member, r)
    prot = SetMembershipCheckCDHProtocol.init(rng, member, r, ck, params)
    w = ByteWriter()
    prot.challenge_contribution(comm, ck, params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    assert proof.verify(comm, c, ck, params)
    # wrong commitment rejected
    assert not proof.verify(ck.commit(member, F.rand(rng)), c, ck, params)

    # batch
    batch = [members[0], members[3], members[3]]
    rs = [F.rand(rng) for _ in batch]
    comms = [ck.commit(m, ri) for m, ri in zip(batch, rs)]
    bprot = SetMembershipBatchCheckProtocol.init(rng, batch, rs, ck, params)
    w = ByteWriter()
    bprot.challenge_contribution(comms, ck, params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    bproof = bprot.gen_proof(c)
    assert bproof.verify(comms, c, ck, params)
    assert not bproof.verify(list(reversed(comms)), c, ck, params)

    # KV single
    kv_params = SetMembershipCheckParamsKV.new(rng, b"sm-kv", members)
    kprot = SetMembershipCheckWithKVProtocol.init(rng, member, r, ck,
                                                  kv_params)
    w = ByteWriter()
    kprot.challenge_contribution(comm, ck, kv_params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    kproof = kprot.gen_proof(c)
    assert kproof.verify(comm, c, ck, kv_params, kv_params.sk)
    from crypto_tpu.short_group_sig.weak_bb import WeakBBSecretKey
    assert not kproof.verify(comm, c, ck, kv_params,
                             WeakBBSecretKey.generate(rng))


def test_cdh_range_variants():
    """CDH + CLS-KV range proof variants (reference
    `ccs_range_proof/*_cdh.rs`, `cls_range_proof/{range_proof_cdh,
    kv_range_proof}.rs`)."""
    from crypto_tpu.smc_range_proof.cdh import (
        CCSArbitraryRangeCDHProtocol, CCSPerfectRangeCDHProtocol,
        CLSRangeCDHProtocol)
    from crypto_tpu.smc_range_proof.ccs import (MemberCommitmentKey,
                                                SetMembershipCheckParams)
    from crypto_tpu.smc_range_proof.kv import SetMembershipCheckParamsKV

    rng = random.Random(92)
    base = 4
    params = SetMembershipCheckParams.new_for_range_proof(rng, b"cdh-rp",
                                                          base)
    ck = MemberCommitmentKey.new(b"cdh-ck")
    val, r = 37, F.rand(rng)
    comm = ck.commit(F(val), r)

    # perfect range [0, base^l)
    prot = CCSPerfectRangeCDHProtocol.init(rng, val, r, 256, base, ck,
                                           params)
    w = ByteWriter()
    prot.challenge_contribution(comm, ck, params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    assert proof.verify(comm, c, 256, ck, params)
    checker = RandomizedPairingChecker(F.rand(rng), lazy=True)
    assert proof.verify(comm, c, 256, ck, params, checker)
    assert checker.verify()

    # arbitrary range [min, max)
    prot = CCSArbitraryRangeCDHProtocol.init(rng, val, r, 18, 100, base,
                                             ck, params)
    w = ByteWriter()
    prot.challenge_contribution(comm, ck, params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    assert proof.verify(comm, c, 18, 100, ck, params)
    assert not proof.verify(comm, c, 40, 100, ck, params)

    # CLS sumset, CDH
    prot = CLSRangeCDHProtocol.init(rng, val, r, 18, 100, base, ck, params)
    w = ByteWriter()
    prot.challenge_contribution(comm, ck, params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    assert proof.verify(comm, c, 18, 100, ck, params)
    assert not proof.verify(ck.commit(F(val), F.rand(rng)), c, 18, 100,
                            ck, params)

    # CLS sumset, keyed verification
    kv_params = SetMembershipCheckParamsKV.new_for_range_proof(
        rng, b"cdh-kv-rp", base)
    prot = CLSRangeCDHProtocol.init(rng, val, r, 18, 100, base, ck,
                                    kv_params, kv=True)
    w = ByteWriter()
    prot.challenge_contribution(comm, ck, kv_params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    assert proof.verify(comm, c, 18, 100, ck, kv_params, kv_params.sk)
    from crypto_tpu.short_group_sig.weak_bb import WeakBBSecretKey
    assert not proof.verify(comm, c, 18, 100, ck, kv_params,
                            WeakBBSecretKey.generate(rng))
