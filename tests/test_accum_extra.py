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


def test_kb_positive_accumulator():
    from crypto_tpu.accumulator.kb_positive import (
        KBPositiveAccumulator, KBPosMembershipProofProtocol, KBPosPublicKey,
        KBPosSecretKey, KBPosSetupParams)
    from crypto_tpu.accumulator.persistence import InMemoryState
    from crypto_tpu.serialize import ByteWriter
    from crypto_tpu.hashing import compute_random_oracle_challenge

    params = KBPosSetupParams.new(b"kb-pos-test")
    sk = KBPosSecretKey.generate(RNG)
    pk = KBPosPublicKey.generate(sk, params)
    state = InMemoryState()
    accum = KBPositiveAccumulator.initialize(RNG, params.accum.P)
    v0 = accum.value

    elems = [F.rand(RNG) for _ in range(4)]
    wits = [accum.add(e, sk, params, state) for e in elems]
    # adds do NOT change the accumulator value
    assert accum.value == v0
    for e, w in zip(elems, wits):
        assert accum.verify_membership(e, w, pk, params)
    assert not accum.verify_membership(F.rand(RNG), wits[0], pk, params)

    # membership proof with linked r
    prot = KBPosMembershipProofProtocol.init(
        RNG, elems[0], wits[0], accum.value, params)
    w = ByteWriter()
    prot.challenge_contribution(accum.value, params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    assert proof.verify(accum.value, c, pk, params)
    assert not proof.verify((accum.value * 3).normalize(), c, pk, params)

    # removal changes value; witnesses updatable
    accum2 = accum.remove(elems[3], sk, state)
    assert accum2.value != accum.value
    from crypto_tpu.accumulator.kb_positive import bb_sig_prf
    removed_r = bb_sig_prf(elems[3], sk.sig)
    w0 = wits[0].update_after_removal(removed_r, accum2.value)
    assert accum2.verify_membership(elems[0], w0, pk, params)
    assert not accum2.verify_membership(elems[0], wits[0], pk, params)


@pytest.mark.slow
def test_threshold_accumulator_witness_generation():
    """Threshold witness C = V * 1/(y+alpha) without reconstructing alpha:
    the accumulator witness IS a weak-BB signature with base V (reference
    `vb_accumulator/src/threshold/mod.rs` reuses threshold_weak_bb_sig)."""
    from crypto_tpu.accumulator.core import PositiveAccumulator
    from crypto_tpu.accumulator.persistence import InMemoryState
    from crypto_tpu.accumulator.setup import (AccumPublicKey, AccumSecretKey,
                                              AccumSetupParams)
    from crypto_tpu.secret_sharing.schemes import shamir_deal_secret
    from crypto_tpu.short_group_sig.threshold_weak_bb import (
        ThresholdWeakBBSigner, run_threshold_weak_bb)

    params = AccumSetupParams.new(b"thr-accum")
    sk = AccumSecretKey.generate(RNG)
    pk = AccumPublicKey.generate(sk, params)
    state = InMemoryState()
    accum = PositiveAccumulator.initialize(params)
    elems = [F.rand(RNG) for _ in range(3)]
    for e in elems:
        accum = accum.add(e, sk, state)

    # alpha is Shamir-shared; 3-of-5 signers jointly produce the witness
    shares, _ = shamir_deal_secret(RNG, sk.alpha, 3, 5)
    signer_ids = [1, 2, 4]
    signers = {
        i: ThresholdWeakBBSigner.init(
            RNG, i, next(s.share for s in shares.shares if s.id == i),
            signer_ids)
        for i in signer_ids
    }
    sig = run_threshold_weak_bb(RNG, signers, elems[0], accum.value())
    from crypto_tpu.accumulator.core import MembershipWitness
    wit = MembershipWitness(C=sig.A)
    assert accum.verify_membership(elems[0], wit, pk, params)
    # and it matches the witness computed with the full key
    direct = accum.compute_membership_witness(elems[0], sk)
    assert wit.C == direct.C
