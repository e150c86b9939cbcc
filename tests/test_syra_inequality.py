"""SyRA pseudonyms, DY VRF, and Schnorr inequality proofs."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.syra.core import (SyraSetupParams, IssuerSecretKey,
                                  IssuerPublicKey, UserSecretKey,
                                  PseudonymProof, vrf_generate, vrf_verify)
from crypto_tpu.schnorr.inequality import DiscreteLogInequalityProtocol
from crypto_tpu.utils.commitment import PedersenCommitmentKey
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge

F = b.Fr
RNG = random.Random(808)


def test_vrf():
    params = SyraSetupParams.new(b"syra-test")
    sk = IssuerSecretKey.generate(RNG)
    pk = IssuerPublicKey.new(sk, params)
    m = F.rand(RNG)
    out, proof = vrf_generate(m, sk, params)
    assert vrf_verify(m, out, proof, pk, params)
    assert not vrf_verify(m + F(1), out, proof, pk, params)


def test_pseudonym():
    params = SyraSetupParams.new(b"syra-test")
    isk = IssuerSecretKey.generate(RNG)
    ipk = IssuerPublicKey.new(isk, params)
    user_id = F.rand(RNG)
    usk = UserSecretKey.issue(user_id, isk, params)
    assert usk.verify(user_id, ipk, params)

    proof = PseudonymProof.new(RNG, usk, user_id, b"ctx-1", params)
    assert proof.verify(b"ctx-1", ipk, params)
    # pseudonym is deterministic per (user, context)
    proof2 = PseudonymProof.new(RNG, usk, user_id, b"ctx-1", params)
    assert proof2.T == proof.T
    # ...but different across contexts (unlinkable)
    proof3 = PseudonymProof.new(RNG, usk, user_id, b"ctx-2", params)
    assert proof3.T != proof.T
    assert proof3.verify(b"ctx-2", ipk, params)
    # wrong context fails
    assert not proof.verify(b"ctx-2", ipk, params)
    # forged user (no issuer signature) fails
    fake_usk = UserSecretKey(usk=b.G1.rand(RNG).normalize())
    fake = PseudonymProof.new(RNG, fake_usk, user_id, b"ctx-1", params)
    assert not fake.verify(b"ctx-1", ipk, params)


def test_inequality_public_value():
    ck = PedersenCommitmentKey.new(b.G1, b"ineq-ck")
    m, r = F.rand(RNG), F.rand(RNG)
    C = ck.commit(m, r)
    v = F.rand(RNG)
    prot = DiscreteLogInequalityProtocol.init_with_public_value(
        RNG, m, r, C, v, ck)
    w = ByteWriter()
    prot.challenge_contribution(C, v, ck, w)
    c = compute_random_oracle_challenge(F, w.bytes())
    proof = prot.gen_proof(c)
    assert proof.verify_with_public_value(C, v, c, ck)
    # equal values cannot even start
    from crypto_tpu.schnorr.inequality import InequalityError
    with pytest.raises(InequalityError):
        DiscreteLogInequalityProtocol.init_with_public_value(
            RNG, m, r, C, m, ck)


def test_inequality_committed_values():
    ck = PedersenCommitmentKey.new(b.G1, b"ineq-ck")
    m1, r1 = F.rand(RNG), F.rand(RNG)
    m2, r2 = F.rand(RNG), F.rand(RNG)
    C1, C2 = ck.commit(m1, r1), ck.commit(m2, r2)
    prot = DiscreteLogInequalityProtocol.init_with_committed_value(
        RNG, m1, r1, C1, m2, r2, C2, ck)
    w = ByteWriter()
    prot.challenge_contribution((C1 - C2).normalize(), F(0), ck, w)
    c = compute_random_oracle_challenge(F, w.bytes())
    proof = prot.gen_proof(c)
    assert proof.verify_with_committed_value(C1, C2, c, ck)


def test_partial_schnorr_response():
    from crypto_tpu.schnorr.generalized import (SchnorrCommitment,
                                                partial_response)
    from crypto_tpu.utils.msm import msm
    n = 5
    bases = [b.G1.rand(RNG).normalize() for _ in range(n)]
    wits = [F.rand(RNG) for _ in range(n)]
    y = msm(bases, wits).normalize()
    blinds = [F.rand(RNG) for _ in range(n)]
    comm = SchnorrCommitment.new(bases, blinds)
    c = F.rand(RNG)
    partial = partial_response(comm, wits, c, skip_indices={1, 3})
    # the skipped responses come from "another protocol"
    missing = {1: blinds[1] + wits[1] * c, 3: blinds[3] + wits[3] * c}
    assert partial.is_valid(bases, y, comm.t, c, missing)
    bad = dict(missing)
    bad[1] = bad[1] + F(1)
    assert not partial.is_valid(bases, y, comm.t, c, bad)


def test_weak_bb_kv_pok():
    from crypto_tpu.short_group_sig.weak_bb import (
        WeakBBSecretKey, WeakBBSig, PoKWeakBBSigKVProtocol)
    from crypto_tpu.hashing import (compute_random_oracle_challenge,
                                    group_elem_from_try_and_incr)
    from crypto_tpu.serialize import ByteWriter
    g1 = group_elem_from_try_and_incr(b.G1, b"kv-g1").normalize()
    sk = WeakBBSecretKey.generate(RNG)
    m = F.rand(RNG)
    sig = WeakBBSig.new(m, sk, g1)
    prot = PoKWeakBBSigKVProtocol.init(RNG, sig, m, g1)
    w = ByteWriter()
    prot.challenge_contribution(g1, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    assert proof.verify(c, sk, g1)
    other = WeakBBSecretKey.generate(RNG)
    assert not proof.verify(c, other, g1)


def test_one_of_n_proof():
    from crypto_tpu.delegatable_credentials.one_of_n import (OneOfNProof,
                                                             OneOfNSrs)
    from crypto_tpu.hashing import group_elem_from_try_and_incr
    P1 = group_elem_from_try_and_incr(b.G1, b"oon-p1").normalize()
    srs, _ = OneOfNSrs.new(RNG, P1)
    m, n_decoys = 2, 3
    g2 = b.G2.generator()
    mk_seq = lambda: [(g2 * int(F.rand(RNG))).normalize() for _ in range(m)]
    actual = mk_seq()
    decoys = [mk_seq() for _ in range(n_decoys)]
    w_scalar = F.rand(RNG)
    instance = [(p * int(w_scalar)).normalize() for p in actual]
    proof = OneOfNProof.new(RNG, actual, decoys, instance, w_scalar, srs, P1)
    assert proof.verify([actual] + decoys, instance, srs, P1)
    # instance not derived from any sequence fails
    bad_instance = [(p * int(F.rand(RNG))).normalize() for p in actual]
    proof2 = OneOfNProof.new(RNG, actual, decoys, instance, w_scalar, srs, P1)
    assert not proof2.verify([actual] + decoys, bad_instance, srs, P1)


def test_syra_pseudonym_alt():
    from crypto_tpu.syra.core import (IssuerPublicKey, IssuerSecretKey,
                                      SyraSetupParams, UserSecretKey,
                                      hash_context_to_z)
    from crypto_tpu.syra.pseudonym_alt import PseudonymGenProtocolAlt
    from crypto_tpu.hashing import compute_random_oracle_challenge
    from crypto_tpu.serialize import ByteWriter
    params = SyraSetupParams.new(b"syra-alt")
    isk = IssuerSecretKey.generate(RNG)
    ipk = IssuerPublicKey.new(isk, params)
    user_id = F.rand(RNG)
    usk = UserSecretKey.issue(user_id, isk, params)
    Z = hash_context_to_z(b"alt-context")
    prot = PseudonymGenProtocolAlt.init(RNG, Z, user_id, usk, params)
    w = ByteWriter()
    prot.challenge_contribution(Z, ipk, params.g, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    w2 = ByteWriter()
    proof.challenge_contribution(Z, ipk, params.g, w2)
    assert bytes(w2.buf) == bytes(w.buf)
    assert proof.verify(c, Z, ipk, params)
    # different context -> same check fails (wrong Z)
    Z2 = hash_context_to_z(b"other-context")
    assert not proof.verify(c, Z2, ipk, params)
    # wrong issuer fails
    isk2 = IssuerSecretKey.generate(RNG)
    ipk2 = IssuerPublicKey.new(isk2, params)
    assert not proof.verify(c, Z, ipk2, params)


@pytest.mark.slow
def test_syra_threshold_issuance():
    """Threshold SyRA user-key issuance: usk = g * 1/(id + sk) is a
    weak-BB signature, so the shared-inverse machinery applies directly
    (reference `syra/src/threshold_issuance.rs` uses the same approach)."""
    from crypto_tpu.syra.core import (IssuerPublicKey, IssuerSecretKey,
                                      SyraSetupParams, UserSecretKey)
    from crypto_tpu.secret_sharing.schemes import shamir_deal_secret
    from crypto_tpu.short_group_sig.threshold_weak_bb import (
        ThresholdWeakBBSigner, run_threshold_weak_bb)
    params = SyraSetupParams.new(b"syra-thr")
    isk = IssuerSecretKey.generate(RNG)
    ipk = IssuerPublicKey.new(isk, params)
    user_id = F.rand(RNG)
    shares, _ = shamir_deal_secret(RNG, isk.sk, 2, 4)
    signer_ids = [2, 4]
    signers = {
        i: ThresholdWeakBBSigner.init(
            RNG, i, next(s.share for s in shares.shares if s.id == i),
            signer_ids)
        for i in signer_ids
    }
    sig = run_threshold_weak_bb(RNG, signers, user_id, params.g)
    usk = UserSecretKey(usk=sig.A)
    assert usk.verify(user_id, ipk, params)
    direct = UserSecretKey.issue(user_id, isk, params)
    assert usk.usk == direct.usk
