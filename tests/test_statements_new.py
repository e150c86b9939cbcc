"""Composite-proof round trips for the round-2 statement additions:
original (2020/777 §7) VB accumulator statements, KB positive accumulator
statement, PedersenCommitmentG2, BBS23-IETF statements, prover/verifier
splits (reference `proof_system/src/statement/mod.rs:31-139`)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.accumulator.setup import AccumKeypair, AccumSetupParams
from crypto_tpu.accumulator.core import PositiveAccumulator, UniversalAccumulator
from crypto_tpu.accumulator.persistence import (InMemoryState,
                                                InMemoryInitialElements)
from crypto_tpu.accumulator import proofs_original as orig
from crypto_tpu.accumulator.kb_positive import (KBPositiveAccumulator,
                                                KBPosSecretKey,
                                                KBPosPublicKey,
                                                KBPosSetupParams)
from crypto_tpu.proof_system.base import ProofSpec, ProofSystemError
from crypto_tpu.proof_system.proof import Proof
from crypto_tpu.proof_system.statements import (
    AccumMembershipWit, AccumNonMembershipWit, PedersenCommitmentStmt)
from crypto_tpu.proof_system.statements_accum_original import (
    VBAccumulatorMembership, VBAccumulatorNonMembership,
    KBPositiveAccumulatorMembership, KBPosAccumWitness)
from crypto_tpu.proof_system.statements_split import (
    PedersenCommitmentG2, PoKBBSSignatureG1Prover, PoKBBSSignatureG1Verifier,
    PoKBBSSignature23IETFG1Prover, PoKBBSSignature23IETFG1Verifier)
from crypto_tpu.proof_system.statements import BBSWitness
from crypto_tpu.proof_system.statements_more import BBS23Witness
from crypto_tpu.utils.msm import msm

F = b.Fr
RNG = random.Random(2024)


def test_original_vb_membership_statement_with_equality():
    params = AccumSetupParams.new(b"stmt-orig")
    kp = AccumKeypair.generate(RNG, params)
    prk = orig.MembershipProvingKey.new(b"stmt-orig-prk")
    st = InMemoryState()
    acc = PositiveAccumulator.initialize(params)
    y = F.rand(RNG)
    acc = acc.add(y, kp.secret_key, st)
    wit = acc.get_membership_witness(y, kp.secret_key, st)

    bases = [b.G1.rand(RNG).normalize() for _ in range(2)]
    blinding = F.rand(RNG)
    comm = msm(bases, [y, blinding]).normalize()

    spec = ProofSpec(context=b"orig-stmt")
    s0 = spec.add_statement(VBAccumulatorMembership(
        acc.value(), params, kp.public_key, prk))
    s1 = spec.add_statement(PedersenCommitmentStmt(bases, comm))
    spec.add_witness_equality([(s0, 0), (s1, 0)])

    wits = [AccumMembershipWit(y, wit), [y, blinding]]
    proof = Proof.new(RNG, spec, wits, nonce=b"n")
    proof.verify(RNG, spec, nonce=b"n")
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, spec, nonce=b"wrong")
    # equality violation: commitment to a different value
    comm2 = msm(bases, [F.rand(RNG), blinding]).normalize()
    spec2 = ProofSpec(context=b"orig-stmt")
    spec2.add_statement(VBAccumulatorMembership(
        acc.value(), params, kp.public_key, prk))
    spec2.add_statement(PedersenCommitmentStmt(bases, comm2))
    spec2.add_witness_equality([(0, 0), (1, 0)])
    with pytest.raises(ProofSystemError):
        Proof.new(RNG, spec2, [AccumMembershipWit(y, wit),
                               [F.rand(RNG), blinding]],
                  nonce=b"n").verify(RNG, spec2, nonce=b"n")


def test_original_vb_non_membership_statement():
    params = AccumSetupParams.new(b"stmt-orig-nm")
    kp = AccumKeypair.generate(RNG, params)
    prk = orig.NonMembershipProvingKey.new(b"stmt-orig-nm-prk")
    st = InMemoryState()
    acc = UniversalAccumulator.initialize(RNG, params, 10, kp.secret_key,
                                          InMemoryInitialElements())
    acc = acc.add_batch([F.rand(RNG) for _ in range(3)], kp.secret_key, st)
    y = F.rand(RNG)
    wit = acc.get_non_membership_witness(y, kp.secret_key, st, params)

    spec = ProofSpec()
    spec.add_statement(VBAccumulatorNonMembership(
        acc.value(), params, kp.public_key, prk))
    proof = Proof.new(RNG, spec, [AccumNonMembershipWit(y, wit)], nonce=b"x")
    proof.verify(RNG, spec, nonce=b"x")


def test_kb_positive_statement_with_equality():
    params = KBPosSetupParams.new(b"kbpos-stmt")
    sk = KBPosSecretKey.generate(RNG)
    pk = KBPosPublicKey.generate(sk, params)
    st = InMemoryState()
    acc = KBPositiveAccumulator.initialize(RNG, params.accum.P)
    y = F.rand(RNG)
    wit = acc.add(y, sk, params, st)
    assert acc.verify_membership(y, wit, pk, params)

    bases = [b.G1.rand(RNG).normalize() for _ in range(2)]
    blinding = F.rand(RNG)
    comm = msm(bases, [y, blinding]).normalize()

    spec = ProofSpec()
    s0 = spec.add_statement(KBPositiveAccumulatorMembership(
        acc.value, params, pk))
    s1 = spec.add_statement(PedersenCommitmentStmt(bases, comm))
    spec.add_witness_equality([(s0, 0), (s1, 0)])
    proof = Proof.new(RNG, spec, [KBPosAccumWitness(y, wit), [y, blinding]],
                      nonce=b"kb")
    proof.verify(RNG, spec, nonce=b"kb")


def test_pedersen_commitment_g2():
    bases = [b.G2.rand(RNG).normalize() for _ in range(3)]
    wits = [F.rand(RNG) for _ in range(3)]
    comm = bases[0] * int(wits[0])
    for base, w in zip(bases[1:], wits[1:]):
        comm = comm + base * int(w)
    spec = ProofSpec()
    spec.add_statement(PedersenCommitmentG2(bases, comm.normalize()))
    proof = Proof.new(RNG, spec, [wits], nonce=b"g2")
    proof.verify(RNG, spec, nonce=b"g2")
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, spec, nonce=b"bad")


def test_bbs_prover_verifier_split():
    from crypto_tpu.bbs_plus.setup import KeypairG2, SignatureParamsG1
    from crypto_tpu.bbs_plus.signature import SignatureG1
    params = SignatureParamsG1.new(b"split", 3)
    kp = KeypairG2.generate(RNG, params)
    msgs = [F.rand(RNG) for _ in range(3)]
    sig = SignatureG1.new(RNG, msgs, kp.secret_key, params)
    revealed = {0: msgs[0]}

    prove_spec = ProofSpec()
    prove_spec.add_statement(PoKBBSSignatureG1Prover(
        params, revealed_messages=revealed))
    proof = Proof.new(RNG, prove_spec, [BBSWitness(sig, msgs)], nonce=b"s")

    verify_spec = ProofSpec()
    verify_spec.add_statement(PoKBBSSignatureG1Verifier(
        params, kp.public_key, revealed))
    proof.verify(RNG, verify_spec, nonce=b"s")
    # prover-side statement refuses to verify
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, prove_spec, nonce=b"s")


def test_bbs23_ietf_statements():
    from crypto_tpu.bbs_plus.bbs23 import (SignatureParams23G1, Signature23G1,
                                           PublicKey23G2)
    from crypto_tpu.bbs_plus.setup import SecretKey
    params = SignatureParams23G1.new(b"ietf-stmt", 3)
    sk = SecretKey.generate(RNG)
    pk = PublicKey23G2.generate(sk, params)
    msgs = [F.rand(RNG) for _ in range(3)]
    sig = Signature23G1.new(RNG, msgs, sk, params)
    revealed = {1: msgs[1]}

    prove_spec = ProofSpec()
    prove_spec.add_statement(PoKBBSSignature23IETFG1Prover(
        params, revealed_messages=revealed))
    proof = Proof.new(RNG, prove_spec, [BBS23Witness(sig, msgs)], nonce=b"i")

    verify_spec = ProofSpec()
    verify_spec.add_statement(PoKBBSSignature23IETFG1Verifier(
        params, pk, revealed))
    proof.verify(RNG, verify_spec, nonce=b"i")
    bad_spec = ProofSpec()
    bad_spec.add_statement(PoKBBSSignature23IETFG1Verifier(
        params, pk, {1: msgs[1] + F(1)}))
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, bad_spec, nonce=b"i")


def test_ve_tz21_robust_statement():
    """VeTZ21Robust (`statement/mod.rs:136`): RDkgith variant in a
    composite proof with witness equality to a BBS+ message."""
    from crypto_tpu.proof_system.statements_split import VeTZ21Robust
    from crypto_tpu.proof_system.statements import PoKBBSSignatureG1, BBSWitness
    from crypto_tpu.bbs_plus.setup import KeypairG2, SignatureParamsG1
    from crypto_tpu.bbs_plus.signature import SignatureG1
    from crypto_tpu.utils.elgamal import keygen
    from crypto_tpu.hashing import n_group_elements

    messages = [F.rand(RNG), F.rand(RNG)]
    params = SignatureParamsG1.new(b"ve-robust", 2)
    kp = KeypairG2.generate(RNG, params)
    sig = SignatureG1.new(RNG, messages, kp.secret_key, params)
    enc_gen = b.G1.generator()
    dec_sk, enc_pk = keygen(RNG, enc_gen)
    ck = [p.normalize() for p in n_group_elements(b.G1, 0, 3, b"ver-ck")]

    spec = ProofSpec()
    s1 = spec.add_statement(PoKBBSSignatureG1(
        params=params, public_key=kp.public_key, revealed_messages={}))
    s2 = spec.add_statement(VeTZ21Robust(
        comm_key=ck, enc_pk=enc_pk, enc_gen=enc_gen, n_parties=8, reps=5))
    spec.add_witness_equality([(s1, 0), (s2, 0)])
    wits = [BBSWitness(signature=sig, messages=messages), [messages[0]]]
    proof = Proof.new(RNG, spec, wits, nonce=b"r")
    proof.verify(RNG, spec, nonce=b"r")
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, spec, nonce=b"bad")
