"""Composite proofs with SNARK-backed statements: credential attribute
bound-check and verifiable encryption linked to a BBS+ signature
(the reference's flagship flows: `proof_system/tests/bound_check_legogroth16.rs`
and `verifiable_encryption_saver.rs` at test scale)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.bbs_plus.setup import KeypairG2, SignatureParamsG1
from crypto_tpu.bbs_plus.signature import SignatureG1
from crypto_tpu.legogroth16.bound_check import generate_snark_srs_bound_check
from crypto_tpu.saver import core as saver_core
from crypto_tpu.proof_system.base import ProofSpec, ProofSystemError
from crypto_tpu.proof_system.statements import PoKBBSSignatureG1, BBSWitness
from crypto_tpu.proof_system.statements_snark import (BoundCheckLegoGroth16,
                                                      SaverStatement)
from crypto_tpu.proof_system.proof import Proof

F = b.Fr
RNG = random.Random(505)


@pytest.fixture(scope="module")
def cred():
    n = 3
    sig_params = SignatureParamsG1.new(b"issuer", n)
    issuer = KeypairG2.generate(RNG, sig_params)
    messages = [F(25), F.rand(RNG), F.rand(RNG)]  # message 0 = age
    sig = SignatureG1.new(RNG, messages, issuer.secret_key, sig_params)
    return sig_params, issuer, messages, sig


@pytest.fixture(scope="module")
def bound_srs():
    return generate_snark_srs_bound_check(RNG)


def test_bbs_with_bound_check(cred, bound_srs):
    """Prove: valid credential AND 18 <= age < 100 without revealing age."""
    sig_params, issuer, messages, sig = cred
    spec = ProofSpec()
    s0 = spec.add_statement(PoKBBSSignatureG1(
        params=sig_params, public_key=issuer.public_key, revealed_messages={}))
    s1 = spec.add_statement(BoundCheckLegoGroth16(
        min_val=18, max_val=100, snark_pk=bound_srs))
    spec.add_witness_equality([(s0, 0), (s1, 0)])
    wits = [BBSWitness(signature=sig, messages=messages), messages[0]]
    proof = Proof.new(RNG, spec, wits, nonce=b"bc")
    assert proof.verify(RNG, spec, nonce=b"bc")


def test_bound_check_out_of_range(bound_srs):
    from crypto_tpu.legogroth16.snark import LegoGroth16Error
    spec = ProofSpec()
    spec.add_statement(BoundCheckLegoGroth16(
        min_val=30, max_val=100, snark_pk=bound_srs))
    with pytest.raises(LegoGroth16Error):
        Proof.new(RNG, spec, [F(25)], nonce=b"x")


def test_bound_check_equality_violation(cred, bound_srs):
    """Proving the bound over a DIFFERENT value than the signed age must
    fail the equality meta-statement."""
    sig_params, issuer, messages, sig = cred
    spec = ProofSpec()
    s0 = spec.add_statement(PoKBBSSignatureG1(
        params=sig_params, public_key=issuer.public_key, revealed_messages={}))
    s1 = spec.add_statement(BoundCheckLegoGroth16(
        min_val=18, max_val=100, snark_pk=bound_srs))
    spec.add_witness_equality([(s0, 0), (s1, 0)])
    wits = [BBSWitness(signature=sig, messages=messages), F(50)]
    proof = Proof.new(RNG, spec, wits, nonce=b"bc")
    with pytest.raises(ProofSystemError, match="equality"):
        proof.verify(RNG, spec, nonce=b"bc")


@pytest.fixture(scope="module")
def saver_setup():
    cb = 8
    gens = saver_core.EncryptionGens.new(b"ps-saver")
    spk = saver_core.generate_srs(cb, gens, RNG)
    g_i = saver_core.get_gs_for_encryption(spk.pk.vk)
    sk, ek, dk = saver_core.keygen(RNG, cb, gens, g_i, spk.pk.delta_g1,
                                   spk.gamma_g1)
    return cb, gens, spk, g_i, sk, ek, dk


def test_bbs_with_verifiable_encryption(cred, saver_setup):
    """Prove: valid credential AND message 1 is encrypted for an auditor."""
    sig_params, issuer, messages, sig = cred
    cb, gens, spk, g_i, sk, ek, dk = saver_setup
    G = b.G1.rand(RNG).normalize()
    H = b.G1.rand(RNG).normalize()
    spec = ProofSpec()
    s0 = spec.add_statement(PoKBBSSignatureG1(
        params=sig_params, public_key=issuer.public_key, revealed_messages={}))
    s1 = spec.add_statement(SaverStatement(
        chunk_bit_size=cb, enc_gens=gens, ek=ek, snark_pk=spk,
        comm_G=G, comm_H=H))
    spec.add_witness_equality([(s0, 1), (s1, 0)])
    wits = [BBSWitness(signature=sig, messages=messages), messages[1]]
    proof = Proof.new(RNG, spec, wits, nonce=b"ve")
    assert proof.verify(RNG, spec, nonce=b"ve")
    # the auditor can decrypt the linked message
    ct = proof.statement_proofs[1].ciphertext
    dec, nu = saver_core.decrypt(ct, sk, dk, g_i, cb)
    assert dec == messages[1]


def test_prover_config_proof_reuse(cred, bound_srs, saver_setup):
    """ProverConfig reuse (`prover.rs:76-120`): the second composite proof
    rerandomizes the first one's SNARK material instead of re-proving."""
    from crypto_tpu.proof_system.proof import (OldLegoGroth16Proof,
                                               OldSaverProof, ProverConfig)
    sig_params, issuer, messages, sig = cred
    cb, gens, spk, g_i, sk, ek, dk = saver_setup
    G = b.G1.rand(RNG).normalize()
    H = b.G1.rand(RNG).normalize()

    def build_spec():
        spec = ProofSpec()
        s0 = spec.add_statement(PoKBBSSignatureG1(
            params=sig_params, public_key=issuer.public_key,
            revealed_messages={}))
        s1 = spec.add_statement(BoundCheckLegoGroth16(
            min_val=18, max_val=100, snark_pk=bound_srs))
        s2 = spec.add_statement(SaverStatement(
            chunk_bit_size=cb, enc_gens=gens, ek=ek, snark_pk=spk,
            comm_G=G, comm_H=H))
        spec.add_witness_equality([(s0, 0), (s1, 0)])
        spec.add_witness_equality([(s0, 1), (s2, 0)])
        return spec

    wits = [BBSWitness(signature=sig, messages=messages), messages[0],
            messages[1]]

    spec1 = build_spec()
    cfg1 = ProverConfig()
    proof1 = Proof.new(RNG, spec1, wits, nonce=b"r1", config=cfg1)
    assert proof1.verify(RNG, spec1, nonce=b"r1")
    assert 1 in cfg1.commitment_randomness
    assert 2 in cfg1.commitment_randomness

    ct1, saver_proof1 = proof1.get_saver_ciphertext_and_proof(2)
    cfg2 = ProverConfig(
        reuse_legogroth16_proofs={1: OldLegoGroth16Proof(
            v=cfg1.commitment_randomness[1],
            proof=proof1.get_legogroth16_proof(1))},
        reuse_saver_proofs={2: OldSaverProof(
            v=cfg1.commitment_randomness[2], ciphertext=ct1,
            proof=saver_proof1)})
    spec2 = build_spec()
    proof2 = Proof.new(RNG, spec2, wits, nonce=b"r2", config=cfg2)
    assert proof2.verify(RNG, spec2, nonce=b"r2")

    # unlinkable: the reused material is rerandomized
    ct2, saver_proof2 = proof2.get_saver_ciphertext_and_proof(2)
    assert ct2.X_r != ct1.X_r
    assert saver_proof2.a != saver_proof1.a
    assert proof2.get_legogroth16_proof(1).a != \
        proof1.get_legogroth16_proof(1).a

    # and the auditor can still decrypt the rerandomized ciphertext
    dec, _ = saver_core.decrypt(ct2, sk, dk, g_i, cb)
    assert dec == messages[1]

    # chaining: config2 recorded the new randomness for a third proof
    assert 1 in cfg2.commitment_randomness and 2 in cfg2.commitment_randomness


def test_snarkpack_aggregation_in_composite_proof(cred, bound_srs,
                                                  saver_setup):
    """ProofSpec-level SnarkPack aggregation (`prover.rs:1040-1105`,
    `verifier.rs:1749-1830`): 2 SAVER Groth16 proofs and 2 bound-check
    LegoGroth16 proofs each fold into one aggregate; per-statement proofs
    lose their SNARKs."""
    from crypto_tpu.legogroth16.aggregation import GenericSRS
    from crypto_tpu.proof_system.statements_snark import (BoundCheckProofAggr,
                                                          SaverProofAggr)
    sig_params, issuer, messages, sig = cred
    cb, gens, spk, g_i, sk, ek, dk = saver_setup
    G = b.G1.rand(RNG).normalize()
    H = b.G1.rand(RNG).normalize()
    gsrs = GenericSRS.setup(RNG, 2)
    prover_srs, verifier_srs = gsrs.specialize(2)

    def build_spec(srs):
        spec = ProofSpec()
        s0 = spec.add_statement(PoKBBSSignatureG1(
            params=sig_params, public_key=issuer.public_key,
            revealed_messages={}))
        s1 = spec.add_statement(BoundCheckLegoGroth16(
            min_val=18, max_val=100, snark_pk=bound_srs))
        s2 = spec.add_statement(BoundCheckLegoGroth16(
            min_val=0, max_val=60, snark_pk=bound_srs))
        s3 = spec.add_statement(SaverStatement(
            chunk_bit_size=cb, enc_gens=gens, ek=ek, snark_pk=spk,
            comm_G=G, comm_H=H))
        s4 = spec.add_statement(SaverStatement(
            chunk_bit_size=cb, enc_gens=gens, ek=ek, snark_pk=spk,
            comm_G=G, comm_H=H))
        spec.add_witness_equality([(s0, 0), (s1, 0), (s2, 0)])
        spec.add_witness_equality([(s0, 1), (s3, 0)])
        spec.add_witness_equality([(s0, 2), (s4, 0)])
        spec.aggregate_legogroth16 = [[s1, s2]]
        spec.aggregate_groth16 = [[s3, s4]]
        spec.snark_aggregation_srs = srs
        return spec

    wits = [BBSWitness(signature=sig, messages=messages),
            messages[0], messages[0], messages[1], messages[2]]
    proof = Proof.new(RNG, build_spec(prover_srs), wits, nonce=b"agg")

    # per-statement proofs are stripped of their SNARKs
    assert isinstance(proof.statement_proofs[1], BoundCheckProofAggr)
    assert isinstance(proof.statement_proofs[3], SaverProofAggr)
    assert proof.aggregated_groth16 and proof.aggregated_legogroth16

    assert proof.verify(RNG, build_spec(verifier_srs), nonce=b"agg")

    # auditor still decrypts both aggregated ciphertexts
    for idx, msg in ((3, messages[1]), (4, messages[2])):
        dec, _ = saver_core.decrypt(
            proof.statement_proofs[idx].ciphertext, sk, dk, g_i, cb)
        assert dec == msg

    # tampering with the aggregate fails verification
    import copy
    bad = copy.deepcopy(proof)
    grp, ag = bad.aggregated_legogroth16[0]
    ag.z_c = (ag.z_c + b.G1.generator()).normalize()
    with pytest.raises(ProofSystemError):
        bad.verify(RNG, build_spec(verifier_srs), nonce=b"agg")


def test_bound_check_with_randomized_pairing_checker(cred, bound_srs):
    """SNARK pairing equations accumulate into the shared checker
    (`verifier.rs` + `snark.verify_proof_with_checker`)."""
    from crypto_tpu.proof_system.proof import VerifierConfig
    sig_params, issuer, messages, signature = cred
    spec = ProofSpec()
    s0 = spec.add_statement(PoKBBSSignatureG1(
        params=sig_params, public_key=issuer.public_key,
        revealed_messages={}))
    s1 = spec.add_statement(BoundCheckLegoGroth16(
        min_val=18, max_val=100, snark_pk=bound_srs))
    spec.add_witness_equality([(s0, 0), (s1, 0)])
    wits = [BBSWitness(signature=signature, messages=messages),
            messages[0]]
    proof = Proof.new(RNG, spec, wits, nonce=b"rc")
    for lazy in (False, True):
        assert proof.verify(RNG, spec, nonce=b"rc",
                            config=VerifierConfig(lazy))
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, spec, nonce=b"bad",
                     config=VerifierConfig(True))


def test_derived_params_tracker_dedupes_prepared_vk(cred, bound_srs):
    """Reference `derived_params.rs:50-108` / `proof_spec.rs:228`: N
    statements sharing the same SNARK params derive the prepared verifying
    key (a pairing) ONCE per spec, and the deduped proof still verifies."""
    sig_params, issuer, messages, sig = cred
    spec = ProofSpec()
    s0 = spec.add_statement(PoKBBSSignatureG1(
        params=sig_params, public_key=issuer.public_key, revealed_messages={}))
    s1 = spec.add_statement(BoundCheckLegoGroth16(
        min_val=18, max_val=100, snark_pk=bound_srs))
    s2 = spec.add_statement(BoundCheckLegoGroth16(
        min_val=0, max_val=60, snark_pk=bound_srs))
    spec.add_witness_equality([(s0, 0), (s1, 0), (s2, 0)])
    wits = [BBSWitness(signature=sig, messages=messages), messages[0],
            messages[0]]
    proof = Proof.new(RNG, spec, wits, nonce=b"ddp")

    # verify on a FRESH equivalent spec so the tracker starts empty
    vspec = ProofSpec()
    v0 = vspec.add_statement(PoKBBSSignatureG1(
        params=sig_params, public_key=issuer.public_key, revealed_messages={}))
    v1 = vspec.add_statement(BoundCheckLegoGroth16(
        min_val=18, max_val=100, snark_pk=bound_srs))
    v2 = vspec.add_statement(BoundCheckLegoGroth16(
        min_val=0, max_val=60, snark_pk=bound_srs))
    vspec.add_witness_equality([(v0, 0), (v1, 0), (v2, 0)])
    assert proof.verify(RNG, vspec, nonce=b"ddp")
    tracker = vspec.derive_prepared_parameters()
    # both bound-check statements share bound_srs.vk -> exactly one pairing
    assert tracker.derivations == 1
