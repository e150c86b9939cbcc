"""Composite proofs with BP++/SMC bound checks, circom R1CS statements and
inequality, all linked to a BBS+ message (reference
`proof_system/tests/{bound_check_bpp,bound_check_smc,r1cs,inequality}`)."""

import os
import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.bbs_plus.setup import SignatureParamsG1, SecretKey, PublicKeyG2
from crypto_tpu.bbs_plus.signature import SignatureG1
from crypto_tpu.bulletproofs_pp.range_proof import SetupParams as BppParams
from crypto_tpu.proof_system.base import ProofSpec, ProofSystemError
from crypto_tpu.proof_system.proof import Proof
from crypto_tpu.proof_system.statements import BBSWitness, PoKBBSSignatureG1
from crypto_tpu.proof_system.statements_ranges import (
    BoundCheckBpp, BoundCheckSmc, PublicInequalityStatement,
    R1CSCircomStatement)
from crypto_tpu.smc_range_proof.ccs import (MemberCommitmentKey,
                                            SetMembershipCheckParams)
from crypto_tpu.utils.commitment import PedersenCommitmentKey

F = b.Fr
RNG = random.Random(888)


def _bbs_setup(messages):
    params = SignatureParamsG1.new(b"ps-range-test", len(messages))
    sk = SecretKey.generate(RNG)
    pk = PublicKeyG2.generate(sk, params)
    sig = SignatureG1.new(RNG, messages, sk, params)
    return params, pk, sig


@pytest.mark.slow
def test_bbs_message_bound_check_bpp():
    val = 35000
    messages = [F(val), F.rand(RNG)]
    params, pk, sig = _bbs_setup(messages)
    bpp = BppParams.new_for_perfect_range_proof(b"ps-bpp", 2, 64, 2)

    spec = ProofSpec()
    s1 = spec.add_statement(PoKBBSSignatureG1(params=params, public_key=pk,
                                              revealed_messages={}))
    s2 = spec.add_statement(BoundCheckBpp(min_val=100, max_val=65536,
                                          bpp_params=bpp))
    spec.add_witness_equality([(s1, 0), (s2, 0)])
    wits = [
        BBSWitness(signature=sig, messages=messages),
        F(val),
    ]
    proof = Proof.new(RNG, spec, wits, nonce=b"n1")
    assert proof.verify(RNG, spec, nonce=b"n1")
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, spec, nonce=b"wrong")


def test_bbs_message_bound_check_smc():
    val = 5000
    messages = [F(val), F.rand(RNG)]
    params, pk, sig = _bbs_setup(messages)
    smc = SetMembershipCheckParams.new_for_range_proof(RNG, b"ps-smc", 2)
    ck = MemberCommitmentKey.new(b"ps-smc-ck")

    spec = ProofSpec()
    s1 = spec.add_statement(PoKBBSSignatureG1(params=params, public_key=pk,
                                              revealed_messages={}))
    s2 = spec.add_statement(BoundCheckSmc(min_val=1000, max_val=8192,
                                          params=smc, comm_key=ck, base=2))
    spec.add_witness_equality([(s1, 0), (s2, 0)])
    wits = [
        BBSWitness(signature=sig, messages=messages),
        F(val),
    ]
    proof = Proof.new(RNG, spec, wits)
    assert proof.verify(RNG, spec)


def test_bbs_message_inequality():
    messages = [F.rand(RNG), F.rand(RNG)]
    params, pk, sig = _bbs_setup(messages)
    ck = PedersenCommitmentKey.new(b.G1, b"ps-ineq-ck")
    r = F.rand(RNG)
    commitment = ck.commit(messages[0], r)
    inequal_to = F.rand(RNG)

    spec = ProofSpec()
    s1 = spec.add_statement(PoKBBSSignatureG1(params=params, public_key=pk,
                                              revealed_messages={}))
    s2 = spec.add_statement(PublicInequalityStatement(
        commitment=commitment, inequal_to=inequal_to, comm_key=ck))
    spec.add_witness_equality([(s1, 0), (s2, 0)])
    wits = [
        BBSWitness(signature=sig, messages=messages),
        (messages[0], r),
    ]
    proof = Proof.new(RNG, spec, wits)
    assert proof.verify(RNG, spec)


VECTORS = "/root/reference/legogroth16/test-vectors/bls12-381"


@pytest.mark.skipif(not os.path.isdir(VECTORS),
                    reason="reference fixtures unavailable")
def test_bbs_message_in_circom_circuit():
    """BBS+ message equals a committed wire of the circom multiply2
    circuit (a*b = out with a linked to the credential)."""
    from crypto_tpu.legogroth16.circom import parse_r1cs, circom_circuit
    from crypto_tpu.legogroth16 import snark

    r1cs = parse_r1cs(os.path.join(VECTORS, "multiply2.r1cs"))
    a_val = F.rand(RNG)
    b_val = F.rand(RNG)
    out = a_val * b_val
    wires = [F(1), out, a_val, b_val]
    messages = [a_val, F.rand(RNG)]
    params, pk, sig = _bbs_setup(messages)
    snark_pk = snark.generate_random_parameters(circom_circuit(r1cs), 1, RNG)

    spec = ProofSpec()
    s1 = spec.add_statement(PoKBBSSignatureG1(params=params, public_key=pk,
                                              revealed_messages={}))
    s2 = spec.add_statement(R1CSCircomStatement(
        r1cs=r1cs, snark_pk=snark_pk, public_inputs=[out]))
    spec.add_witness_equality([(s1, 0), (s2, 0)])
    wits = [
        BBSWitness(signature=sig, messages=messages),
        wires,
    ]
    proof = Proof.new(RNG, spec, wits)
    assert proof.verify(RNG, spec)
    # tampered public input fails
    spec2 = ProofSpec()
    spec2.add_statement(PoKBBSSignatureG1(params=params, public_key=pk,
                                          revealed_messages={}))
    spec2.add_statement(R1CSCircomStatement(
        r1cs=r1cs, snark_pk=snark_pk, public_inputs=[out + F(1)]))
    spec2.add_witness_equality([(0, 0), (1, 0)])
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, spec2)


def test_bbs_message_verifiably_encrypted():
    """BBS+ message encrypted for an auditor with TZ21 DKGitH, linked to
    the credential proof."""
    from crypto_tpu.proof_system.statements_ranges import (
        VerifiableEncryptionTZ21)
    from crypto_tpu.utils.elgamal import keygen
    from crypto_tpu.hashing import n_group_elements
    messages = [F.rand(RNG), F.rand(RNG)]
    params, pk, sig = _bbs_setup(messages)
    enc_gen = b.G1.generator()
    dec_sk, enc_pk = keygen(RNG, enc_gen)
    ck = [p.normalize() for p in n_group_elements(b.G1, 0, 3, b"ve-ck")]

    spec = ProofSpec()
    s1 = spec.add_statement(PoKBBSSignatureG1(params=params, public_key=pk,
                                              revealed_messages={}))
    s2 = spec.add_statement(VerifiableEncryptionTZ21(
        comm_key=ck, enc_pk=enc_pk, enc_gen=enc_gen, n_parties=4, reps=8))
    spec.add_witness_equality([(s1, 0), (s2, 0)])
    wits = [
        BBSWitness(signature=sig, messages=messages),
        [messages[0]],
    ]
    proof = Proof.new(RNG, spec, wits)
    assert proof.verify(RNG, spec)
    # decryption: compress and recover the witness
    ve = proof.statement_proofs[s2].ve_proof
    compressed = ve.compress(subset_size=4)
    dec = compressed.decrypt(dec_sk, proof.statement_proofs[s2].commitment,
                             ck[:2])
    assert dec[0] == messages[0]


@pytest.mark.skipif(not os.path.isdir(VECTORS),
                    reason="reference fixtures unavailable")
def test_r1cs_snarkpack_aggregation():
    """Two circom R1CS statements folded into one SnarkPack aggregate."""
    from crypto_tpu.legogroth16 import snark
    from crypto_tpu.legogroth16.circom import circom_circuit, parse_r1cs
    from crypto_tpu.legogroth16.aggregation import GenericSRS
    from crypto_tpu.proof_system.statements_ranges import R1CSCircomProofAggr

    r1cs = parse_r1cs(os.path.join(VECTORS, "multiply2.r1cs"))
    snark_pk = snark.generate_random_parameters(circom_circuit(r1cs), 1, RNG)
    gsrs = GenericSRS.setup(RNG, 2)
    psrs, vsrs = gsrs.specialize(2)

    pairs = [(F(3), F(5)), (F(7), F(11))]

    def build(srs):
        spec = ProofSpec()
        idx = []
        for a_val, b_val in pairs:
            idx.append(spec.add_statement(R1CSCircomStatement(
                r1cs=r1cs, snark_pk=snark_pk,
                public_inputs=[a_val * b_val])))
        spec.aggregate_legogroth16 = [idx]
        spec.snark_aggregation_srs = srs
        return spec

    wits = [[F(1), a * bb, a, bb] for a, bb in pairs]
    proof = Proof.new(RNG, build(psrs), wits, nonce=b"r1cs-agg")
    assert all(isinstance(p, R1CSCircomProofAggr)
               for p in proof.statement_proofs)
    assert proof.verify(RNG, build(vsrs), nonce=b"r1cs-agg")

    # wrong public input fails
    bad_spec = build(vsrs)
    bad_spec.statements[0].public_inputs = [F(999)]
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, bad_spec, nonce=b"r1cs-agg")
