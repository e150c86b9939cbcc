"""Composite proof system end-to-end: BBS+ + accumulator + Pedersen
commitment statements under one transcript with witness equalities
(the shape of the reference's flagship test
`proof_system/tests/bbs_plus_and_accumulator.rs`)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.bbs_plus.setup import KeypairG2, SignatureParamsG1
from crypto_tpu.bbs_plus.signature import SignatureG1
from crypto_tpu.accumulator.setup import AccumKeypair, AccumSetupParams
from crypto_tpu.accumulator.core import PositiveAccumulator
from crypto_tpu.accumulator.persistence import InMemoryState
from crypto_tpu.proof_system.base import ProofSpec, ProofSystemError
from crypto_tpu.proof_system.statements import (
    PoKBBSSignatureG1, BBSWitness, VBAccumulatorMembershipCDH,
    AccumMembershipWit, PedersenCommitmentStmt)
from crypto_tpu.proof_system.proof import Proof, VerifierConfig
from crypto_tpu.utils.msm import msm

F = b.Fr
RNG = random.Random(77)


@pytest.fixture(scope="module")
def world():
    """A credential world: BBS+ issuer, accumulator manager, a holder whose
    credential contains a 'user id' message that is also in the accumulator
    and committed in a Pedersen commitment."""
    n_msgs = 5
    sig_params = SignatureParamsG1.new(b"issuer-params", n_msgs)
    issuer = KeypairG2.generate(RNG, sig_params)
    messages = [F.rand(RNG) for _ in range(n_msgs)]
    user_id = messages[2]
    signature = SignatureG1.new(RNG, messages, issuer.secret_key, sig_params)

    accum_params = AccumSetupParams.new(b"accum-params")
    accum_kp = AccumKeypair.generate(RNG, accum_params)
    state = InMemoryState()
    accum = PositiveAccumulator.initialize(accum_params)
    accum = accum.add_batch([user_id, F.rand(RNG)], accum_kp.secret_key, state)
    mem_wit = accum.get_membership_witness(user_id, accum_kp.secret_key, state)

    bases = [b.G1.rand(RNG).normalize() for _ in range(2)]
    blinding = F.rand(RNG)
    commitment = msm(bases, [user_id, blinding]).normalize()

    return dict(sig_params=sig_params, issuer=issuer, messages=messages,
                user_id=user_id, signature=signature,
                accum_params=accum_params, accum_kp=accum_kp, accum=accum,
                mem_wit=mem_wit, bases=bases, blinding=blinding,
                commitment=commitment)


def _build_spec(w, revealed_ids=(0,)):
    spec = ProofSpec(context=b"test-context")
    revealed = {i: w["messages"][i] for i in revealed_ids}
    s0 = spec.add_statement(PoKBBSSignatureG1(
        params=w["sig_params"], public_key=w["issuer"].public_key,
        revealed_messages=revealed))
    s1 = spec.add_statement(VBAccumulatorMembershipCDH(
        accumulator_value=w["accum"].value(), params=w["accum_params"],
        public_key=w["accum_kp"].public_key))
    s2 = spec.add_statement(PedersenCommitmentStmt(
        bases=w["bases"], commitment=w["commitment"]))
    # user_id: message 2 of the signature == accumulator element == opening 0
    spec.add_witness_equality([(s0, 2), (s1, 0), (s2, 0)])
    return spec, revealed


def _witnesses(w):
    return [
        BBSWitness(signature=w["signature"], messages=w["messages"]),
        AccumMembershipWit(element=w["user_id"], witness=w["mem_wit"]),
        [w["user_id"], w["blinding"]],
    ]


def test_composite_proof_roundtrip(world):
    spec, _ = _build_spec(world)
    proof = Proof.new(RNG, spec, _witnesses(world), nonce=b"nonce-1")
    assert proof.verify(RNG, spec, nonce=b"nonce-1")
    # randomized pairing checker config (lazy and eager)
    for lazy in (True, False):
        assert proof.verify(RNG, spec, nonce=b"nonce-1",
                            config=VerifierConfig(lazy))


def test_composite_proof_wrong_nonce(world):
    spec, _ = _build_spec(world)
    proof = Proof.new(RNG, spec, _witnesses(world), nonce=b"nonce-1")
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, spec, nonce=b"other-nonce")


def test_witness_equality_enforced(world):
    """A proof built with a DIFFERENT element in the accumulator statement
    must fail the equality meta-statement."""
    w = dict(world)
    state = InMemoryState()
    other_elem = F.rand(RNG)
    accum = PositiveAccumulator.initialize(w["accum_params"])
    accum = accum.add(other_elem, w["accum_kp"].secret_key, state)
    other_wit = accum.get_membership_witness(
        other_elem, w["accum_kp"].secret_key, state)
    w["accum"] = accum

    spec, _ = _build_spec(w)
    wits = _witnesses(w)
    wits[1] = AccumMembershipWit(element=other_elem, witness=other_wit)
    proof = Proof.new(RNG, spec, wits, nonce=b"n")
    with pytest.raises(ProofSystemError, match="equality"):
        proof.verify(RNG, spec, nonce=b"n")


def test_forged_commitment_fails(world):
    spec, _ = _build_spec(world)
    wits = _witnesses(world)
    wits[2] = [world["user_id"] + F(1), world["blinding"]]
    proof = Proof.new(RNG, spec, wits, nonce=b"n")
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, spec, nonce=b"n")


def test_revealed_message_mismatch(world):
    spec, revealed = _build_spec(world, revealed_ids=(0, 1))
    proof = Proof.new(RNG, spec, _witnesses(world), nonce=b"n")
    assert proof.verify(RNG, spec, nonce=b"n")
    # verifier with different revealed value
    spec2 = ProofSpec(context=b"test-context")
    revealed2 = {0: world["messages"][0], 1: world["messages"][1] + F(1)}
    spec2.add_statement(PoKBBSSignatureG1(
        params=world["sig_params"], public_key=world["issuer"].public_key,
        revealed_messages=revealed2))
    spec2.add_statement(VBAccumulatorMembershipCDH(
        accumulator_value=world["accum"].value(), params=world["accum_params"],
        public_key=world["accum_kp"].public_key))
    spec2.add_statement(PedersenCommitmentStmt(
        bases=world["bases"], commitment=world["commitment"]))
    spec2.add_witness_equality([(0, 2), (1, 0), (2, 0)])
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, spec2, nonce=b"n")
