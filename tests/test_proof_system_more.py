"""Composite proofs mixing PS, KVAC, BBS23 and BBS+ statements."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.coconut import core as ps
from crypto_tpu.kvac.bbdt16 import (MAC, MACParams, KVACSecretKey,
                                    KVACPublicKey)
from crypto_tpu.bbs_plus.setup import KeypairG2, SignatureParamsG1, SecretKey
from crypto_tpu.bbs_plus.signature import SignatureG1
from crypto_tpu.bbs_plus.bbs23 import (SignatureParams23G1, PublicKey23G2,
                                       Signature23G1)
from crypto_tpu.proof_system.base import ProofSpec, ProofSystemError
from crypto_tpu.proof_system.statements import PoKBBSSignatureG1, BBSWitness
from crypto_tpu.proof_system.statements_more import (
    PoKPSSignature, PSSigWitness, PoKBBDT16MAC, KVACWitness,
    PoKBBSSignature23G1, BBS23Witness)
from crypto_tpu.proof_system.proof import Proof

F = b.Fr
RNG = random.Random(1313)


def test_bbs_plus_and_ps_linked():
    """Same user id signed under BBS+ (issuer A) and PS (issuer B)."""
    n = 3
    uid = F.rand(RNG)
    bbs_params = SignatureParamsG1.new(b"issuerA", n)
    bbs_kp = KeypairG2.generate(RNG, bbs_params)
    bbs_msgs = [F.rand(RNG), uid, F.rand(RNG)]
    bbs_sig = SignatureG1.new(RNG, bbs_msgs, bbs_kp.secret_key, bbs_params)

    ps_params = ps.PSSignatureParams.new(b"issuerB", n)
    ps_sk = ps.PSSecretKey.generate(RNG, n)
    ps_pk = ps.PSPublicKey.generate(ps_sk, ps_params)
    ps_msgs = [uid, F.rand(RNG), F.rand(RNG)]
    ps_sig = ps.PSSignature.new(RNG, ps_msgs, ps_sk, ps_params)

    spec = ProofSpec()
    s0 = spec.add_statement(PoKBBSSignatureG1(
        params=bbs_params, public_key=bbs_kp.public_key, revealed_messages={}))
    s1 = spec.add_statement(PoKPSSignature(
        params=ps_params, public_key=ps_pk, revealed_messages={}))
    spec.add_witness_equality([(s0, 1), (s1, 0)])
    wits = [BBSWitness(bbs_sig, bbs_msgs), PSSigWitness(ps_sig, ps_msgs)]
    proof = Proof.new(RNG, spec, wits, nonce=b"link")
    assert proof.verify(RNG, spec, nonce=b"link")

    # a different PS credential (different uid) fails the equality
    ps_msgs2 = [F.rand(RNG), ps_msgs[1], ps_msgs[2]]
    ps_sig2 = ps.PSSignature.new(RNG, ps_msgs2, ps_sk, ps_params)
    wits2 = [BBSWitness(bbs_sig, bbs_msgs), PSSigWitness(ps_sig2, ps_msgs2)]
    proof2 = Proof.new(RNG, spec, wits2, nonce=b"link")
    with pytest.raises(ProofSystemError, match="equality"):
        proof2.verify(RNG, spec, nonce=b"link")


def test_kvac_statement():
    n = 3
    params = MACParams.new(b"kvac-ps", n)
    sk = KVACSecretKey.generate(RNG)
    msgs = [F.rand(RNG) for _ in range(n)]
    mac = MAC.new(RNG, msgs, sk, params)

    spec = ProofSpec()
    stmt = PoKBBDT16MAC(params=params, revealed_messages={0: msgs[0]})
    spec.add_statement(stmt)
    proof = Proof.new(RNG, spec, [KVACWitness(mac, msgs)], nonce=b"kv")
    assert proof.verify(RNG, spec, nonce=b"kv")
    # key holder confirms
    assert stmt.verify_with_key(proof.statement_proofs[0], sk)
    assert not stmt.verify_with_key(proof.statement_proofs[0],
                                    KVACSecretKey.generate(RNG))


def test_two_bbs23_with_shared_randomizer():
    n = 3
    params = SignatureParams23G1.new(b"bbs23-ps", n)
    sk = SecretKey.generate(RNG)
    pk = PublicKey23G2.generate(sk, params)
    shared = F.rand(RNG)
    msgs1 = [F.rand(RNG), shared, F.rand(RNG)]
    msgs2 = [shared, F.rand(RNG), F.rand(RNG)]
    sig1 = Signature23G1.new(RNG, msgs1, sk, params)
    sig2 = Signature23G1.new(RNG, msgs2, sk, params)
    r = F.rand_nonzero(RNG)

    spec = ProofSpec()
    s0 = spec.add_statement(PoKBBSSignature23G1(
        params=params, public_key=pk, revealed_messages={}))
    s1 = spec.add_statement(PoKBBSSignature23G1(
        params=params, public_key=pk, revealed_messages={}))
    spec.add_witness_equality([(s0, 1), (s1, 0)])
    wits = [BBS23Witness(sig1, msgs1, sig_randomizer=r),
            BBS23Witness(sig2, msgs2, sig_randomizer=r)]
    proof = Proof.new(RNG, spec, wits, nonce=b"b23")
    assert proof.verify(RNG, spec, nonce=b"b23")


def test_kb_universal_accumulator_statements():
    from crypto_tpu.accumulator.kb_universal import KBUniversalAccumulator
    from crypto_tpu.accumulator.persistence import InMemoryState
    from crypto_tpu.accumulator.setup import (AccumPublicKey,
                                              AccumSecretKey,
                                              AccumSetupParams)
    from crypto_tpu.proof_system.statements import (
        AccumMembershipWit, KBUniversalAccumulatorMembership,
        KBUniversalAccumulatorNonMembership)
    from crypto_tpu.proof_system.base import ProofSpec
    from crypto_tpu.proof_system.proof import Proof as CompositeProof

    params = AccumSetupParams.new(b"kb-ps")
    sk = AccumSecretKey.generate(RNG)
    pk = AccumPublicKey.generate(sk, params)
    domain = [F.rand(RNG) for _ in range(6)]
    ms, nms = InMemoryState(), InMemoryState()
    kb = KBUniversalAccumulator.initialize(params, sk, domain, ms, nms)
    kb = kb.add(domain[0], sk, ms, nms)
    kb = kb.add(domain[1], sk, ms, nms)

    mem_wit = kb.get_membership_witness(domain[0], sk, ms)
    nonmem_wit = kb.get_non_membership_witness(domain[3], sk, nms)

    spec = ProofSpec()
    s1 = spec.add_statement(KBUniversalAccumulatorMembership(
        accumulator_value=kb.mem.value(), params=params, public_key=pk))
    s2 = spec.add_statement(KBUniversalAccumulatorNonMembership(
        accumulator_value=kb.non_mem.value(), params=params,
        public_key=pk))
    wits = [
        AccumMembershipWit(element=domain[0], witness=mem_wit),
        AccumMembershipWit(element=domain[3], witness=nonmem_wit),
    ]
    proof = CompositeProof.new(RNG, spec, wits)
    assert proof.verify(RNG, spec)


def test_setup_params_references():
    """Shared setup params referenced by index (reference
    `setup_params.rs`): two BBS+ statements share ONE params/key entry."""
    from crypto_tpu.proof_system.base import ProofSpec, SetupParamsRef
    from crypto_tpu.proof_system.proof import Proof
    from crypto_tpu.proof_system.statements import (BBSWitness,
                                                    PoKBBSSignatureG1)
    from crypto_tpu.bbs_plus.setup import KeypairG2, SignatureParamsG1
    from crypto_tpu.bbs_plus.signature import SignatureG1

    rng = random.Random(77)
    params = SignatureParamsG1.new(b"shared-params", 2)
    kp = KeypairG2.generate(rng, params)
    msgs1 = [F.rand(rng), F.rand(rng)]
    msgs2 = [msgs1[0], F.rand(rng)]
    sig1 = SignatureG1.new(rng, msgs1, kp.secret_key, params)
    sig2 = SignatureG1.new(rng, msgs2, kp.secret_key, params)

    spec = ProofSpec()
    p_ref = spec.add_setup_params(params)
    k_ref = spec.add_setup_params(kp.public_key)
    assert isinstance(p_ref, SetupParamsRef)
    s0 = spec.add_statement(PoKBBSSignatureG1(
        params=p_ref, public_key=k_ref, revealed_messages={}))
    s1 = spec.add_statement(PoKBBSSignatureG1(
        params=p_ref, public_key=k_ref, revealed_messages={}))
    spec.add_witness_equality([(s0, 0), (s1, 0)])
    wits = [BBSWitness(signature=sig1, messages=msgs1),
            BBSWitness(signature=sig2, messages=msgs2)]
    proof = Proof.new(rng, spec, wits, nonce=b"sp")
    assert proof.verify(rng, spec, nonce=b"sp")
    # the spec itself still stores the references, not copies
    assert spec.statements[0].params is p_ref

    # out-of-bounds reference fails cleanly
    spec2 = ProofSpec()
    spec2.add_statement(PoKBBSSignatureG1(
        params=SetupParamsRef(5), public_key=k_ref, revealed_messages={}))
    from crypto_tpu.proof_system.base import ProofSystemError
    with pytest.raises(ProofSystemError):
        Proof.new(rng, spec2, [wits[0]], nonce=b"sp")
