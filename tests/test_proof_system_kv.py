"""Keyed-verification + detached accumulator statements (reference
`proof_system/src/statement/accumulator/{keyed_verification,detached}.rs`,
tests modeled on `proof_system/tests/accumulators.rs` KV/detached
sections)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.accumulator.setup import AccumKeypair, AccumSetupParams
from crypto_tpu.accumulator.core import (PositiveAccumulator,
                                         UniversalAccumulator)
from crypto_tpu.accumulator.kb_universal import KBUniversalAccumulator
from crypto_tpu.accumulator.persistence import InMemoryState
from crypto_tpu.proof_system.base import ProofSpec, ProofSystemError
from crypto_tpu.proof_system.proof import Proof
from crypto_tpu.proof_system.statements import (AccumMembershipWit,
                                                AccumNonMembershipWit,
                                                PedersenCommitmentStmt)
from crypto_tpu.proof_system.statements_kv import (
    DetachedAccumMembershipWit, DetachedAccumNonMembershipWit,
    DetachedAccumulatorMembershipProver, DetachedAccumulatorMembershipVerifier,
    DetachedAccumulatorNonMembershipProver,
    DetachedAccumulatorNonMembershipVerifier,
    KBUniversalAccumulatorMembershipKV,
    KBUniversalAccumulatorMembershipKVFullVerifier,
    KBUniversalAccumulatorNonMembershipKV, VBAccumulatorMembershipKV,
    VBAccumulatorMembershipKVFullVerifier)
from crypto_tpu.utils.msm import msm

F = b.Fr
RNG = random.Random(4242)


@pytest.fixture(scope="module")
def world():
    params = AccumSetupParams.new(b"kv-accum")
    kp = AccumKeypair.generate(RNG, params)
    state = InMemoryState()
    elem = F.rand(RNG)
    accum = PositiveAccumulator.initialize(params)
    accum = accum.add_batch([elem, F.rand(RNG), F.rand(RNG)],
                            kp.secret_key, state)
    wit = accum.get_membership_witness(elem, kp.secret_key, state)
    return dict(params=params, kp=kp, accum=accum, elem=elem, wit=wit)


def test_vb_membership_kv_statement(world):
    w = world
    bases = [b.G1.rand(RNG).normalize() for _ in range(2)]
    blinding = F.rand(RNG)
    comm = msm(bases, [w["elem"], blinding]).normalize()

    spec = ProofSpec(context=b"kv")
    s0 = spec.add_statement(VBAccumulatorMembershipKV(
        accumulator_value=w["accum"].value()))
    s1 = spec.add_statement(PedersenCommitmentStmt(bases=bases,
                                                   commitment=comm))
    spec.add_witness_equality([(s0, 0), (s1, 0)])
    wits = [AccumMembershipWit(element=w["elem"], witness=w["wit"]),
            [w["elem"], blinding]]
    proof = Proof.new(RNG, spec, wits, nonce=b"n")
    assert proof.verify(RNG, spec, nonce=b"n")

    # the key holder can check the delegated keyed part
    keyed = proof.statement_proofs[0].keyed_part()
    assert keyed.verify(w["kp"].secret_key)

    # full-verifier spec: same proof, verifier holds the secret key
    spec_fv = ProofSpec(context=b"kv")
    s0 = spec_fv.add_statement(VBAccumulatorMembershipKVFullVerifier(
        accumulator_value=w["accum"].value(),
        secret_key=w["kp"].secret_key))
    s1 = spec_fv.add_statement(PedersenCommitmentStmt(bases=bases,
                                                      commitment=comm))
    spec_fv.add_witness_equality([(s0, 0), (s1, 0)])
    assert proof.verify(RNG, spec_fv, nonce=b"n")

    # wrong secret key fails the full verifier
    spec_bad = ProofSpec(context=b"kv")
    s0 = spec_bad.add_statement(VBAccumulatorMembershipKVFullVerifier(
        accumulator_value=w["accum"].value(),
        secret_key=type(w["kp"].secret_key)(alpha=F.rand(RNG))))
    s1 = spec_bad.add_statement(PedersenCommitmentStmt(bases=bases,
                                                       commitment=comm))
    spec_bad.add_witness_equality([(s0, 0), (s1, 0)])
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, spec_bad, nonce=b"n")


def test_kb_universal_kv_statements(world):
    params, kp = world["params"], world["kp"]
    domain = [F.rand(RNG) for _ in range(6)]
    member, non_member = domain[1], domain[4]
    mem_state, nm_state = InMemoryState(), InMemoryState()
    kb = KBUniversalAccumulator.initialize(params, kp.secret_key, domain,
                                           mem_state, nm_state)
    kb = kb.add(member, kp.secret_key, mem_state, nm_state)
    mem_wit = kb.get_membership_witness(member, kp.secret_key, mem_state)
    nm_wit = kb.get_non_membership_witness(non_member, kp.secret_key,
                                           nm_state)

    spec = ProofSpec(context=b"kb-kv")
    spec.add_statement(KBUniversalAccumulatorMembershipKV(
        accumulator_value=kb.mem.value()))
    spec.add_statement(KBUniversalAccumulatorNonMembershipKV(
        accumulator_value=kb.non_mem.value()))
    wits = [AccumMembershipWit(element=member, witness=mem_wit),
            AccumMembershipWit(element=non_member, witness=nm_wit)]
    proof = Proof.new(RNG, spec, wits, nonce=b"n2")
    assert proof.verify(RNG, spec, nonce=b"n2")

    spec_fv = ProofSpec(context=b"kb-kv")
    spec_fv.add_statement(KBUniversalAccumulatorMembershipKVFullVerifier(
        accumulator_value=kb.mem.value(), secret_key=kp.secret_key))
    spec_fv.add_statement(KBUniversalAccumulatorNonMembershipKV(
        accumulator_value=kb.non_mem.value()))
    assert proof.verify(RNG, spec_fv, nonce=b"n2")


def test_detached_membership(world):
    w = world
    spec_p = ProofSpec(context=b"detached")
    spec_p.add_statement(DetachedAccumulatorMembershipProver(
        params=w["params"], public_key=w["kp"].public_key))
    wits = [DetachedAccumMembershipWit(
        element=w["elem"], witness=w["wit"],
        accumulator_value=w["accum"].value())]
    proof = Proof.new(RNG, spec_p, wits, nonce=b"d")

    # the randomized accumulator differs from the original
    sp = proof.statement_proofs[0]
    assert sp.accumulator != w["accum"].value()

    spec_v = ProofSpec(context=b"detached")
    spec_v.add_statement(DetachedAccumulatorMembershipVerifier(
        params=w["params"], public_key=w["kp"].public_key,
        secret_key=w["kp"].secret_key))
    assert proof.verify(RNG, spec_v, nonce=b"d")

    # wrong decryption key -> ECIES tag failure surfaces as an error
    spec_bad = ProofSpec(context=b"detached")
    spec_bad.add_statement(DetachedAccumulatorMembershipVerifier(
        params=w["params"], public_key=w["kp"].public_key,
        secret_key=type(w["kp"].secret_key)(alpha=F.rand(RNG))))
    with pytest.raises((ProofSystemError, ValueError)):
        proof.verify(RNG, spec_bad, nonce=b"d")


def test_detached_non_membership(world):
    params, kp = world["params"], world["kp"]
    from crypto_tpu.accumulator.persistence import InMemoryInitialElements
    state = InMemoryState()
    members = [F.rand(RNG) for _ in range(3)]
    non_member = F.rand(RNG)
    accum = UniversalAccumulator.initialize(RNG, params, 10, kp.secret_key,
                                            InMemoryInitialElements())
    accum = accum.add_batch(members, kp.secret_key, state)
    nm_wit = accum.get_non_membership_witness(non_member, kp.secret_key,
                                              state, params)
    from crypto_tpu.hashing import group_elem_from_try_and_incr
    Q = group_elem_from_try_and_incr(b.G1, b"detached-Q").normalize()

    spec_p = ProofSpec(context=b"detached-nm")
    spec_p.add_statement(DetachedAccumulatorNonMembershipProver(
        params=params, public_key=kp.public_key, Q=Q))
    wits = [DetachedAccumNonMembershipWit(
        element=non_member, witness=nm_wit,
        accumulator_value=accum.value())]
    proof = Proof.new(RNG, spec_p, wits, nonce=b"d2")

    spec_v = ProofSpec(context=b"detached-nm")
    spec_v.add_statement(DetachedAccumulatorNonMembershipVerifier(
        params=params, public_key=kp.public_key,
        secret_key=kp.secret_key, Q=Q))
    assert proof.verify(RNG, spec_v, nonce=b"d2")


def test_bound_check_smc_kv_and_kvac_full_verifier():
    """SMC-KV bound check + BBDT16 full-verifier statements (reference
    `bound_check_smc_with_kv.rs`, `bbdt16_kvac.rs`)."""
    from crypto_tpu.smc_range_proof.kv import SetMembershipCheckParamsKV
    from crypto_tpu.smc_range_proof.ccs import MemberCommitmentKey
    from crypto_tpu.proof_system.statements_ranges import (
        BoundCheckSmcWithKVProver, BoundCheckSmcWithKVVerifier)
    from crypto_tpu.proof_system.statements_more import (
        KVACWitness, PoKBBDT16MACFullVerifier)
    from crypto_tpu.kvac.bbdt16 import KVACSecretKey, MAC, MACParams

    rng = random.Random(606)
    base = 4
    params_kv = SetMembershipCheckParamsKV.new_for_range_proof(
        rng, b"smc-kv-rp", base)
    ck = MemberCommitmentKey.new(b"smc-kv-ck")

    mac_params = MACParams.new(b"kvac-params", 3)
    sk = KVACSecretKey.generate(rng)
    msgs = [F(57), F.rand(rng), F.rand(rng)]
    mac = MAC.new(rng, msgs, sk, mac_params)

    spec_p = ProofSpec(context=b"smckv")
    s0 = spec_p.add_statement(PoKBBDT16MACFullVerifier(
        params=mac_params, revealed_messages={1: msgs[1]}, secret_key=sk))
    s1 = spec_p.add_statement(BoundCheckSmcWithKVProver(
        min_val=18, max_val=100, params=params_kv, comm_key=ck, base=base))
    spec_p.add_witness_equality([(s0, 0), (s1, 0)])
    wits = [KVACWitness(mac=mac, messages=msgs), F(57)]
    proof = Proof.new(RNG, spec_p, wits, nonce=b"kv3")

    # full-verifier spec with the range secret key
    spec_v = ProofSpec(context=b"smckv")
    s0 = spec_v.add_statement(PoKBBDT16MACFullVerifier(
        params=mac_params, revealed_messages={1: msgs[1]}, secret_key=sk))
    s1 = spec_v.add_statement(BoundCheckSmcWithKVVerifier(
        min_val=18, max_val=100, params=params_kv, comm_key=ck, base=base,
        secret_key=params_kv.sk))
    spec_v.add_witness_equality([(s0, 0), (s1, 0)])
    assert proof.verify(RNG, spec_v, nonce=b"kv3")

    # out-of-range witness cannot even init
    with pytest.raises(Exception):
        Proof.new(RNG, spec_p, [KVACWitness(mac=mac, messages=msgs), F(7)],
                  nonce=b"kv4")

    # wrong MAC secret key fails
    spec_bad = ProofSpec(context=b"smckv")
    s0 = spec_bad.add_statement(PoKBBDT16MACFullVerifier(
        params=mac_params, revealed_messages={1: msgs[1]},
        secret_key=KVACSecretKey.generate(rng)))
    s1 = spec_bad.add_statement(BoundCheckSmcWithKVVerifier(
        min_val=18, max_val=100, params=params_kv, comm_key=ck, base=base,
        secret_key=params_kv.sk))
    spec_bad.add_witness_equality([(s0, 0), (s1, 0)])
    with pytest.raises(ProofSystemError):
        proof.verify(RNG, spec_bad, nonce=b"kv3")
