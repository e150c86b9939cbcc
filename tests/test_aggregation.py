"""SnarkPack aggregation of LegoGroth16 proofs
(reference `legogroth16/src/aggregation/` tests)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.legogroth16 import snark
from crypto_tpu.legogroth16.aggregation import (
    AggregationError, GenericSRS, aggregate_proofs, verify_aggregate_proof)
from crypto_tpu.r1cs.cs import ConstraintSystem, LinearCombination
from crypto_tpu.transcript.transcript import Transcript

F = b.Fr
RNG = random.Random(2222)


def mul_circuit(a_val=None, b_val=None):
    def circuit(cs: ConstraintSystem):
        out = cs.new_input(None if a_val is None else a_val * b_val)
        a = cs.new_witness(a_val)
        bb = cs.new_witness(b_val)
        cs.enforce(LinearCombination.from_var(a),
                   LinearCombination.from_var(bb),
                   LinearCombination.from_var(out))
    return circuit


@pytest.mark.slow
def test_aggregate_legogroth16_proofs():
    pk = snark.generate_random_parameters(mul_circuit(), 1, RNG)
    n = 4
    proofs, publics = [], []
    for _ in range(n):
        x, y = F.rand(RNG), F.rand(RNG)
        proof, v, _ = snark.create_proof(mul_circuit(x, y), pk, RNG)
        pvk = snark.PreparedVerifyingKey.from_vk(pk.vk)
        assert snark.verify_proof(pvk, proof, [x * y])
        proofs.append(proof)
        publics.append([x * y])

    srs = GenericSRS.setup(RNG, n)
    prover_srs, verifier_srs = srs.specialize(n)
    t = Transcript(b"aggregation")
    agg = aggregate_proofs(prover_srs, t, proofs)

    tv = Transcript(b"aggregation")
    assert verify_aggregate_proof(verifier_srs, pk.vk, publics, agg, RNG, tv)
    # wrong public inputs fail
    bad = [list(p) for p in publics]
    bad[0][0] = bad[0][0] + F(1)
    tv = Transcript(b"aggregation")
    assert not verify_aggregate_proof(verifier_srs, pk.vk, bad, agg, RNG, tv)
    # wrong transcript label fails
    tv = Transcript(b"other")
    assert not verify_aggregate_proof(verifier_srs, pk.vk, publics, agg,
                                      RNG, tv)


@pytest.mark.slow
def test_aggregate_legogroth16_using_groth16():
    """Variant that keeps D out of the IPA
    (reference aggregation/legogroth16/using_groth16.rs)."""
    from crypto_tpu.legogroth16.aggregation import (
        aggregate_proofs_using_groth16, verify_aggregate_proof_using_groth16)
    pk = snark.generate_random_parameters(mul_circuit(), 1, RNG)
    n = 4
    proofs, publics = [], []
    for _ in range(n):
        x, y = F.rand(RNG), F.rand(RNG)
        proof, v, _ = snark.create_proof(mul_circuit(x, y), pk, RNG)
        proofs.append(proof)
        publics.append([x * y])

    srs = GenericSRS.setup(RNG, n)
    prover_srs, verifier_srs = srs.specialize(n)
    t = Transcript(b"aggregation")
    agg, d = aggregate_proofs_using_groth16(prover_srs, t, proofs)

    tv = Transcript(b"aggregation")
    assert verify_aggregate_proof_using_groth16(
        verifier_srs, pk.vk, publics, agg, d, RNG, tv)
    # wrong D vector fails
    bad_d = [d[1]] + d[1:]
    tv = Transcript(b"aggregation")
    assert not verify_aggregate_proof_using_groth16(
        verifier_srs, pk.vk, publics, agg, bad_d, RNG, tv)
    # wrong public inputs fail
    bad = [list(p) for p in publics]
    bad[0][0] = bad[0][0] + F(1)
    tv = Transcript(b"aggregation")
    assert not verify_aggregate_proof_using_groth16(
        verifier_srs, pk.vk, bad, agg, d, RNG, tv)
