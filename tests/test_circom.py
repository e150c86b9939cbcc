"""Circom .r1cs frontend against the REFERENCE's in-tree test vectors
(`legogroth16/test-vectors/bls12-381/*.r1cs`) — direct parity anchors."""

import os
import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.legogroth16.circom import parse_r1cs, circom_circuit
from crypto_tpu.legogroth16 import snark
from crypto_tpu.r1cs.cs import ConstraintSystem

F = b.Fr
RNG = random.Random(2020)
VECTORS = "/root/reference/legogroth16/test-vectors/bls12-381"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VECTORS), reason="reference test vectors unavailable")


def test_parse_multiply2():
    r = parse_r1cs(os.path.join(VECTORS, "multiply2.r1cs"))
    assert r.prime == b.R
    assert r.n_wires == 4
    assert r.n_public == 1
    assert r.n_constraints == 1


def test_parse_various():
    for name in ("mimc_bls12_381.r1cs", "less_than_32.r1cs",
                 "multiply_n.r1cs", "nconstraints.r1cs"):
        r = parse_r1cs(os.path.join(VECTORS, name))
        assert r.prime == b.R
        assert r.n_constraints > 0
        assert r.n_wires > r.n_public


def test_prove_multiply2_circuit():
    """Full LegoGroth16 proof over the circom-compiled multiply2 circuit."""
    r = parse_r1cs(os.path.join(VECTORS, "multiply2.r1cs"))
    a_val, b_val = F.rand(RNG), F.rand(RNG)
    out = a_val * b_val
    wires = [F(1), out, a_val, b_val]

    # satisfaction check of the parsed constraints
    cs = ConstraintSystem(F, mode="prove")
    circom_circuit(r, wire_assignment=wires)(cs)
    assert cs.is_satisfied()
    bad = ConstraintSystem(F, mode="prove")
    circom_circuit(r, wire_assignment=[F(1), out + F(1), a_val, b_val])(bad)
    assert not bad.is_satisfied()

    pk = snark.generate_random_parameters(circom_circuit(r), 1, RNG)
    proof, v, committed = snark.create_proof(
        circom_circuit(r, wire_assignment=wires), pk, RNG)
    pvk = snark.PreparedVerifyingKey.from_vk(pk.vk)
    assert snark.verify_proof(pvk, proof, [out])
    assert not snark.verify_proof(pvk, proof, [out + F(1)])
    assert committed == [a_val]


WASM_OK = True
try:
    from crypto_tpu.native import get_wasm_lib
    WASM_OK = get_wasm_lib() is not None
except Exception:
    WASM_OK = False


@pytest.mark.skipif(not WASM_OK, reason="native WASM interpreter unavailable")
def test_wasm_witness_calculator():
    """Drive the circom-emitted .wasm through the C++ WASM interpreter
    (the reference's wasmer slot, `circom/witness.rs`)."""
    from crypto_tpu.legogroth16.witness import WitnessCalculator
    wc = WitnessCalculator.from_file(os.path.join(VECTORS, "multiply2.wasm"))
    a_val, b_val = F(1234), F(5678)
    wires = wc.calculate_witnesses({"a": [a_val], "b": [b_val]})
    assert wires == [F(1), a_val * b_val, a_val, b_val]
    # wrong signal name is rejected
    with pytest.raises(Exception):
        wc.calculate_witnesses({"a": [a_val], "c": [b_val]})


@pytest.mark.skipif(not WASM_OK, reason="native WASM interpreter unavailable")
@pytest.mark.slow
def test_wasm_witness_to_legogroth16_proof():
    """Full pipeline: .r1cs + .wasm -> witness -> LegoGroth16 proof, for a
    nontrivial circuit (mimc hash, 2922 wires)."""
    from crypto_tpu.legogroth16.witness import WitnessCalculator
    r = parse_r1cs(os.path.join(VECTORS, "mimc_bls12_381.r1cs"))
    wc = WitnessCalculator.from_file(
        os.path.join(VECTORS, "mimc_bls12_381.wasm"))
    inputs = {"in": [F.rand(RNG) for _ in range(8)], "k": [F(7)]}
    wires = wc.calculate_witnesses(inputs, sanity_check=True)
    assert len(wires) == r.n_wires

    cs = ConstraintSystem(F, mode="prove")
    circom_circuit(r, wire_assignment=wires)(cs)
    assert cs.is_satisfied()

    pk = snark.generate_random_parameters(circom_circuit(r), 2, RNG)
    proof, v, committed = snark.create_proof(
        circom_circuit(r, wire_assignment=wires), pk, RNG)
    pvk = snark.PreparedVerifyingKey.from_vk(pk.vk)
    assert snark.verify_proof(pvk, proof, [wires[1]])
    assert not snark.verify_proof(pvk, proof, [wires[1] + F(1)])
