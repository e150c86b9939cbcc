"""Circom .r1cs/.wasm frontend over BN254 against the reference's bn128
test vectors (`legogroth16/test-vectors/bn128/`) — the second-curve parity
anchors (`circom/r1cs.rs:33-103` curve header dispatch)."""

import os
import random

import pytest

from crypto_tpu.curves import bn254 as bn
from crypto_tpu.legogroth16.circom import parse_r1cs, circom_circuit
from crypto_tpu.legogroth16 import snark
from crypto_tpu.r1cs.cs import ConstraintSystem

F = bn.Fr
RNG = random.Random(4242)
VECTORS = "/root/reference/legogroth16/test-vectors/bn128"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VECTORS), reason="reference test vectors unavailable")


def test_parse_bn128_header():
    r = parse_r1cs(os.path.join(VECTORS, "multiply2.r1cs"))
    assert r.prime == bn.R
    assert r.n_constraints == 1


def test_prove_multiply2_bn254():
    """Full LegoGroth16 prove/verify over BN254 from a bn128 circom
    fixture."""
    r = parse_r1cs(os.path.join(VECTORS, "multiply2.r1cs"))
    a_val, b_val = F.rand(RNG), F.rand(RNG)
    out = a_val * b_val
    wires = [F(1), out, a_val, b_val]

    cs = ConstraintSystem(F, mode="prove")
    circom_circuit(r, wire_assignment=wires, field=F)(cs)
    assert cs.is_satisfied()

    pk = snark.generate_random_parameters(
        circom_circuit(r, field=F), 1, RNG, ctx=bn)
    proof, v, committed = snark.create_proof(
        circom_circuit(r, wire_assignment=wires, field=F), pk, RNG, ctx=bn)
    pvk = snark.PreparedVerifyingKey.from_vk(pk.vk, ctx=bn)
    assert snark.verify_proof(pvk, proof, [out], ctx=bn)
    assert not snark.verify_proof(pvk, proof, [out + F(1)], ctx=bn)
    assert committed == [a_val]
    assert snark.verify_commitment(pk.vk, proof, [out], committed, v, ctx=bn)


WASM_OK = True
try:
    from crypto_tpu.native import get_wasm_lib
    WASM_OK = get_wasm_lib() is not None
except Exception:
    WASM_OK = False


@pytest.mark.skipif(not WASM_OK, reason="native WASM interpreter unavailable")
def test_wasm_witness_bn254():
    from crypto_tpu.legogroth16.witness import WitnessCalculator
    wc = WitnessCalculator.from_file(os.path.join(VECTORS, "multiply2.wasm"),
                                     field=F)
    a_val, b_val = F(1234), F(5678)
    wires = wc.calculate_witnesses({"a": [a_val], "b": [b_val]})
    assert wires[1] == a_val * b_val
