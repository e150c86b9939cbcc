"""LegoGroth16 tests (BASELINE.md parity config #5 at test scale).

Circuits mirror the reference's test circuits (`legogroth16/tests/mimc.rs`
shape and the multiply/bitsize gadgets used by SAVER).
"""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.r1cs.cs import ConstraintSystem, LinearCombination, ONE, Variable
from crypto_tpu.legogroth16 import snark

F = b.Fr
RNG = random.Random(33)


def multiply_circuit(x_val=None, y_val=None, public_product=None):
    """Prove knowledge of x, y with x*y = z (z public)."""
    def circuit(cs: ConstraintSystem):
        z = cs.new_input(public_product)
        x = cs.new_witness(x_val)
        y = cs.new_witness(y_val)
        cs.enforce(LinearCombination.from_var(x),
                   LinearCombination.from_var(y),
                   LinearCombination.from_var(z))
    return circuit


def cubic_circuit(x_val=None, out_val=None):
    """x^3 + x + 5 == out (the classic toy circuit)."""
    def circuit(cs: ConstraintSystem):
        out = cs.new_input(out_val)
        x = cs.new_witness(x_val)
        x2 = cs.new_witness(None if x_val is None else x_val * x_val)
        x3 = cs.new_witness(None if x_val is None else x_val * x_val * x_val)
        cs.enforce(x.lc(), x.lc(), x2.lc())
        cs.enforce(x.lc(), x2.lc(), x3.lc())
        # (x3 + x + 5) * 1 = out
        lhs = x3.lc() + x.lc() + LinearCombination.constant(F, 5)
        cs.enforce(lhs, LinearCombination.from_var(ONE), out.lc())
    return circuit


def test_r1cs_satisfaction():
    x, y = F(3), F(7)
    cs = ConstraintSystem(F, mode="prove")
    multiply_circuit(x, y, x * y)(cs)
    assert cs.is_satisfied()
    cs2 = ConstraintSystem(F, mode="prove")
    multiply_circuit(x, y, F(22))(cs2)
    assert not cs2.is_satisfied()


@pytest.mark.parametrize("commit_count", [0, 1, 2])
def test_prove_verify_multiply(commit_count):
    x, y = F.rand(RNG), F.rand(RNG)
    z = x * y
    pk = snark.generate_random_parameters(multiply_circuit(), commit_count, RNG)
    proof, v, committed = snark.create_proof(multiply_circuit(x, y, z), pk, RNG)
    pvk = snark.PreparedVerifyingKey.from_vk(pk.vk)
    assert snark.verify_proof(pvk, proof, [z])
    # wrong public input fails
    assert not snark.verify_proof(pvk, proof, [z + F(1)])
    # commitment opens
    assert snark.verify_commitment(pk.vk, proof, [z], committed, v)
    if commit_count >= 1:
        assert committed[0] == x
        # wrong opening fails
        assert not snark.verify_commitment(pk.vk, proof, [z],
                                           [w + F(1) for w in committed], v)


def test_prove_verify_cubic():
    x = F(3)
    out = x * x * x + x + F(5)
    pk = snark.generate_random_parameters(cubic_circuit(), 1, RNG)
    proof, v, committed = snark.create_proof(cubic_circuit(x, out), pk, RNG)
    pvk = snark.PreparedVerifyingKey.from_vk(pk.vk)
    assert snark.verify_proof(pvk, proof, [out])
    assert committed == [x]
    assert snark.verify_commitment(pk.vk, proof, [out], committed, v)


def test_larger_circuit_chain():
    """Chain of n squarings: x_{i+1} = x_i^2; proves at a few dozen
    constraints, exercising the NTT witness map beyond trivial sizes."""
    n = 50
    x0 = F.rand(RNG)

    def make(xv=None):
        def circuit(cs):
            vals = None
            if xv is not None:
                vals = [xv]
                for _ in range(n):
                    vals.append(vals[-1] * vals[-1])
            out = cs.new_input(None if xv is None else vals[-1])
            cur = cs.new_witness(None if xv is None else vals[0])
            for i in range(n):
                nxt_val = None if xv is None else vals[i + 1]
                nxt = cs.new_witness(nxt_val) if i < n - 1 else None
                if i < n - 1:
                    cs.enforce(cur.lc(), cur.lc(), nxt.lc())
                    cur = nxt
                else:
                    cs.enforce(cur.lc(), cur.lc(), out.lc())
        return circuit

    pk = snark.generate_random_parameters(make(), 1, RNG)
    proof, v, committed = snark.create_proof(make(x0), pk, RNG)
    pvk = snark.PreparedVerifyingKey.from_vk(pk.vk)
    expected = x0
    for _ in range(n):
        expected = expected * expected
    assert snark.verify_proof(pvk, proof, [expected])
    assert committed == [x0]
