"""End-to-end BN254 demo: circom circuit -> WASM witness -> LegoGroth16
proof -> verification -> device pairing cross-check.

Mirrors the reference's bn128 fixture flow (`legogroth16/test-vectors/
bn128/` + `circom/witness.rs` + `prover.rs`), everything running through
crypto_tpu's own stack: the .r1cs binary reader, the C++ WASM interpreter,
the field-generic device MSM/NTT, the BN254 host pairing for verification
and the BN254 DEVICE pairing (`curves/jpairing.JPairingBN`) as a
cross-check.

    python examples/bn254_circom_snark_demo.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import crypto_tpu.jax_setup  # noqa: E402  (persistent compile cache)

from crypto_tpu.curves import bn254 as bn                      # noqa: E402
from crypto_tpu.legogroth16 import snark                       # noqa: E402
from crypto_tpu.legogroth16.circom import parse_r1cs, circom_circuit  # noqa: E402

VECTORS = "/root/reference/legogroth16/test-vectors/bn128"
F = bn.Fr
RNG = random.Random(7)


def main():
    r1cs_path = os.path.join(VECTORS, "multiply2.r1cs")
    wasm_path = os.path.join(VECTORS, "multiply2.wasm")
    r = parse_r1cs(r1cs_path)
    print(f"parsed {r1cs_path}: {r.n_constraints} constraints, "
          f"{r.n_wires} wires, prime == BN254 r: {r.prime == bn.R}")

    a_val, b_val = F(1234567), F(7654321)
    try:
        from crypto_tpu.legogroth16.witness import WitnessCalculator
        wc = WitnessCalculator.from_file(wasm_path, field=F)
        wires = wc.calculate_witnesses({"a": [a_val], "b": [b_val]})
        print("witness via the C++ WASM interpreter:", int(wires[1]))
    except Exception as e:  # toolchain-less fallback
        print("WASM interpreter unavailable, computing wires directly:", e)
        wires = [F(1), a_val * b_val, a_val, b_val]

    t0 = time.time()
    pk = snark.generate_random_parameters(
        circom_circuit(r, field=F), 1, RNG, ctx=bn)
    print(f"CRS generated in {time.time()-t0:.2f}s")

    t0 = time.time()
    proof, v, committed = snark.create_proof(
        circom_circuit(r, wire_assignment=wires, field=F), pk, RNG, ctx=bn)
    print(f"proved in {time.time()-t0:.2f}s")

    pvk = snark.PreparedVerifyingKey.from_vk(pk.vk, ctx=bn)
    out = wires[1]
    assert snark.verify_proof(pvk, proof, [out], ctx=bn)
    assert snark.verify_commitment(pk.vk, proof, [out], committed, v, ctx=bn)
    print("verified (host BN254 pairing) OK")

    # device-pairing cross-check of the same 3-pairing equation
    from crypto_tpu.curves.jpairing import jpairing_for
    jp = jpairing_for("bn254")
    d = (snark.prepare_inputs(pk.vk, [out], ctx=bn) + proof.d).normalize()
    lhs = jp.multi_pairing([
        (proof.a, proof.b),
        (proof.c, (-pk.vk.delta_g2).normalize()),
        (d, (-pk.vk.gamma_g2).normalize())])
    assert lhs == pvk.alpha_beta
    print("verified (DEVICE BN254 pairing) OK")


if __name__ == "__main__":
    main()
