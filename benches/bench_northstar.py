"""North-star benchmark: LegoGroth16 prove/verify at 2^16 constraints
(BASELINE.json north_star; reference hot path
`legogroth16/src/{prover.rs:149-385, r1cs_to_qap.rs:150-209}`).

Prints a phase breakdown + one JSON line:
  {"metric": "legogroth16_prove_2^16_wall_s", "value": ..., ...}

Env: N (log2 constraints, default 16), CRYPTO_TPU_CARRY (default ks).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import crypto_tpu.jax_setup  # noqa
import random

if not os.environ.get("CRYPTO_TPU_CARRY"):
    from crypto_tpu.fields.jfield import set_carry_mode
    set_carry_mode("ks")

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.r1cs.cs import ConstraintSystem, LinearCombination
from crypto_tpu.legogroth16 import snark

F = bls.Fr
LOGN = int(os.environ.get("N", "16"))
RNG = random.Random(9)


def chain_circuit(n_constraints: int, x_val=None):
    """x_{i+1} = x_i^2 + x_i + i  squaring chain; 1 public input (the final
    value), n_constraints witnesses."""
    def circuit(cs: ConstraintSystem):
        vals = None
        if x_val is not None:
            vals = [x_val]
            for i in range(n_constraints):
                v = vals[-1]
                vals.append(v * v + v + F(i))
        out = cs.new_input(None if vals is None else vals[-1])
        x = cs.new_witness(x_val)
        cur = x
        for i in range(n_constraints):
            nxt_val = None if vals is None else vals[i + 1]
            if i == n_constraints - 1:
                nxt_lc = out.lc()
                nxt = None
            else:
                nxt = cs.new_witness(nxt_val)
                nxt_lc = nxt.lc()
            # cur * (cur + 1) = nxt - i  <=>  cur*cur + cur + i = nxt
            cs.enforce(cur.lc(),
                       cur.lc() + LinearCombination.constant(F, 1),
                       nxt_lc + LinearCombination.constant(F, -i % F.p))
            if nxt is not None:
                cur = nxt
    return circuit


def main():
    # pick constraints so the domain is exactly 2^LOGN
    nc = (1 << LOGN) - 4
    print(f"building circuit: {nc} constraints", flush=True)

    t0 = time.time()
    pk = snark.generate_random_parameters(chain_circuit(nc), 1, RNG)
    t_setup = time.time() - t0
    print(f"CRS generation: {t_setup:.2f}s "
          f"(h_query={len(pk.h_query)}, a_query={len(pk.a_query)})",
          flush=True)

    # phase instrumentation: time the QAP witness map (7 NTTs) and the four
    # MSM groups inside create_proof (`prover.rs:267-385` split)
    phases = {}
    real_wm, real_msmq = snark.witness_map, snark._msm_query

    def timed_wm(cs, F=F):
        t = time.time()
        out = real_wm(cs, F)
        phases["witness_map_ntt"] = phases.get("witness_map_ntt", 0.) + \
            (time.time() - t)
        return out

    def timed_msmq(pk_, name, scalars, offset=0):
        t = time.time()
        out = real_msmq(pk_, name, scalars, offset)
        phases[f"msm_{name}"] = phases.get(f"msm_{name}", 0.) + \
            (time.time() - t)
        return out

    snark.witness_map = timed_wm
    snark._msm_query = timed_msmq

    x = F.rand(RNG)
    t0 = time.time()
    proof, v, committed = snark.create_proof(chain_circuit(nc, x), pk, RNG)
    t_prove_cold = time.time() - t0
    print(f"prove (cold, incl compile): {t_prove_cold:.2f}s", flush=True)

    phases.clear()
    t0 = time.time()
    proof, v, committed = snark.create_proof(chain_circuit(nc, x), pk, RNG)
    t_prove = time.time() - t0
    snark.witness_map, snark._msm_query = real_wm, real_msmq
    msm_s = sum(v_ for k_, v_ in phases.items() if k_.startswith("msm_"))
    ntt_s = phases.get("witness_map_ntt", 0.0)
    print(f"prove (warm): {t_prove:.2f}s "
          f"(witness-map/NTT {ntt_s:.2f}s, MSMs {msm_s:.2f}s, "
          f"other {t_prove - ntt_s - msm_s:.2f}s)", flush=True)
    for k_ in sorted(phases):
        print(f"  {k_}: {phases[k_]:.2f}s", flush=True)

    # public input = final chain value
    vals = [x]
    for i in range(nc):
        vv = vals[-1]
        vals.append(vv * vv + vv + F(i))
    pub = [vals[-1]]

    t0 = time.time()
    pvk = snark.PreparedVerifyingKey.from_vk(pk.vk)
    ok = snark.verify_proof(pvk, proof, pub)
    t_verify = time.time() - t0
    assert ok, "proof did not verify"
    assert snark.verify_commitment(pk.vk, proof, pub, committed, v)
    print(f"verify: {t_verify:.2f}s", flush=True)

    out = {
        "metric": f"legogroth16_prove_2^{LOGN}_wall_s",
        "value": round(t_prove, 2),
        "unit": "s",
        "setup_s": round(t_setup, 2),
        "verify_s": round(t_verify, 2),
        "ntt_s": round(ntt_s, 2),
        "msm_s": round(msm_s, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
