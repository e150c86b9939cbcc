"""VB positive-accumulator scaling benchmark (BASELINE.md parity config 3,
reference Criterion benches `benches/benches/positive_accumulator.rs` and
`accum_witness_updates.rs`).

Measures at NELEM (default 2^14) elements:
  * batch add + batch remove (one field product + one scalar mul each)
  * membership-witness generation for the whole batch (batch inversion +
    fixed-base scalar muls)
  * witness updates for all members after a batch addition (with sk)

Prints one JSON line per metric.  Env: NELEM (default 16384).
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
from crypto_tpu.accumulator.setup import AccumSetupParams, AccumKeypair
from crypto_tpu.accumulator.core import PositiveAccumulator
from crypto_tpu.accumulator.persistence import InMemoryState
from crypto_tpu.accumulator.witness import update_membership_batch_with_sk

NELEM = int(os.environ.get("NELEM", str(1 << 14)))
rng = random.Random(0)
F = bls.Fr


def main():
    params = AccumSetupParams.new(b"bench-accum")
    kp = AccumKeypair.generate(rng, params)
    acc = PositiveAccumulator.initialize(params)
    state = InMemoryState()

    elems = [F.rand(rng) for _ in range(NELEM)]
    t0 = time.time()
    acc = acc.add_batch(elems, kp.secret_key, state)
    dt_add = time.time() - t0
    print(json.dumps({"metric": f"vb_accum_batch_add_{NELEM}_wall_s",
                      "value": round(dt_add, 3), "unit": "s",
                      "elems_per_s": round(NELEM / dt_add, 1)}), flush=True)

    members = elems[: NELEM // 2]
    t0 = time.time()
    wits = acc.get_membership_witnesses_for_batch(members, kp.secret_key,
                                                  state)
    dt_wit = time.time() - t0
    print(json.dumps({
        "metric": f"vb_accum_witness_gen_{len(members)}_wall_s",
        "value": round(dt_wit, 3), "unit": "s",
        "witnesses_per_s": round(len(members) / dt_wit, 1)}), flush=True)

    # spot-check two witnesses
    assert acc.verify_membership(members[0], wits[0], kp.public_key, params)
    assert acc.verify_membership(members[-1], wits[-1], kp.public_key, params)

    additions = [F.rand(rng) for _ in range(256)]
    new_acc = acc.add_batch(additions, kp.secret_key, state)
    t0 = time.time()
    new_wits = update_membership_batch_with_sk(
        additions, [], members, wits, acc.value(), kp.secret_key)
    dt_upd = time.time() - t0
    assert new_acc.verify_membership(members[0], new_wits[0], kp.public_key,
                                     params)
    print(json.dumps({
        "metric": f"vb_accum_witness_update_{len(members)}_after_256_adds_wall_s",
        "value": round(dt_upd, 3), "unit": "s",
        "updates_per_s": round(len(members) / dt_upd, 1)}), flush=True)

    removals = elems[NELEM // 2:]
    t0 = time.time()
    acc2 = new_acc.remove_batch(removals, kp.secret_key, state)
    dt_rem = time.time() - t0
    print(json.dumps({"metric": f"vb_accum_batch_remove_{len(removals)}_wall_s",
                      "value": round(dt_rem, 3), "unit": "s",
                      "elems_per_s": round(len(removals) / dt_rem, 1)}),
          flush=True)
    del acc2


if __name__ == "__main__":
    main()
