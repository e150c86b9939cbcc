"""Device pairing + BBS+ batch-verification benchmark (VERDICT round-1
item 2 'done' criteria: a multi-pairing product and a 1k-signature batch
verify measured on TPU).

Prints one JSON line per metric.
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

import jax

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jpairing import jpairing_for

NPAIR = int(os.environ.get("NPAIR", "64"))
NSIG = int(os.environ.get("NSIG", "1024"))
rng = random.Random(0)


def main():
    jp = jpairing_for("bls12_381")

    # batched Miller + final exp: NPAIR pairings in one program
    pairs = [(bls.G1.rand(rng).normalize(), bls.G2.rand(rng).normalize())
             for _ in range(NPAIR)]
    pairs2 = [(bls.G1.rand(rng).normalize(), bls.G2.rand(rng).normalize())
              for _ in range(NPAIR)]
    px, py, qx, qy, act = jp.pack_pairs(pairs)
    px2, py2, qx2, qy2, act2 = jp.pack_pairs(pairs2)
    t0 = time.time()
    f = jp.miller_loop_batch(px, py, qx, qy, act)
    out = jp.final_exponentiation(jp.product(f))
    jax.block_until_ready(out)
    print(f"pairing batch cold (incl compile): {time.time()-t0:.1f}s",
          flush=True)
    # timed run on a DIFFERENT pair set (the relay memoizes identical
    # executions)
    t0 = time.time()
    f = jp.miller_loop_batch(px2, py2, qx2, qy2, act2)
    out = jp.final_exponentiation(jp.product(f))
    _ = jp.j12.unpack(out)       # force full sync through the host readback
    dt = time.time() - t0
    print(json.dumps({
        "metric": f"device_multi_pairing_{NPAIR}_wall_s",
        "value": round(dt, 3), "unit": "s",
        "pairings_per_s": round(NPAIR / dt, 1)}), flush=True)
    # spot-check one pair against host
    one = jp.multi_pairing(pairs[:1])
    assert one == bls.pairing(*pairs[0]), "device pairing mismatch"

    # BBS+ batch verification of NSIG signatures
    from crypto_tpu.bbs_plus.setup import KeypairG2, SignatureParamsG1
    from crypto_tpu.bbs_plus.signature import SignatureG1
    from crypto_tpu.bbs_plus import batch as bbs_batch
    params = SignatureParamsG1.new(b"bench-batch", 4)
    kp = KeypairG2.generate(rng, params)
    t0 = time.time()
    sigs, msgs = [], []
    for _ in range(NSIG):
        m = [bls.Fr.rand(rng) for _ in range(4)]
        sigs.append(SignatureG1.new(rng, m, kp.secret_key, params))
        msgs.append(m)
    print(f"signing {NSIG}: {time.time()-t0:.1f}s", flush=True)

    os.environ.setdefault("CRYPTO_TPU_PAIRING_BACKEND", "device")
    t0 = time.time()
    ok = bbs_batch.batch_verify_signatures(sigs, msgs, kp.public_key,
                                           params, rng)
    dt_cold = time.time() - t0
    assert ok
    t0 = time.time()
    ok = bbs_batch.batch_verify_signatures(sigs, msgs, kp.public_key,
                                           params, rng)
    dt = time.time() - t0
    assert ok
    print(json.dumps({
        "metric": f"bbs_plus_batch_verify_{NSIG}_wall_s",
        "value": round(dt, 3), "unit": "s",
        "sigs_per_s": round(NSIG / dt, 1),
        "cold_s": round(dt_cold, 2)}), flush=True)


if __name__ == "__main__":
    main()
