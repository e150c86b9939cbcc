#!/usr/bin/env python
"""Benchmark entry point (driver contract): prints ONE JSON line.

Primary metric: G1 MSM throughput (points/s/chip) at 2^20 points on
BLS12-381 — the arkworks-Pippenger-equivalent workload every prover in the
reference leans on (BASELINE.json `metric`).

`vs_baseline` compares against a single-threaded arkworks-class CPU
Pippenger estimate (~2^20 points in ~4 s on one core => ~260k points/s);
the reference publishes no numbers (BASELINE.md), so this is the documented
stand-in ratio.

Env knobs:
  CRYPTO_TPU_BENCH_N     log2 number of points (default 20)
  CRYPTO_TPU_BENCH_FAST  if set, use 2^14 points (smoke mode)
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import crypto_tpu.jax_setup  # persistent compile cache
    import jax

    # Kogge-Stone carries measured ~13% faster than scan at 2^20 on TPU
    # (both programs live in the persistent compile cache); override with
    # CRYPTO_TPU_CARRY=scan|ks.
    if not os.environ.get("CRYPTO_TPU_CARRY"):
        from crypto_tpu.fields.jfield import set_carry_mode
        set_carry_mode("ks")

    logn = int(os.environ.get("CRYPTO_TPU_BENCH_N", "20"))
    if os.environ.get("CRYPTO_TPU_BENCH_FAST"):
        logn = min(logn, 14)
    n = 1 << logn

    from crypto_tpu.curves import bls12_381 as bls
    from crypto_tpu.curves.jcurve import jcurve_for
    from crypto_tpu.ops import msm as msm_ops

    rng = np.random.default_rng(0)
    jc = jcurve_for(bls.G1)

    # Generate n points on device: random multiples of G batched via repeated
    # doubling of a packed base batch (cheap, avoids host loop over 2^20).
    base = bls.G1.generator()
    k = 64
    host_pts = []
    acc = base
    for i in range(k):
        host_pts.append(acc)
        acc = (acc + base.double()).normalize() if i % 2 else (acc.double()).normalize()
    seed_pack = jc.pack_points(host_pts)
    reps = n // k
    import jax.numpy as jnp
    points = type(seed_pack)(jnp.tile(seed_pack.X, (reps, 1)),
                             jnp.tile(seed_pack.Y, (reps, 1)),
                             jnp.tile(seed_pack.Z, (reps, 1)))
    scalars = [int(x) for x in rng.integers(1, 1 << 63, size=n)]
    # widen scalars to full 255-bit range
    scalars = [(s * (s + 1) * 0x9E3779B97F4A7C15) % bls.R for s in scalars]

    # warmup (compile)
    msm_ops.msm_device(bls.G1, points, scalars)

    t0 = time.time()
    result = msm_ops.msm_device(bls.G1, points, scalars)
    dt = time.time() - t0
    del result

    pts_per_s = n / dt
    baseline_cpu = 260_000.0  # arkworks-class single-core Pippenger, points/s
    out = {
        "metric": f"g1_msm_2^{logn}_points_per_s_per_chip",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / baseline_cpu, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
