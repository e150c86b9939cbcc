"""Staged timing diagnostic for msm_pippenger on the real TPU.

Usage: python benches/dev_msm_diag.py [log2_n] [c]
Prints wall-clock for: point gen, digit extraction, planning, pallas kernel
compile (first window), steady-state window execution, tail, total.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

t_import0 = time.time()
import jax
if os.environ.get("DIAG_LOG_COMPILES"):
    jax.config.update("jax_log_compiles", True)
import jax.numpy as jnp
from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jcurve import jcurve_for
from crypto_tpu.ops.pippenger import (
    msm_pippenger, signed_digits, plan_window, canonical_signature,
    _engine_for, _pool_for, _round_up, JPoints,
)
print(f"imports: {time.time()-t_import0:.1f}s  backend={jax.default_backend()}",
      flush=True)

LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 14
C = int(sys.argv[2]) if len(sys.argv) > 2 else 13
n = 1 << LOG2N

jc = jcurve_for(bls.G1)
rng = np.random.default_rng(0)

# --- point generation: distinct points cheaply via small host set + device add
t0 = time.time()
k = 64
base = bls.G1.generator()
A_host = [(base.mul_raw((1 << 40) + i)).normalize() for i in range(k)]
A = jc.pack_points(A_host)
print(f"host seed points: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
m = n // k
B = jc.pack_points([bls.G1.infinity()])
step_pt = base.mul_raw(1 << 41)
while B.X.shape[0] < m:
    sp = jc.pack_points([step_pt.normalize()])
    ln = B.X.shape[0]
    stepb = JPoints(jnp.tile(sp.X, (ln, 1)), jnp.tile(sp.Y, (ln, 1)),
                    jnp.tile(sp.Z, (ln, 1)))
    shifted = jc.jit_add(B, stepb)
    B = JPoints(jnp.concatenate([B.X, shifted.X]),
                jnp.concatenate([B.Y, shifted.Y]),
                jnp.concatenate([B.Z, shifted.Z]))
    step_pt = step_pt.double()
B = JPoints(B.X[:m], B.Y[:m], B.Z[:m])
Arep = JPoints(jnp.repeat(A.X, m, axis=0), jnp.repeat(A.Y, m, axis=0),
               jnp.repeat(A.Z, m, axis=0))
Brep = JPoints(jnp.tile(B.X, (k, 1)), jnp.tile(B.Y, (k, 1)),
               jnp.tile(B.Z, (k, 1)))
jac_points = jc.jit_add(Arep, Brep)
jax.block_until_ready(jac_points.X)
print(f"device point build (incl add compile): {time.time()-t0:.1f}s",
      flush=True)

t0 = time.time()
aff = jax.jit(jc.to_affine)(jac_points)
points = JPoints(aff.X, aff.Y,
                 jc.F.select(aff.inf, jc.F.zeros(aff.X.shape[:-1]),
                             jc.F.ones(aff.X.shape[:-1])))
jax.block_until_ready(points.X)
print(f"normalize (incl compile): {time.time()-t0:.1f}s", flush=True)

scalars = [int(x) for x in rng.integers(1, 1 << 63, size=n)]
scalars = [(s * (s + 1) * 0x9E3779B97F4A7C15) % bls.R for s in scalars]

t0 = time.time()
digits = signed_digits(scalars, C, 255)
print(f"signed_digits: {time.time()-t0:.2f}s  W={digits.shape[0]}", flush=True)

t0 = time.time()
inf_mask = np.zeros(n, dtype=bool)
W = digits.shape[0]
pool_base = n + 1
plans = []
pool_size = pool_base
for w in range(W):
    plan, end = plan_window(digits[w], inf_mask, C, pool_base,
                            points_affine=True)
    plans.append(plan)
    pool_size = max(pool_size, end)
    for lv in plan.levels:
        pool_size = max(pool_size, lv.out_offset + _round_up(lv.n_pairs))
sig = canonical_signature(plans)
pool_size += max((s for s, _ in sig), default=0)
print(f"planning: {time.time()-t0:.2f}s  sig={sig}  pool={pool_size}",
      flush=True)

BACKEND = os.environ.get("CRYPTO_TPU_MSM_BACKEND", "pallas")
print(f"engine backend: {BACKEND}", flush=True)
engine = _engine_for(jc, BACKEND)
pool0 = _pool_for(jc, points, pool_size)
jax.block_until_ready(pool0.X)

t0 = time.time()
pool_arrays = (pool0.X, pool0.Y, pool0.Z)
pool = JPoints(*pool_arrays)
pool_arrays, out0, flag0 = engine.run_window(pool, plans[0], C, sig)
jax.block_until_ready(out0.X)
print(f"first window (compile+run): {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
outs = [out0]
flags = [flag0]
for w in range(1, W):
    pool = JPoints(*pool_arrays)
    pool_arrays, out, flag = engine.run_window(pool, plans[w], C, sig)
    outs.append(out)
    flags.append(flag)
jax.block_until_ready(outs[-1].X)
dt = time.time() - t0
print(f"steady windows x{W-1}: {dt:.2f}s  ({dt/(W-1):.3f}s/window)", flush=True)

t0 = time.time()
result = msm_pippenger(bls.G1, points, scalars, c=C, inf_mask=inf_mask,
                       points_affine=True)
dt = time.time() - t0
print(f"full msm_pippenger: {dt:.2f}s -> {n/dt:.0f} points/s", flush=True)

# correctness vs host at small n
if LOG2N <= 12:
    from crypto_tpu.utils.msm import msm as msm_host
    host_pts = jc.unpack(points)
    exp = msm_host(host_pts, [bls.Fr(s) for s in scalars])
    print("correct:", result == exp, flush=True)
