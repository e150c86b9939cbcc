"""Round-4 consolidated TPU session: correctness + timings for the
fast+karatsuba+merged-bands+pad128 engine, plus the WGROUP A/B.

Stages (each prints immediately):
  1. 2^16 MSM vs known dlog (full validation of the new kernels on TPU)
  2. 2^20 window program + plan timing
  3. full 2^20 MSM wall clock
  4. WGROUP=4 grouped-programs A/B (extra compile; skip with NO_WGROUP=1)
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import crypto_tpu.jax_setup  # noqa
import jax
import jax.numpy as jnp
from crypto_tpu.fields.jfield import set_carry_mode
set_carry_mode("ks")
from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jcurve import jcurve_for, JPoints
from crypto_tpu.ops import msm_v2

jc = jcurve_for(bls.G1)
F = jc.F
L = F.L
rng = np.random.default_rng(3)

# --- 1. correctness at 2^16 -------------------------------------------------
n = 1 << 16
k = 16
G = bls.G1.generator()
dlogs = [int(rng.integers(1, 1 << 60)) for _ in range(k)]
base_pts = [(G.mul_raw(a)).normalize() for a in dlogs]
P = jc.pack_points(base_pts)
pts = JPoints(jnp.tile(P.X, (n // k, 1)), jnp.tile(P.Y, (n // k, 1)),
              jnp.tile(P.Z, (n // k, 1)))
scal = [int(s) for s in rng.integers(1, 1 << 62, size=n)]
t0 = time.time()
res = msm_v2.msm_device_scheduled(bls.G1, pts, scal, c=16)
print(f"2^16 msm ran in {time.time()-t0:.1f}s (incl compile)", flush=True)
expect_dlog = sum(s * dlogs[i % k] for i, s in enumerate(scal)) % bls.R
expect = G.mul_raw(expect_dlog)
assert res.normalize() == expect.normalize(), "MSM MISMATCH vs known dlog!"
print("2^16 correctness OK (duplicate bases -> exercises flag+rerun too)",
      flush=True)

# --- 2./3. timings at 2^20 ---------------------------------------------------
n = 1 << 20
digits = jnp.asarray(
    rng.integers(-(1 << 15) + 1, 1 << 15, size=(16, n), dtype=np.int32))
x = jnp.asarray(rng.integers(0, 1 << 15, size=(n, L), dtype=np.int32))
y = jnp.asarray(rng.integers(0, 1 << 15, size=(n, L), dtype=np.int32))
inf = jnp.zeros((n,), bool)
B = 1 << 15
eng = msm_v2._engine_for(jc)
(order, starts_p, counts_p, invperm, nprof_d,
 occs_d) = msm_v2._plan_windows_sorted(digits, inf, B)
jax.block_until_ready(order)
t0 = time.time()
o2 = msm_v2._plan_windows_sorted(digits + 1, inf, B)
jax.block_until_ready(o2[0])
print(f"plan (16 windows, warm): {(time.time()-t0)*1000:.0f} ms", flush=True)
bands, occm = msm_v2._model_bands(n, 16, max_h=64)
print(f"model bands: {bands}", flush=True)
prog = eng.window_program_bands(n, 16, bands, fast=True)
t0 = time.time()
out = prog(digits[0], x, y, inf, order[0], starts_p[0], counts_p[0],
           invperm[0])
jax.block_until_ready(out)
print(f"window program compile+first: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for w in range(3):
    out = prog(digits[w], x, y, inf, order[w], starts_p[w], counts_p[w],
               invperm[w])
jax.block_until_ready(out)
print(f"window program (fast+kar+merged bands): "
      f"{(time.time()-t0)/3*1000:.1f} ms", flush=True)

sb = jnp.asarray(rng.integers(0, 256, size=(n, 32), dtype=np.uint8))
pts20 = JPoints(x, y, jnp.ones_like(x).at[:, 1:].set(0))
msm_v2.msm_device_scheduled(bls.G1, pts20, sb)
sb2 = jnp.asarray(rng.integers(0, 256, size=(n, 32), dtype=np.uint8))
t0 = time.time()
msm_v2.msm_device_scheduled(bls.G1, pts20, sb2)
print(f"full 2^20 msm (fresh scalars): {time.time()-t0:.2f}s", flush=True)

# --- 4. WGROUP A/B -----------------------------------------------------------
if not os.environ.get("NO_WGROUP"):
    os.environ["CRYPTO_TPU_WGROUP"] = "4"
    t0 = time.time()
    msm_v2.msm_device_scheduled(bls.G1, pts20, sb)
    print(f"WGROUP=4 compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    msm_v2.msm_device_scheduled(bls.G1, pts20, sb2)
    print(f"WGROUP=4 full 2^20 msm: {time.time()-t0:.2f}s", flush=True)
    del os.environ["CRYPTO_TPU_WGROUP"]
