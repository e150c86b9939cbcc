"""Round-5 consolidated TPU session: correctness + the in-program
collective sharded-MSM path on the real chip + engine timings.

Stages (each prints immediately):
  1. 2^16 MSM vs known dlog (validates unified-levels + tree-combine + new
     model bands on real hardware)
  2. sharded MSM with the in-program all_gather combine on a 1-device TPU
     mesh (the TPU-default path of parallel/sharded_msm_v2.py, recorded
     per round-4 Weak #4)
  3. full 2^20 MSM wall clock (fresh scalars)
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
rng = np.random.default_rng(3)
import random
hrng = random.Random(17)
G = bls.G1.generator()

# --- 1. correctness at 2^16 (distinct full-range dlogs) ---------------------
n = 1 << 16
k = 256
dlogs = [hrng.randrange(1, bls.R) for _ in range(k)]
base_pts = [(G.mul_raw(a)).normalize() for a in dlogs]
P = jc.pack_points(base_pts)
pts = JPoints(jnp.tile(P.X, (n // k, 1)), jnp.tile(P.Y, (n // k, 1)),
              jnp.tile(P.Z, (n // k, 1)))
scal = [hrng.randrange(1, bls.R) for _ in range(n)]
t0 = time.time()
res = msm_v2.msm_device_scheduled(bls.G1, pts, scal, c=16)
print(f"2^16 msm ran in {time.time()-t0:.1f}s (incl compile)", flush=True)
expect_dlog = sum(s * dlogs[i % k] for i, s in enumerate(scal)) % bls.R
expect = G.mul_raw(expect_dlog)
assert res.normalize() == expect.normalize(), "MSM MISMATCH vs known dlog!"
print("2^16 correctness OK (duplicate bases -> exercises flag+rerun too)",
      flush=True)

# --- 2. in-program collective sharded MSM on the real chip ------------------
from jax.sharding import Mesh
from crypto_tpu.parallel.sharded_msm_v2 import msm_sharded_v2
n_s = 512
pts_s = []
dl_s = []
for _ in range(n_s):
    d = hrng.randrange(1, bls.R)
    dl_s.append(d)
    pts_s.append(G.mul_raw(d).normalize())
sc_s = [hrng.randrange(0, 1 << 64) for _ in range(n_s)]
mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
t0 = time.time()
out = msm_sharded_v2(bls.G1, pts_s, sc_s, mesh, c=8, nbits=64,
                     collective=True)
dt = time.time() - t0
exp = G.mul_raw(sum(s * d for s, d in zip(sc_s, dl_s)) % bls.R)
assert out.normalize() == exp.normalize(), "collective sharded MSM mismatch"
print(f"in-program all_gather sharded MSM OK on TPU mesh "
      f"({n_s} points, {dt:.1f}s incl compile) — the TPU-default "
      f"collective path of sharded_msm_v2", flush=True)

# --- 3. full 2^20 wall (fresh scalars, same program as bench.py) ------------
n = 1 << 20
from bench import make_bench_points  # noqa: E402  (repo-root import)
points, _dlog = make_bench_points(bls, jc, n, phase=lambda s: None)
words = rng.integers(0, 1 << 63, size=(n, 5), dtype=np.int64).astype(object)
scalars = [(int(w0) | (int(w1) << 63) | (int(w2) << 126)
            | (int(w3) << 189) | (int(w4) << 252)) % bls.R
           for (w0, w1, w2, w3, w4) in words]
from crypto_tpu.ops.pippenger import scalars_to_bytes
sb = jax.device_put(jnp.asarray(scalars_to_bytes(scalars, 32)))
msm_v2.msm_device_scheduled(bls.G1, points, sb)
sc2 = scalars[n // 2:] + scalars[:n // 2]
sb2 = jax.device_put(jnp.asarray(scalars_to_bytes(sc2, 32)))
t0 = time.time()
msm_v2.msm_device_scheduled(bls.G1, points, sb2)
print(f"full 2^20 msm (fresh scalars): {time.time()-t0:.2f}s", flush=True)
