"""Measure msm_v2 (device-scheduled batched-affine) at 2^N on TPU."""
import os
import sys
import time

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
from crypto_tpu.ops.pippenger import scalars_to_bytes

logn = int(os.environ.get("N", "20"))
n = 1 << logn
rng = np.random.default_rng(0)
jc = jcurve_for(bls.G1)

# build distinct points on device (same construction as bench.py)
from crypto_tpu.ops.pallas.curve_kernels import make_add_fns, make_normalize_fn
add_fn, _a, _d = make_add_fns(jc)
base = bls.G1.generator()
k = 64
m = n // k
A_host = [base.mul_raw((1 << 40) + i) for i in range(k)]
A = jc.pack_points([p.normalize() for p in A_host])
B = jc.pack_points([bls.G1.infinity()])
step_pt = base.mul_raw(1 << 41)
while B.X.shape[0] < m:
    sp = jc.pack_points([step_pt.normalize()])
    ln = B.X.shape[0]
    stepb = JPoints(jnp.tile(sp.X, (ln, 1)), jnp.tile(sp.Y, (ln, 1)),
                    jnp.tile(sp.Z, (ln, 1)))
    shifted, _f = add_fn(B, stepb)
    B = JPoints(jnp.concatenate([B.X, shifted.X]),
                jnp.concatenate([B.Y, shifted.Y]),
                jnp.concatenate([B.Z, shifted.Z]))
    step_pt = step_pt.double()
B = JPoints(B.X[:m], B.Y[:m], B.Z[:m])
Arep = JPoints(jnp.repeat(A.X, m, axis=0), jnp.repeat(A.Y, m, axis=0),
               jnp.repeat(A.Z, m, axis=0))
Brep = JPoints(jnp.tile(B.X, (k, 1)), jnp.tile(B.Y, (k, 1)),
               jnp.tile(B.Z, (k, 1)))
jac_points, _f = add_fn(Arep, Brep)
points = make_normalize_fn(jc)(jac_points)
jax.block_until_ready(points.X)
print("points built", flush=True)

# full-range Fr scalars (4x64-bit words mod R); the old 63-bit-seeded
# construction only spanned ~190 bits, skewing window 11 and emptying 12-15
words = rng.integers(0, 1 << 63, size=(n, 4), dtype=np.int64).astype(object)
scalars = [int(w0) | (int(w1) << 63) | (int(w2) << 126) | (int(w3) << 189)
           for (w0, w1, w2, w3) in words]
scalars = [s % bls.R for s in scalars]

t0 = time.time()
sbytes = scalars_to_bytes(scalars, 32)
print(f"scalars->bytes: {time.time()-t0:.2f}s", flush=True)

# ground truth (2^14 and below only; too slow otherwise)
t0 = time.time()
out = msm_v2.msm_device_scheduled(bls.G1, points, sbytes)
print(f"msm_v2 (cold, incl compile): {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
out2 = msm_v2.msm_device_scheduled(bls.G1, points, sbytes)
dt = time.time() - t0
print(f"msm_v2 (warm): {dt:.2f}s -> {n/dt:.0f} pts/s "
      f"(vs_baseline {n/dt/260000:.3f})", flush=True)
assert out.normalize() == out2.normalize()

if logn <= 14:
    from crypto_tpu.ops.pippenger import msm_pippenger
    ref = msm_pippenger(bls.G1, points, scalars,
                        inf_mask=np.zeros(n, dtype=bool), points_affine=True)
    assert out.normalize() == ref.normalize(), "v2 != v1 result"
    print("v2 == v1 OK", flush=True)
