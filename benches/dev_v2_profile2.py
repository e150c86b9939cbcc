"""Profile the FUSED v2 path: pre/post kernels, batch_inv_t, Jacobian tail."""
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
from crypto_tpu.curves.jcurve import jcurve_for
from crypto_tpu.ops import msm_v2
from crypto_tpu.ops.pallas.curve_kernels import affine_kernels_for
from crypto_tpu.ops.pallas.field_kernels import mont_mul_t_fn

c = 16
B = 1 << (c - 1)
PAD = 64
M = B * PAD
rng = np.random.default_rng(2)
jc = jcurve_for(bls.G1)
F = jc.F
L = F.L

pre, post = affine_kernels_for(L, F.p, F.field.Ninv_R)
mulT = mont_mul_t_fn(L, F.p, F.field.Ninv_R)


def timeit(label, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label}: {(time.time()-t0)/iters*1000:.1f} ms", flush=True)
    return out

h = M // 2
xT = jnp.asarray(rng.integers(0, 1 << 15, size=(L, h), dtype=np.int32))
yT = jnp.asarray(rng.integers(0, 1 << 15, size=(L, h), dtype=np.int32))
mT = jnp.zeros((1, h), jnp.int32)

# raw transposed mul at 1M
timeit("mulT 1M", jax.jit(lambda a, b: mulT(a, b)), xT, yT)

# pre kernel at 1M pairs
pre_j = jax.jit(lambda a, b, m, c2, d2, m2: pre(a, b, m, c2, d2, m2))
d, dbl, inf3 = timeit("pre 1M", pre_j, xT, yT, mT, yT, xT, mT)

# batch_inv_t at 1M
bi = jax.jit(lambda v: msm_v2.batch_inv_t(F, v, mulT))
dinv = timeit("batch_inv_t 1M", bi, d)

# post kernel at 1M
post_j = jax.jit(lambda *a: post(*a))
timeit("post 1M", post_j, xT, yT, yT, xT, dinv, dbl, mT, mT)

# full fused halving chain 2M -> 32k (one window's bucket_sums minus layout)
eng = msm_v2._engine_for(jc)
bsf = eng.bucket_sums_fn(c, PAD, 1)
dw = jnp.asarray(rng.integers(-(1 << 15) + 1, 1 << 15, size=(1 << 20,), dtype=np.int32))
x = jnp.asarray(rng.integers(0, 1 << 15, size=(1 << 20, L), dtype=np.int32))
y = jnp.asarray(rng.integers(0, 1 << 15, size=(1 << 20, L), dtype=np.int32))
inf = jnp.zeros((1 << 20,), bool)
bs_j = jax.jit(lambda *a: bsf(*a)[0].x)
timeit("bucket_sums fused (1 window)", bs_j, dw, x, y, inf, iters=1)

# Jacobian tail
bx = jnp.asarray(rng.integers(0, 1 << 15, size=(B, L), dtype=np.int32))
byy = jnp.asarray(rng.integers(0, 1 << 15, size=(B, L), dtype=np.int32))
binf = jnp.zeros((B,), bool)
tail = jax.jit(lambda a, b2, c2: eng.tail_fn(c)(a, b2, c2)[0])
timeit("tail jac (32k buckets)", tail, bx, byy, binf, iters=1)
