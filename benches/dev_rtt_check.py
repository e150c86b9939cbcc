"""Measure per-call dispatch latency to the remote TPU: tiny jit op,
sequential dependent calls, and the mul kernel at several batch sizes."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

f = jax.jit(lambda a: a + 1)
x = jnp.zeros((8, 128), jnp.float32)
jax.block_until_ready(f(x))
for trial in range(3):
    t0 = time.time()
    y = x
    for _ in range(10):
        y = f(y)
    jax.block_until_ready(y)
    print(f"tiny-op x10 dependent: {time.time()-t0:.3f}s", flush=True)

t0 = time.time()
ys = [f(x + i) for i in range(10)]
jax.block_until_ready(ys)
print(f"tiny-op x10 independent: {time.time()-t0:.3f}s", flush=True)

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.fields.jfield import jfield_for
from crypto_tpu.ops.pallas.field_kernels import mont_mul_t_fn

J = jfield_for(bls.G1.K)
L = J.L
rng = np.random.default_rng(0)
fn = mont_mul_t_fn(L, J.p, J.field.Ninv_R)
for logb in (9, 13, 17, 20):
    B = 1 << logb
    vals = [int(v) for v in rng.integers(0, 2**60, size=64)]
    a = jnp.asarray(np.tile(np.asarray(J.pack(vals)).T, (1, B // 64)).copy())
    out = fn(a, a)
    jax.block_until_ready(out)
    t0 = time.time()
    y = out
    for _ in range(5):
        y = fn(y, a)
    jax.block_until_ready(y)
    dt = (time.time() - t0) / 5
    print(f"mul B=2^{logb}: {dt*1e3:.1f} ms/call -> {dt/B*1e9:.1f} ns/elem",
          flush=True)
