"""Quick relay health check: compile + run the standalone Mont-mul Pallas
kernel and one small XLA program on the TPU, with timing."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

print(f"backend={jax.default_backend()}", flush=True)

t0 = time.time()
x = jnp.ones((256, 256), jnp.float32)
y = jax.jit(lambda a: a @ a)(x)
jax.block_until_ready(y)
print(f"xla matmul compile+run: {time.time()-t0:.1f}s", flush=True)

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.fields.jfield import jfield_for
from crypto_tpu.ops.pallas.field_kernels import mont_mul_t_fn

J = jfield_for(bls.G1.K)
L = J.L
rng = np.random.default_rng(0)
vals = [int(x) for x in rng.integers(0, 2**60, size=512)]
a = jnp.asarray(np.asarray(J.pack(vals)).T.copy())

t0 = time.time()
fn = mont_mul_t_fn(L, J.p, J.field.Ninv_R)
out = fn(a, a)
jax.block_until_ready(out)
print(f"mont_mul pallas compile+run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
for _ in range(10):
    out = fn(out, a)
jax.block_until_ready(out)
print(f"mont_mul x10 steady: {time.time()-t0:.3f}s", flush=True)
