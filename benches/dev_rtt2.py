"""Fine-grained step timing on the axon TPU with forced device_get syncs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(msg, t0):
    print(f"[{time.time()-START:7.1f}s] {msg}: {time.time()-t0:.3f}s",
          flush=True)

START = time.time()

f = jax.jit(lambda a: a + 1)
x = jnp.zeros((8, 128), jnp.float32)
t0 = time.time(); v = jax.device_get(f(x)); log("tiny first (compile)", t0)
t0 = time.time(); v = jax.device_get(f(x)); log("tiny devget", t0)
t0 = time.time()
y = x
for _ in range(10):
    y = f(y)
v = jax.device_get(y)
log("tiny x10 dependent devget", t0)

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.fields.jfield import jfield_for
from crypto_tpu.ops.pallas.field_kernels import mont_mul_t_fn

J = jfield_for(bls.G1.K)
L = J.L
rng = np.random.default_rng(0)
fn = jax.jit(mont_mul_t_fn(L, J.p, J.field.Ninv_R))
B = 512
vals = [int(v) for v in rng.integers(0, 2**60, size=64)]
a = jnp.asarray(np.tile(np.asarray(J.pack(vals)).T, (1, B // 64)).copy())
t0 = time.time(); out = fn(a, a); _ = jax.device_get(out)
log("mul first (compile)", t0)
t0 = time.time(); out2 = fn(out, a); _ = jax.device_get(out2)
log("mul second (maybe layout recompile)", t0)
t0 = time.time(); out3 = fn(out2, a); _ = jax.device_get(out3)
log("mul third", t0)
t0 = time.time()
y = out3
for _ in range(10):
    y = fn(y, a)
_ = jax.device_get(y)
log("mul x10 dependent", t0)
