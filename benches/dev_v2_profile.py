"""Break down msm_v2 window cost on TPU: sort vs layout vs reduce vs tail."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import crypto_tpu.jax_setup  # noqa
import jax
import jax.numpy as jnp

from crypto_tpu.fields.jfield import set_carry_mode, jfield_for
set_carry_mode("ks")

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jcurve import jcurve_for
from crypto_tpu.ops import msm_v2

logn = int(os.environ.get("N", "20"))
n = 1 << logn
c = 16
B = 1 << (c - 1)
PAD = 64
rng = np.random.default_rng(1)
jc = jcurve_for(bls.G1)
F = jc.F

def timeit(label, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1000:.1f} ms", flush=True)
    return out

# random digits + coords directly on device (content irrelevant for perf)
dw = jnp.asarray(rng.integers(-(1 << 15) + 1, 1 << 15, size=n, dtype=np.int32))
x = jnp.asarray(rng.integers(0, 1 << 15, size=(n, F.L), dtype=np.int32))
y = jnp.asarray(rng.integers(0, 1 << 15, size=(n, F.L), dtype=np.int32))
inf = jnp.zeros((n,), bool)

# 1. sort alone
sort_fn = jax.jit(lambda k: jnp.argsort(k, stable=True))
timeit("argsort 1M", sort_fn, jnp.abs(dw))

# 2. layout alone (sort + searchsorted + gathers)
def layout(dw, x, y, inf):
    absd = jnp.abs(dw)
    live = (absd > 0) & (~inf)
    keys = jnp.where(live, absd - 1, B).astype(jnp.int32)
    order = jnp.argsort(keys, stable=True)
    sk = keys[order]
    starts = jnp.searchsorted(sk, jnp.arange(B, dtype=jnp.int32))
    ends = jnp.searchsorted(sk, jnp.arange(1, B + 1, dtype=jnp.int32))
    counts = (ends - starts).astype(jnp.int32)
    bgrid = jnp.repeat(jnp.arange(B, dtype=jnp.int32), PAD)
    rgrid = jnp.tile(jnp.arange(PAD, dtype=jnp.int32), B)
    pos = starts[bgrid] + rgrid
    valid = rgrid < counts[bgrid]
    srcp = jnp.where(valid, order[jnp.where(valid, pos, 0)], 0)
    sx = x[srcp]
    sy = y[srcp]
    return sx, sy, valid
layout_jit = jax.jit(layout)
sx, sy, valid = timeit("layout (sort+gather)", layout_jit, dw, x, y, inf)

# 3. batch_inv alone at 1M
v = jnp.asarray(rng.integers(1, 1 << 15, size=(B * PAD // 2, F.L), dtype=np.int32))
bi = jax.jit(lambda v: msm_v2.batch_inv(F, v))
timeit("batch_inv 2M", bi, v)

# 4. one affine halving level at B*PAD
def halve(sx, sy, valid):
    P = msm_v2.AffinePoints(sx, sy, ~valid)
    return msm_v2.affine_halve(F, P).x
timeit("affine_halve 2M->1M", jax.jit(halve), sx, sy, valid)

# 5. full bucket_sums
eng = msm_v2._engine_for(jc)
bs = jax.jit(lambda dw, x, y, inf: eng.bucket_sums_fn(c, PAD)(dw, x, y, inf)[0].x)
timeit("bucket_sums full", bs, dw, x, y, inf, iters=1)

# 6. tail alone
bx = jnp.asarray(rng.integers(0, 1 << 15, size=(B, F.L), dtype=np.int32))
byy = jnp.asarray(rng.integers(0, 1 << 15, size=(B, F.L), dtype=np.int32))
binf = jnp.zeros((B,), bool)
tail = jax.jit(lambda a, b2, c2: eng.tail_fn(c)(a, b2, c2)[0])
timeit("tail (32k buckets)", tail, bx, byy, binf, iters=1)

# 7. raw pallas mul throughput at 2M batch
from crypto_tpu.ops.pallas.field_kernels import mont_mul_batched
mm = jax.jit(lambda a, b2: F.mul(a, b2))
big = jnp.asarray(rng.integers(0, 1 << 15, size=(1 << 21, F.L), dtype=np.int32))
timeit("F.mul 2M", mm, big, big)
