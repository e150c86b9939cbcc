"""Settle per-kernel throughput questions with iters=20 timings.

1. mulT raw (onehot Montgomery mul) at 2M
2. post kernel at 512k  /  pre at 512k
3. chunked prefix/down at 512k
4. XLA gather vs DMA gather at 128k rows (SMEM-safe chunk)
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
from crypto_tpu.curves.jcurve import jcurve_for
from crypto_tpu.ops import msm_v2
from crypto_tpu.ops.pallas.curve_kernels import (affine_kernels_for,
                                                 chunked_level_kernels_for)
from crypto_tpu.ops.pallas.field_kernels import mont_mul_t_fn, gather_rows_t_fn

jc = jcurve_for(bls.G1)
F = jc.F
L = F.L
rng = np.random.default_rng(5)


def timeit(label, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{label}: {dt*1000:.2f} ms", flush=True)
    return out


mulT = mont_mul_t_fn(L, F.p, F.field.Ninv_R)
m2 = 1 << 21
a = jnp.asarray(rng.integers(0, 1 << 15, size=(L, m2), dtype=np.int32))
b = jnp.asarray(rng.integers(0, 1 << 15, size=(L, m2), dtype=np.int32))
timeit("mulT 2M (= ns/elem /2.097)", jax.jit(lambda a, b: mulT(a, b)), a, b)

h = 1 << 19
pre, post = affine_kernels_for(L, F.p, F.field.Ninv_R)
xT = a[:, :h]; yT = b[:, :h]
mT = jnp.zeros((1, h), jnp.int32)
d, dbl, inf3 = timeit("pre 512k", jax.jit(lambda *z: pre(*z)),
                      xT, yT, mT, yT, xT, mT)
dinv = jnp.asarray(rng.integers(0, 1 << 15, size=(L, h), dtype=np.int32))
timeit("post 512k", jax.jit(lambda *z: post(*z)),
       xT, yT, yT, xT, dinv, dbl, mT, mT)

bi = jax.jit(lambda v: msm_v2.batch_inv_t(F, v, mulT))
timeit("batch_inv_t 512k (tree)", bi, d)

cp, cd = chunked_level_kernels_for(L, F.p, F.field.Ninv_R)
pref, tot, mdbl, minf = timeit("chunk prefix 512k", jax.jit(lambda *z: cp(*z)),
                               xT, yT, mT, yT, xT, mT)
tinv = jnp.asarray(rng.integers(0, 1 << 15, size=(L, h // 8), dtype=np.int32))
timeit("chunk down 512k", jax.jit(lambda *z: cd(*z)),
       xT, yT, mT, yT, xT, mT, pref, tinv, mdbl)
timeit("chunk totals inv (64k tree)", bi, tot)

# gathers at 128k rows
n = 1 << 20
M = 1 << 17
xy = jnp.asarray(rng.integers(0, 1 << 30, size=(n, L), dtype=np.int32))
idx = jnp.asarray(rng.integers(0, n, size=(M,), dtype=np.int32))
timeit("XLA gather 128k rows", jax.jit(lambda p, i: p[i].T), xy, idx)
for nc in (16, 32, 64):
    try:
        g = gather_rows_t_fn(L, block_b=2048, nchunk=nc)
        timeit(f"DMA gather 128k rows nchunk={nc}",
               jax.jit(lambda p, i, g=g: g(p, i)), xy, idx)
    except Exception as e:
        print(f"DMA nchunk={nc} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
# XLA gather on 128-padded rows: does row width change latency?
xy128 = jnp.concatenate([xy, jnp.zeros((n, 128 - L), jnp.int32)], axis=1)
timeit("XLA gather 128k rows (128-wide)", jax.jit(lambda p, i: p[i]),
       xy128, idx)
# and 52-wide (2 points packed per row)
xy52 = jnp.concatenate([xy, xy], axis=1)
idx2 = idx[: M // 2]
timeit("XLA gather 64k rows (52-wide)", jax.jit(lambda p, i: p[i]),
       xy52, idx2)
