"""Round-4 phase profile: bands window program, gather strategies, mul cost.

Phases measured (one window at 2^20, c=16, band layout):
  1. XLA packed-row gather (slots rows of (U,) int32)   [current default]
  2. DMA scalar-prefetch gather (gather_rows_t_fn)      [candidate]
  3. mulT raw throughput at 1M / 2M (block 512 onehot)
  4. pre / batch_inv_t / post at 512k pairs
  5. full window program (bands) end to end
  6. plan program (all 16 windows)
"""
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
from crypto_tpu.ops.pallas.field_kernels import mont_mul_t_fn, gather_rows_t_fn

logn = int(os.environ.get("N", "20"))
n = 1 << logn
c = 16
B = 1 << (c - 1)
rng = np.random.default_rng(7)
jc = jcurve_for(bls.G1)
F = jc.F
L = F.L


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


# --- payload + indices matching the real layout scale --------------------
SLOTS = int(1.25 * n)
SLOTS -= SLOTS % 2048
xy = jnp.asarray(rng.integers(0, 1 << 30, size=(n, L), dtype=np.int32))
idx = jnp.asarray(rng.integers(0, n, size=(SLOTS,), dtype=np.int32))
# ~12% dead slots like the band layout
dead = jnp.asarray(rng.random(SLOTS) < 0.12)
idx_dma = jnp.where(dead, -1, idx)

g1 = jax.jit(lambda xy, i: xy[i].T)
timeit(f"XLA gather {SLOTS/1e6:.2f}M rows (U={L})", g1, xy, idx)

g2 = jax.jit(lambda xy, i: gather_rows_t_fn(L)(xy, i))
try:
    timeit(f"DMA gather {SLOTS/1e6:.2f}M rows (U={L})", g2, xy, idx_dma)
except Exception as e:
    print(f"DMA gather FAILED: {type(e).__name__}: {e}", flush=True)

# --- raw mul throughput ----------------------------------------------------
mulT = mont_mul_t_fn(L, F.p, F.field.Ninv_R)
for m in (1 << 20, 1 << 21):
    a = jnp.asarray(rng.integers(0, 1 << 15, size=(L, m), dtype=np.int32))
    timeit(f"mulT {m>>20}M", jax.jit(lambda a, b: mulT(a, b)), a, a)

# --- pre / inv / post at 512k pairs -----------------------------------------
h = 1 << 19
pre, post = affine_kernels_for(L, F.p, F.field.Ninv_R)
xT = jnp.asarray(rng.integers(0, 1 << 15, size=(L, h), dtype=np.int32))
yT = jnp.asarray(rng.integers(0, 1 << 15, size=(L, h), dtype=np.int32))
mT = jnp.zeros((1, h), jnp.int32)
pre_j = jax.jit(lambda *a: pre(*a))
d, dbl, inf3 = timeit("pre 512k", pre_j, xT, yT, mT, yT, xT, mT)
bi = jax.jit(lambda v: msm_v2.batch_inv_t(F, v, mulT))
dinv = timeit("batch_inv_t 512k", bi, d)
post_j = jax.jit(lambda *a: post(*a))
timeit("post 512k", post_j, xT, yT, yT, xT, dinv, dbl, mT, mT)

# --- full real MSM with per-window wall clocks ------------------------------
from crypto_tpu.ops.pippenger import scalars_to_bytes
words = rng.integers(0, 1 << 62, size=(n, 4), dtype=np.int64)
scalars = [int(w0) | (int(w1) << 62) | (int(w2) << 124) | (int(w3) << 186)
           for (w0, w1, w2, w3) in words[:256]]
# full-size digit tensor without the python bigint cost: random int16 digits
digits = jnp.asarray(
    rng.integers(-(1 << 15) + 1, 1 << 15, size=(16, n), dtype=np.int32))
x = jnp.asarray(rng.integers(0, 1 << 15, size=(n, L), dtype=np.int32))
y = jnp.asarray(rng.integers(0, 1 << 15, size=(n, L), dtype=np.int32))
inf = jnp.zeros((n,), bool)

eng = msm_v2._engine_for(jc)
t0 = time.time()
(order, starts_p, counts_p, invperm, nprof_d,
 occs_d) = msm_v2._plan_windows_sorted(digits, inf, B)
nprof, occs = (np.asarray(jax.device_get(nprof_d)),
               np.maximum(np.asarray(jax.device_get(occs_d)), 1))
jax.block_until_ready(order)
print(f"plan_windows_sorted (16 windows, cold-ish): {(time.time()-t0)*1000:.0f} ms",
      flush=True)
bands = msm_v2._build_bands(nprof.max(axis=0), int(occs.max()), B, max_h=64)
slots = sum(Q * h for (Q, h, _) in bands)
print(f"bands: {bands} slots={slots} ({slots/n:.3f} N)", flush=True)

prog = eng.window_program_bands(n, c, bands)
w = 0
out = prog(digits[w], x, y, inf, order[w], starts_p[w], counts_p[w], invperm[w])
jax.block_until_ready(out)
t0 = time.time()
for w in range(3):
    out = prog(digits[w], x, y, inf, order[w], starts_p[w], counts_p[w],
               invperm[w])
jax.block_until_ready(out)
print(f"window program (bands): {(time.time()-t0)/3*1000:.1f} ms", flush=True)

# plan re-run warm
t0 = time.time()
o2 = msm_v2._plan_windows_sorted(digits, inf, B)
jax.block_until_ready(o2[0])
print(f"plan_windows_sorted warm: {(time.time()-t0)*1000:.1f} ms", flush=True)
