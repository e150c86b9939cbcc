"""Round-5 phase split at 2^20/c=16 with the CANONICAL model bands (the
bench.py program — every timing here shares the persistent compile cache
with the driver's bench run).

Stages (each prints immediately; gate the extra-compile stages with env):
  1. plan + full window program (bench-shared programs)
  2. gather-only split                       [skip: NO_SPLIT=1]
  3. mul-kernel speed-of-light at level width [skip: NO_MUL=1]
  4. batch_inv_t latency share               [skip: NO_INV=1]
  5. WGROUP=4 grouped program A/B            [only: WGROUP_AB=1]
  6. full msm_device_scheduled wall          [skip: NO_FULL=1]
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
set_carry_mode(os.environ.get("CRYPTO_TPU_CARRY", "ks"))

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jcurve import jcurve_for
from crypto_tpu.ops import msm_v2

logn = int(os.environ.get("N", "20"))
n = 1 << logn
c = 16
B = 1 << (c - 1)
rng = np.random.default_rng(7)
jc = jcurve_for(bls.G1)
F = jc.F
L = F.L

digits = jnp.asarray(
    rng.integers(-(1 << 15) + 1, 1 << 15, size=(16, n), dtype=np.int32))
x = jnp.asarray(rng.integers(0, 1 << 15, size=(n, L), dtype=np.int32))
y = jnp.asarray(rng.integers(0, 1 << 15, size=(n, L), dtype=np.int32))
inf = jnp.zeros((n,), bool)

eng = msm_v2._engine_for(jc)


def timeit(label, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label}: {(time.time()-t0)/iters*1000:.1f} ms", flush=True)


# --- 1. plan + bench-shared window program ---------------------------------
t0 = time.time()
(order, starts_p, counts_p, invperm, nprof_d,
 occs_d) = msm_v2._plan_windows_sorted(digits, inf, B)
jax.block_until_ready(order)
print(f"plan compile+first: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
o2 = msm_v2._plan_windows_sorted(digits + 1, inf, B)
jax.block_until_ready(o2[0])
print(f"plan warm: {(time.time()-t0)*1000:.0f} ms", flush=True)

top_keys = (bls.R >> ((16 - 1) * c)) + 1 if c == 16 else None
bands, occm = msm_v2._model_bands(n, c, max_h=64, top_keys=top_keys)
total_slots = sum(Q * h for (Q, h, r0) in bands)
print(f"model bands ({len(bands)}): {bands}\n"
      f"total slots: {total_slots} ({total_slots/n:.3f}N)", flush=True)
prog = eng.window_program_bands(n, c, bands, fast=True)
t0 = time.time()
out = prog(digits[0], x, y, inf, order[0], starts_p[0], counts_p[0],
           invperm[0])
jax.block_until_ready(out)
print(f"window program compile+first: {time.time()-t0:.1f}s", flush=True)
timeit("full window (fast, model bands)", prog, digits[0], x, y, inf,
       order[0], starts_p[0], counts_p[0], invperm[0])

# --- 2. gather-only --------------------------------------------------------
if not os.environ.get("NO_SPLIT"):
    bgrid_cat, rank_cat = eng.band_grids(bands)

    def gather_only(dw, xx, yy, infm, order_w, starts_w, counts_w,
                    bgrid, rank):
        y_signed = F.select(dw < 0, F.neg(yy), yy)
        xy = (xx | (y_signed << 15)).reshape(xx.shape[0], -1)
        if xy.shape[1] < 128:
            xy = jnp.concatenate(
                [xy, jnp.zeros((xy.shape[0], 128 - xy.shape[1]),
                               jnp.int32)], axis=1)
        pos = starts_w[bgrid] + rank
        valid = rank < counts_w[bgrid]
        srcp = jnp.where(valid, order_w[jnp.where(valid, pos, 0)], 0)
        sxyT = xy[srcp].T[:L]
        return jnp.sum(sxyT[0])

    timeit("gather only", jax.jit(gather_only), digits[0], x, y, inf,
           order[0], starts_p[0], counts_p[0], bgrid_cat, rank_cat)

# --- 3. mul speed-of-light -------------------------------------------------
if not os.environ.get("NO_MUL"):
    from crypto_tpu.ops.pallas.field_kernels import mont_mul_t_fn
    mulT = mont_mul_t_fn(F.L, F.p, F.field.Ninv_R)
    M = total_slots // 2 // 512 * 512     # ~first-level pair count
    a_t = jnp.asarray(rng.integers(0, 1 << 15, size=(L, M), dtype=np.int32))
    b_t = jnp.asarray(rng.integers(0, 1 << 15, size=(L, M), dtype=np.int32))
    mj = jax.jit(mulT)
    out = mj(a_t, b_t); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = mj(out, b_t)
    jax.block_until_ready(out)
    per = (time.time() - t0) / 3 / M * 1e9
    print(f"mont_mul_t at width {M}: {per:.1f} ns/elem "
          f"(window mul bound ~{7*total_slots*per/1e6:.0f} ms)", flush=True)

# --- 4. batch_inv_t latency ------------------------------------------------
if not os.environ.get("NO_INV"):
    from crypto_tpu.ops.pallas.field_kernels import mont_mul_t_fn
    mulT = mont_mul_t_fn(F.L, F.p, F.field.Ninv_R)
    for w in (1 << 14, 1 << 10, 1 << 6):
        v = jnp.asarray(rng.integers(1, 1 << 15, size=(L, w),
                                     dtype=np.int32))
        fn = jax.jit(lambda vv: msm_v2.batch_inv_t(F, vv, mulT))
        timeit(f"batch_inv_t width {w}", fn, v)

# --- 5. WGROUP A/B ---------------------------------------------------------
if os.environ.get("WGROUP_AB"):
    G = int(os.environ.get("WGROUP_AB"))
    gprog = eng.window_program_bands_group(n, c, bands, G, fast=True)
    t0 = time.time()
    gout = gprog(digits[:G], x, y, inf, order[:G], starts_p[:G],
                 counts_p[:G], invperm[:G])
    jax.block_until_ready(gout)
    print(f"WGROUP={G} compile+first: {time.time()-t0:.1f}s", flush=True)

    def run_grouped(dws, orders, startss, countss, invperms):
        outs = []
        for g0 in range(0, 16, G):
            sl = slice(g0, g0 + G)
            outs.append(gprog(dws[sl], x, y, inf, orders[sl], startss[sl],
                              countss[sl], invperms[sl]))
        return outs

    timeit(f"16 windows via WGROUP={G}", run_grouped, digits, order,
           starts_p, counts_p, invperm, iters=1)

    def run_single(dws, orders, startss, countss, invperms):
        return [prog(dws[w], x, y, inf, orders[w], startss[w], countss[w],
                     invperms[w]) for w in range(16)]

    timeit("16 windows via single program", run_single, digits, order,
           starts_p, counts_p, invperm, iters=1)

# --- 6. full MSM -----------------------------------------------------------
if not os.environ.get("NO_FULL"):
    sb = jnp.asarray(rng.integers(0, 256, size=(n, 32), dtype=np.uint8))
    sb2 = jnp.asarray(rng.integers(0, 256, size=(n, 32), dtype=np.uint8))
    pts = msm_v2.JPoints(x, y, jnp.ones_like(x).at[:, 1:].set(0))
    msm_v2.msm_device_scheduled(bls.G1, pts, sb)
    t0 = time.time()
    msm_v2.msm_device_scheduled(bls.G1, pts, sb2)
    print(f"full 2^20 msm (fresh scalars): {time.time()-t0:.2f}s",
          flush=True)
