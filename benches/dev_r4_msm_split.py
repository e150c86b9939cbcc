"""Where do the 8 s go? Phase-split of msm_device_scheduled at 2^20.

Also splits the window program: gather-only vs gather+levels vs full.
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

(order, starts_p, counts_p, invperm, nprof_d,
 occs_d) = msm_v2._plan_windows_sorted(digits, inf, B)
nprof, occs = (np.asarray(jax.device_get(nprof_d)),
               np.maximum(np.asarray(jax.device_get(occs_d)), 1))
bands = msm_v2._build_bands(nprof.max(axis=0), int(occs.max()), B, max_h=64)

# --- window program phase splits ------------------------------------------
bs_fn = eng._bucket_sums_tpu_bands(c, bands)
halve_t, pair_add_t, U, ush = eng._fused_ctx()


def gather_only(dw, xx, yy, infm, order_w, starts_w, counts_w):
    y_signed = F.select(dw < 0, F.neg(yy), yy)
    xy = (xx | (y_signed << 15)).reshape(xx.shape[0], -1)
    acc = jnp.zeros((), jnp.int32)
    for (Q, h, r0) in bands:
        bgrid = jnp.tile(jnp.arange(Q, dtype=jnp.int32), h)
        rank = jnp.repeat(jnp.arange(h, dtype=jnp.int32), Q) + r0
        pos = starts_w[bgrid] + rank
        valid = rank < counts_w[bgrid]
        srcp = jnp.where(valid, order_w[jnp.where(valid, pos, 0)], 0)
        sxyT = xy[srcp].T
        acc = acc + jnp.sum(sxyT[0])
    return acc


def levels_too(dw, xx, yy, infm, order_w, starts_w, counts_w):
    P, _flag = bs_fn(dw, xx, yy, infm, order_w, starts_w, counts_w)
    return P.x


def timeit(label, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label}: {(time.time()-t0)/iters*1000:.1f} ms", flush=True)


timeit("gather only", jax.jit(gather_only), digits[0], x, y, inf,
       order[0], starts_p[0], counts_p[0])
timeit("gather+levels", jax.jit(levels_too), digits[0], x, y, inf,
       order[0], starts_p[0], counts_p[0])
prog = eng.window_program_bands(n, c, bands)
timeit("full window", prog, digits[0], x, y, inf, order[0], starts_p[0],
       counts_p[0], invperm[0])

# --- end-to-end msm with host phase stamps ---------------------------------
sb = jnp.asarray(rng.integers(0, 256, size=(n, 32), dtype=np.uint8))
pts = msm_v2.JPoints(x, y, jnp.ones_like(x).at[:, 1:].set(0))

res = msm_v2.msm_device_scheduled(bls.G1, pts, sb)    # warm all programs
t0 = time.time()
res = msm_v2.msm_device_scheduled(bls.G1, pts, sb)
print(f"msm_device_scheduled total: {time.time()-t0:.2f} s", flush=True)

# manual reconstruction with stamps
t0 = time.time()
dig = msm_v2.device_digits(sb, c, 255)
jax.block_until_ready(dig)
t1 = time.time()
(order, starts_p, counts_p, invperm, nprof_d,
 occs_d) = msm_v2._plan_windows_sorted(dig, inf, B)
nprof2, occs2 = (np.asarray(jax.device_get(nprof_d)),
                 np.maximum(np.asarray(jax.device_get(occs_d)), 1))
t2 = time.time()
bands2 = msm_v2._build_bands(nprof2.max(axis=0), int(occs2.max()), B, 64)
prog2 = eng.window_program_bands(n, c, bands2)
wouts = []
for w in range(16):
    wouts.append(prog2(dig[w], x, y, inf, order[w], starts_p[w], counts_p[w],
                       invperm[w]))
jax.block_until_ready(wouts[-1])
t3 = time.time()
xs = jnp.stack([o[0] for o in wouts])
ys = jnp.stack([o[1] for o in wouts])
infs = jnp.stack([o[2] for o in wouts])
hx = np.atleast_1d(F.unpack_host(xs))
hy = np.atleast_1d(F.unpack_host(ys))
hinf = np.asarray(jax.device_get(infs))
t4 = time.time()
print(f"digits: {t1-t0:.2f}s plan: {t2-t1:.2f}s windows: {t3-t2:.2f}s "
      f"collect/unpack: {t4-t3:.2f}s", flush=True)
