"""Decompose MSM wall-clock: host scheduling vs transfers vs device compute."""
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
from crypto_tpu.ops import pippenger as pip

logn = int(os.environ.get("N", "18"))
n = 1 << logn
rng = np.random.default_rng(0)

jc = jcurve_for(bls.G1)

# points: reuse the bench's construction but smaller k
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

scalars = [int(x) for x in rng.integers(1, 1 << 63, size=n)]
scalars = [(s * (s + 1) * 0x9E3779B97F4A7C15) % bls.R for s in scalars]
inf_mask = np.zeros(n, dtype=bool)

c = pip._auto_c(n)
nbits = bls.G1.scalar_field.bits

# 1. host: digits
t0 = time.time()
digits = pip.signed_digits(scalars, c, nbits)
t_digits = time.time() - t0
print(f"digits: {t_digits:.2f}s", flush=True)

# 2. host: plans
t0 = time.time()
W = digits.shape[0]
pool_base = n + 1
plans = []
pool_size = pool_base
for w in range(W):
    plan, end = pip.plan_window(digits[w], inf_mask, c, pool_base, True)
    plans.append(plan)
    pool_size = max(pool_size, end)
    for lv in plan.levels:
        pool_size = max(pool_size, lv.out_offset + pip._round_up(lv.n_pairs))
t_plan = time.time() - t0
print(f"plans:  {t_plan:.2f}s", flush=True)

sig = pip.canonical_signature(plans)
pool_size += max((s for s, _ in sig), default=0)
engine = pip._engine_for(jc, "pallas")
print("sig:", sig, "pool:", pool_size, flush=True)

# 3. build per-window args on host (pad) and measure transfer separately
t0 = time.time()
all_args = []
for w in range(W):
    plan = plans[w]
    offsets = []
    args = []
    for li, (size, affine) in enumerate(sig):
        pad_off = pool_size - size
        if li < len(plan.levels):
            lv = plan.levels[li]
            pad = size - lv.n_pairs
            args.append(np.concatenate([lv.a_idx, np.zeros(pad, np.int32)]))
            args.append(np.concatenate([lv.b_idx, np.zeros(pad, np.int32)]))
            args.append(np.concatenate([lv.sa, np.ones(pad, np.int32)]))
            args.append(np.concatenate([lv.sb, np.ones(pad, np.int32)]))
            offsets.append(lv.out_offset)
        else:
            zeros = np.zeros(size, np.int32)
            ones = np.ones(size, np.int32)
            args.extend([zeros, zeros, ones, ones])
            offsets.append(pad_off)
    nb2 = 1 << (c - 1)
    src = np.zeros(nb2, dtype=np.int32)
    sgn = np.ones(nb2, dtype=np.int32)
    src[:nb2] = plan.bucket_src[1:nb2 + 1]
    sgn[:nb2] = plan.bucket_sign[1:nb2 + 1]
    all_args.append((np.asarray(offsets, np.int32), src, sgn, args))
t_pad = time.time() - t0
nbytes = sum(sum(a.nbytes for a in aa[3]) + aa[0].nbytes + aa[1].nbytes
             + aa[2].nbytes for aa in all_args)
print(f"pad:    {t_pad:.2f}s, arg bytes total {nbytes/1e6:.1f} MB", flush=True)

# 4. transfer all args to device
t0 = time.time()
dev_args = []
for offs, src, sgn, args in all_args:
    dev_args.append((jax.device_put(jnp.asarray(offs)),
                     jax.device_put(jnp.asarray(src)),
                     jax.device_put(jnp.asarray(sgn)),
                     [jax.device_put(jnp.asarray(a)) for a in args]))
jax.block_until_ready([a for aa in dev_args for a in aa[3]])
t_xfer = time.time() - t0
print(f"xfer:   {t_xfer:.2f}s ({nbytes/1e6/t_xfer:.0f} MB/s)", flush=True)

# 5. pool + compile
pool0 = pip._pool_for(jc, points, pool_size)
nb2 = 1 << (c - 1)
prog = engine._window_prog(sig, nb2)
t0 = time.time()
px, py, pz = pool0.X, pool0.Y, pool0.Z
out = prog(px, py, pz, dev_args[0][0], dev_args[0][1], dev_args[0][2],
           *dev_args[0][3])
jax.block_until_ready(out[3])
t_compile_first = time.time() - t0
print(f"window0 (incl compile): {t_compile_first:.2f}s", flush=True)
px, py, pz = out[0], out[1], out[2]

# 6. steady-state: remaining windows, all args pre-staged
t0 = time.time()
outs = []
for w in range(1, W):
    offs, src, sgn, args = dev_args[w]
    out = prog(px, py, pz, offs, src, sgn, *args)
    px, py, pz = out[0], out[1], out[2]
    outs.append(out[3:])
jax.block_until_ready(outs[-1])
t_dev = time.time() - t0
print(f"device steady: {t_dev:.2f}s for {W-1} windows "
      f"({t_dev/(W-1)*1000:.0f} ms/window)", flush=True)

total_est = t_digits + t_plan + t_pad + t_xfer + t_dev / (W - 1) * W
print(f"TOTAL est {total_est:.2f}s -> {n/total_est:.0f} pts/s", flush=True)
