"""Round-5 phase split of the warm 2^20 MSM (bands path): digits, plan
(+host pull), window-program calls, tail/host accumulation.  Run AFTER
bench.py has warmed the caches; varies scalars between warmup and timed
runs (the axon relay memoizes identical executions).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import crypto_tpu.jax_setup  # noqa

if not os.environ.get("CRYPTO_TPU_CARRY"):
    from crypto_tpu.fields.jfield import set_carry_mode
    set_carry_mode("ks")

import numpy as np
import jax
import jax.numpy as jnp

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jcurve import jcurve_for, JPoints
from crypto_tpu.ops import msm_v2
from crypto_tpu.ops.pippenger import scalars_to_bytes

logn = int(os.environ.get("CRYPTO_TPU_BENCH_N", "20"))
n = 1 << logn
jc = jcurve_for(bls.G1)

cache_f = os.path.expanduser(f"~/.cache/crypto_tpu_bench/points_2e{logn}_v3.npz")
z = np.load(cache_f)
points = JPoints(jax.device_put(jnp.asarray(z["X"])),
                 jax.device_put(jnp.asarray(z["Y"])),
                 jax.device_put(jnp.asarray(z["Z"])))
jax.block_until_ready(points.X)
print("points loaded", flush=True)

rng = np.random.default_rng(time.time_ns() & 0xFFFFFFFF)


def fresh_sbytes():
    words = rng.integers(0, 1 << 63, size=(n, 5), dtype=np.int64).astype(object)
    scalars = [(int(w0) | (int(w1) << 63) | (int(w2) << 126)
                | (int(w3) << 189) | (int(w4) << 252)) % bls.R
               for (w0, w1, w2, w3, w4) in words]
    sb = jax.device_put(jnp.asarray(scalars_to_bytes(scalars, 32)))
    jax.block_until_ready(sb)
    return sb


# warmup (compiles nothing if cache is truly warm)
msm_v2.msm_device_scheduled(bls.G1, points, fresh_sbytes())
print("warmup done", flush=True)

# instrumented run: monkeypatch-free timing via the module internals
for rep in range(2):
    sb = fresh_sbytes()
    c = 16
    nbits = bls.G1.scalar_field.bits
    B = 1 << (c - 1)

    t0 = time.time()
    digits = msm_v2.device_digits(sb, c, nbits)
    jax.block_until_ready(digits)
    t_digits = time.time() - t0

    inf_mask = jc.is_infinity(points)
    t0 = time.time()
    (order, starts_p, counts_p, invperm, nprof_d,
     occs_d) = msm_v2._plan_windows_sorted(digits, inf_mask, B)
    jax.block_until_ready(order)
    t_plan = time.time() - t0

    t0 = time.time()
    nprof = np.asarray(jax.device_get(nprof_d))
    occs = np.maximum(np.asarray(jax.device_get(occs_d)), 1)
    t_pull = time.time() - t0

    smax = min(1 << nbits, bls.G1.scalar_field.p)
    W = digits.shape[0]
    top_keys = (smax >> ((W - 1) * c)) + 1
    bands, occ_model = msm_v2._model_bands(n, c, max_h=64, top_keys=top_keys)
    engine = msm_v2._engine_for(jc)
    prog = engine.window_program_bands(n, c, bands, fast=True)

    # all 16 calls dispatched async, then one barrier
    t0 = time.time()
    wouts = [prog(digits[w], points.X, points.Y, inf_mask, order[w],
                  starts_p[w], counts_p[w], invperm[w]) for w in range(W)]
    jax.block_until_ready(wouts[-1][0])
    t_windows = time.time() - t0

    # per-window sync cost (first window only, fresh scalars not needed:
    # executions already happened above; this times a SECOND dispatch set)
    t0 = time.time()
    flags = np.asarray(jax.device_get(jnp.stack([o[-1] for o in wouts])))
    xs = jnp.stack([o[0] for o in wouts])
    ys = jnp.stack([o[1] for o in wouts])
    infs = jnp.stack([o[2] for o in wouts])
    hx = np.atleast_1d(jc.F.unpack_host(xs))
    hy = np.atleast_1d(jc.F.unpack_host(ys))
    hinf = np.asarray(jax.device_get(infs))
    from crypto_tpu.curves.sw import Point
    K = bls.G1.K
    acc = bls.G1.infinity()
    for w in range(W - 1, -1, -1):
        for _ in range(c):
            acc = acc.double()
        if not bool(hinf[w]):
            acc = acc + Point(hx[w], hy[w], K.one(), bls.G1)
    t_tail = time.time() - t0

    total = t_digits + t_plan + t_pull + t_windows + t_tail
    print(f"rep{rep}: digits {t_digits:.3f}s  plan {t_plan:.3f}s  "
          f"pull {t_pull:.3f}s  windows16 {t_windows:.3f}s  "
          f"tail+host {t_tail:.3f}s  TOTAL {total:.3f}s "
          f"({n/total/1e3:.1f}k pts/s)", flush=True)

# reference end-to-end number through the public entry
for rep in range(2):
    sb = fresh_sbytes()
    t0 = time.time()
    msm_v2.msm_device_scheduled(bls.G1, points, sb)
    dt = time.time() - t0
    print(f"end-to-end rep{rep}: {dt:.3f}s ({n/dt/1e3:.1f}k pts/s)",
          flush=True)
