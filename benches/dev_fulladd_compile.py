"""Time the Mosaic compile of each fused curve kernel in isolation."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jcurve import jcurve_for
from crypto_tpu.ops.pallas.curve_kernels import _kernels_for, FULL_ADD_BLOCK, DEFAULT_BLOCK

START = time.time()
jc = jcurve_for(bls.G1)
F = jc.F
L = F.L
call_full, call_aff, call_dbl = _kernels_for(L, F.p, F.field.Ninv_R,
                                             DEFAULT_BLOCK)
rng = np.random.default_rng(0)

which = sys.argv[1] if len(sys.argv) > 1 else "dbl"

if which == "dbl":
    B = DEFAULT_BLOCK
    g = jc.pack_points([bls.G1.generator().mul_raw(i + 1).normalize()
                        for i in range(64)])
    x = jnp.tile(g.X, (B // 64, 1)).T.copy()
    y = jnp.tile(g.Y, (B // 64, 1)).T.copy()
    z = jnp.tile(g.Z, (B // 64, 1)).T.copy()
    t0 = time.time()
    out = jax.jit(call_dbl)(x, y, z)
    jax.block_until_ready(out)
    print(f"double kernel compile+run: {time.time()-t0:.1f}s", flush=True)
elif which == "aff":
    B = DEFAULT_BLOCK
    g = jc.pack_points([bls.G1.generator().mul_raw(i + 1).normalize()
                        for i in range(64)])
    h = jc.pack_points([bls.G1.generator().mul_raw(i + 100).normalize()
                        for i in range(64)])
    x1 = jnp.tile(g.X, (B // 64, 1)).T.copy()
    y1 = jnp.tile(g.Y, (B // 64, 1)).T.copy()
    x2 = jnp.tile(h.X, (B // 64, 1)).T.copy()
    y2 = jnp.tile(h.Y, (B // 64, 1)).T.copy()
    t0 = time.time()
    out = jax.jit(call_aff)(x1, y1, x2, y2)
    jax.block_until_ready(out)
    print(f"affine-add kernel compile+run: {time.time()-t0:.1f}s", flush=True)
else:
    B = FULL_ADD_BLOCK
    g = jc.pack_points([bls.G1.generator().mul_raw(i + 1).normalize()
                        for i in range(64)])
    h = jc.pack_points([bls.G1.generator().mul_raw(i + 100).normalize()
                        for i in range(64)])
    x1 = jnp.tile(g.X, (B // 64, 1)).T.copy()
    y1 = jnp.tile(g.Y, (B // 64, 1)).T.copy()
    z1 = jnp.tile(g.Z, (B // 64, 1)).T.copy()
    x2 = jnp.tile(h.X, (B // 64, 1)).T.copy()
    y2 = jnp.tile(h.Y, (B // 64, 1)).T.copy()
    z2 = jnp.tile(h.Z, (B // 64, 1)).T.copy()
    t0 = time.time()
    out = jax.jit(call_full)(x1, y1, z1, x2, y2, z2)
    jax.block_until_ready(out)
    print(f"full-add kernel compile+run: {time.time()-t0:.1f}s", flush=True)
