"""Does a fresh scalar set retrigger band-program compiles? (ADVICE #2)"""
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

n = 1 << 20
rng = np.random.default_rng(11)
jc = jcurve_for(bls.G1)
L = jc.F.L
x = jnp.asarray(rng.integers(0, 1 << 15, size=(n, L), dtype=np.int32))
y = jnp.asarray(rng.integers(0, 1 << 15, size=(n, L), dtype=np.int32))
pts = msm_v2.JPoints(x, y, jnp.ones_like(x).at[:, 1:].set(0))

for trial in range(4):
    sb = jnp.asarray(rng.integers(0, 256, size=(n, 32), dtype=np.uint8))
    t0 = time.time()
    msm_v2.msm_device_scheduled(bls.G1, pts, sb)
    eng = msm_v2._engine_for(jc)
    nbands = len([k for k in eng._jits if isinstance(k, tuple) and k[0] == "wpb"])
    print(f"trial {trial}: {time.time()-t0:.2f}s  band-program variants so far: {nbands}",
          flush=True)
