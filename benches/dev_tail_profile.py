"""Sub-phase profile of the batched tail at (16, 2^15)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import crypto_tpu.jax_setup  # noqa
import numpy as np
import jax, jax.numpy as jnp
from crypto_tpu.fields.jfield import set_carry_mode
set_carry_mode("ks")
from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jcurve import jcurve_for, JPoints
from crypto_tpu.ops import msm_v2
from crypto_tpu.ops.msm_v2 import _engine_for, _jac_reduce_axis1

c = 16
B = 1 << (c - 1)
Wb = 16
rng = np.random.default_rng(1)
jc = jcurve_for(bls.G1)
F = jc.F
L = F.L
px = jnp.asarray(rng.integers(0, 1 << 15, size=(Wb, B, L), dtype=np.int32))
py = jnp.asarray(rng.integers(0, 1 << 15, size=(Wb, B, L), dtype=np.int32))
pinf = jnp.zeros((Wb, B), bool)
engine = _engine_for(jc)

def phase(label, fn, iters=2):
    out = fn(); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    print(f"{label}: {(time.time()-t0)/iters*1000:.0f} ms", flush=True)
    return out

logB = B.bit_length() - 1
logC = (logB + 1) // 2
C = 1 << logC
R = B // C
ush = (L,)

def to_jac(px, py, pinf):
    one = F.ones(())
    z = F.select(pinf, F.zeros(pinf.shape), jnp.broadcast_to(one, px.shape).astype(px.dtype))
    return JPoints(px, py, z)

@jax.jit
def grid_reduce(px, py, pinf):
    P = to_jac(px, py, pinf)
    grid = JPoints(P.X.reshape((Wb, R, C) + ush), P.Y.reshape((Wb, R, C) + ush),
                   P.Z.reshape((Wb, R, C) + ush))
    Tstack = JPoints(grid.X.swapaxes(1, 2), grid.Y.swapaxes(1, 2), grid.Z.swapaxes(1, 2))
    Sq = _jac_reduce_axis1(jc, Tstack)
    Tc = _jac_reduce_axis1(jc, grid)
    return Sq.X, Sq.Y, Sq.Z, Tc.X, Tc.Y, Tc.Z

out = phase("grid reduce (Sq+Tc)", lambda: grid_reduce(px, py, pinf))
sqx, sqy, sqz, tcx, tcy, tcz = out

tail_fn = engine.tail_batched_fn(c)
full = jax.jit(tail_fn)
phase("full batched tail", lambda: full(px, py, pinf))
