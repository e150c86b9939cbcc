"""Phase-timing of msm_device_scheduled internals at 2^20 (TPU)."""
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
from crypto_tpu.ops.msm_v2 import _engine_for, device_digits, _plan_windows
from crypto_tpu.ops.pippenger import scalars_to_bytes

logn = int(os.environ.get("CRYPTO_TPU_BENCH_N", "20"))
n = 1 << logn
c = 16
rng = np.random.default_rng(0)
jc = jcurve_for(bls.G1)
F = jc.F
L = F.L
# synthetic affine points (random limbs are fine for timing; formulas total)
X = jnp.asarray(rng.integers(0, 1 << 15, size=(n, L), dtype=np.int32))
Y = jnp.asarray(rng.integers(0, 1 << 15, size=(n, L), dtype=np.int32))
inf = jnp.zeros((n,), bool)
sb = jnp.asarray(rng.integers(0, 256, size=(n, 32), dtype=np.int64).astype(np.uint8))
jax.block_until_ready((X, Y, inf, sb))
engine = _engine_for(jc)

def phase(label, fn, iters=1):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    print(f"{label}: {(time.time()-t0)/iters*1000:.0f} ms", flush=True)
    return out

digits = phase("digits", lambda: device_digits(sb, c, 255))
plan = phase("plan (16 argsorts)", lambda: _plan_windows(digits, inf, 1 << (c-1)))
order, starts, counts, occs_d = plan
occs = np.maximum(np.asarray(jax.device_get(occs_d)), 1)
print("occs:", occs, flush=True)
pad_w = 1 << (int(occs.max()) - 1).bit_length()
pad_w = min(pad_w, 64)
prog = engine.bucket_program(n, c, pad_w, 1)
one = phase("bucket program (1 window)",
            lambda: prog(digits[0], X, Y, inf, order[0], starts[0], counts[0]), iters=2)
def all_windows():
    outs = [prog(digits[w], X, Y, inf, order[w], starts[w], counts[w])
            for w in range(16)]
    return outs
outs = phase("bucket programs (16 windows)", all_windows)
bx = jnp.stack([o[0] for o in outs]); by = jnp.stack([o[1] for o in outs])
bi = jnp.stack([o[2] for o in outs])
tailb = engine.tail_batched_program(16, c)
phase("batched tail (16 windows)", lambda: tailb(bx, by, bi), iters=2)
t0 = time.time()
hx = F.unpack_host(bx[:1]); print(f"unpack 1 window bucket vec: {(time.time()-t0)*1000:.0f} ms")
