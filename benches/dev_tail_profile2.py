import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import crypto_tpu.jax_setup  # noqa
import numpy as np
import jax, jax.numpy as jnp
from crypto_tpu.fields.jfield import set_carry_mode
set_carry_mode("ks")
from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jcurve import jcurve_for, JPoints

jc = jcurve_for(bls.G1)
F = jc.F
L = F.L
Wb = 16
rng = np.random.default_rng(1)

def phase(label, fn, *args, iters=2):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label}: {(time.time()-t0)/iters*1000:.0f} ms", flush=True)

def rnd(shape):
    return jnp.asarray(rng.integers(0, 1 << 15, size=shape + (L,), dtype=np.int32))

def ws_mask_select(px, py, pz, n, nbits):
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)
    masks = ((idx[None, :] >> jnp.arange(nbits, dtype=jnp.int32)[:, None]) & 1) > 0
    masks = jnp.broadcast_to(masks[:, None, :], (nbits, Wb, n))
    inf = jc.infinity((nbits, Wb, n))
    stacked = JPoints(jnp.broadcast_to(px[None], (nbits,) + px.shape),
                      jnp.broadcast_to(py[None], (nbits,) + py.shape),
                      jnp.broadcast_to(pz[None], (nbits,) + pz.shape))
    return jc.select(masks, stacked, inf)

def tree_reduce2(p, n):
    m = n
    while m > 1:
        half = m // 2
        a = JPoints(p.X[:, :, :half], p.Y[:, :, :half], p.Z[:, :, :half])
        b = JPoints(p.X[:, :, half:m], p.Y[:, :, half:m], p.Z[:, :, half:m])
        p = jc.add(a, b)
        m = half
    return p

def make_parts(n):
    nbits = n.bit_length()
    @jax.jit
    def sel_only(px, py, pz):
        p = ws_mask_select(px, py, pz, n, nbits)
        return p.X
    @jax.jit
    def tree(px, py, pz):
        p = ws_mask_select(px, py, pz, n, nbits)
        p = tree_reduce2(p, n)
        return p.X
    return sel_only, tree

def make_horner(nbits):
    @jax.jit
    def hor(bx, by, bz):
        acc = JPoints(bx[nbits - 1], by[nbits - 1], bz[nbits - 1])
        for bpos in range(nbits - 2, -1, -1):
            acc = jc.double(acc)
            acc = jc.add(acc, JPoints(bx[bpos], by[bpos], bz[bpos]))
        return acc.X
    return hor

for n in (128, 256):
    sel_only, tree = make_parts(n)
    px, py, pz = rnd((Wb, n)), rnd((Wb, n)), rnd((Wb, n))
    phase(f"select-only n={n}", sel_only, px, py, pz)
    phase(f"select+tree n={n}", tree, px, py, pz)
nb = 9
hor = make_horner(nb)
bx, by, bz = rnd((nb, Wb)), rnd((nb, Wb)), rnd((nb, Wb))
phase("horner 9 bits", hor, bx, by, bz)
