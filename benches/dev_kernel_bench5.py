"""Widemul inner-loop variants: roll decomposition, concat shifts, f32 FMA."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crypto_tpu.curves.bls12_381 import Fq
from crypto_tpu.fields.jfield import jfield_for, limbs_to_int
from crypto_tpu.ops.pallas import field_kernels as fk

J = jfield_for(Fq)
L = J.L


def timeit(name, fn, *args, iters=30):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:28s}: FAIL {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    B = args[0].shape[1]
    print(f"{name:28s}: {dt*1e3:8.3f} ms  ({dt/B*1e9:8.2f} ns/elem)")
    return out


def wm_roll_only(a, b):
    B = a.shape[1]
    b_ext = jnp.concatenate([b, jnp.zeros((L, B), jnp.int32)], axis=0)
    acc = jnp.zeros((2 * L, B), jnp.int32)
    for i in range(L):
        acc = acc + pltpu.roll(b_ext, i, axis=0)
    return acc


def wm_int2(a, b):
    B = a.shape[1]
    b_ext = jnp.concatenate([b, jnp.zeros((L, B), jnp.int32)], axis=0)
    a_lo = a & 0xFF
    a_hi = a >> 8
    acc_l = jnp.zeros((2 * L, B), jnp.int32)
    acc_h = jnp.zeros((2 * L, B), jnp.int32)
    for i in range(L):
        rb = pltpu.roll(b_ext, i, axis=0)
        acc_l = acc_l + rb * a_lo[i:i + 1, :]
        acc_h = acc_h + rb * a_hi[i:i + 1, :]
    return acc_l + ((acc_h & 0x7F) << 8) + fk._shift_rows_down(acc_h >> 7, 1)


def wm_int2_decomp(a, b):
    """Decompose roll(i) = aligned-roll(8*(i//8)) of pre-rolled (i%8)."""
    B = a.shape[1]
    b_ext = jnp.concatenate([b, jnp.zeros((2 * L - L, B), jnp.int32)], axis=0)
    pre = [pltpu.roll(b_ext, r, axis=0) for r in range(8)]
    a_lo = a & 0xFF
    a_hi = a >> 8
    acc_l = jnp.zeros((2 * L, B), jnp.int32)
    acc_h = jnp.zeros((2 * L, B), jnp.int32)
    for i in range(L):
        q, r = divmod(i, 8)
        rb = pltpu.roll(pre[r], 8 * q, axis=0) if q else pre[r]
        acc_l = acc_l + rb * a_lo[i:i + 1, :]
        acc_h = acc_h + rb * a_hi[i:i + 1, :]
    return acc_l + ((acc_h & 0x7F) << 8) + fk._shift_rows_down(acc_h >> 7, 1)


def wm_concat(a, b):
    B = a.shape[1]
    a_lo = a & 0xFF
    a_hi = a >> 8
    acc_l = jnp.zeros((2 * L, B), jnp.int32)
    acc_h = jnp.zeros((2 * L, B), jnp.int32)
    for i in range(L):
        pl_ = b * a_lo[i:i + 1, :]
        ph_ = b * a_hi[i:i + 1, :]
        if i == 0:
            padded_l = jnp.concatenate([pl_, jnp.zeros((L, B), jnp.int32)], axis=0)
            padded_h = jnp.concatenate([ph_, jnp.zeros((L, B), jnp.int32)], axis=0)
        elif i == L:
            padded_l = jnp.concatenate([jnp.zeros((L, B), jnp.int32), pl_], axis=0)
            padded_h = jnp.concatenate([jnp.zeros((L, B), jnp.int32), ph_], axis=0)
        else:
            zlo = jnp.zeros((i, B), jnp.int32)
            zhi = jnp.zeros((L - i, B), jnp.int32)
            padded_l = jnp.concatenate([zlo, pl_, zhi], axis=0)
            padded_h = jnp.concatenate([zlo, ph_, zhi], axis=0)
        acc_l = acc_l + padded_l
        acc_h = acc_h + padded_h
    return acc_l + ((acc_h & 0x7F) << 8) + fk._shift_rows_down(acc_h >> 7, 1)


def wm_f32_4way(a, b):
    B = a.shape[1]
    b_ext = jnp.concatenate([b, jnp.zeros((L, B), jnp.int32)], axis=0)
    b_lo = (b_ext & 0x7F).astype(jnp.float32)
    b_hi = (b_ext >> 7).astype(jnp.float32)
    a_lo = (a & 0x7F).astype(jnp.float32)
    a_hi = (a >> 7).astype(jnp.float32)
    ll = jnp.zeros((2 * L, B), jnp.float32)
    lh = jnp.zeros((2 * L, B), jnp.float32)
    hl = jnp.zeros((2 * L, B), jnp.float32)
    hh = jnp.zeros((2 * L, B), jnp.float32)
    for i in range(L):
        rl = pltpu.roll(b_lo, i, axis=0)
        rh = pltpu.roll(b_hi, i, axis=0)
        al = a_lo[i:i + 1, :]
        ah = a_hi[i:i + 1, :]
        ll = ll + rl * al
        lh = lh + rh * al
        hl = hl + rl * ah
        hh = hh + rh * ah
    lli = ll.astype(jnp.int32)
    lhi = lh.astype(jnp.int32)
    hli = hl.astype(jnp.int32)
    hhi = hh.astype(jnp.int32)
    main = lli + ((lhi + hli) << 7)
    extra = hhi  # weight 2^14: still fits int32 shifted? hh < 2^21 -> <<14 = 2^35 no
    return main + ((extra & 1) << 14) + fk._shift_rows_down(extra >> 1, 1)


WMS = {
    "roll_only": wm_roll_only,
    "int2": wm_int2,
    "int2_decomp": wm_int2_decomp,
    "concat": wm_concat,
    "f32_4way": wm_f32_4way,
}


def make_kernel(mode, block_b, carry=True):
    wm = WMS[mode]

    def kernel(a_ref, b_ref, out_ref):
        cols = wm(a_ref[:], b_ref[:])
        out_ref[:] = fk._carry_ks_rows(cols, 2 * L) if carry else cols

    @jax.jit
    def run(a_t, b_t):
        B = a_t.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2 * L, B), jnp.int32),
            grid=(B // block_b,),
            in_specs=[
                pl.BlockSpec((L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * L, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(a_t, b_t)

    return run


def main():
    rng = np.random.default_rng(0)
    N = 1 << 16
    vals_a = [int(x) for x in rng.integers(0, 2**60, size=64)]
    vals_b = [int(x) for x in rng.integers(0, 2**60, size=64)]
    a = J.pack(vals_a)
    b = J.pack(vals_b)
    aN = jnp.tile(a, (N // 64, 1))
    bN = jnp.tile(b, (N // 64, 1))
    a_t = jnp.asarray(np.asarray(aN).T.copy())
    b_t = jnp.asarray(np.asarray(bN).T.copy())
    a_int = [limbs_to_int(np.asarray(a)[k]) for k in range(4)]
    b_int = [limbs_to_int(np.asarray(b)[k]) for k in range(4)]

    for mode in WMS:
        out = timeit(f"{mode} blk=2048", make_kernel(mode, 2048), a_t, b_t)
        if out is not None and mode != "roll_only":
            ok = all(limbs_to_int(np.asarray(out)[:, k]) == a_int[k] * b_int[k]
                     for k in range(4))
            print(f"   {mode} correct: {ok}")


if __name__ == "__main__":
    main()
