"""Dev microbenchmarks for Montgomery-mul kernel variants (TPU tuning).

Isolates stages of the Pallas mont-mul to find pathologies and compares
layout variants. Not part of the test suite.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crypto_tpu.curves.bls12_381 import Fq
from crypto_tpu.fields.jfield import jfield_for, LIMB_BITS, LIMB_MASK, int_to_limbs
from crypto_tpu.ops.pallas import field_kernels as fk

J = jfield_for(Fq)
L = J.L


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    B = args[0].shape[-1] if args[0].ndim == 2 else args[0].shape[0]
    print(f"{name:28s}: {dt*1e3:8.3f} ms  ({dt/B*1e9:8.2f} ns/elem)")
    return dt


def make_stage_kernel(stage: str, block_b: int):
    tb = fk._const_tables(L, J.p, J.field.Ninv_R)
    names = ["oh", "ninv_lo", "ninv_hi", "p_lo", "p_hi", "p_ext"]
    consts = [jnp.asarray(tb[n]) for n in names]
    const_specs = [
        pl.BlockSpec(tb[n].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in names
    ]

    def kernel(a_ref, b_ref, oh_ref, ninv_lo_ref, ninv_hi_ref,
               p_lo_ref, p_hi_ref, p_ext_ref, out_ref):
        a = a_ref[:]
        b = b_ref[:]
        if stage == "pbuild":
            P = jnp.concatenate([a[i:i + 1, :] * b for i in range(L)], axis=0)
            out_ref[:] = P[:L] + P[L:2 * L]
            return
        P = jnp.concatenate([a[i:i + 1, :] * b for i in range(L)], axis=0)
        Plo = (P & LIMB_MASK).astype(jnp.float32)
        Phi = (P >> LIMB_BITS).astype(jnp.float32)
        oh = oh_ref[:]
        cols_lo = fk._f32dot(oh, Plo).astype(jnp.int32)
        cols_hi = fk._f32dot(oh, Phi).astype(jnp.int32)
        wide = cols_lo + fk._shift_rows_down(cols_hi, 1)
        if stage == "widemul":
            out_ref[:] = wide[:L] + wide[L:2 * L]
            return
        t = fk._carry_ks_rows(wide, 2 * L)
        if stage == "widemul_carry":
            out_ref[:] = t[:L] + t[L:2 * L]
            return
        m_main, m_carry = fk._toeplitz_mul(t[:L], ninv_lo_ref[:], ninv_hi_ref[:])
        m = fk._carry_ks_rows(m_main + fk._shift_rows_down(m_carry, 1), L)
        u_main, u_carry = fk._toeplitz_mul(m, p_lo_ref[:], p_hi_ref[:])
        u = u_main + fk._shift_rows_down(u_carry, 1)
        s = fk._carry_ks_rows(t + u, 2 * L + 1)
        res = s[L:]
        d, borrow = fk._sub_ks_rows(res, p_ext_ref[:])
        out_ref[:] = jnp.where(borrow > 0, res[:L], d[:L])

    @jax.jit
    def run(a_t, b_t):
        B = a_t.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.int32),
            grid=(B // block_b,),
            in_specs=[
                pl.BlockSpec((L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            ] + const_specs,
            out_specs=pl.BlockSpec((L, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(a_t, b_t, *consts)

    return run


def main():
    rng = np.random.default_rng(0)
    N = 1 << 16
    vals = [int(x) for x in rng.integers(0, 2**60, size=64)]
    a = J.pack(vals)
    b = J.pack(vals[::-1])
    aN = jnp.tile(a, (N // 64, 1))
    bN = jnp.tile(b, (N // 64, 1))
    a_t = jnp.asarray(np.asarray(aN).T.copy())
    b_t = jnp.asarray(np.asarray(bN).T.copy())

    mulj = jax.jit(J.mul)
    timeit("einsum mul (B,L)", mulj, aN, bN)

    for block in (512, 2048, 8192):
        for stage in ("pbuild", "widemul", "widemul_carry", "full"):
            try:
                fn = make_stage_kernel(stage, block)
                timeit(f"pallas {stage} blk={block}", fn, a_t, b_t)
            except Exception as e:
                print(f"pallas {stage} blk={block}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
