"""Roll/Horner widemul strategies — correctness + timing vs the OH-matmul kernel."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crypto_tpu.curves.bls12_381 import Fq
from crypto_tpu.fields.jfield import jfield_for, LIMB_BITS, LIMB_MASK, limbs_to_int
from crypto_tpu.ops.pallas import field_kernels as fk

J = jfield_for(Fq)
L = J.L


def timeit(name, fn, *args, iters=30):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:30s}: FAIL {type(e).__name__}: {str(e)[:140]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    B = args[0].shape[1]
    print(f"{name:30s}: {dt*1e3:8.3f} ms  ({dt/B*1e9:8.2f} ns/elem)")
    return out


def widemul_roll_b(a, b):
    """cols (2L, B) unnormalized; roll-b with 8/7-bit pre-split of a."""
    B = a.shape[1]
    b_ext = jnp.concatenate([b, jnp.zeros((L, B), jnp.int32)], axis=0)
    a_lo = a & 0xFF          # 8 bits
    a_hi = a >> 8            # 7 bits
    acc_l = jnp.zeros((2 * L, B), jnp.int32)
    acc_h = jnp.zeros((2 * L, B), jnp.int32)
    for i in range(L):
        rb = pltpu.roll(b_ext, i, axis=0)
        acc_l = acc_l + rb * a_lo[i:i + 1, :]
        acc_h = acc_h + rb * a_hi[i:i + 1, :]
    # value = acc_l + 2^8 * acc_h ; acc_l < 2^28, acc_h < 2^27
    cols = acc_l + ((acc_h & 0x7F) << 8) + fk._shift_rows_down(acc_h >> 7, 1)
    return cols


def widemul_horner(a, b):
    """Horner: process a limbs high->low, rolling the accumulator."""
    B = a.shape[1]
    a_lo = a & 0xFF
    a_hi = a >> 8
    acc_l = jnp.zeros((2 * L, B), jnp.int32)
    acc_h = jnp.zeros((2 * L, B), jnp.int32)
    for i in range(L - 1, -1, -1):
        if i != L - 1:
            acc_l = pltpu.roll(acc_l, 1, axis=0)
            acc_h = pltpu.roll(acc_h, 1, axis=0)
        pl_ = b * a_lo[i:i + 1, :]
        ph_ = b * a_hi[i:i + 1, :]
        acc_l = acc_l.at[:L, :].add(pl_)
        acc_h = acc_h.at[:L, :].add(ph_)
    cols = acc_l + ((acc_h & 0x7F) << 8) + fk._shift_rows_down(acc_h >> 7, 1)
    return cols


def make_widemul_kernel(mode, block_b):
    wm = {"roll_b": widemul_roll_b, "horner": widemul_horner}[mode]

    def kernel(a_ref, b_ref, out_ref):
        cols = wm(a_ref[:], b_ref[:])
        out_ref[:] = fk._carry_ks_rows(cols, 2 * L)

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


def make_montmul_kernel(mode, block_b):
    wm = {"roll_b": widemul_roll_b, "horner": widemul_horner}[mode]
    tb = fk._const_tables(L, J.p, J.field.Ninv_R)
    names = ["ninv_lo", "ninv_hi", "p_lo", "p_hi", "p_ext"]
    consts = [jnp.asarray(tb[n]) for n in names]
    const_specs = [
        pl.BlockSpec(tb[n].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in names
    ]

    def kernel(a_ref, b_ref, ninv_lo_ref, ninv_hi_ref, p_lo_ref, p_hi_ref,
               p_ext_ref, out_ref):
        t = fk._carry_ks_rows(wm(a_ref[:], b_ref[:]), 2 * L)
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
    vals_a = [int(x) for x in rng.integers(0, 2**60, size=64)]
    vals_b = [int(x) for x in rng.integers(0, 2**60, size=64)]
    a = J.pack(vals_a)
    b = J.pack(vals_b)
    aN = jnp.tile(a, (N // 64, 1))
    bN = jnp.tile(b, (N // 64, 1))
    a_t = jnp.asarray(np.asarray(aN).T.copy())
    b_t = jnp.asarray(np.asarray(bN).T.copy())

    # correctness check of widemul columns vs integer ground truth
    a_int = [limbs_to_int(np.asarray(a)[k]) for k in range(4)]
    b_int = [limbs_to_int(np.asarray(b)[k]) for k in range(4)]
    for mode in ("roll_b", "horner"):
        out = timeit(f"widemul {mode} blk=2048", make_widemul_kernel(mode, 2048),
                     a_t, b_t)
        if out is not None:
            ok = all(
                limbs_to_int(np.asarray(out)[:, k]) == a_int[k] * b_int[k]
                for k in range(4))
            print(f"   widemul {mode} correct: {ok}")

    ref = jax.jit(J.mul)(aN, bN)
    for mode in ("roll_b", "horner"):
        for blk in (1024, 2048, 4096):
            out = timeit(f"montmul {mode} blk={blk}",
                         make_montmul_kernel(mode, blk), a_t, b_t)
            if out is not None and blk == 2048:
                ok = bool(jnp.all(out.T == ref))
                print(f"   montmul {mode} correct vs einsum: {ok}")


if __name__ == "__main__":
    main()
