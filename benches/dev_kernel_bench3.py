"""Primitive-op microbenchmarks inside Pallas kernels (TPU VPU/MXU probing)."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 26
ROWS = 676  # L*L


def timeit(name, fn, *args, iters=50, denom=None):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:36s}: FAIL {type(e).__name__}: {str(e)[:100]}")
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    d = denom or args[0].shape[-1]
    print(f"{name:36s}: {dt*1e3:8.3f} ms  ({dt/d*1e9:8.2f} ns/elem)")


def prim_kernel(mode):
    def kernel(x_ref, y_ref, out_ref):
        x = x_ref[:]
        y = y_ref[:]
        if mode == "i32_mul":
            out_ref[:] = x * y
        elif mode == "i32_add":
            out_ref[:] = x + y
        elif mode == "i32_mul8":   # 8 sequential muls (dependency chain)
            acc = x
            for _ in range(8):
                acc = acc * y
            out_ref[:] = acc
        elif mode == "f32_mul":
            out_ref[:] = (x.astype(jnp.float32) * y.astype(jnp.float32)).astype(jnp.int32)
        elif mode == "f32_mul_pure":
            xf = x.astype(jnp.float32)
            yf = y.astype(jnp.float32)
            acc = xf
            for _ in range(8):
                acc = acc * yf
            out_ref[:] = acc.astype(jnp.int32)
        elif mode == "shift_and":
            out_ref[:] = ((x >> 7) & 0x7FFF) + ((y >> 3) & 0x1FFF)
        elif mode == "shifted_add_reduce":
            # column reduction of (ROWS, B) into (2L, B) by 26 shifted adds
            acc = jnp.zeros((2 * L, x.shape[1]), jnp.int32)
            for i in range(L):
                blk = x[i * L:(i + 1) * L, :]
                pad_lo = jnp.zeros((i, x.shape[1]), jnp.int32)
                pad_hi = jnp.zeros((2 * L - L - i, x.shape[1]), jnp.int32)
                acc = acc + jnp.concatenate([pad_lo, blk, pad_hi], axis=0)
            out_ref[:L] = acc[:L] + acc[L:]
            out_ref[L:] = acc[L:]
        else:
            raise ValueError(mode)
    return kernel


def run_prim(mode, rows, block_b, out_rows=None):
    kernel = prim_kernel(mode)
    out_rows = out_rows or rows

    @jax.jit
    def run(x, y):
        B = x.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out_rows, B), jnp.int32),
            grid=(B // block_b,),
            in_specs=[
                pl.BlockSpec((rows, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((out_rows, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(x, y)

    return run


def bcast_kernel(mode):
    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[:]
        b = b_ref[:]
        if mode == "bcast_one":
            out_ref[:] = a[3:4, :] * b    # single sublane broadcast + mul
        elif mode == "bcast_26":
            acc = jnp.zeros_like(b)
            for i in range(L):
                acc = acc + a[i:i + 1, :] * b
            out_ref[:] = acc
        elif mode == "roll_26":
            acc = jnp.zeros_like(b)
            for i in range(L):
                acc = acc + pltpu.roll(a, i, axis=0) * b
            out_ref[:] = acc
    return kernel


def run_bcast(mode, block_b):
    kernel = bcast_kernel(mode)

    @jax.jit
    def run(a, b):
        B = a.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.int32),
            grid=(B // block_b,),
            in_specs=[
                pl.BlockSpec((L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(a, b)

    return run


def main():
    rng = np.random.default_rng(0)
    B = 1 << 16
    blk = 2048
    x = jnp.asarray(rng.integers(0, 1 << 15, size=(ROWS, B), dtype=np.int32))
    y = jnp.asarray(rng.integers(0, 1 << 15, size=(ROWS, B), dtype=np.int32))
    a = jnp.asarray(rng.integers(0, 1 << 15, size=(L, B), dtype=np.int32))
    b = jnp.asarray(rng.integers(0, 1 << 15, size=(L, B), dtype=np.int32))

    for mode in ("i32_add", "i32_mul", "i32_mul8", "f32_mul", "f32_mul_pure",
                 "shift_and"):
        timeit(f"{mode} (676,B)", run_prim(mode, ROWS, blk), x, y)
    timeit("shifted_add_reduce (676->52)",
           run_prim("shifted_add_reduce", ROWS, blk, out_rows=2 * L), x, y)
    for mode in ("bcast_one", "bcast_26", "roll_26"):
        timeit(f"{mode} (26,B)", run_bcast(mode, blk), a, b)


if __name__ == "__main__":
    main()
