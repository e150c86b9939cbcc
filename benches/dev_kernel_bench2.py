"""P-build strategy variants for the Montgomery-mul Pallas kernel."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crypto_tpu.curves.bls12_381 import Fq
from crypto_tpu.fields.jfield import jfield_for, LIMB_BITS, LIMB_MASK
from crypto_tpu.ops.pallas import field_kernels as fk

J = jfield_for(Fq)
L = J.L


def timeit(name, fn, *args, iters=20):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:30s}: FAIL {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    B = args[0].shape[1]
    print(f"{name:30s}: {dt*1e3:8.3f} ms  ({dt/B*1e9:8.2f} ns/elem)")
    return out


def build_variant(mode: str, block_b: int, with_oh: bool = True):
    # constant tables
    oh_np = np.zeros((2 * L, L * L), dtype=np.float32)
    for i in range(L):
        for j in range(L):
            oh_np[i + j, i * L + j] = 1.0
    E_np = np.zeros((L * L, L), dtype=np.float32)   # row i*L+j selects a_i
    T_np = np.zeros((L * L, L), dtype=np.float32)   # row i*L+j selects b_j
    for i in range(L):
        for j in range(L):
            E_np[i * L + j, i] = 1.0
            T_np[i * L + j, j] = 1.0
    consts = [jnp.asarray(oh_np), jnp.asarray(E_np), jnp.asarray(T_np)]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for c in [oh_np, E_np, T_np]
    ]

    def reduce_cols(P):
        # P: (L*L, B) int32 partial products -> (2L, B) columns via OH matmul
        Plo = (P & LIMB_MASK).astype(jnp.float32)
        Phi = (P >> LIMB_BITS).astype(jnp.float32)
        return Plo, Phi

    def kernel(a_ref, b_ref, oh_ref, E_ref, T_ref, out_ref, scratch):
        a = a_ref[:]
        b = b_ref[:]
        if mode == "concat":
            P = jnp.concatenate([a[i:i + 1, :] * b for i in range(L)], axis=0)
        elif mode == "repeat":
            A_rep = pltpu.repeat(a, L, axis=0)             # a_{k // L} ? measure
            B_rep = jnp.concatenate([b] * L, axis=0)
            P = A_rep * B_rep
        elif mode == "mxu_build":
            A_rep = fk._f32dot(E_ref[:], a.astype(jnp.float32)).astype(jnp.int32)
            B_rep = jnp.concatenate([b] * L, axis=0)
            P = A_rep * B_rep
        elif mode == "scratch_mac":
            scratch[:] = jnp.zeros_like(scratch)
            for i in range(L):
                scratch[i:i + L, :] += a[i:i + 1, :] * b
            # columns already reduced (values < 26*2^30?? no: products <2^30,
            # 26 of them overflow int32!) -- this variant is for TIMING the
            # slice-accumulate pattern only, not correctness.
            out_ref[:] = scratch[:L, :] + scratch[L:2 * L, :]
            return
        else:
            raise ValueError(mode)
        if not with_oh:
            out_ref[:] = P[:L] + P[L:2 * L]
            return
        Plo, Phi = reduce_cols(P)
        oh = oh_ref[:]
        cols_lo = fk._f32dot(oh, Plo).astype(jnp.int32)
        cols_hi = fk._f32dot(oh, Phi).astype(jnp.int32)
        wide = cols_lo + fk._shift_rows_down(cols_hi, 1)
        out_ref[:] = wide[:L] + wide[L:2 * L]

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
            scratch_shapes=[pltpu.VMEM((2 * L, block_b), jnp.int32)],
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

    ref = None
    for blk in (1024, 2048):
        for mode in ("concat", "repeat", "mxu_build", "scratch_mac"):
            out = timeit(f"{mode} blk={blk}", build_variant(mode, blk), a_t, b_t)
            if mode == "concat" and out is not None:
                ref = out
            elif out is not None and ref is not None and mode != "scratch_mac":
                same = bool(jnp.all(out == ref))
                if not same:
                    print(f"   !! {mode} output differs from concat")


if __name__ == "__main__":
    main()
