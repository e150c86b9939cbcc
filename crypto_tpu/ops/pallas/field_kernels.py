"""Pallas TPU kernels for the field-arithmetic hot path.

Fused Montgomery multiplication: schoolbook -> REDC -> carries -> conditional
subtract, entirely in VMEM, with the index-shuffling expressed as MXU matmuls
against small CONSTANT matrices (exact in f32 by magnitude bounds):

* column reduction of the a*b partial products: one-hot matrix
  OH[i+j, i*L+j] = 1;  cols = OH @ split(P)              (2 matmuls)
* REDC products with the constant vectors ninv / p: lower-triangular
  Toeplitz matrices; operands bit-split (x into 7+8 bits, constants into
  8+7 bits) so every f32 product < 2^16 and every accumulated sum < 2^21
  stays exact; the 2^15-weighted piece recombines as a one-limb row shift.

Layout: TRANSPOSED (L, B) — limb index in sublanes, batch in lanes.
Values are 15-bit limbs in int32 (see `crypto_tpu.fields.jfield`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as _pl_mod
import functools as _ft


class _PallasShim:
    def __getattr__(self, name):
        return getattr(_pl_mod, name)

    def pallas_call(self, *a, **kw):
        kw.setdefault('interpret', _INTERPRET)
        return _pl_mod.pallas_call(*a, **kw)


pl = _PallasShim()
from jax.experimental.pallas import tpu as pltpu

from ...fields.jfield import LIMB_BITS, LIMB_MASK, int_to_limbs

BLOCK_B = 512

# CRYPTO_TPU_PALLAS_INTERPRET=1 runs every kernel in the Pallas interpreter
# (CPU) — used by tests to cover the kernel code paths without a TPU.
import os as _os
_INTERPRET = bool(_os.environ.get("CRYPTO_TPU_PALLAS_INTERPRET"))


def _shift_rows_down(x, k):
    """Shift rows toward higher limb index (row i -> row i+k), zeros in."""
    if k == 0:
        return x
    z = jnp.zeros((k,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([z, x[:-k]], axis=0)


def _carry_ks_rows(x, out_rows):
    """Exact carry normalization over the ROW (limb) axis, log-depth.
    x: (K, B) nonneg int32 (< 2^31) -> (out_rows, B) 15-bit limbs."""
    K = x.shape[0]
    if K < out_rows:
        x = jnp.concatenate(
            [x, jnp.zeros((out_rows - K,) + x.shape[1:], x.dtype)], axis=0)
    elif out_rows < K:
        x = x[:out_rows]
    x = (x & LIMB_MASK) + _shift_rows_down(x >> LIMB_BITS, 1)
    x = (x & LIMB_MASK) + _shift_rows_down(x >> LIMB_BITS, 1)
    a = x & LIMB_MASK
    w = _shift_rows_down(x >> LIMB_BITS, 1)
    s = a + w
    g = s >> LIMB_BITS
    p = (s == LIMB_MASK).astype(jnp.int32)
    step = 1
    n = s.shape[0]
    while step < n:
        g = g | (p & _shift_rows_down(g, step))
        p = p & _shift_rows_down(p, step)
        step <<= 1
    return (s + _shift_rows_down(g, 1)) & LIMB_MASK


def _sub_ks_rows(a, b):
    """(a - b) over rows with parallel-prefix borrows; returns (diff, borrow)."""
    d = a - b
    g = (d < 0).astype(jnp.int32)
    p = (d == 0).astype(jnp.int32)
    gg, pp = g, p
    step = 1
    n = d.shape[0]
    while step < n:
        gg = gg | (pp & _shift_rows_down(gg, step))
        pp = pp & _shift_rows_down(pp, step)
        step <<= 1
    borrow_in = _shift_rows_down(gg, 1)
    return (d - borrow_in) & LIMB_MASK, gg[-1:]


def _f32dot(m, x):
    return jax.lax.dot_general(
        m, x, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _const_tables(L: int, p_int: int, ninv_int: int):
    oh = np.zeros((2 * L, L * L), dtype=np.float32)
    for i in range(L):
        for j in range(L):
            oh[i + j, i * L + j] = 1.0
    p_limbs = int_to_limbs(p_int, L).astype(np.int64)
    ninv_limbs = int_to_limbs(ninv_int, L).astype(np.int64)

    def toeplitz(vec, rows):
        t = np.zeros((rows, L), dtype=np.int64)
        for k in range(rows):
            for i in range(L):
                j = k - i
                if 0 <= j < L:
                    t[k, i] = vec[j]
        return t

    ninv_T = toeplitz(ninv_limbs, L)    # mod-R product keeps only L rows
    p_T = toeplitz(p_limbs, 2 * L)
    return dict(
        oh=oh,
        ninv_lo=(ninv_T & 0xFF).astype(np.float32),
        ninv_hi=(ninv_T >> 8).astype(np.float32),
        p_lo=(p_T & 0xFF).astype(np.float32),
        p_hi=(p_T >> 8).astype(np.float32),
        p_ext=np.concatenate([p_limbs, [0]]).astype(np.int32).reshape(L + 1, 1),
    )


def use_karatsuba(L: int) -> bool:
    """Karatsuba wide-mul applies to even limb counts (BLS12-381 L=26);
    odd-L fields (BN254 L=17) keep the schoolbook one-hot path."""
    return L % 2 == 0 and not _os.environ.get("CRYPTO_TPU_NO_KARATSUBA")


def _kar_tables(L: int, p_int: int):
    """Karatsuba constants: the half-width one-hot column router and the
    negativity-offset row vector.

    The middle product is computed as z0 + z2 - zm with
    zm = (a0-a1)(b0-b1) — SIGNED operands in (-2^15, 2^15), so per-row
    main/carry streams of the middle block can dip to -13*2^15*2 > -2^20
    even though the combined value is nonnegative.  `kar_off` adds a
    constant C == lam*p (so REDC output is unchanged mod p) whose row
    decomposition puts 2^20 on every middle row, keeping all columns
    nonnegative for the shared carry machinery."""
    Lh = L // 2
    oh13 = np.zeros((2 * Lh, Lh * Lh), dtype=np.float32)
    for i in range(Lh):
        for j in range(Lh):
            oh13[i + j, i * Lh + j] = 1.0
    c_target = sum((1 << 20) << (LIMB_BITS * k) for k in range(Lh, Lh + 2 * Lh))
    lam = -(-c_target // p_int)
    rem = lam * p_int - c_target
    rows = np.zeros(2 * L, dtype=np.int64)
    rows[Lh:Lh + 2 * Lh] += 1 << 20
    rem_limbs = int_to_limbs(rem, 2 * L).astype(np.int64)
    rows += rem_limbs
    assert rows.max() < (1 << 21)
    return dict(oh13=oh13,
                kar_off=rows.astype(np.int32).reshape(2 * L, 1))


def _wide_cols_kar(a, b, oh13, kar_off, L):
    """Uncarried product columns (2L, B) of a*b + C via one-level Karatsuba
    (subtractive form: zm = (a0-a1)(b0-b1), z0+z2-zm = middle), with the
    constant C == lam*p offset keeping every row nonnegative (< 2^22).
    3 * (L/2)^2 limb products instead of L^2."""
    Lh = L // 2
    a0, a1 = a[:Lh], a[Lh:]
    b0, b1 = b[:Lh], b[Lh:]

    def stream_u(P):            # nonneg products < 2^30
        Plo = (P & LIMB_MASK).astype(jnp.float32)
        Phi = (P >> LIMB_BITS).astype(jnp.float32)
        lo = _f32dot(oh13, Plo).astype(jnp.int32)
        hi = _f32dot(oh13, Phi).astype(jnp.int32)
        return lo + _shift_rows_down(hi, 1)          # (2Lh, B) < 2^19.8

    def outer(x, y):
        return jnp.concatenate([x[i:i + 1, :] * y for i in range(Lh)], axis=0)

    z0 = stream_u(outer(a0, b0))
    z2 = stream_u(outer(a1, b1))
    am = a0 - a1                                      # (-2^15, 2^15)
    bm = b0 - b1
    Pm = outer(am, bm)                                # signed, |.| < 2^30
    # signed split: & keeps the nonneg low 15 bits, arithmetic >> the rest
    Pm_lo = (Pm & LIMB_MASK).astype(jnp.float32)
    Pm_hi = (Pm >> LIMB_BITS).astype(jnp.float32)     # in [-2^15, 2^15)
    zm = (_f32dot(oh13, Pm_lo).astype(jnp.int32)
          + _shift_rows_down(_f32dot(oh13, Pm_hi).astype(jnp.int32), 1))
    mid = z0 + z2 - zm                                # true value >= 0
    # rows [0,Lh): z0 | [Lh,2Lh): z0+mid | [2Lh,3Lh): mid+z2 | [3Lh,4Lh): z2
    cols = jnp.concatenate([
        z0[:Lh],
        z0[Lh:] + mid[:Lh],
        mid[Lh:] + z2[:Lh],
        z2[Lh:],
    ], axis=0) + kar_off
    return cols                                       # nonneg, < 2^22.5


def _toeplitz_mul3(x, c_lo, c_hi):
    """`_toeplitz_mul` for UNCARRIED x with rows < 2^23: x splits into
    three pieces (7 + 8 + 8 bits), every f32 product < 2^16 and every
    26-term column sum < 2^21 stays exact.  Returns (main, carry) with
    value = main + 2^15 * carry, main < 2^30, carry < 2^30."""
    x0 = (x & 0x7F).astype(jnp.float32)
    x1 = ((x >> 7) & 0xFF).astype(jnp.float32)
    x2 = (x >> 15).astype(jnp.float32)
    ll = _f32dot(c_lo, x0).astype(jnp.int32)
    lm = _f32dot(c_lo, x1).astype(jnp.int32)
    lh = _f32dot(c_lo, x2).astype(jnp.int32)
    hl = _f32dot(c_hi, x0).astype(jnp.int32)
    hm = _f32dot(c_hi, x1).astype(jnp.int32)
    hh = _f32dot(c_hi, x2).astype(jnp.int32)
    main = ll + (lm << 7) + (hl << 8)
    carry = lh + hm + (hh << 8)
    return main, carry


def _toeplitz_mul(x, c_lo, c_hi):
    """(main, carry) streams of C @ x where C = c_lo + 2^8 c_hi and
    x = (x & 0x7F) + 2^7 (x >> 7).  All four f32 matmuls exact
    (products < 2^16, sums < 2^21).  True value = main + 2^15 * carry,
    with main < 2^29 (int32-safe) and carry < 2^20."""
    x_lo = (x & 0x7F).astype(jnp.float32)
    x_hi = (x >> 7).astype(jnp.float32)
    ll = _f32dot(c_lo, x_lo).astype(jnp.int32)
    lh = _f32dot(c_lo, x_hi).astype(jnp.int32)
    hl = _f32dot(c_hi, x_lo).astype(jnp.int32)
    hh = _f32dot(c_hi, x_hi).astype(jnp.int32)
    main = ll + (lh << 7) + (hl << 8)
    return main, hh


def _mont_mul_body(c: dict, a, b, L: int):
    """Full Montgomery mul on loaded (L, B) values given the constant dict.

    With Karatsuba tables present ('oh13'/'kar_off'): one-level Karatsuba
    wide-mul producing UNCARRIED nonneg columns, fed straight into a
    3-way-split ninv Toeplitz — skips the first full-width carry pass
    (one of three), ~3/4 the limb products.

    Otherwise: schoolbook one-hot columns + 2-way Toeplitz (original)."""
    if "oh13" in c:
        t = _wide_cols_kar(a, b, c["oh13"], c["kar_off"], L)   # uncarried
        m_main, m_carry = _toeplitz_mul3(t[:L], c["ninv_lo"], c["ninv_hi"])
    else:
        P = jnp.concatenate([a[i:i + 1, :] * b for i in range(L)], axis=0)
        Plo = (P & LIMB_MASK).astype(jnp.float32)
        Phi = (P >> LIMB_BITS).astype(jnp.float32)
        oh = c["oh"]
        cols_lo = _f32dot(oh, Plo).astype(jnp.int32)           # (2L, B) < 2^21
        cols_hi = _f32dot(oh, Phi).astype(jnp.int32)
        t = _carry_ks_rows(cols_lo + _shift_rows_down(cols_hi, 1), 2 * L)
        m_main, m_carry = _toeplitz_mul(t[:L], c["ninv_lo"], c["ninv_hi"])

    # m = (t mod R) * ninv mod R
    m = _carry_ks_rows(m_main + _shift_rows_down(m_carry, 1), L)
    # u = m * p (full width); s = (t + u) / R
    u_main, u_carry = _toeplitz_mul(m, c["p_lo"], c["p_hi"])
    u = u_main + _shift_rows_down(u_carry, 1)
    s = _carry_ks_rows(t + u, 2 * L + 1)
    res = s[L:]
    d, borrow = _sub_ks_rows(res, c["p_ext"])
    return jnp.where(borrow > 0, res[:L], d[:L])


def mul_const_names(L: int) -> list:
    """Constant-table names for `_mont_mul_body` (order matters for the
    pallas_call wrappers that zip names to refs)."""
    if use_karatsuba(L):
        return ["oh13", "kar_off", "ninv_lo", "ninv_hi", "p_lo", "p_hi",
                "p_ext"]
    return ["oh", "ninv_lo", "ninv_hi", "p_lo", "p_hi", "p_ext"]


def _make_mont_mul_kernel(L: int, names: list):
    def kernel(a_ref, b_ref, *rest):
        cvals = dict(zip(names, (r[:] for r in rest[:len(names)])))
        rest[len(names)][:] = _mont_mul_body(cvals, a_ref[:], b_ref[:], L)

    return kernel


@functools.lru_cache(maxsize=None)
def gather_rows_t_fn(ncols: int, block_b: int = 2048, nchunk: int = 32):
    """Row gather with transposed output via scalar-prefetch DMA:
    (payload (N, ncols) int32 in HBM, idx (M,) int32) -> (ncols, M).

    XLA's gather reads ~50 cycles/row (latency-bound); this kernel keeps
    `nchunk` row DMAs in flight per block and emits the transposed layout
    the fused affine kernels consume (saving the separate XLA transpose).
    Negative indices mark DEAD slots: no DMA is issued and the output row
    is zero — the MSM layout is ~50% padding at PAD=2*avg-occupancy, so
    skipping dead rows halves the latency-bound fetch count.
    Mosaic tiling requires DMA slices 128-aligned in the minor dimension,
    so payload rows are padded to the next 128 lanes (the extra bytes ride
    the same latency-bound fetch).  M must be a multiple of block_b."""
    from jax.experimental.pallas import tpu as _pltpu

    ncols_p = ((ncols + 127) // 128) * 128

    def kernel(idx_ref, payload_ref, out_ref, scratch, sems):
        base = pl.program_id(0) * block_b
        scratch[:] = jnp.zeros((block_b, ncols_p), jnp.int32)

        def outer(k, carry):
            start = k * nchunk
            for t in range(nchunk):
                r = start + t
                i = idx_ref[base + r]

                @pl.when(i >= 0)
                def _():
                    pltpu.make_async_copy(payload_ref.at[i], scratch.at[r],
                                          sems.at[t]).start()
            for t in range(nchunk):
                r = start + t
                i = idx_ref[base + r]

                @pl.when(i >= 0)
                def _():
                    pltpu.make_async_copy(payload_ref.at[i], scratch.at[r],
                                          sems.at[t]).wait()
            return carry

        jax.lax.fori_loop(0, block_b // nchunk, outer, 0)
        out_ref[:] = scratch[:].T[:ncols]

    def run(payload: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        M = idx.shape[0]
        assert M % block_b == 0, "pad M to the block size"
        if payload.shape[1] != ncols_p:
            payload = jnp.concatenate(
                [payload, jnp.zeros((payload.shape[0],
                                     ncols_p - payload.shape[1]),
                                    jnp.int32)], axis=1)
        gs = _pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M // block_b,),
            in_specs=[pl.BlockSpec(memory_space=_pltpu.ANY)],
            out_specs=pl.BlockSpec((ncols, block_b), lambda i, *_: (0, i),
                                   memory_space=_pltpu.VMEM),
            scratch_shapes=[_pltpu.VMEM((block_b, ncols_p), jnp.int32),
                            _pltpu.SemaphoreType.DMA((nchunk,))],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ncols, M), jnp.int32),
            grid_spec=gs,
        )(idx, payload)

    return run


@functools.lru_cache(maxsize=None)
def mont_mul_t_fn(L: int, p_int: int, ninv_int: int, block_b: int = BLOCK_B):
    """Batched Montgomery mul in transposed layout: (L, B) x (L, B) -> (L, B).
    B must be a multiple of block_b (caller pads)."""
    names = mul_const_names(L)
    kernel = _make_mont_mul_kernel(L, names)
    tb = _const_tables(L, p_int, ninv_int)
    if use_karatsuba(L):
        tb.update(_kar_tables(L, p_int))
    # keep constants as NUMPY arrays: this factory is lru-cached and may be
    # first invoked inside a jit trace — jnp.asarray there would capture
    # per-trace tracers in the closure (UnexpectedTracerError on reuse)
    consts = [np.asarray(tb[n]) for n in names]
    const_specs = [
        pl.BlockSpec(tb[n].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in names
    ]

    def run(a_t: jnp.ndarray, b_t: jnp.ndarray) -> jnp.ndarray:
        B = a_t.shape[1]
        grid = (B // block_b,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.int32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, block_b), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + const_specs,
            out_specs=pl.BlockSpec((L, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(a_t, b_t, *consts)

    return run


def mont_mul_batched(J, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for JField.mul on (..., L) operands via the pallas kernel.
    Transposes at the boundary; pads batch to the block size."""
    L = J.L
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, L)
    b = jnp.broadcast_to(b, shape).reshape(-1, L)
    B = a.shape[0]
    pad = (-B) % BLOCK_B
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, L), jnp.int32)])
        b = jnp.concatenate([b, jnp.zeros((pad, L), jnp.int32)])
    out_t = mont_mul_t_fn(L, J.p, J.field.Ninv_R)(a.T, b.T)
    out = out_t.T
    if pad:
        out = out[:B]
    return out.reshape(shape)
