"""Fused Pallas point-arithmetic kernels — the MSM/verifier hot path.

Each kernel computes a complete short-Weierstrass group operation (Jacobian,
a=0) over batches of BLS12-381-class field elements *entirely in VMEM*: the
~11-16 Montgomery multiplications of a point add never round-trip to HBM,
unlike the composed-XLA path (`curves/jcurve.py`) where every field op
materializes (batch, L^2)-scale intermediates.

Field-mul strategy (measured on TPU v5e, see benches/dev_kernel_bench*.py):
the schoolbook column accumulation runs on the VPU as 26 iterations of
roll-shifted broadcast-MACs with an 8/7-bit split of one operand (so partial
sums stay in int32); Montgomery reduction uses the 3-mul REDC form with the
constant (ninv, p) products as small exact-f32 Toeplitz matmuls on the MXU.
~19 ns per Montgomery mul per element at block 2048 — within ~4x of the
VPU-slot lower bound for 26x26 limb schoolbook (int32 mul = 4 VPU slots).

Layout: transposed (L, B) — limb index in sublanes, batch in lanes; values
are 15-bit limbs, Montgomery form (see `crypto_tpu.fields.jfield`).

Degenerate pairs: the fast add formula cannot produce P+P; kernels emit a
per-element flag (h==0 and r==0 and neither operand infinite) instead, and
the caller redoes the computation on the total path if any flag fires
(`ops/pippenger.py`).

Reference parity anchor: arkworks group ops used throughout the reference,
e.g. MSM at `legogroth16/src/prover.rs:286-300`.
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

from ...fields.jfield import LIMB_BITS, LIMB_MASK
from ...curves.jcurve import JCurve, JPoints
from . import field_kernels as fk

DEFAULT_BLOCK = 2048

# CRYPTO_TPU_PALLAS_INTERPRET=1 runs every kernel in the Pallas interpreter
# (CPU) — used by tests to cover the kernel code paths without a TPU.
import os as _os
_INTERPRET = bool(_os.environ.get("CRYPTO_TPU_PALLAS_INTERPRET"))
# the full-add kernel's live set + grid double-buffering exceeds the 16M
# VMEM budget at block 2048; 1536 fits (measured on v5e)
FULL_ADD_BLOCK = 1536


# ---------------------------------------------------------------------------
# transposed-layout field helpers (values, not refs; all shapes (rows, B))
# ---------------------------------------------------------------------------

def _shift_rows_down(x, k):
    if k == 0:
        return x
    z = jnp.zeros((k,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([z, x[:-k]], axis=0)


def _widemul_cols(a, b, L):
    """Unnormalized product columns (2L, B) of two L-limb operands.

    roll-b inner loop with an 8/7-bit split of `a` so each accumulator stays
    exactly representable in int32 (26 products of <=2^23 / <=2^22)."""
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
    return acc_l + ((acc_h & 0x7F) << 8) + _shift_rows_down(acc_h >> 7, 1)


class FieldCtx:
    """Per-curve constants + field ops in transposed layout, usable both
    inside Pallas kernels (on loaded values) and when tracing kernels.

    `onehot=True` computes the schoolbook columns via the exact-f32 one-hot
    MXU matmul (as `field_kernels._make_mont_mul_kernel`; ~10 ns/elem) at
    the price of a (L*L, B) VMEM intermediate — use with block <= 512.
    Default is the roll/MAC VPU form (fits block 1536-2048)."""

    def __init__(self, L: int, p_int: int, ninv_int: int,
                 onehot: bool = False):
        self.L = L
        self.onehot = onehot
        tb = fk._const_tables(L, p_int, ninv_int)
        self.kar = onehot and fk.use_karatsuba(L)
        if self.kar:
            tb.update(fk._kar_tables(L, p_int))
            self.names = fk.mul_const_names(L)
        elif onehot:
            self.names = ["oh", "ninv_lo", "ninv_hi", "p_lo", "p_hi",
                          "p_ext"]
        else:
            self.names = ["ninv_lo", "ninv_hi", "p_lo", "p_hi", "p_ext"]
        # numpy (not jnp) so lru-cached factories never capture tracers
        self.tables = {n: np.asarray(tb[n]) for n in self.names}
        self.shapes = {n: tb[n].shape for n in self.names}

    # every op takes `c` = dict of loaded constant values
    def _wide_cols(self, c, a, b):
        L = self.L
        if not self.onehot:
            return _widemul_cols(a, b, L)
        P = jnp.concatenate([a[i:i + 1, :] * b for i in range(L)], axis=0)
        Plo = (P & LIMB_MASK).astype(jnp.float32)
        Phi = (P >> LIMB_BITS).astype(jnp.float32)
        oh = c["oh"]
        cols_lo = fk._f32dot(oh, Plo).astype(jnp.int32)
        cols_hi = fk._f32dot(oh, Phi).astype(jnp.int32)
        return cols_lo + _shift_rows_down(cols_hi, 1)

    def mul(self, c, a, b):
        L = self.L
        if "oh13" in c or "oh" in c:
            return fk._mont_mul_body(c, a, b, L)
        # roll/MAC VPU form (no one-hot tables shipped)
        t = fk._carry_ks_rows(self._wide_cols(c, a, b), 2 * L)
        m_main, m_carry = fk._toeplitz_mul(t[:L], c["ninv_lo"], c["ninv_hi"])
        m = fk._carry_ks_rows(m_main + _shift_rows_down(m_carry, 1), L)
        u_main, u_carry = fk._toeplitz_mul(m, c["p_lo"], c["p_hi"])
        u = u_main + _shift_rows_down(u_carry, 1)
        s = fk._carry_ks_rows(t + u, 2 * L + 1)
        res = s[L:]
        d, borrow = fk._sub_ks_rows(res, c["p_ext"])
        return jnp.where(borrow > 0, res[:L], d[:L])

    def square(self, c, a):
        return self.mul(c, a, a)

    def add(self, c, a, b):
        L = self.L
        s = fk._carry_ks_rows(a + b, L + 1)
        d, borrow = fk._sub_ks_rows(s, c["p_ext"])
        return jnp.where(borrow > 0, s[:L], d[:L])

    def sub(self, c, a, b):
        L = self.L
        d, borrow = fk._sub_ks_rows(a, b)
        dp = fk._carry_ks_rows(d + c["p_ext"][:L], L)
        return jnp.where(borrow > 0, dp, d)

    def dbl(self, c, a):
        return self.add(c, a, a)

    def neg(self, c, a):
        d, _ = fk._sub_ks_rows(c["p_ext"][:self.L] * jnp.ones_like(a[:1]), a)
        return jnp.where(self.is_zero(a), jnp.zeros_like(a), d)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=0, keepdims=True)   # (1, B) bool

    @staticmethod
    def select(mask, a, b):
        """mask (1,B) bool -> rows broadcast."""
        return jnp.where(mask, a, b)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _plain_one_like(x):
    """(L, B) tensor with row 0 = 1, rest 0 (any nonzero X/Y works for the
    infinity encoding; only Z == 0 is semantically meaningful)."""
    return jnp.concatenate(
        [jnp.ones((1, x.shape[1]), x.dtype),
         jnp.zeros((x.shape[0] - 1, x.shape[1]), x.dtype)], axis=0)


def _full_add_body(F: FieldCtx, c, X1, Y1, Z1, X2, Y2, Z2):
    """add-2007-bl (a=0); returns (X3, Y3, Z3, degenerate_flag (1,B) int32)."""
    Z1Z1 = F.square(c, Z1)
    Z2Z2 = F.square(c, Z2)
    U1 = F.mul(c, X1, Z2Z2)
    U2 = F.mul(c, X2, Z1Z1)
    S1 = F.mul(c, F.mul(c, Y1, Z2), Z2Z2)
    S2 = F.mul(c, F.mul(c, Y2, Z1), Z1Z1)
    H = F.sub(c, U2, U1)
    r = F.dbl(c, F.sub(c, S2, S1))
    I = F.square(c, F.dbl(c, H))
    J = F.mul(c, H, I)
    V = F.mul(c, U1, I)
    rsq = F.square(c, r)
    X3 = F.sub(c, F.sub(c, rsq, J), F.dbl(c, V))
    Y3 = F.sub(c, F.mul(c, r, F.sub(c, V, X3)),
               F.dbl(c, F.mul(c, S1, J)))
    Z3 = F.mul(c, F.sub(c, F.sub(c, F.square(c, F.add(c, Z1, Z2)), Z1Z1), Z2Z2), H)

    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    h0 = F.is_zero(H)
    r0 = F.is_zero(r)
    both = (~p_inf) & (~q_inf)
    degenerate = h0 & r0 & both
    make_inf = h0 & (~r0) & both
    inf_xy = _plain_one_like(X3)
    X3 = F.select(make_inf, inf_xy, X3)
    Y3 = F.select(make_inf, inf_xy, Y3)
    Z3 = F.select(make_inf, jnp.zeros_like(Z3), Z3)
    X3 = F.select(p_inf, X2, X3)
    Y3 = F.select(p_inf, Y2, Y3)
    Z3 = F.select(p_inf, Z2, Z3)
    sel_p = q_inf & (~p_inf)
    X3 = F.select(sel_p, X1, X3)
    Y3 = F.select(sel_p, Y1, Y3)
    Z3 = F.select(sel_p, Z1, Z3)
    return X3, Y3, Z3, degenerate.astype(jnp.int32)


def _affine_add_body(F: FieldCtx, c, X1, Y1, X2, Y2, one_mont):
    """mmadd-2007-bl: both inputs affine (Z=1, never infinity): 4M+2S.
    Returns Jacobian (X3, Y3, Z3, flag)."""
    H = F.sub(c, X2, X1)
    HH = F.square(c, H)
    I = F.dbl(c, F.dbl(c, HH))
    J = F.mul(c, H, I)
    r = F.dbl(c, F.sub(c, Y2, Y1))
    V = F.mul(c, X1, I)
    rsq = F.square(c, r)
    X3 = F.sub(c, F.sub(c, rsq, J), F.dbl(c, V))
    Y3 = F.sub(c, F.mul(c, r, F.sub(c, V, X3)),
               F.dbl(c, F.mul(c, Y1, J)))
    Z3 = F.dbl(c, H)
    h0 = F.is_zero(H)
    r0 = F.is_zero(r)
    degenerate = h0 & r0
    make_inf = h0 & (~r0)
    inf_xy = _plain_one_like(X3)
    X3 = F.select(make_inf, inf_xy, X3)
    Y3 = F.select(make_inf, inf_xy, Y3)
    Z3 = F.select(make_inf, jnp.zeros_like(Z3), Z3)
    return X3, Y3, Z3, degenerate.astype(jnp.int32)


def _double_body(F: FieldCtx, c, X1, Y1, Z1):
    """dbl-2009-l (a=0): total (Y=0 or inf -> inf)."""
    A = F.square(c, X1)
    B = F.square(c, Y1)
    C = F.square(c, B)
    t = F.square(c, F.add(c, X1, B))
    D = F.dbl(c, F.sub(c, F.sub(c, t, A), C))
    E = F.add(c, F.dbl(c, A), A)
    Fq_ = F.square(c, E)
    X3 = F.sub(c, Fq_, F.dbl(c, D))
    Y3 = F.sub(c, F.mul(c, E, F.sub(c, D, X3)),
               F.dbl(c, F.dbl(c, F.dbl(c, C))))
    Z3 = F.dbl(c, F.mul(c, Y1, Z1))
    bad = F.is_zero(Y1) | F.is_zero(Z1)
    inf_xy = _plain_one_like(X3)
    X3 = F.select(bad, inf_xy, X3)
    Y3 = F.select(bad, inf_xy, Y3)
    Z3 = F.select(bad, jnp.zeros_like(Z3), Z3)
    return X3, Y3, Z3


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _kernels_for(L: int, p_int: int, ninv_int: int, block_b: int):
    F = FieldCtx(L, p_int, ninv_int)
    consts = [F.tables[n] for n in F.names]
    const_specs = [
        pl.BlockSpec(F.shapes[n], lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in F.names
    ]

    full_block = min(block_b, FULL_ADD_BLOCK)

    def io_spec(blk):
        return pl.BlockSpec((L, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def flag_spec(blk):
        return pl.BlockSpec((1, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def full_add_kernel(x1, y1, z1, x2, y2, z2, *rest):
        cvals = dict(zip(F.names, (r[:] for r in rest[:5])))
        ox, oy, oz, ofl = rest[5], rest[6], rest[7], rest[8]
        X3, Y3, Z3, fl = _full_add_body(F, cvals, x1[:], y1[:], z1[:],
                                        x2[:], y2[:], z2[:])
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3
        ofl[:] = fl

    def affine_add_kernel(x1, y1, x2, y2, *rest):
        cvals = dict(zip(F.names, (r[:] for r in rest[:5])))
        ox, oy, oz, ofl = rest[5], rest[6], rest[7], rest[8]
        X3, Y3, Z3, fl = _affine_add_body(F, cvals, x1[:], y1[:], x2[:], y2[:],
                                          None)
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3
        ofl[:] = fl

    def double_kernel(x1, y1, z1, *rest):
        cvals = dict(zip(F.names, (r[:] for r in rest[:5])))
        ox, oy, oz = rest[5], rest[6], rest[7]
        X3, Y3, Z3 = _double_body(F, cvals, x1[:], y1[:], z1[:])
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3

    def call_full_add(x1, y1, z1, x2, y2, z2):
        B = x1.shape[1]
        out = pl.pallas_call(
            full_add_kernel,
            out_shape=(jax.ShapeDtypeStruct((L, B), jnp.int32),) * 3
            + (jax.ShapeDtypeStruct((1, B), jnp.int32),),
            grid=(B // full_block,),
            in_specs=[io_spec(full_block)] * 6 + const_specs,
            out_specs=(io_spec(full_block), io_spec(full_block),
                       io_spec(full_block), flag_spec(full_block)),
        )(x1, y1, z1, x2, y2, z2, *consts)
        return out

    def call_affine_add(x1, y1, x2, y2):
        B = x1.shape[1]
        out = pl.pallas_call(
            affine_add_kernel,
            out_shape=(jax.ShapeDtypeStruct((L, B), jnp.int32),) * 3
            + (jax.ShapeDtypeStruct((1, B), jnp.int32),),
            grid=(B // block_b,),
            in_specs=[io_spec(block_b)] * 4 + const_specs,
            out_specs=(io_spec(block_b), io_spec(block_b), io_spec(block_b),
                       flag_spec(block_b)),
        )(x1, y1, x2, y2, *consts)
        return out

    def call_double(x1, y1, z1):
        B = x1.shape[1]
        out = pl.pallas_call(
            double_kernel,
            out_shape=(jax.ShapeDtypeStruct((L, B), jnp.int32),) * 3,
            grid=(B // block_b,),
            in_specs=[io_spec(block_b)] * 3 + const_specs,
            out_specs=(io_spec(block_b), io_spec(block_b), io_spec(block_b)),
        )(x1, y1, z1, *consts)
        return out

    return call_full_add, call_affine_add, call_double


@functools.lru_cache(maxsize=None)
def _mul_call_for(L: int, p_int: int, ninv_int: int, block_b: int):
    """Standalone batched Montgomery-mul pallas call: (L,B)x(L,B)->(L,B)."""
    F = FieldCtx(L, p_int, ninv_int)
    consts = [F.tables[n] for n in F.names]
    const_specs = [
        pl.BlockSpec(F.shapes[n], lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in F.names
    ]

    def kernel(a_ref, b_ref, *rest):
        cvals = dict(zip(F.names, (r[:] for r in rest[:5])))
        rest[5][:] = F.mul(cvals, a_ref[:], b_ref[:])

    def call(a_t, b_t):
        B = a_t.shape[1]
        spec = pl.BlockSpec((L, block_b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.int32),
            grid=(B // block_b,),
            in_specs=[spec, spec] + const_specs,
            out_specs=spec,
        )(a_t, b_t, *consts)

    return call


def make_normalize_fn(jc: JCurve, block_b: int = DEFAULT_BLOCK):
    """Batched Jacobian -> affine (Z in {0,1}) via Fermat inversion, with all
    ~770 Montgomery muls running through one fixed-shape Pallas mul kernel
    inside a lax.scan (one Mosaic compile; ~2.6 us/elem on v5e).

    Infinity (Z=0) maps to (X', Y', 0) unchanged-as-infinity since 0^(p-2)=0.
    """
    F = jc.F
    L = F.L
    call_mul = _mul_call_for(L, F.p, F.field.Ninv_R, block_b)
    bits = jnp.asarray(
        np.array([int(c) for c in bin(F.p - 2)[2:]], dtype=np.int32))
    r_mont = jnp.asarray(np.asarray(F.r_mont))     # Montgomery 1

    def norm(P: JPoints):
        shape = P.X.shape
        ins = [t.reshape(-1, L) for t in (P.X, P.Y, P.Z)]
        n = ins[0].shape[0]
        pad = (-n) % block_b
        if pad:
            ins = [jnp.concatenate([t, jnp.zeros((pad, L), t.dtype)])
                   for t in ins]
        stacked = [t.reshape(-1, block_b, L) for t in ins]

        def body(ops):
            x_t, y_t, z_t = (o.T for o in ops)

            def sbody(acc, bit):
                acc2 = call_mul(acc, acc)
                accz = call_mul(acc2, z_t)
                return jnp.where(bit > 0, accz, acc2), None

            zinv, _ = jax.lax.scan(sbody, z_t, bits[1:])
            zinv2 = call_mul(zinv, zinv)
            zinv3 = call_mul(zinv2, zinv)
            xo = call_mul(x_t, zinv2)
            yo = call_mul(y_t, zinv3)
            znz = jnp.any(z_t != 0, axis=0, keepdims=True)
            zo = jnp.where(znz, r_mont[:, None], 0)
            return xo.T, yo.T, zo.T

        k = stacked[0].shape[0]
        if k == 1:
            outs = body(tuple(s[0] for s in stacked))
        else:
            outs = jax.lax.map(body, tuple(stacked))
            outs = tuple(o.reshape(-1, L) for o in outs)
        return JPoints(*(o[:n].reshape(shape) for o in outs))

    return jax.jit(norm)


# ---------------------------------------------------------------------------
# fused batched-affine reduction kernels (for ops/msm_v2.py)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def affine_kernels_for(L: int, p_int: int, ninv_int: int,
                       block_b: int = 512):
    """Two fused kernels for one batched-affine halving level (transposed
    (L, B) layout, masks as (1, B) int32):

      pre(x1, y1, m1, x2, y2, m2) -> (d, dbl, inf3)
          d = 2*y1 (doubling) or x2-x1, with 1 in dead lanes (ready for the
          batch-inversion tree); dbl/inf3 case masks.
      post(x1, y1, x2, y2, dinv, dbl, m1, m2) -> (x3, y3)
          the unified affine add/double given the inverted denominators
          (4 muls + selects, all in VMEM).
    """
    F = FieldCtx(L, p_int, ninv_int, onehot=True)
    consts = [F.tables[n] for n in F.names]
    const_specs = [
        pl.BlockSpec(F.shapes[n], lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in F.names
    ]

    def io_spec(rows, blk):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    one_mont_col = None  # computed from constants inside the kernel

    NC = len(F.names)

    def pre_kernel(x1, y1, m1, x2, y2, m2, *rest):
        c = dict(zip(F.names, (r[:] for r in rest[:NC])))
        od, odbl, oinf = rest[NC], rest[NC + 1], rest[NC + 2]
        X1, Y1, X2, Y2 = x1[:], y1[:], x2[:], y2[:]
        i1 = m1[:] > 0
        i2 = m2[:] > 0
        same_x = jnp.all(X1 == X2, axis=0, keepdims=True)
        y2n = F.neg(c, Y2)
        y_opp = jnp.all(Y1 == y2n, axis=0, keepdims=True)
        both = (~i1) & (~i2)
        is_dbl = same_x & (~y_opp) & both
        is_inf3 = (same_x & y_opp & both) | (i1 & i2)
        dead = (~both) | is_inf3
        d = jnp.where(is_dbl, F.dbl(c, Y1), F.sub(c, X2, X1))
        # Montgomery one = R mod p: derive from p_ext? cheaper: pass via
        # iota-free constant — use (1 - d)*mask trick instead: dead lanes
        # get value 1 (plain 1 works for inversion validity: inv(1)=1 in
        # Montgomery domain iff input is R... any NONZERO value works since
        # the result is discarded; use limb0=1)
        onev = jnp.concatenate(
            [jnp.ones((1, d.shape[1]), jnp.int32),
             jnp.zeros((d.shape[0] - 1, d.shape[1]), jnp.int32)], axis=0)
        zero_d = jnp.all(d == 0, axis=0, keepdims=True)
        d = jnp.where(dead | zero_d, onev, d)
        od[:] = d
        odbl[:] = is_dbl.astype(jnp.int32)
        oinf[:] = is_inf3.astype(jnp.int32)

    def post_kernel(x1, y1, x2, y2, dinv, mdbl, m1, m2, *rest):
        c = dict(zip(F.names, (r[:] for r in rest[:NC])))
        ox, oy = rest[NC], rest[NC + 1]
        X1, Y1, X2, Y2, DI = x1[:], y1[:], x2[:], y2[:], dinv[:]
        is_dbl = mdbl[:] > 0
        i1 = m1[:] > 0
        i2 = m2[:] > 0
        x1sq = F.square(c, X1)
        num = jnp.where(is_dbl, F.add(c, F.dbl(c, x1sq), x1sq),
                        F.sub(c, Y2, Y1))
        lam = F.mul(c, num, DI)
        x3 = F.sub(c, F.sub(c, F.square(c, lam), X1), X2)
        y3 = F.sub(c, F.mul(c, lam, F.sub(c, X1, x3)), Y1)
        x3 = jnp.where(i1, X2, jnp.where(i2 & (~i1), X1, x3))
        y3 = jnp.where(i1, Y2, jnp.where(i2 & (~i1), Y1, y3))
        ox[:] = x3
        oy[:] = y3

    def call_pre(x1, y1, m1, x2, y2, m2):
        B = x1.shape[1]
        return pl.pallas_call(
            pre_kernel,
            out_shape=(jax.ShapeDtypeStruct((L, B), jnp.int32),
                       jax.ShapeDtypeStruct((1, B), jnp.int32),
                       jax.ShapeDtypeStruct((1, B), jnp.int32)),
            grid=(B // block_b,),
            in_specs=[io_spec(L, block_b), io_spec(L, block_b),
                      io_spec(1, block_b), io_spec(L, block_b),
                      io_spec(L, block_b), io_spec(1, block_b)] + const_specs,
            out_specs=(io_spec(L, block_b), io_spec(1, block_b),
                       io_spec(1, block_b)),
        )(x1, y1, m1, x2, y2, m2, *consts)

    def call_post(x1, y1, x2, y2, dinv, mdbl, m1, m2):
        B = x1.shape[1]
        return pl.pallas_call(
            post_kernel,
            out_shape=(jax.ShapeDtypeStruct((L, B), jnp.int32),
                       jax.ShapeDtypeStruct((L, B), jnp.int32)),
            grid=(B // block_b,),
            in_specs=[io_spec(L, block_b)] * 5
            + [io_spec(1, block_b)] * 3 + const_specs,
            out_specs=(io_spec(L, block_b), io_spec(L, block_b)),
        )(x1, y1, x2, y2, dinv, mdbl, m1, m2, *consts)

    return call_pre, call_post


# ---------------------------------------------------------------------------
# chunked batched-affine halve level (fused inversion, for ops/msm_v2.py)
# ---------------------------------------------------------------------------

def _denom_dbl_inf(F: FieldCtx, c, X1, Y1, X2, Y2, i1, i2):
    """Shared denominator logic of the unified affine add/double: returns
    (d, is_dbl, is_inf3) with d == 1 in dead lanes.  MUST be identical in
    the prefix and downsweep kernels — the chunked Montgomery walk
    re-multiplies the same d values."""
    same_x = jnp.all(X1 == X2, axis=0, keepdims=True)
    y2n = F.neg(c, Y2)
    y_opp = jnp.all(Y1 == y2n, axis=0, keepdims=True)
    both = (~i1) & (~i2)
    is_dbl = same_x & (~y_opp) & both
    is_inf3 = (same_x & y_opp & both) | (i1 & i2)
    dead = (~both) | is_inf3
    d = jnp.where(is_dbl, F.dbl(c, Y1), F.sub(c, X2, X1))
    onev = jnp.concatenate(
        [jnp.ones((1, d.shape[1]), jnp.int32),
         jnp.zeros((d.shape[0] - 1, d.shape[1]), jnp.int32)], axis=0)
    zero_d = jnp.all(d == 0, axis=0, keepdims=True)
    d = jnp.where(dead | zero_d, onev, d)
    return d, is_dbl, is_inf3


def _denom_fast(F: FieldCtx, c, X1, X2, i1, i2):
    """Doubling-free denominator: d = x2 - x1, with 1 in dead lanes and
    inf3 = both-infinite.  Real MSM workloads (CRS bases, commitment keys)
    have distinct bases, so a doubling/cancellation inside the bucket
    reduction means two disjoint partial sums collided — cryptographically
    negligible, and when it DOES happen d == 0 zeroes the inversion-tree
    product, which the caller detects (zero chunk total / zero d) and
    reruns the window through the total-formula kernels.  Cuts the x1^2
    doubling numerator, the same-x/opposite-y equality reduces, and the
    field negation from every pair."""
    both = (~i1) & (~i2)
    d = F.sub(c, X2, X1)
    onev = jnp.concatenate(
        [jnp.ones((1, d.shape[1]), jnp.int32),
         jnp.zeros((d.shape[0] - 1, d.shape[1]), jnp.int32)], axis=0)
    d = jnp.where(~both, onev, d)
    return d, (i1 & i2)


# sub-slice width of the chunked level kernels (the onehot mul's natural
# block) and the number of sub-slices chained per block
CHUNK_BW = 512
CHUNK_K = 8


@functools.lru_cache(maxsize=None)
def chunked_level_kernels_fast(L: int, p_int: int, ninv_int: int,
                               k: int = CHUNK_K, bw: int = CHUNK_BW):
    """Doubling-free variant of `chunked_level_kernels_for` (see
    `_denom_fast` for the contract): prefix emits no dbl mask, down applies
    the distinct-points add formula (3 muls: lambda, lambda^2, y3)."""
    F = FieldCtx(L, p_int, ninv_int, onehot=True)
    consts = [F.tables[n] for n in F.names]
    const_specs = [
        pl.BlockSpec(F.shapes[n], lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in F.names
    ]
    W = k * bw
    NC = len(F.names)

    def io_spec(rows, blk):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def prefix_kernel(x1, y1, m1, x2, y2, m2, *rest):
        c = dict(zip(F.names, (r[:] for r in rest[:NC])))
        oprefix, ototal, oinf = rest[NC], rest[NC + 1], rest[NC + 2]
        acc = None
        for j in range(k):
            sl = slice(j * bw, (j + 1) * bw)
            d, is_inf3 = _denom_fast(F, c, x1[:, sl], x2[:, sl],
                                     m1[:, sl] > 0, m2[:, sl] > 0)
            acc = d if acc is None else F.mul(c, acc, d)
            oprefix[:, sl] = acc
            oinf[:, sl] = is_inf3.astype(jnp.int32)
        ototal[:] = acc

    def down_kernel(x1, y1, m1, x2, y2, m2, prefix, tinv, *rest):
        c = dict(zip(F.names, (r[:] for r in rest[:NC])))
        ox, oy = rest[NC], rest[NC + 1]
        t = tinv[:]
        for j in range(k - 1, -1, -1):
            sl = slice(j * bw, (j + 1) * bw)
            X1, Y1, X2, Y2 = x1[:, sl], y1[:, sl], x2[:, sl], y2[:, sl]
            i1 = m1[:, sl] > 0
            i2 = m2[:, sl] > 0
            if j > 0:
                psl = slice((j - 1) * bw, j * bw)
                dinv = F.mul(c, t, prefix[:, psl])
                d, _inf = _denom_fast(F, c, X1, X2, i1, i2)
                t = F.mul(c, t, d)
            else:
                dinv = t
            lam = F.mul(c, F.sub(c, Y2, Y1), dinv)
            x3 = F.sub(c, F.sub(c, F.square(c, lam), X1), X2)
            y3 = F.sub(c, F.mul(c, lam, F.sub(c, X1, x3)), Y1)
            x3 = jnp.where(i1, X2, jnp.where(i2 & (~i1), X1, x3))
            y3 = jnp.where(i1, Y2, jnp.where(i2 & (~i1), Y1, y3))
            ox[:, sl] = x3
            oy[:, sl] = y3

    def call_prefix(x1, y1, m1, x2, y2, m2):
        B = x1.shape[1]
        return pl.pallas_call(
            prefix_kernel,
            out_shape=(jax.ShapeDtypeStruct((L, B), jnp.int32),
                       jax.ShapeDtypeStruct((L, B // k), jnp.int32),
                       jax.ShapeDtypeStruct((1, B), jnp.int32)),
            grid=(B // W,),
            in_specs=[io_spec(L, W), io_spec(L, W), io_spec(1, W),
                      io_spec(L, W), io_spec(L, W), io_spec(1, W)]
            + const_specs,
            out_specs=(io_spec(L, W), io_spec(L, bw), io_spec(1, W)),
        )(x1, y1, m1, x2, y2, m2, *consts)

    def call_down(x1, y1, m1, x2, y2, m2, prefix, tinv):
        B = x1.shape[1]
        return pl.pallas_call(
            down_kernel,
            out_shape=(jax.ShapeDtypeStruct((L, B), jnp.int32),
                       jax.ShapeDtypeStruct((L, B), jnp.int32)),
            grid=(B // W,),
            in_specs=[io_spec(L, W), io_spec(L, W), io_spec(1, W),
                      io_spec(L, W), io_spec(L, W), io_spec(1, W),
                      io_spec(L, W), io_spec(L, bw)] + const_specs,
            out_specs=(io_spec(L, W), io_spec(L, W)),
        )(x1, y1, m1, x2, y2, m2, prefix, tinv, *consts)

    return call_prefix, call_down


@functools.lru_cache(maxsize=None)
def affine_kernels_fast(L: int, p_int: int, ninv_int: int,
                        block_b: int = 512):
    """Doubling-free variant of `affine_kernels_for` (see `_denom_fast`):
    pre emits (d, inf3) only; post applies the 3-mul distinct-points
    formula.  Used with a caller-side zero-denominator check + safe
    rerun."""
    F = FieldCtx(L, p_int, ninv_int, onehot=True)
    consts = [F.tables[n] for n in F.names]
    const_specs = [
        pl.BlockSpec(F.shapes[n], lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in F.names
    ]
    NC = len(F.names)

    def io_spec(rows, blk):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def pre_kernel(x1, y1, m1, x2, y2, m2, *rest):
        c = dict(zip(F.names, (r[:] for r in rest[:NC])))
        od, oinf = rest[NC], rest[NC + 1]
        d, is_inf3 = _denom_fast(F, c, x1[:], x2[:], m1[:] > 0, m2[:] > 0)
        od[:] = d
        oinf[:] = is_inf3.astype(jnp.int32)

    def post_kernel(x1, y1, x2, y2, dinv, m1, m2, *rest):
        c = dict(zip(F.names, (r[:] for r in rest[:NC])))
        ox, oy = rest[NC], rest[NC + 1]
        X1, Y1, X2, Y2, DI = x1[:], y1[:], x2[:], y2[:], dinv[:]
        i1 = m1[:] > 0
        i2 = m2[:] > 0
        lam = F.mul(c, F.sub(c, Y2, Y1), DI)
        x3 = F.sub(c, F.sub(c, F.square(c, lam), X1), X2)
        y3 = F.sub(c, F.mul(c, lam, F.sub(c, X1, x3)), Y1)
        x3 = jnp.where(i1, X2, jnp.where(i2 & (~i1), X1, x3))
        y3 = jnp.where(i1, Y2, jnp.where(i2 & (~i1), Y1, y3))
        ox[:] = x3
        oy[:] = y3

    def call_pre(x1, y1, m1, x2, y2, m2):
        B = x1.shape[1]
        return pl.pallas_call(
            pre_kernel,
            out_shape=(jax.ShapeDtypeStruct((L, B), jnp.int32),
                       jax.ShapeDtypeStruct((1, B), jnp.int32)),
            grid=(B // block_b,),
            in_specs=[io_spec(L, block_b), io_spec(L, block_b),
                      io_spec(1, block_b), io_spec(L, block_b),
                      io_spec(L, block_b), io_spec(1, block_b)] + const_specs,
            out_specs=(io_spec(L, block_b), io_spec(1, block_b)),
        )(x1, y1, m1, x2, y2, m2, *consts)

    def call_post(x1, y1, x2, y2, dinv, m1, m2):
        B = x1.shape[1]
        return pl.pallas_call(
            post_kernel,
            out_shape=(jax.ShapeDtypeStruct((L, B), jnp.int32),
                       jax.ShapeDtypeStruct((L, B), jnp.int32)),
            grid=(B // block_b,),
            in_specs=[io_spec(L, block_b)] * 5
            + [io_spec(1, block_b)] * 2 + const_specs,
            out_specs=(io_spec(L, block_b), io_spec(L, block_b)),
        )(x1, y1, x2, y2, dinv, m1, m2, *consts)

    return call_pre, call_post


@functools.lru_cache(maxsize=None)
def chunked_level_kernels_for(L: int, p_int: int, ninv_int: int,
                              k: int = CHUNK_K, bw: int = CHUNK_BW):
    """One batched-affine halving level in TWO fused kernels (G1/Fq path),
    replacing pre + global batch-inversion tree (~40 launches) + post:

      prefix(x1, y1, m1, x2, y2, m2) -> (prefix, total, dbl, inf3)
          per-pair denominators d and, within each (L, k*bw) block, the
          running products prefix[j] = d_0 * ... * d_j over the k bw-wide
          sub-slices; `total` is the block's chunk product (L, bw).
      down(x1, y1, m1, x2, y2, m2, prefix, tinv, dbl) -> (x3, y3)
          given inverted chunk totals, walks the k sub-slices backwards
          (dinv_j = t * prefix_{j-1}; t *= d_j, with d_j recomputed from the
          coords) and applies the full unified add/double formula in the
          same kernel.

    The caller inverts only the (L, M/k) chunk totals (via `batch_inv_t`),
    so the global log-depth tree shrinks k-fold and every remaining mul of
    the level runs inside two Mosaic launches.  Pair count M must be a
    multiple of k*bw (callers pad with dead lanes)."""
    F = FieldCtx(L, p_int, ninv_int, onehot=True)
    consts = [F.tables[n] for n in F.names]
    const_specs = [
        pl.BlockSpec(F.shapes[n], lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in F.names
    ]
    W = k * bw
    NC = len(F.names)

    def io_spec(rows, blk):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def prefix_kernel(x1, y1, m1, x2, y2, m2, *rest):
        c = dict(zip(F.names, (r[:] for r in rest[:NC])))
        oprefix, ototal, odbl, oinf = (rest[NC], rest[NC + 1], rest[NC + 2],
                                       rest[NC + 3])
        acc = None
        for j in range(k):
            sl = slice(j * bw, (j + 1) * bw)
            d, is_dbl, is_inf3 = _denom_dbl_inf(
                F, c, x1[:, sl], y1[:, sl], x2[:, sl], y2[:, sl],
                m1[:, sl] > 0, m2[:, sl] > 0)
            acc = d if acc is None else F.mul(c, acc, d)
            oprefix[:, sl] = acc
            odbl[:, sl] = is_dbl.astype(jnp.int32)
            oinf[:, sl] = is_inf3.astype(jnp.int32)
        ototal[:] = acc

    def down_kernel(x1, y1, m1, x2, y2, m2, prefix, tinv, mdbl, *rest):
        c = dict(zip(F.names, (r[:] for r in rest[:NC])))
        ox, oy = rest[NC], rest[NC + 1]
        t = tinv[:]
        for j in range(k - 1, -1, -1):
            sl = slice(j * bw, (j + 1) * bw)
            X1, Y1, X2, Y2 = x1[:, sl], y1[:, sl], x2[:, sl], y2[:, sl]
            i1 = m1[:, sl] > 0
            i2 = m2[:, sl] > 0
            is_dbl = mdbl[:, sl] > 0
            if j > 0:
                psl = slice((j - 1) * bw, j * bw)
                dinv = F.mul(c, t, prefix[:, psl])
                d, _dbl2, _inf2 = _denom_dbl_inf(F, c, X1, Y1, X2, Y2, i1, i2)
                t = F.mul(c, t, d)
            else:
                dinv = t
            x1sq = F.square(c, X1)
            num = jnp.where(is_dbl, F.add(c, F.dbl(c, x1sq), x1sq),
                            F.sub(c, Y2, Y1))
            lam = F.mul(c, num, dinv)
            x3 = F.sub(c, F.sub(c, F.square(c, lam), X1), X2)
            y3 = F.sub(c, F.mul(c, lam, F.sub(c, X1, x3)), Y1)
            x3 = jnp.where(i1, X2, jnp.where(i2 & (~i1), X1, x3))
            y3 = jnp.where(i1, Y2, jnp.where(i2 & (~i1), Y1, y3))
            ox[:, sl] = x3
            oy[:, sl] = y3

    def call_prefix(x1, y1, m1, x2, y2, m2):
        B = x1.shape[1]
        return pl.pallas_call(
            prefix_kernel,
            out_shape=(jax.ShapeDtypeStruct((L, B), jnp.int32),
                       jax.ShapeDtypeStruct((L, B // k), jnp.int32),
                       jax.ShapeDtypeStruct((1, B), jnp.int32),
                       jax.ShapeDtypeStruct((1, B), jnp.int32)),
            grid=(B // W,),
            in_specs=[io_spec(L, W), io_spec(L, W), io_spec(1, W),
                      io_spec(L, W), io_spec(L, W), io_spec(1, W)]
            + const_specs,
            out_specs=(io_spec(L, W), io_spec(L, bw), io_spec(1, W),
                       io_spec(1, W)),
        )(x1, y1, m1, x2, y2, m2, *consts)

    def call_down(x1, y1, m1, x2, y2, m2, prefix, tinv, mdbl):
        B = x1.shape[1]
        return pl.pallas_call(
            down_kernel,
            out_shape=(jax.ShapeDtypeStruct((L, B), jnp.int32),
                       jax.ShapeDtypeStruct((L, B), jnp.int32)),
            grid=(B // W,),
            in_specs=[io_spec(L, W), io_spec(L, W), io_spec(1, W),
                      io_spec(L, W), io_spec(L, W), io_spec(1, W),
                      io_spec(L, W), io_spec(L, bw), io_spec(1, W)]
            + const_specs,
            out_specs=(io_spec(L, W), io_spec(L, W)),
        )(x1, y1, m1, x2, y2, m2, prefix, tinv, mdbl, *consts)

    return call_prefix, call_down


class Fq2Ctx:
    """Transposed-layout Fq2 ops over a `FieldCtx` base: one element is a
    (2L, B) slab — c0 limbs in rows [:L], c1 in rows [L:].  All arithmetic
    is componentwise base-field work (Karatsuba mul: 3 base muls), so every
    op stays exact-int32/f32 like `FieldCtx`.  Assumes the quadratic
    non-residue beta == -1 (true for the BLS12-381 and BN254 towers this
    framework instantiates, `fields/jtower.py`)."""

    def __init__(self, L: int, p_int: int, ninv_int: int,
                 onehot: bool = False):
        self.base = FieldCtx(L, p_int, ninv_int, onehot=onehot)
        self.L = L
        self.U = 2 * L
        self.names = self.base.names
        self.tables = self.base.tables
        self.shapes = self.base.shapes

    def _split(self, a):
        return a[:self.L], a[self.L:]

    def _cat(self, c0, c1):
        return jnp.concatenate([c0, c1], axis=0)

    def mul(self, c, a, b):
        F = self.base
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        v0 = F.mul(c, a0, b0)
        v1 = F.mul(c, a1, b1)
        t = F.mul(c, F.add(c, a0, a1), F.add(c, b0, b1))
        # beta = -1: c0 = v0 - v1, c1 = t - v0 - v1
        return self._cat(F.sub(c, v0, v1), F.sub(c, F.sub(c, t, v0), v1))

    def square(self, c, a):
        F = self.base
        a0, a1 = self._split(a)
        t0 = F.mul(c, a0, a1)
        t1 = F.mul(c, F.add(c, a0, a1), F.sub(c, a0, a1))
        return self._cat(t1, F.add(c, t0, t0))

    def add(self, c, a, b):
        F = self.base
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return self._cat(F.add(c, a0, b0), F.add(c, a1, b1))

    def sub(self, c, a, b):
        F = self.base
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return self._cat(F.sub(c, a0, b0), F.sub(c, a1, b1))

    def dbl(self, c, a):
        return self.add(c, a, a)

    def neg(self, c, a):
        F = self.base
        a0, a1 = self._split(a)
        return self._cat(F.neg(c, a0), F.neg(c, a1))

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=0, keepdims=True)

    @staticmethod
    def select(mask, a, b):
        return jnp.where(mask, a, b)


# Fq2 blocks are half the base-field blocks: the (2L, B) coords plus the
# onehot (L*L, B) mul intermediates double the VMEM live set per lane.
FQ2_BLOCK = 256


@functools.lru_cache(maxsize=None)
def affine_kernels_for_fq2(L: int, p_int: int, ninv_int: int,
                           block_b: int = FQ2_BLOCK):
    """Fq2 (G2) variant of `affine_kernels_for`: one batched-affine halving
    level as two fused kernels in transposed (2L, B) layout.  Used by the
    G2 MSM TPU path (`ops/msm_v2.py`) so TIPP/MIPP aggregation and CRS
    `b_g2_query` generation run fused (reference G2 MSM call sites:
    `legogroth16/src/aggregation/groth16/prover.rs:46`)."""
    F = Fq2Ctx(L, p_int, ninv_int, onehot=True)
    consts = [F.tables[n] for n in F.names]
    const_specs = [
        pl.BlockSpec(F.shapes[n], lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in F.names
    ]
    U = 2 * L

    def io_spec(rows, blk):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    NC = len(F.names)

    def pre_kernel(x1, y1, m1, x2, y2, m2, *rest):
        c = dict(zip(F.names, (r[:] for r in rest[:NC])))
        od, odbl, oinf = rest[NC], rest[NC + 1], rest[NC + 2]
        X1, Y1, X2, Y2 = x1[:], y1[:], x2[:], y2[:]
        i1 = m1[:] > 0
        i2 = m2[:] > 0
        same_x = jnp.all(X1 == X2, axis=0, keepdims=True)
        y2n = F.neg(c, Y2)
        y_opp = jnp.all(Y1 == y2n, axis=0, keepdims=True)
        both = (~i1) & (~i2)
        is_dbl = same_x & (~y_opp) & both
        is_inf3 = (same_x & y_opp & both) | (i1 & i2)
        dead = (~both) | is_inf3
        d = jnp.where(is_dbl, F.dbl(c, Y1), F.sub(c, X2, X1))
        onev = jnp.concatenate(
            [jnp.ones((1, d.shape[1]), jnp.int32),
             jnp.zeros((d.shape[0] - 1, d.shape[1]), jnp.int32)], axis=0)
        zero_d = jnp.all(d == 0, axis=0, keepdims=True)
        d = jnp.where(dead | zero_d, onev, d)
        od[:] = d
        odbl[:] = is_dbl.astype(jnp.int32)
        oinf[:] = is_inf3.astype(jnp.int32)

    def post_kernel(x1, y1, x2, y2, dinv, mdbl, m1, m2, *rest):
        c = dict(zip(F.names, (r[:] for r in rest[:NC])))
        ox, oy = rest[NC], rest[NC + 1]
        X1, Y1, X2, Y2, DI = x1[:], y1[:], x2[:], y2[:], dinv[:]
        is_dbl = mdbl[:] > 0
        i1 = m1[:] > 0
        i2 = m2[:] > 0
        x1sq = F.square(c, X1)
        num = jnp.where(is_dbl, F.add(c, F.dbl(c, x1sq), x1sq),
                        F.sub(c, Y2, Y1))
        lam = F.mul(c, num, DI)
        x3 = F.sub(c, F.sub(c, F.square(c, lam), X1), X2)
        y3 = F.sub(c, F.mul(c, lam, F.sub(c, X1, x3)), Y1)
        x3 = jnp.where(i1, X2, jnp.where(i2 & (~i1), X1, x3))
        y3 = jnp.where(i1, Y2, jnp.where(i2 & (~i1), Y1, y3))
        ox[:] = x3
        oy[:] = y3

    def call_pre(x1, y1, m1, x2, y2, m2):
        B = x1.shape[1]
        return pl.pallas_call(
            pre_kernel,
            out_shape=(jax.ShapeDtypeStruct((U, B), jnp.int32),
                       jax.ShapeDtypeStruct((1, B), jnp.int32),
                       jax.ShapeDtypeStruct((1, B), jnp.int32)),
            grid=(B // block_b,),
            in_specs=[io_spec(U, block_b), io_spec(U, block_b),
                      io_spec(1, block_b), io_spec(U, block_b),
                      io_spec(U, block_b), io_spec(1, block_b)] + const_specs,
            out_specs=(io_spec(U, block_b), io_spec(1, block_b),
                       io_spec(1, block_b)),
        )(x1, y1, m1, x2, y2, m2, *consts)

    def call_post(x1, y1, x2, y2, dinv, mdbl, m1, m2):
        B = x1.shape[1]
        return pl.pallas_call(
            post_kernel,
            out_shape=(jax.ShapeDtypeStruct((U, B), jnp.int32),
                       jax.ShapeDtypeStruct((U, B), jnp.int32)),
            grid=(B // block_b,),
            in_specs=[io_spec(U, block_b)] * 5
            + [io_spec(1, block_b)] * 3 + const_specs,
            out_specs=(io_spec(U, block_b), io_spec(U, block_b)),
        )(x1, y1, x2, y2, dinv, mdbl, m1, m2, *consts)

    return call_pre, call_post


@functools.lru_cache(maxsize=None)
def fq2_mul_t_fn(L: int, p_int: int, ninv_int: int,
                 block_b: int = FQ2_BLOCK):
    """Batched Fq2 Montgomery mul in transposed layout:
    (2L, B) x (2L, B) -> (2L, B), Karatsuba fused in one kernel.  B must be
    a multiple of block_b (callers pad).  Feeds `batch_inv_t` on the G2 MSM
    path."""
    F = Fq2Ctx(L, p_int, ninv_int, onehot=True)
    consts = [np.asarray(F.tables[n]) for n in F.names]
    const_specs = [
        pl.BlockSpec(F.shapes[n], lambda i: (0, 0), memory_space=pltpu.VMEM)
        for n in F.names
    ]
    U = 2 * L
    NC = len(F.names)

    def kernel(a_ref, b_ref, *rest):
        cvals = dict(zip(F.names, (r[:] for r in rest[:NC])))
        rest[NC][:] = F.mul(cvals, a_ref[:], b_ref[:])

    def run(a_t, b_t):
        B = a_t.shape[1]
        spec = pl.BlockSpec((U, block_b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((U, B), jnp.int32),
            grid=(B // block_b,),
            in_specs=[spec, spec] + const_specs,
            out_specs=spec,
        )(a_t, b_t, *consts)

    return run


def _pad_t(x, block_b, fill=0):
    B = x.shape[1]
    pad = (-B) % block_b
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((x.shape[0], pad), fill, x.dtype)], axis=1)
    return x


def make_add_fns(jc: JCurve, block_b: int = DEFAULT_BLOCK):
    """Returns (add_fn, affine_add_fn, double_fn) operating on (..., L)-layout
    JPoints batches, backed by the fused Pallas kernels.

    add_fn/affine_add_fn: (A, B) -> (JPoints, flag scalar int32)
    double_fn: P -> JPoints

    Every call is routed through a fixed-block `lax.map` over chunks so that
    exactly THREE Mosaic kernels are ever compiled per curve, regardless of
    batch shape (per-shape Mosaic recompiles through the remote compile relay
    cost ~30-70 s each; XLA-only wrapper programs compile in seconds).
    """
    F = jc.F
    L = F.L
    p_int = F.p
    ninv_int = F.field.Ninv_R
    call_full, call_aff, call_dbl = _kernels_for(L, p_int, ninv_int, block_b)
    full_block = min(block_b, FULL_ADD_BLOCK)

    def _chunked(call, chunk, n_in, n_out, inputs, fills):
        """Pad each (n, L) input to a chunk multiple and lax.map the fixed
        (L, chunk) pallas call over chunks; returns n_out (n, L) arrays plus
        (if the kernel emits one) a flag scalar."""
        n = inputs[0].shape[0]
        pad = (-n) % chunk
        padded = []
        for t, fill in zip(inputs, fills):
            if pad:
                t = jnp.concatenate(
                    [t, jnp.full((pad, L), fill, t.dtype)], axis=0)
            padded.append(t.reshape(-1, chunk, L))
        k = padded[0].shape[0]

        def body(ops):
            outs = call(*(o.T for o in ops))
            return tuple(o.T for o in outs[:n_out]) + tuple(outs[n_out:])

        if k == 1:
            outs = body(tuple(p[0] for p in padded))
        else:
            outs = jax.lax.map(body, tuple(padded))
            outs = tuple(o.reshape(-1, *o.shape[2:]) for o in outs)
        coords = tuple(o[:n] for o in outs[:n_out])
        rest = outs[n_out:]
        return coords, rest

    def add_fn(A: JPoints, B: JPoints):
        shape = A.X.shape
        ins = [t.reshape(-1, L) for t in (A.X, A.Y, A.Z, B.X, B.Y, B.Z)]
        # pad: Z=0 (infinity) pairs are not degenerate -> flag stays 0
        (ox, oy, oz), (fl,) = _chunked(call_full, full_block, 6, 3, ins,
                                       fills=[0] * 6)
        flag = jnp.max(fl)
        return JPoints(ox.reshape(shape), oy.reshape(shape),
                       oz.reshape(shape)), flag

    def affine_add_fn(A: JPoints, B: JPoints):
        """Both operands affine with Z==1 (caller guarantees); Z ignored.
        Padding uses distinct x (0 vs 1) so padded pairs are never
        degenerate."""
        shape = A.X.shape
        ins = [t.reshape(-1, L) for t in (A.X, A.Y, B.X, B.Y)]
        (ox, oy, oz), (fl,) = _chunked(call_aff, block_b, 4, 3, ins,
                                       fills=[0, 0, 1, 0])
        flag = jnp.max(fl)
        return JPoints(ox.reshape(shape), oy.reshape(shape),
                       oz.reshape(shape)), flag

    def double_fn(P: JPoints):
        shape = P.X.shape
        ins = [t.reshape(-1, L) for t in (P.X, P.Y, P.Z)]
        (ox, oy, oz), _ = _chunked(call_dbl, block_b, 3, 3, ins, fills=[0] * 3)
        return JPoints(ox.reshape(shape), oy.reshape(shape), oz.reshape(shape))

    return add_fn, affine_add_fn, double_fn
