"""Device-side extension-field towers (Fq2/Fq6/Fq12) for pairing curves.

TPU-native counterpart of the host towers in `fields/tower.py`, replacing
the arkworks `QuadExtField`/`CubicExtField` stack the reference inherits
(SURVEY.md §2.2: "Fq2/Fq6/Fq12 towers" row).  Tower layout matches
arkworks/host:

    Fq2  = Fq [u] / (u^2 - beta)       elements (..., 2, L)
    Fq6  = Fq2[v] / (v^3 - xi)         elements (..., 3, 2, L)
    Fq12 = Fq6[w] / (w^2 - v)          elements (..., 2, 3, 2, L)

Elements are plain int32 limb tensors with the tower coordinates as leading
trailing axes, so curve/pairing code treats them exactly like base-field
tensors (gather/scatter/select on leading batch dims just work).  Every op
is built from `JField` base ops (which route through the Pallas Montgomery
mul on TPU) and is jit-safe and shape-polymorphic.

Each module exposes the same protocol as `JField` (mul/add/sub/neg/double/
square/select/is_zero/zeros/ones/pack/unpack) plus `unit_ndim` — the number
of trailing axes one element occupies — so `JCurve` can be generic over the
coefficient field (G1 over JField, G2 over JQuadField).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .host import Field, Fp
from .jfield import JField, jfield_for
from .tower import QuadExtField, CubicOverQuad, QuadOverCubic, Fp2, Fp6, Fp12


class JQuadField:
    """Fq2 as (..., 2, L) tensors over a JField base."""

    unit_ndim = 2

    def __init__(self, host: QuadExtField):
        self.host = host
        self.base: JField = jfield_for(host.base)
        self.L = self.base.L
        self.unit_shape = (2, self.L)
        # beta == -1 is the only fast-path we special-case (BLS12-381 and
        # BN254 both use u^2 = -1)
        self.beta_is_m1 = int(host.beta) == host.base.p - 1
        self.beta_mont = self.base.pack([int(host.beta)])[0]
        # frobenius coefficient c1[1] = beta^((p-1)/2) (applied to c1)
        self.frob_c1_mont = self.base.pack([int(host.frob_c1[1])])[0]

    # -- packing -------------------------------------------------------
    def pack(self, values) -> jnp.ndarray:
        """Nested lists of host Fp2 -> (..., 2, L) device array."""
        arr = np.asarray(values, dtype=object)
        flat = arr.reshape(-1)
        ints = [[int(v.c0), int(v.c1)] for v in flat]
        packed = self.base.pack(ints)            # (N, 2, L)
        return packed.reshape(arr.shape + (2, self.L))

    def unpack(self, t: jnp.ndarray):
        """(..., 2, L) -> nested object array of host Fp2."""
        vals = self.base.unpack(t)               # object array (..., 2)
        arr = np.asarray(vals, dtype=object)
        shape = arr.shape[:-1]
        flat = arr.reshape(-1, 2)
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            out[i] = self.host(self.host.base(int(flat[i][0])),
                               self.host.base(int(flat[i][1])))
        return out.reshape(shape) if shape else out[0]

    # -- helpers -------------------------------------------------------
    def _c0(self, a):
        return a[..., 0, :]

    def _c1(self, a):
        return a[..., 1, :]

    def _make(self, c0, c1):
        return jnp.stack([c0, c1], axis=-2)

    def mul_beta(self, a: jnp.ndarray) -> jnp.ndarray:
        """Multiply a BASE-field tensor (..., L) by beta."""
        if self.beta_is_m1:
            return self.base.neg(a)
        return self.base.mul(a, jnp.broadcast_to(self.beta_mont, a.shape))

    # -- ring ops ------------------------------------------------------
    def add(self, a, b):
        return self._make(self.base.add(self._c0(a), self._c0(b)),
                          self.base.add(self._c1(a), self._c1(b)))

    def sub(self, a, b):
        return self._make(self.base.sub(self._c0(a), self._c0(b)),
                          self.base.sub(self._c1(a), self._c1(b)))

    def neg(self, a):
        return self._make(self.base.neg(self._c0(a)),
                          self.base.neg(self._c1(a)))

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Karatsuba: 3 base muls."""
        F = self.base
        a0, a1 = self._c0(a), self._c1(a)
        b0, b1 = self._c0(b), self._c1(b)
        a0, a1, b0, b1 = jnp.broadcast_arrays(a0, a1, b0, b1)
        v0 = F.mul(a0, b0)
        v1 = F.mul(a1, b1)
        t = F.mul(F.add(a0, a1), F.add(b0, b1))
        c0 = F.add(v0, self.mul_beta(v1))
        c1 = F.sub(F.sub(t, v0), v1)
        return self._make(c0, c1)

    def square(self, a):
        """Complex squaring for beta = -1: 2 base muls; generic: 3."""
        F = self.base
        a0, a1 = self._c0(a), self._c1(a)
        if self.beta_is_m1:
            t0 = F.mul(a0, a1)
            t1 = F.mul(F.add(a0, a1), F.sub(a0, a1))  # a0^2 - a1^2
            return self._make(t1, F.add(t0, t0))
        t0 = F.mul(a0, a1)
        bt0 = self.mul_beta(t0)
        t1 = F.mul(F.add(a0, a1), F.add(a0, self.mul_beta(a1)))
        return self._make(F.sub(F.sub(t1, t0), bt0), F.add(t0, t0))

    def mul_base(self, a, s):
        """a * s with s a base-field tensor (..., L)."""
        F = self.base
        s0 = jnp.broadcast_to(s, self._c0(a).shape)
        return self._make(F.mul(self._c0(a), s0), F.mul(self._c1(a), s0))

    def conjugate(self, a):
        return self._make(self._c0(a), self.base.neg(self._c1(a)))

    def frobenius(self, a, power: int = 1):
        if power % 2 == 0:
            return a
        return self.conjugate(a)

    def inv(self, a):
        """1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 - beta a1^2); 0 -> 0."""
        F = self.base
        a0, a1 = self._c0(a), self._c1(a)
        norm = F.sub(F.mul(a0, a0), self.mul_beta(F.mul(a1, a1)))
        ninv = F.inv(norm)
        return self._make(F.mul(a0, ninv), F.neg(F.mul(a1, ninv)))

    # -- predicates / constants ---------------------------------------
    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None], a, b)

    def zeros(self, shape=()):
        return jnp.zeros(tuple(shape) + (2, self.L), dtype=jnp.int32)

    def ones(self, shape=()):
        one = jnp.stack([self.base.r_mont, self.base.zero_limbs])
        return jnp.broadcast_to(one, tuple(shape) + (2, self.L)).astype(jnp.int32)

    def from_base(self, c0):
        """Lift (..., L) base tensor into (..., 2, L)."""
        return self._make(c0, jnp.zeros_like(c0))

    unpack_host = unpack   # uniform protocol with JField


class JCubicField:
    """Fq6 = Fq2[v]/(v^3 - xi) as (..., 3, 2, L) tensors."""

    unit_ndim = 3

    def __init__(self, host: CubicOverQuad):
        self.host = host
        self.fq2 = jquad_for(host.fq2)
        self.L = self.fq2.L
        self.unit_shape = (3, 2, self.L)
        self.xi_mont = self.fq2.pack([host.xi])[0]        # (2, L)
        # frobenius coefficients (precomputed on the host factory):
        # v^(p^i) = frob_c1[i] * v, (v^2)^(p^i) = frob_c2[i] * v^2
        self.frob_c1 = [self.fq2.pack([c])[0] for c in host.frob_c1]
        self.frob_c2 = [self.fq2.pack([c])[0] for c in host.frob_c2]

    def _c(self, a, i):
        return a[..., i, :, :]

    def _make(self, c0, c1, c2):
        return jnp.stack([c0, c1, c2], axis=-3)

    def mul_xi(self, a):
        """Multiply an Fq2 tensor by xi."""
        F2 = self.fq2
        return F2.mul(a, jnp.broadcast_to(self.xi_mont, a.shape))

    def add(self, a, b):
        F2 = self.fq2
        return self._make(*[F2.add(self._c(a, i), self._c(b, i)) for i in range(3)])

    def sub(self, a, b):
        F2 = self.fq2
        return self._make(*[F2.sub(self._c(a, i), self._c(b, i)) for i in range(3)])

    def neg(self, a):
        F2 = self.fq2
        return self._make(*[F2.neg(self._c(a, i)) for i in range(3)])

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Toom/Karatsuba-lite (6 Fq2 muls, CH-SQR3-style interpolation)."""
        F2 = self.fq2
        a0, a1, a2 = (self._c(a, i) for i in range(3))
        b0, b1, b2 = (self._c(b, i) for i in range(3))
        a0, a1, a2, b0, b1, b2 = jnp.broadcast_arrays(a0, a1, a2, b0, b1, b2)
        v0 = F2.mul(a0, b0)
        v1 = F2.mul(a1, b1)
        v2 = F2.mul(a2, b2)
        # c0 = v0 + xi ((a1+a2)(b1+b2) - v1 - v2)
        t = F2.mul(F2.add(a1, a2), F2.add(b1, b2))
        c0 = F2.add(v0, self.mul_xi(F2.sub(F2.sub(t, v1), v2)))
        # c1 = (a0+a1)(b0+b1) - v0 - v1 + xi v2
        t = F2.mul(F2.add(a0, a1), F2.add(b0, b1))
        c1 = F2.add(F2.sub(F2.sub(t, v0), v1), self.mul_xi(v2))
        # c2 = (a0+a2)(b0+b2) - v0 - v2 + v1
        t = F2.mul(F2.add(a0, a2), F2.add(b0, b2))
        c2 = F2.add(F2.sub(F2.sub(t, v0), v2), v1)
        return self._make(c0, c1, c2)

    def square(self, a):
        return self.mul(a, a)

    def mul_by_v(self, a):
        """a * v: (c0, c1, c2) -> (xi c2, c0, c1)."""
        return self._make(self.mul_xi(self._c(a, 2)), self._c(a, 0),
                          self._c(a, 1))

    def mul_fq2(self, a, s):
        """a * s with s an Fq2 tensor."""
        F2 = self.fq2
        s = jnp.broadcast_to(s, self._c(a, 0).shape)
        return self._make(*[F2.mul(self._c(a, i), s) for i in range(3)])

    def frobenius(self, a, power: int = 1):
        F2 = self.fq2
        i = power % 6
        c0 = F2.frobenius(self._c(a, 0), power)
        c1 = F2.mul(F2.frobenius(self._c(a, 1), power),
                    jnp.broadcast_to(self.frob_c1[i], self._c(a, 1).shape))
        c2 = F2.mul(F2.frobenius(self._c(a, 2), power),
                    jnp.broadcast_to(self.frob_c2[i], self._c(a, 2).shape))
        return self._make(c0, c1, c2)

    def inv(self, a):
        """Cubic-extension inversion (mirrors host `Fp6.inverse`)."""
        F2 = self.fq2
        a0, a1, a2 = (self._c(a, i) for i in range(3))
        t0 = F2.sub(F2.mul(a0, a0), self.mul_xi(F2.mul(a1, a2)))
        t1 = F2.sub(self.mul_xi(F2.mul(a2, a2)), F2.mul(a0, a1))
        t2 = F2.sub(F2.mul(a1, a1), F2.mul(a0, a2))
        d = F2.add(F2.mul(a0, t0),
                   self.mul_xi(F2.add(F2.mul(a2, t1), F2.mul(a1, t2))))
        dinv = F2.inv(d)
        return self._make(F2.mul(t0, dinv), F2.mul(t1, dinv), F2.mul(t2, dinv))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2, -3))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2, -3))

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None, None], a, b)

    def zeros(self, shape=()):
        return jnp.zeros(tuple(shape) + self.unit_shape, dtype=jnp.int32)

    def ones(self, shape=()):
        one2 = self.fq2.ones(())
        z2 = self.fq2.zeros(())
        one = jnp.stack([one2, z2, z2])
        return jnp.broadcast_to(one, tuple(shape) + self.unit_shape).astype(jnp.int32)

    def pack(self, values):
        arr = np.asarray(values, dtype=object)
        flat = arr.reshape(-1)
        rows = [[v.c0, v.c1, v.c2] for v in flat]
        packed = self.fq2.pack(rows)            # (N, 3, 2, L)
        return packed.reshape(arr.shape + self.unit_shape)

    def unpack(self, t):
        arr2 = self.fq2.unpack(t)
        arr2 = np.asarray(arr2, dtype=object)
        shape = arr2.shape[:-1]
        flat = arr2.reshape(-1, 3)
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            out[i] = self.host(flat[i][0], flat[i][1], flat[i][2])
        return out.reshape(shape) if shape else out[0]

    unpack_host = unpack


class JQuadOverCubicField:
    """Fq12 = Fq6[w]/(w^2 - v) as (..., 2, 3, 2, L) tensors."""

    unit_ndim = 4

    def __init__(self, host: QuadOverCubic):
        self.host = host
        self.fq6 = jcubic_for(host.fq6)
        self.fq2 = self.fq6.fq2
        self.L = self.fq6.L
        self.unit_shape = (2, 3, 2, self.L)
        # frobenius coefficients for the w coordinate (host-precomputed):
        # w^(p^i) = frob_c1[i] * w with frob_c1[i] in Fq2
        self.frob_c1 = [self.fq2.pack([c])[0] for c in host.frob_c1]

    def _c(self, a, i):
        return a[..., i, :, :, :]

    def _make(self, c0, c1):
        return jnp.stack([c0, c1], axis=-4)

    def add(self, a, b):
        F6 = self.fq6
        return self._make(F6.add(self._c(a, 0), self._c(b, 0)),
                          F6.add(self._c(a, 1), self._c(b, 1)))

    def sub(self, a, b):
        F6 = self.fq6
        return self._make(F6.sub(self._c(a, 0), self._c(b, 0)),
                          F6.sub(self._c(a, 1), self._c(b, 1)))

    def neg(self, a):
        F6 = self.fq6
        return self._make(F6.neg(self._c(a, 0)), F6.neg(self._c(a, 1)))

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Karatsuba over Fq6 (w^2 = v): 3 Fq6 muls."""
        F6 = self.fq6
        a0, a1 = self._c(a, 0), self._c(a, 1)
        b0, b1 = self._c(b, 0), self._c(b, 1)
        a0, a1, b0, b1 = jnp.broadcast_arrays(a0, a1, b0, b1)
        v0 = F6.mul(a0, b0)
        v1 = F6.mul(a1, b1)
        c0 = F6.add(v0, F6.mul_by_v(v1))
        t = F6.mul(F6.add(a0, a1), F6.add(b0, b1))
        c1 = F6.sub(F6.sub(t, v0), v1)
        return self._make(c0, c1)

    def square(self, a):
        """(a0 + a1 w)^2 = (a0^2 + v a1^2) + 2 a0 a1 w via Karatsuba-square."""
        F6 = self.fq6
        a0, a1 = self._c(a, 0), self._c(a, 1)
        v0 = F6.mul(a0, a1)
        t = F6.mul(F6.add(a0, a1), F6.add(a0, F6.mul_by_v(a1)))
        c0 = F6.sub(F6.sub(t, v0), F6.mul_by_v(v0))
        return self._make(c0, F6.double(v0))

    def conjugate(self, a):
        return self._make(self._c(a, 0), self.fq6.neg(self._c(a, 1)))

    def frobenius(self, a, power: int = 1):
        F6 = self.fq6
        i = power % 12
        c0 = F6.frobenius(self._c(a, 0), power)
        c1 = F6.frobenius(self._c(a, 1), power)
        c1 = F6.mul_fq2(c1, self.frob_c1[i])
        return self._make(c0, c1)

    def inv(self, a):
        """1/(a0 + a1 w) = (a0 - a1 w)/(a0^2 - v a1^2)."""
        F6 = self.fq6
        a0, a1 = self._c(a, 0), self._c(a, 1)
        norm = F6.sub(F6.mul(a0, a0), F6.mul_by_v(F6.mul(a1, a1)))
        ninv = F6.inv(norm)
        return self._make(F6.mul(a0, ninv), F6.neg(F6.mul(a1, ninv)))

    def cyclotomic_square(self, a):
        """Granger-Scott squaring for elements in the cyclotomic subgroup
        (norm 1 — i.e. after the easy part of final exponentiation).
        Mirrors host `Fp12.cyclotomic_square`: view Fq12 as quadratic over
        Fq4 with Fq2 coordinate pairs (z0,z1),(z2,z3),(z4,z5)."""
        F2 = self.fq2
        # coordinate layout: c0 = (z0, z4, z3), c1 = (z2, z1, z5)
        z0 = a[..., 0, 0, :, :]
        z4 = a[..., 0, 1, :, :]
        z3 = a[..., 0, 2, :, :]
        z2 = a[..., 1, 0, :, :]
        z1 = a[..., 1, 1, :, :]
        z5 = a[..., 1, 2, :, :]

        def fq4_square(x, y):
            """(x + y t)^2 in Fq4 = Fq2[t]/(t^2 - xi): Karatsuba form
            matching the host: (x+y)(x+xi y) - t - xi t, 2t with t = xy."""
            t = F2.mul(x, y)
            xt = self.fq6.mul_xi(t)
            s = F2.mul(F2.add(x, y), F2.add(x, self.fq6.mul_xi(y)))
            return F2.sub(F2.sub(s, t), xt), F2.add(t, t)

        t0, t1 = fq4_square(z0, z1)
        t2, t3 = fq4_square(z2, z3)
        t4, t5 = fq4_square(z4, z5)
        nz0 = F2.add(F2.double(F2.sub(t0, z0)), t0)      # 3 t0 - 2 z0
        nz1 = F2.add(F2.double(F2.add(t1, z1)), t1)      # 3 t1 + 2 z1
        xt5 = self.fq6.mul_xi(t5)
        nz2 = F2.add(F2.double(F2.add(xt5, z2)), xt5)    # 3 xi t5 + 2 z2
        nz3 = F2.add(F2.double(F2.sub(t4, z3)), t4)      # 3 t4 - 2 z3
        nz4 = F2.add(F2.double(F2.sub(t2, z4)), t2)      # 3 t2 - 2 z4
        nz5 = F2.add(F2.double(F2.add(t3, z5)), t3)      # 3 t3 + 2 z5
        c0 = jnp.stack([nz0, nz4, nz3], axis=-3)
        c1 = jnp.stack([nz2, nz1, nz5], axis=-3)
        return self._make(c0, c1)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2, -3, -4))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2, -3, -4))

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None, None, None], a, b)

    def zeros(self, shape=()):
        return jnp.zeros(tuple(shape) + self.unit_shape, dtype=jnp.int32)

    def ones(self, shape=()):
        one = jnp.stack([self.fq6.ones(()), self.fq6.zeros(())])
        return jnp.broadcast_to(one, tuple(shape) + self.unit_shape).astype(jnp.int32)

    def pack(self, values):
        arr = np.asarray(values, dtype=object)
        flat = arr.reshape(-1)
        rows = [[v.c0, v.c1] for v in flat]
        packed = self.fq6.pack(rows)
        return packed.reshape(arr.shape + self.unit_shape)

    def unpack(self, t):
        arr6 = self.fq6.unpack(t)
        arr6 = np.asarray(arr6, dtype=object)
        shape = arr6.shape[:-1]
        flat = arr6.reshape(-1, 2)
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            out[i] = self.host(flat[i][0], flat[i][1])
        return out.reshape(shape) if shape else out[0]

    unpack_host = unpack


@functools.cache
def jquad_for(host: QuadExtField) -> JQuadField:
    return JQuadField(host)


@functools.cache
def jcubic_for(host: CubicOverQuad) -> JCubicField:
    return JCubicField(host)


@functools.cache
def jfield12_for(host: QuadOverCubic) -> JQuadOverCubicField:
    return JQuadOverCubicField(host)
