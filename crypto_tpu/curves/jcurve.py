"""Batched short-Weierstrass point arithmetic on TPU (Jacobian coordinates).

The device-side counterpart of `crypto_tpu.curves.sw` — this is where MSM,
batched verification equations and SNARK-prover group ops run.  Points are
pytrees of int32 limb tensors (struct-of-arrays):

    JPoints(X, Y, Z)  with  X/Y/Z : (..., L) Montgomery-form limb tensors

Z == 0 encodes infinity.  All ops are branch-free (select-based), total
(handle doubling / inverse / infinity cases), shape-polymorphic over leading
batch dims, and jit-cached.

Curve model: y^2 = x^3 + b with a = 0 (BLS12-381/BN254 G1 and G2; the
formulas assume a == 0, asserted at construction).  The coefficient field is
generic: prime-field curves (G1) run over `JField`, quadratic-extension
curves (G2 over Fq2) over `JQuadField` — elements then carry extra trailing
tower axes (`F.unit_ndim`), which every formula here is agnostic to.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.host import Field
from ..fields.jfield import JField, jfield_for
from ..fields.tower import QuadExtField
from .sw import SWCurve, Point


def _device_field_for(K):
    """Device-field context for a host coefficient field (Fq or Fq2)."""
    if isinstance(K, Field):
        return jfield_for(K)
    if isinstance(K, QuadExtField):
        from ..fields.jtower import jquad_for
        return jquad_for(K)
    raise TypeError(f"no device field for coefficient field {K!r}")


class JPoints(NamedTuple):
    """Batch of Jacobian points as limb tensors."""
    X: jnp.ndarray
    Y: jnp.ndarray
    Z: jnp.ndarray


class JAffine(NamedTuple):
    """Batch of affine points; `inf` is a boolean mask."""
    X: jnp.ndarray
    Y: jnp.ndarray
    inf: jnp.ndarray


class JCurve:
    def __init__(self, curve: SWCurve):
        assert curve.a.is_zero(), "formulas assume a == 0"
        self.curve = curve
        self.F = _device_field_for(curve.K)
        self.b_mont = self.F.pack([curve.b])[0]
        self.jit_add = jax.jit(self.add)
        self.jit_double = jax.jit(self.double)

    @property
    def _u(self) -> int:
        """Trailing axes per coefficient-field element."""
        return self.F.unit_ndim

    def _bshape(self, t: jnp.ndarray) -> tuple:
        """Leading (batch) shape of a coordinate tensor."""
        return t.shape[: t.ndim - self.F.unit_ndim]

    # ------------------------------------------------------------------
    # constructors / conversion
    # ------------------------------------------------------------------

    def infinity(self, shape=()) -> JPoints:
        z = self.F.zeros(shape)
        one = self.F.ones(shape)
        return JPoints(one, one, z)

    def pack_points(self, points: list[Point]) -> JPoints:
        """Host points -> device Jacobian batch (normalized to Z=1/0)."""
        K = self.curve.K
        xs, ys, zs = [], [], []
        for p in points:
            if p.is_infinity():
                xs.append(K.one())
                ys.append(K.one())
                zs.append(K.zero())
            else:
                x, y = p.to_affine()
                xs.append(x)
                ys.append(y)
                zs.append(K.one())
        return JPoints(self.F.pack(xs), self.F.pack(ys), self.F.pack(zs))

    def pack_affine(self, points: list[Point]) -> JAffine:
        K = self.curve.K
        xs, ys, infs = [], [], []
        for p in points:
            if p.is_infinity():
                xs.append(K.zero())
                ys.append(K.zero())
                infs.append(True)
            else:
                x, y = p.to_affine()
                xs.append(x)
                ys.append(y)
                infs.append(False)
        return JAffine(self.F.pack(xs), self.F.pack(ys), jnp.asarray(np.array(infs)))

    def unpack(self, pts: JPoints) -> list[Point]:
        """Device batch -> host points."""
        F = self.F
        xs = np.atleast_1d(F.unpack_host(pts.X))
        ys = np.atleast_1d(F.unpack_host(pts.Y))
        zs = np.atleast_1d(F.unpack_host(pts.Z))
        out = []
        for x, y, z in zip(xs.reshape(-1), ys.reshape(-1), zs.reshape(-1)):
            if z.is_zero():
                out.append(self.curve.infinity())
            else:
                out.append(Point(x, y, z, self.curve))
        return out

    def affine_to_jacobian(self, a: JAffine) -> JPoints:
        F = self.F
        shape = self._bshape(a.X)
        one = F.ones(shape)
        z = F.select(a.inf, F.zeros(shape), one)
        return JPoints(a.X, a.Y, z)

    # ------------------------------------------------------------------
    # predicates
    # ------------------------------------------------------------------

    def is_infinity(self, p: JPoints) -> jnp.ndarray:
        return self.F.is_zero(p.Z)

    def select(self, mask: jnp.ndarray, a: JPoints, b: JPoints) -> JPoints:
        F = self.F
        return JPoints(F.select(mask, a.X, b.X),
                       F.select(mask, a.Y, b.Y),
                       F.select(mask, a.Z, b.Z))

    def eq(self, p: JPoints, q: JPoints) -> jnp.ndarray:
        """Batched equality across different Z."""
        F = self.F
        z1z1 = F.square(p.Z)
        z2z2 = F.square(q.Z)
        x_eq = F.eq(F.mul(p.X, z2z2), F.mul(q.X, z1z1))
        y_eq = F.eq(F.mul(F.mul(p.Y, z2z2), q.Z), F.mul(F.mul(q.Y, z1z1), p.Z))
        both_inf = self.is_infinity(p) & self.is_infinity(q)
        either_inf = self.is_infinity(p) | self.is_infinity(q)
        return jnp.where(either_inf, both_inf, x_eq & y_eq)

    def neg(self, p: JPoints) -> JPoints:
        return JPoints(p.X, self.F.neg(p.Y), p.Z)

    # ------------------------------------------------------------------
    # group law (branch-free, total)
    # ------------------------------------------------------------------

    def double(self, p: JPoints) -> JPoints:
        """dbl-2009-l (a=0): 1M+5S + adds."""
        F = self.F
        A = F.square(p.X)
        B = F.square(p.Y)
        C = F.square(B)
        # D = 2((X+B)^2 - A - C)
        t = F.square(F.add(p.X, B))
        D = F.double(F.sub(F.sub(t, A), C))
        E = F.add(F.add(A, A), A)          # 3A
        Fq = F.square(E)
        X3 = F.sub(Fq, F.double(D))
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), F.double(F.double(F.double(C))))
        Z3 = F.double(F.mul(p.Y, p.Z))
        # doubling a point with Y=0 (2-torsion; not on odd-order subgroups
        # but be total anyway) or infinity -> infinity
        bad = F.is_zero(p.Y) | self.is_infinity(p)
        return self.select(bad, self.infinity(self._bshape(p.X)),
                           JPoints(X3, Y3, Z3))

    def add(self, p: JPoints, q: JPoints) -> JPoints:
        """add-2007-bl with full case handling via selects: 11M+5S."""
        F = self.F
        Z1Z1 = F.square(p.Z)
        Z2Z2 = F.square(q.Z)
        U1 = F.mul(p.X, Z2Z2)
        U2 = F.mul(q.X, Z1Z1)
        S1 = F.mul(F.mul(p.Y, q.Z), Z2Z2)
        S2 = F.mul(F.mul(q.Y, p.Z), Z1Z1)
        H = F.sub(U2, U1)
        r = F.double(F.sub(S2, S1))
        h_zero = F.is_zero(H)
        r_zero = F.is_zero(r)

        I = F.square(F.double(H))
        J = F.mul(H, I)
        V = F.mul(U1, I)
        rsq = F.square(r)
        X3 = F.sub(F.sub(rsq, J), F.double(V))
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.double(F.mul(S1, J)))
        Z3 = F.mul(F.sub(F.sub(F.square(F.add(p.Z, q.Z)), Z1Z1), Z2Z2), H)
        res = JPoints(X3, Y3, Z3)

        p_inf = self.is_infinity(p)
        q_inf = self.is_infinity(q)
        # same x: either double (same y) or infinity (opposite y)
        dbl = self.double(p)
        res = self.select(h_zero & r_zero & ~p_inf & ~q_inf, dbl, res)
        res = self.select(h_zero & ~r_zero & ~p_inf & ~q_inf,
                          self.infinity(self._bshape(p.X)), res)
        res = self.select(p_inf, q, res)
        res = self.select(q_inf & ~p_inf, p, res)
        return res

    # ------------------------------------------------------------------
    # batch utilities
    # ------------------------------------------------------------------

    def to_affine(self, p: JPoints) -> JAffine:
        """Batch normalization via batched Fermat inversion."""
        F = self.F
        zinv = F.inv(p.Z)            # 0 -> 0 for infinity
        zinv2 = F.square(zinv)
        x = F.mul(p.X, zinv2)
        y = F.mul(p.Y, F.mul(zinv2, zinv))
        return JAffine(x, y, self.is_infinity(p))

    def scalar_mul(self, p: JPoints, scalar_bits: jnp.ndarray) -> JPoints:
        """Batched double-and-add; scalar_bits (..., nbits) int32 MSB-first."""
        def body(acc, bits_col):
            acc = self.double(acc)
            added = self.add(acc, p)
            acc = self.select(bits_col > 0, added, acc)
            return acc, None

        init = self.infinity(self._bshape(p.X))
        bits_t = jnp.moveaxis(scalar_bits, -1, 0)
        out, _ = jax.lax.scan(body, init, bits_t)
        return out


@functools.cache
def jcurve_for(curve: SWCurve) -> JCurve:
    return JCurve(curve)
