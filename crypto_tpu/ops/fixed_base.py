"""Fixed-base scalar multiplication via device-resident window tables.

TPU-native counterpart of arkworks `FixedBase::{get_window_table,
windowed_mul, msm}` (reference `utils/src/msm.rs:8-45`), used for CRS
generation (`legogroth16/src/generator.rs`), ElGamal window tables
(`utils/src/elgamal.rs:96-108`) and batched `h^i` computations.

Design: a (W, 256) table of digit multiples  table[w][d] = d * 2^(8w) * base
is built ONCE on device (masked bit-sums for row 0, then 8 doublings per
subsequent row), after which N scalars cost a gather (N, W) -> (N, W, pts)
plus a log-depth tree reduction over the window axis: ~(W-1) batched point
adds for the whole batch — entirely dense, branch-free device work.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..curves.sw import SWCurve, Point
from ..curves.jcurve import JCurve, JPoints, jcurve_for

WINDOW_BITS = 8


class FixedBaseTable:
    """Device-resident window table for one base point."""

    def __init__(self, curve: SWCurve, base: Point, nbits: int | None = None):
        self.curve = curve
        self.jc: JCurve = jcurve_for(curve)
        self.nbits = nbits or curve.scalar_field.bits
        self.W = (self.nbits + WINDOW_BITS - 1) // WINDOW_BITS
        self.table = self._build(base)       # JPoints with shape (W, 256)

    def _build(self, base: Point) -> JPoints:
        jc = self.jc
        D = 1 << WINDOW_BITS
        # bit points: base, 2*base, ..., 128*base (host doublings: 8 points)
        bit_pts = []
        acc = base.normalize()
        for _ in range(WINDOW_BITS):
            bit_pts.append(acc)
            acc = acc.double().normalize()
        packed = jc.pack_points(bit_pts)                     # (8,)
        # row 0: digit d = sum over set bits of d
        digits = np.arange(D, dtype=np.int64)
        row = jc.infinity((D,))
        for b in range(WINDOW_BITS):
            mask = jnp.asarray((digits >> b) & 1 > 0)
            u = jc.F.unit_ndim
            bp = JPoints(
                jnp.broadcast_to(packed.X[b], (D,) + packed.X.shape[1:]),
                jnp.broadcast_to(packed.Y[b], (D,) + packed.Y.shape[1:]),
                jnp.broadcast_to(packed.Z[b], (D,) + packed.Z.shape[1:]))
            added = jc.jit_add(row, bp)
            row = jc.select(mask, added, row)
        # subsequent rows: double the previous row WINDOW_BITS times
        rows = [row]
        for _ in range(self.W - 1):
            r = rows[-1]
            for _ in range(WINDOW_BITS):
                r = jc.jit_double(r)
            rows.append(r)
        return JPoints(jnp.stack([r.X for r in rows]),
                       jnp.stack([r.Y for r in rows]),
                       jnp.stack([r.Z for r in rows]))

    def mul_many(self, scalars) -> JPoints:
        """(N,) scalars -> (N,) JPoints = scalar_i * base, on device."""
        jc = self.jc
        n = len(scalars)
        digs = np.zeros((n, self.W), dtype=np.int32)
        for i, s in enumerate(scalars):
            s = int(s)
            for w in range(self.W):
                digs[i, w] = s & 0xFF
                s >>= WINDOW_BITS
        return self._reduce_jit(jnp.asarray(digs))

    @functools.cached_property
    def _reduce_jit(self):
        jc = self.jc
        table = self.table

        def reduce(digs):
            # gather (N, W) points from the (W, 256) table
            w_idx = jnp.broadcast_to(
                jnp.arange(self.W, dtype=jnp.int32)[None, :], digs.shape)
            P = JPoints(table.X[w_idx, digs], table.Y[w_idx, digs],
                        table.Z[w_idx, digs])            # (N, W, unit)
            m = self.W
            while m > 1:
                half = m // 2
                rest = m - 2 * half
                a = JPoints(P.X[:, :half], P.Y[:, :half], P.Z[:, :half])
                b = JPoints(P.X[:, half:2 * half], P.Y[:, half:2 * half],
                            P.Z[:, half:2 * half])
                s = jc.add(a, b)
                if rest:
                    s = JPoints(
                        jnp.concatenate([s.X, P.X[:, 2 * half:m]], axis=1),
                        jnp.concatenate([s.Y, P.Y[:, 2 * half:m]], axis=1),
                        jnp.concatenate([s.Z, P.Z[:, 2 * half:m]], axis=1))
                P = s
                m = half + rest
            return JPoints(P.X[:, 0], P.Y[:, 0], P.Z[:, 0])

        return jax.jit(reduce)

    def mul_many_host(self, scalars) -> list[Point]:
        return self.jc.unpack(self.mul_many(scalars))


@functools.lru_cache(maxsize=32)
def _table_cache(curve: SWCurve, key: tuple, nbits: int | None):
    base = Point(*key, curve)
    return FixedBaseTable(curve, base, nbits)


def table_for(curve: SWCurve, base: Point,
              nbits: int | None = None) -> FixedBaseTable:
    b = base.normalize()
    return _table_cache(curve, (b.X, b.Y, b.Z), nbits)
