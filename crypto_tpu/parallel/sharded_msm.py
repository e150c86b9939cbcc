"""SPMD-sharded MSM over a device mesh.

The TPU-native replacement for the reference's rayon data-parallel MSM
(SURVEY.md §2.4): points and digits are sharded along the batch axis of a
1-D mesh; every chip runs the identical merge-tree Pippenger program on its
shard, and the per-window partial sums (W points, ~KB) are combined with one
`all_gather` over ICI followed by a log-depth on-chip reduction — the
communication volume is independent of N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curves.sw import SWCurve, Point
from ..curves.jcurve import JCurve, JPoints, jcurve_for
from ..ops.msm import msm_program, scalars_to_digits, horner_combine


def make_msm_step(jc: JCurve, mesh: Mesh, c: int, axis: str = "data"):
    """Builds the jitted sharded MSM step: (points (N,L)x3, digits (W,N))
    -> per-window sums (W,) replicated."""

    def step(PX, PY, PZ, digits):
        def local(px, py, pz, dg):
            part = msm_program(jc, JPoints(px, py, pz), dg, c)
            # combine partials across chips: all_gather (tiny: W points)
            gx = jax.lax.all_gather(part.X, axis)   # (ndev, W, L)
            gy = jax.lax.all_gather(part.Y, axis)
            gz = jax.lax.all_gather(part.Z, axis)
            acc = JPoints(gx, gy, gz)
            n = acc.X.shape[0]
            while n > 1:
                half = n // 2
                a = JPoints(acc.X[:half], acc.Y[:half], acc.Z[:half])
                b = JPoints(acc.X[half:n], acc.Y[half:n], acc.Z[half:n])
                acc = jc.add(a, b)
                n = half
            return acc.X[0], acc.Y[0], acc.Z[0]

        kwargs = dict(mesh=mesh,
                      in_specs=(P(axis), P(axis), P(axis), P(None, axis)),
                      out_specs=(P(), P(), P()))
        try:
            sm = shard_map(local, check_vma=False, **kwargs)
        except TypeError:  # older JAX spelling
            sm = shard_map(local, check_rep=False, **kwargs)
        return sm(PX, PY, PZ, digits)

    return jax.jit(step)


def msm_sharded(curve: SWCurve, points: list[Point] | JPoints,
                scalars, mesh: Mesh, c: int = 15, axis: str = "data",
                nbits: int | None = None) -> Point:
    """Full sharded MSM; returns host Point.  N must divide by mesh size."""
    jc = jcurve_for(curve)
    if not isinstance(points, JPoints):
        points = jc.pack_points(points)
    n = points.X.shape[0]
    ndev = mesh.devices.size
    assert n % ndev == 0, "pad N to a multiple of the mesh size"
    if nbits is None:
        nbits = curve.scalar_field.bits
    digits = jnp.asarray(scalars_to_digits([int(s) for s in scalars], c, nbits))
    step = make_msm_step(jc, mesh, c, axis)
    wx, wy, wz = step(points.X, points.Y, points.Z, digits)
    return horner_combine(jc, curve, JPoints(wx, wy, wz), c)
