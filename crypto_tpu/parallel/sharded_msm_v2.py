"""SPMD-sharded device-scheduled MSM (v2 engine) over a device mesh.

Data-parallel Pippenger (SURVEY.md §2.4): points and digits are sharded
along the batch axis; each chip runs the digit-bucket layout + batched-
affine reduction on its shard (`ops/msm_v2.bucket_sums_fn`), then the B
per-bucket partial sums are combined across chips with one `all_gather`
over ICI (B points, KBs — communication independent of N) followed by a
log-depth affine tree add, and the weighted tail runs replicated.

Two combine strategies, selected by backend (override with
`CRYPTO_TPU_SHARDED_COLLECTIVE=0/1`):

* **In-program collective (TPU default)**: the `all_gather`, the log-depth
  bucket combine and the weighted tail all run INSIDE the shard_map
  program, so one jit call per window returns the final window point with
  zero host round-trips — the gather rides ICI and the replicated combine
  overlaps across windows (dispatches are async).
* **Outside-SPMD combine (CPU default)**: the per-device bucket vectors
  come back sharded and are combined after a `device_get`.  XLA:CPU's
  collective rendezvous aborts after 40 s when 8 virtual devices
  time-share the host cores, so the virtual-mesh test lane cannot keep
  collectives inside the program; this fallback exists for that lane
  only.

Communication: one all_gather of (ndev, B) affine points per window; the
per-chip compute is ~(N/ndev) * 7 muls, so scaling efficiency approaches
compute/(compute + B*log(ndev) adds).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curves.sw import SWCurve, Point
from ..curves.jcurve import JCurve, JPoints, jcurve_for
from ..ops.msm_v2 import (DeviceMSM, AffinePoints, _engine_for,
                          affine_pair_add, device_digits, scalars_to_bytes,
                          _global_max_occupancy)


_STEP_CACHE: dict = {}


def in_program_collective() -> bool:
    """True when the cross-shard bucket combine should run inside the SPMD
    program (all_gather over ICI).  Defaults to the backend: real TPU
    meshes keep the collective in-program; the XLA:CPU virtual mesh cannot
    (40 s rendezvous abort when virtual devices starve host threads)."""
    env = os.environ.get("CRYPTO_TPU_SHARDED_COLLECTIVE")
    if env is not None:
        return env not in ("", "0")
    return jax.default_backend() != "cpu"


def make_sharded_window_step(jc: JCurve, mesh: Mesh, c: int, PAD: int,
                             axis: str = "data", collective: bool = False):
    key = (jc, tuple(d.id for d in mesh.devices.flat), c, PAD, axis,
           collective)
    cached = _STEP_CACHE.get(key)
    if cached is not None:
        return cached
    step = _make_sharded_window_step(jc, mesh, c, PAD, axis, collective)
    _STEP_CACHE[key] = step
    return step


def _shard_map(fn, **kwargs):
    try:
        return shard_map(fn, check_vma=False, **kwargs)
    except TypeError:       # older JAX spelling
        return shard_map(fn, check_rep=False, **kwargs)


def _make_sharded_window_step(jc: JCurve, mesh: Mesh, c: int, PAD: int,
                              axis: str = "data", collective: bool = False):
    """Jitted sharded step over one digit window.

    collective=True: (digits (N,), x, y, inf) -> final window point
    (ox, oy, oinf) — per-shard bucket sums, in-program all_gather over
    `axis`, replicated log-depth combine and weighted tail; no host
    round-trips.

    collective=False: -> per-device bucket vectors (ndev*B,) sharded along
    `axis`; the combine + tail run on the fetched output (XLA:CPU lane).
    """
    engine = _engine_for(jc)
    bucket_sums = engine.bucket_sums_fn(c, PAD)
    tail = engine.tail_fn(c)
    F = jc.F
    ndev = mesh.devices.size

    if collective:
        def step(dw, x, y, inf):
            def local(dw_s, x_s, y_s, inf_s):
                Ploc, _maxc, _flag = bucket_sums(dw_s, x_s, y_s, inf_s)
                # one ICI all_gather of the (B,) bucket vector per shard;
                # combine + O(B) tail run replicated on every device
                gx = jax.lax.all_gather(Ploc.x, axis)
                gy = jax.lax.all_gather(Ploc.y, axis)
                gi = jax.lax.all_gather(Ploc.inf, axis)
                bx, by, bi = _combine_stacked(F, gx, gy, gi)
                return tail(bx, by, bi)

            sm = _shard_map(local, mesh=mesh,
                            in_specs=(P(axis), P(axis), P(axis), P(axis)),
                            out_specs=(P(), P(), P()))
            return sm(dw, x, y, inf)
    else:
        def step(dw, x, y, inf):
            def local(dw_s, x_s, y_s, inf_s):
                Ploc, _maxc, _flag = bucket_sums(dw_s, x_s, y_s, inf_s)
                return Ploc.x, Ploc.y, Ploc.inf

            sm = _shard_map(local, mesh=mesh,
                            in_specs=(P(axis), P(axis), P(axis), P(axis)),
                            out_specs=(P(axis), P(axis), P(axis)))
            return sm(dw, x, y, inf)

    return jax.jit(step)


def _combine_stacked(F, gx, gy, gi):
    """(n, B, unit) stacked bucket vectors -> (B, unit) combined, log
    depth (n a power of two)."""
    n = gx.shape[0]
    B = gx.shape[1]
    while n > 1:
        half = n // 2
        A = AffinePoints(gx[:half].reshape((-1,) + gx.shape[2:]),
                         gy[:half].reshape((-1,) + gy.shape[2:]),
                         gi[:half].reshape(-1))
        Bp = AffinePoints(gx[half:n].reshape((-1,) + gx.shape[2:]),
                          gy[half:n].reshape((-1,) + gy.shape[2:]),
                          gi[half:n].reshape(-1))
        S = affine_pair_add(F, A, Bp)
        gx = S.x.reshape((half, B) + S.x.shape[1:])
        gy = S.y.reshape((half, B) + S.y.shape[1:])
        gi = S.inf.reshape(half, B)
        n = half
    return gx[0], gy[0], gi[0]


def combine_bucket_shards(F, gx, gy, gi, ndev: int):
    """(ndev*B, unit) sharded bucket vectors -> (B,) combined, log depth."""
    B = gx.shape[0] // ndev
    return _combine_stacked(F,
                            gx.reshape((ndev, B) + gx.shape[1:]),
                            gy.reshape((ndev, B) + gy.shape[1:]),
                            gi.reshape(ndev, B))


def msm_sharded_v2(curve: SWCurve, points, scalars, mesh: Mesh,
                   c: int = 16, nbits: int | None = None,
                   pad: int | None = None, axis: str = "data",
                   collective: bool | None = None) -> Point:
    """Full sharded MSM; N must divide by the mesh size."""
    jc = jcurve_for(curve)
    F = jc.F
    if nbits is None:
        nbits = curve.scalar_field.bits
    if collective is None:
        collective = in_program_collective()
    if not isinstance(points, JPoints):
        points = jc.pack_points([p.normalize() for p in points])
    n = points.X.shape[0]
    ndev = mesh.devices.size
    assert n % ndev == 0, "pad N to a multiple of the mesh size"

    if isinstance(scalars, jnp.ndarray) and scalars.ndim == 2:
        digits = scalars
    else:
        W_ = (nbits + c) // c
        nbytes = (W_ * c + 7) // 8
        sbytes = scalars_to_bytes([int(s) for s in scalars], nbytes)
        digits = device_digits(jnp.asarray(sbytes), c, nbits)
    W = digits.shape[0]
    inf_mask = jc.is_infinity(points)

    if pad is None:
        # per-shard occupancy <= global occupancy; a shard sees N/ndev
        # points so size the pad from per-shard worst case (recompute on
        # the shard sizes by capping with the global max)
        maxc = int(jax.device_get(
            _global_max_occupancy(digits, inf_mask, 1 << (c - 1))))
        maxc = max(maxc, 1)
        pad = 1 << (maxc - 1).bit_length()

    step = make_sharded_window_step(jc, mesh, c, pad, axis, collective)
    engine = _engine_for(jc)
    tail = engine.tail_fn(c)
    outs = []
    for w in range(W):
        if collective:
            # final window point comes straight out of the SPMD program;
            # dispatches stay async across windows (no host sync)
            outs.append(step(digits[w], points.X, points.Y, inf_mask))
        else:
            gx, gy, gi = step(digits[w], points.X, points.Y, inf_mask)
            # materialize the (ndev*B) bucket vectors on the default
            # device: eager ops on still-sharded arrays would otherwise
            # lower to cross-device collectives outside any mesh program
            gx = jnp.asarray(jax.device_get(gx))
            gy = jnp.asarray(jax.device_get(gy))
            gi = jnp.asarray(jax.device_get(gi))
            bx, by, binf = combine_bucket_shards(F, gx, gy, gi, ndev)
            outs.append(tail(bx, by, binf))

    xs = jnp.stack([jnp.asarray(jax.device_get(o[0])) for o in outs]) \
        if collective else jnp.stack([o[0] for o in outs])
    ys = jnp.stack([jnp.asarray(jax.device_get(o[1])) for o in outs]) \
        if collective else jnp.stack([o[1] for o in outs])
    infs = jnp.stack([jnp.asarray(jax.device_get(o[2])) for o in outs]) \
        if collective else jnp.stack([o[2] for o in outs])
    hx = np.atleast_1d(F.unpack_host(xs))
    hy = np.atleast_1d(F.unpack_host(ys))
    hinf = np.asarray(jax.device_get(infs))
    K = curve.K
    acc = curve.infinity()
    for w in range(W - 1, -1, -1):
        for _ in range(c):
            acc = acc.double()
        if not bool(hinf[w]):
            acc = acc + Point(hx[w], hy[w], K.one(), curve)
    return acc
