"""Sharded device-scheduled MSM over the 8-device virtual mesh."""

import random

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.parallel.sharded_msm_v2 import msm_sharded_v2

rng = random.Random(31)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_msm_sharded_v2_vs_host():
    n = 64
    pts = [b.G1.rand(rng).normalize() for _ in range(n)]
    # 64-bit scalars: full-width digits are covered by the unsharded G1
    # tests; this exercises the shard_map layout + combine (8 windows
    # instead of 32 keeps the virtual-mesh run ~4x cheaper)
    scs = [rng.randrange(0, 1 << 64) for _ in range(n)]
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    got = msm_sharded_v2(b.G1, pts, scs, mesh, c=8, nbits=64)
    exp = b.G1.infinity()
    for p, s in zip(pts, scs):
        exp = exp + p * s
    assert got.normalize() == exp.normalize()


@pytest.mark.slow
def test_msm_sharded_v2_in_program_collective_1dev():
    """The TPU-default in-program path (all_gather + replicated log-depth
    combine + fused tail INSIDE the shard_map program) executes on a
    1-device mesh even on XLA:CPU: a 1-device all_gather needs no
    cross-device rendezvous, so this covers the exact code real chips run
    (round-4 Weak #4: that path previously had zero in-tree coverage).
    Slow lane: the XLA:CPU compile of the jitted collective step is
    minutes; the same path also runs on the real chip in
    benches/dev_r5_tpu_session.py with recorded output."""
    n = 32
    pts = [b.G1.rand(rng).normalize() for _ in range(n)]
    scs = [rng.randrange(0, 1 << 16) for _ in range(n)]
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    # nbits=16 (2 windows) keeps the XLA:CPU compile of the jitted
    # collective step as small as the engine allows (c must be 8 or 16)
    got = msm_sharded_v2(b.G1, pts, scs, mesh, c=8, nbits=16,
                         collective=True)
    exp = b.G1.infinity()
    for p, s in zip(pts, scs):
        exp = exp + p * s
    assert got.normalize() == exp.normalize()


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_msm_sharded_v2_in_program_collective_2dev():
    """2-device in-program all_gather on the virtual CPU mesh (slow lane:
    XLA:CPU cross-device rendezvous is fragile under core starvation; a
    2-device axis is the smallest real collective)."""
    n = 32
    pts = [b.G1.rand(rng).normalize() for _ in range(n)]
    scs = [rng.randrange(0, 1 << 32) for _ in range(n)]
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    got = msm_sharded_v2(b.G1, pts, scs, mesh, c=8, nbits=32,
                         collective=True)
    exp = b.G1.infinity()
    for p, s in zip(pts, scs):
        exp = exp + p * s
    assert got.normalize() == exp.normalize()
