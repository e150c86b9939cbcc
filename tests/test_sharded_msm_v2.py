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
