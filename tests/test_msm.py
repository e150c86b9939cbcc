"""Device MSM (merge-tree Pippenger) and sharded MSM tests."""

import random

import numpy as np
import pytest

# legacy merge-tree MSM engine (ops/msm.py), superseded by ops/msm_v2 on
# the hot path; exercised in the slow lane to keep default CI latency down
pytestmark = pytest.mark.slow

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.ops.msm import msm_device, scalars_to_digits
from crypto_tpu.utils.msm import msm as msm_host

RNG = random.Random(123)


def _setup(n, edge_cases=True):
    pts = [b.G1.rand(RNG) for _ in range(n)]
    sc = [RNG.randrange(b.R) for _ in range(n)]
    if edge_cases and n >= 4:
        pts[0] = b.G1.infinity()
        sc[1] = 0
        pts[2] = pts[3]  # duplicate point
        sc[3] = sc[2]    # duplicate scalar too (same bucket, equal points)
    return pts, sc


def test_digits():
    d = scalars_to_digits([0x1234, 1], 4, 16)
    assert d.shape == (4, 2)
    assert list(d[:, 0]) == [4, 3, 2, 1]
    assert list(d[:, 1]) == [1, 0, 0, 0]


@pytest.mark.parametrize("n,c", [(7, 4), (64, 8), (200, 8)])
def test_msm_device_matches_host(n, c):
    pts, sc = _setup(n)
    dev = msm_device(b.G1, pts, sc, c=c)
    host = msm_host(pts, [b.Fr(s) for s in sc])
    assert dev == host


def test_msm_all_same_digit():
    """Adversarial: every scalar identical (single hot bucket per window)."""
    n = 32
    pts = [b.G1.rand(RNG) for _ in range(n)]
    s = RNG.randrange(b.R)
    sc = [s] * n
    dev = msm_device(b.G1, pts, sc, c=8)
    host = msm_host(pts, [b.Fr(x) for x in sc])
    assert dev == host


def test_msm_all_zero():
    n = 8
    pts = [b.G1.rand(RNG) for _ in range(n)]
    dev = msm_device(b.G1, pts, [0] * n, c=4)
    assert dev.is_infinity()


def test_msm_sharded():
    import jax
    from jax.sharding import Mesh
    from crypto_tpu.parallel.sharded_msm import msm_sharded

    ndev = min(8, len(jax.devices()))
    n = 8 * ndev
    pts, sc = _setup(n)
    sc = [s % (1 << 32) for s in sc]
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("data",))
    out = msm_sharded(b.G1, pts, sc, mesh, c=8, nbits=32)
    host = msm_host(pts, [b.Fr(s) for s in sc])
    assert out == host
