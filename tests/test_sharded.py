"""Sharded (multi-device) MSM and NTT on the virtual CPU mesh."""
import random
import numpy as np
import jax
from jax.sharding import Mesh
import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.parallel.sharded_ntt import sharded_ntt
from crypto_tpu.ops.ntt import domain_for

F = b.Fr
RNG = random.Random(1717)

def test_sharded_ntt_matches_single_device():
    ndev = min(8, len(jax.devices()))
    if ndev < 2:
        pytest.skip("needs multiple devices")
    n = 16 * ndev if (16 * ndev) & (16 * ndev - 1) == 0 else 128
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("data",))
    vals = [RNG.randrange(b.R) for _ in range(n)]
    out = sharded_ntt(F, vals, mesh)
    expected = domain_for(F, n).ntt_ints(vals)
    assert out == expected
