"""Device fixed-base window tables vs host scalar multiplication.

Reference parity anchor: `utils/src/msm.rs:8-45` (`FixedBase` window
tables) as used by CRS generation `legogroth16/src/generator.rs`.
"""

import random

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.ops.fixed_base import table_for

rng = random.Random(5)


def test_fixed_base_mul_many():
    base = b.G1.rand(rng).normalize()
    tab = table_for(b.G1, base)
    scalars = [0, 1, 2, 255, 256, rng.randrange(b.Fr.p), b.Fr.p - 1]
    got = tab.mul_many_host(scalars)
    for s, g in zip(scalars, got):
        assert g.normalize() == (base * s).normalize(), s


def test_fixed_base_g2():
    base = b.G2.rand(rng).normalize()
    tab = table_for(b.G2, base)
    scalars = [rng.randrange(b.Fr.p) for _ in range(3)]
    got = tab.mul_many_host(scalars)
    for s, g in zip(scalars, got):
        assert g.normalize() == (base * s).normalize()
