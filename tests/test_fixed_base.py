"""Device fixed-base window tables vs host scalar multiplication.

Reference parity anchor: `utils/src/msm.rs:8-45` (`FixedBase` window
tables) as used by CRS generation `legogroth16/src/generator.rs`.
"""

import random

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.ops.fixed_base import table_for

rng = random.Random(5)


def test_fixed_base_mul_many():
    # 64-bit table keeps the CPU build fast; full-width covered by the
    # legogroth16 CRS tests on device
    base = b.G1.rand(rng).normalize()
    tab = table_for(b.G1, base, nbits=64)
    scalars = [0, 1, 2, 255, 256, rng.randrange(1 << 64), (1 << 64) - 1]
    got = tab.mul_many_host(scalars)
    for s, g in zip(scalars, got):
        assert g.normalize() == (base * s).normalize(), s


def test_fixed_base_g2():
    base = b.G2.rand(rng).normalize()
    # 16-bit table: the G2/Fq2 table build is eager-op dominated on CPU;
    # windowing width coverage lives in the G1 test above
    tab = table_for(b.G2, base, nbits=16)
    scalars = [rng.randrange(1 << 16) for _ in range(2)]
    got = tab.mul_many_host(scalars)
    for s, g in zip(scalars, got):
        assert g.normalize() == (base * s).normalize()
