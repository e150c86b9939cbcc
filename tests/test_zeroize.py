"""Secret wiping (reference `Zeroize`/`ZeroizeOnDrop` derives,
`bbs_plus/src/setup.rs:88-92`)."""

import random

import numpy as np

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.utils.zeroize import wipe_bytes, zeroize
from crypto_tpu.bbs_plus.setup import SecretKey
from crypto_tpu.accumulator.setup import AccumSecretKey

RNG = random.Random(1)


def test_wipe_bytes():
    buf = bytearray(b"super secret seed")
    wipe_bytes(buf)
    assert bytes(buf) == b"\x00" * 17
    arr = np.frombuffer(bytearray(b"\x01" * 16), dtype=np.uint8).copy()
    wipe_bytes(arr)
    assert not arr.any()


def test_secret_key_zeroize():
    sk = SecretKey.generate(RNG)
    assert not sk.x.is_zero()
    sk.zeroize()
    assert sk.x.is_zero()

    ak = AccumSecretKey.generate(RNG)
    ak.zeroize()
    assert ak.alpha.is_zero()
