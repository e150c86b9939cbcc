"""ElGamal family + discrete-log solving tests."""

import random

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.utils import elgamal as eg

F = b.Fr
RNG = random.Random(101)


def test_plain_elgamal():
    g = b.G1.generator()
    sk, pk = eg.keygen(RNG, g)
    msg = b.G1.rand(RNG).normalize()
    ct, r = eg.Ciphertext.new(RNG, msg, pk, g)
    assert ct.decrypt(sk) == msg
    ct2, _ = ct.rerandomize(RNG, pk, g)
    assert ct2.encrypted != ct.encrypted
    assert ct2.decrypt(sk) == msg


def test_hashed_elgamal():
    g = b.G1.generator()
    sk, pk = eg.keygen(RNG, g)
    m = F.rand(RNG)
    ct, _ = eg.HashedElgamalCiphertext.new(RNG, m, pk, g)
    assert ct.decrypt(sk) == m


def test_batched_hashed_elgamal():
    g = b.G1.generator()
    sk, pk = eg.keygen(RNG, g)
    msgs = [F.rand(RNG) for _ in range(5)]
    ct, _ = eg.BatchedHashedElgamalCiphertext.new(RNG, msgs, pk, g)
    assert ct.decrypt(sk) == msgs


def test_bsgs_point():
    g = b.G1.generator()
    for x in (0, 1, 7, 255, 1000):
        target = g.mul_raw(x)
        assert eg.solve_discrete_log_bsgs(1024, g, target) == x
    assert eg.solve_discrete_log_bsgs(100, g, g.mul_raw(512)) is None


def test_bsgs_gt():
    e = b.gt_generator()
    for x in (0, 3, 200):
        assert eg.solve_discrete_log_bsgs(256, e, e ** x) == x
    assert eg.solve_discrete_log_brute_force(256, e, e ** 100) == 100
