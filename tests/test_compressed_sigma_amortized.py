"""Amortized compressed-sigma variants (reference
`compressed_sigma/src/{amortized_linear_form,amortized_homomorphisms}.rs`)."""

import random

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.compressed_sigma.core import CompSigmaParams
from crypto_tpu.compressed_sigma.homomorphism import MSMHomomorphism
from crypto_tpu.compressed_sigma.amortized import (
    AmortizedLinearFormProof, AmortizedHomomorphismsProof)
from crypto_tpu.utils.msm import msm

F = b.Fr
RNG = random.Random(88)


def test_amortized_linear_form():
    n, s = 8, 3
    params = CompSigmaParams.new(b"alf", n)
    L = [F.rand(RNG) for _ in range(n)]
    xs = [[F.rand(RNG) for _ in range(n)] for _ in range(s)]
    Ps = [msm(params.g, x).normalize() for x in xs]
    ys = [sum((li * xi for li, xi in zip(L, x)), F(0)) for x in xs]
    proof = AmortizedLinearFormProof.new(RNG, xs, L, params.g, b"seed")
    assert proof.verify(Ps, ys, L, params.g, b"seed")
    # wrong evaluation rejected
    bad = list(ys)
    bad[1] = bad[1] + F(1)
    assert not proof.verify(Ps, bad, L, params.g, b"seed")
    # wrong commitment rejected
    badP = list(Ps)
    badP[0] = (badP[0] + params.g[0]).normalize()
    assert not proof.verify(badP, ys, L, params.g, b"seed")


def test_amortized_homomorphisms():
    n, m = 8, 3
    params = CompSigmaParams.new(b"ahs", n)
    x = [F.rand(RNG) for _ in range(n)]
    P = msm(params.g, x).normalize()
    fs = [MSMHomomorphism([b.G1.rand(RNG).normalize() for _ in range(n)])
          for _ in range(m)]
    ys = [f.eval(x) for f in fs]
    proof = AmortizedHomomorphismsProof.new(RNG, x, params.g, fs, ys, b"s2")
    assert proof.verify(P, params.g, fs, ys, b"s2")
    bad = list(ys)
    bad[2] = (bad[2] + fs[0].bases[0]).normalize()
    assert not proof.verify(P, params.g, fs, bad, b"s2")
