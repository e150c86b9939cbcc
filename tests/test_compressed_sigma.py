"""Compressed sigma protocol + partial knowledge tests."""

import random

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.compressed_sigma.core import (
    CompSigmaParams, CompressedLinearFormProof, PartialKnowledgeProof)
from crypto_tpu.transcript.transcript import Transcript
from crypto_tpu.utils.msm import msm

F = b.Fr
RNG = random.Random(1414)


def test_compressed_linear_form():
    for n in (4, 8, 7):
        params = CompSigmaParams.new(b"cs-test", 8)
        x = [F.rand(RNG) for _ in range(n)]
        L = [F.rand(RNG) for _ in range(n)]
        P = msm(params.g[:n], x).normalize()
        y = sum((a * c for a, c in zip(L, x)), F(0))
        proof = CompressedLinearFormProof.new(RNG, x, L, params,
                                              Transcript(b"cs"))
        assert proof.verify(P, L, y, params, Transcript(b"cs"))
        # log-size
        assert len(proof.z_final) <= 2
        # wrong evaluation fails
        assert not proof.verify(P, L, y + F(1), params, Transcript(b"cs"))
        # wrong commitment fails
        P2 = (P + params.g[0]).normalize()
        assert not proof.verify(P2, L, y, params, Transcript(b"cs"))


def test_partial_knowledge():
    n, k = 5, 2
    bases = [b.G1.rand(RNG).normalize() for _ in range(n)]
    secrets = [F.rand(RNG) for _ in range(n)]
    pubs = [(bases[i] * int(secrets[i])).normalize() for i in range(n)]
    known = {1: secrets[1], 3: secrets[3]}  # knows 2 of 5
    proof = PartialKnowledgeProof.new(RNG, n, known, bases, pubs,
                                      Transcript(b"pk"))
    assert proof.verify(n, k, bases, pubs, Transcript(b"pk"))
    # claiming more knowledge than the polynomial allows fails
    assert not proof.verify(n, 3, bases, pubs, Transcript(b"pk"))
    # tampered response fails
    proof.responses[0] = proof.responses[0] + F(1)
    assert not proof.verify(n, k, bases, pubs, Transcript(b"pk"))


def test_compressed_homomorphism():
    from crypto_tpu.compressed_sigma.homomorphism import (
        HomRandomCommitment, MSMHomomorphism)
    from crypto_tpu.hashing import n_group_elements
    n = 8
    g = [p.normalize() for p in n_group_elements(b.G1, 0, n, b"ch-g")]
    h = [p.normalize() for p in n_group_elements(b.G1, 0, n, b"ch-h")]
    f = MSMHomomorphism(h)
    x = [F.rand(RNG) for _ in range(n)]
    P = msm(g, x).normalize()
    y = f.eval(x)
    rc = HomRandomCommitment.new(RNG, g, f)
    c = F.rand(RNG)
    resp = rc.response(g, f, x, c)
    assert resp.is_valid(g, P, y, f, rc.A_hat, rc.t, c)
    assert not resp.is_valid(g, P, (y * 2).normalize(), f, rc.A_hat, rc.t, c)
    assert not resp.is_valid(g, P, y, f, rc.A_hat, rc.t, c + F(1))


def test_amortized_homomorphism():
    from crypto_tpu.compressed_sigma.homomorphism import (
        AmortizedHomProof, MSMHomomorphism)
    from crypto_tpu.hashing import n_group_elements
    n, s = 4, 3
    g = [p.normalize() for p in n_group_elements(b.G1, 0, n, b"ah-g")]
    h = [p.normalize() for p in n_group_elements(b.G1, 0, n, b"ah-h")]
    f = MSMHomomorphism(h)
    xs = [[F.rand(RNG) for _ in range(n)] for _ in range(s)]
    Ps = [msm(g, x).normalize() for x in xs]
    ys = [f.eval(x) for x in xs]
    proof = AmortizedHomProof.new(RNG, xs, g, f, b"seed")
    assert proof.verify(Ps, ys, g, f, b"seed")
    assert not proof.verify(Ps, list(reversed(ys)), g, f, b"seed")
    assert not proof.verify(Ps, ys, g, f, b"other-seed")
