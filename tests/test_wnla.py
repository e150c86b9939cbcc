"""Bulletproofs++ weighted norm linear argument tests."""
import random
from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.bulletproofs_pp.wnla import (BppSetupParams, commit,
    inner_product, weighted_norm, WeightedNormLinearArgument)
from crypto_tpu.transcript.transcript import Transcript

F = b.Fr
RNG = random.Random(1111)

def test_wnla_roundtrip():
    for (nl, nn) in [(4, 8), (1, 16)]:
        params = BppSetupParams.new(b"wnla-test", nn, nl)
        l = [F.rand(RNG) for _ in range(nl)]
        n = [F.rand(RNG) for _ in range(nn)]
        c = [F.rand(RNG) for _ in range(nl)]
        rho = F.rand_nonzero(RNG)
        v = inner_product(c, l) + weighted_norm(n, rho * rho)
        C = commit(params, v, l, n)
        arg = WeightedNormLinearArgument.new(l, n, c, rho, params,
                                             Transcript(b"wnla"))
        assert arg.verify(c, rho, C, params, Transcript(b"wnla"))
        assert not arg.verify([x + F(1) for x in c], rho, C, params,
                              Transcript(b"wnla"))
        # proof sizes are logarithmic
        assert len(arg.l) == 1 and len(arg.n) == 1

def test_wnla_transcript_binding():
    nl = nn = 4
    params = BppSetupParams.new(b"wnla-test2", nn, nl)
    l = [F.rand(RNG) for _ in range(nl)]
    n = [F.rand(RNG) for _ in range(nn)]
    c = [F.rand(RNG) for _ in range(nl)]
    rho = F.rand_nonzero(RNG)
    v = inner_product(c, l) + weighted_norm(n, rho * rho)
    C = commit(params, v, l, n)
    arg = WeightedNormLinearArgument.new(l, n, c, rho, params,
                                         Transcript(b"ctx-A"))
    # different transcript context -> rejected
    assert not arg.verify(c, rho, C, params, Transcript(b"ctx-B"))


def test_bpp_range_proof_roundtrip():
    from crypto_tpu.bulletproofs_pp.range_proof import Prover, SetupParams
    rng = random.Random(99)
    for base, num_bits, vals in [(2, 4, [7]), (16, 8, [243]),
                                 (2, 16, [12431]), (16, 16, [65535, 0])]:
        params = SetupParams.new_for_perfect_range_proof(
            b"bpp-test", base, num_bits, len(vals))
        gamma = [F.rand(rng) for _ in vals]
        V = [params.compute_pedersen_commitment(v, g)
             for v, g in zip(vals, gamma)]
        prover = Prover(base, num_bits, V, list(vals), gamma)
        proof = prover.prove(rng, params, Transcript(b"bpp"))
        assert proof.verify(num_bits, V, params, Transcript(b"bpp"))
        assert not proof.verify(num_bits, list(reversed(V)), params,
                                Transcript(b"bpp")) or len(V) == 1


def test_bpp_range_proof_out_of_range():
    from crypto_tpu.bulletproofs_pp.range_proof import (Prover, SetupParams)
    from crypto_tpu.bulletproofs_pp.wnla import BppError
    rng = random.Random(100)
    params = SetupParams.new_for_perfect_range_proof(b"bpp-oob", 16, 4, 1)
    gamma = [F.rand(rng)]
    V = [params.compute_pedersen_commitment(243, gamma[0])]
    try:
        Prover(16, 4, V, [243], gamma).prove(rng, params, Transcript(b"bpp"))
        assert False, "should reject out-of-range value"
    except BppError:
        pass
