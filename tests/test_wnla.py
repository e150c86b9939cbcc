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
