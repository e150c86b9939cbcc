"""LegoGroth16 cp_link (QA-NIZK subspace linking) tests."""
import random
from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.legogroth16 import snark, link
from crypto_tpu.r1cs.cs import ConstraintSystem

F = b.Fr
RNG = random.Random(1616)

def _mult(x=None, y=None, z=None):
    def c(cs):
        zv = cs.new_input(z)
        xv = cs.new_witness(x)
        yv = cs.new_witness(y)
        cs.enforce(xv.lc(), yv.lc(), zv.lc())
    return c

def test_subspace_snark():
    n = 3
    bases = [b.G1.rand(RNG).normalize() for _ in range(n)]
    M = [bases, [(p * 5).normalize() for p in bases]]
    ek, vk = link.subspace_keygen(RNG, M)
    w = [F.rand(RNG) for _ in range(n)]
    from crypto_tpu.utils.msm import msm
    x = [msm(M[0], w).normalize(), msm(M[1], w).normalize()]
    pi = link.subspace_prove(ek, w)
    assert link.subspace_verify(vk, x, pi)
    x_bad = [x[1], x[0]]
    assert not link.subspace_verify(vk, x_bad, pi)

def test_legogroth16_with_cp_link():
    x, y = F.rand(RNG), F.rand(RNG)
    pk = snark.generate_random_parameters(_mult(), 2, RNG)
    lk = link.generate_link_keys(RNG, pk.vk)
    pwl, link_v, committed = link.create_proof_incl_cp_link(
        _mult(x, y, x * y), pk, lk, RNG)
    pvk = snark.PreparedVerifyingKey.from_vk(pk.vk)
    assert link.verify_proof_incl_cp_link(pvk, lk, pwl, [x * y])
    assert link.verify_link_commitment(lk, pwl.link_d, committed, link_v)
    assert committed == [x, y]
    bad = link.ProofWithLink(pwl.groth16_proof,
                             (pwl.link_d + lk.link_h).normalize(), pwl.link_pi)
    assert not link.verify_proof_incl_cp_link(pvk, lk, bad, [x * y])
