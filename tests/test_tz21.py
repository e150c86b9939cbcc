"""TZ21 DKG-in-the-head verifiable encryption tests."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.utils.elgamal import keygen
from crypto_tpu.utils.msm import msm
from crypto_tpu.verifiable_encryption.tz21 import DkgithProof, SeedTree, SALT_SIZE

F = b.Fr
RNG = random.Random(909)


def test_seed_tree_opening():
    import os
    salt = os.urandom(SALT_SIZE)
    tree = SeedTree.create(os.urandom(16), salt, 3, 8)
    for hidden in (0, 3, 7):
        opening = tree.open_all_but(hidden)
        assert len(opening) == 3  # depth of 8-leaf tree
        leaves = SeedTree.reconstruct_leaves(opening, hidden, salt, 3, 8)
        assert set(leaves) == set(range(8)) - {hidden}
        for j, seed in leaves.items():
            assert seed == tree.leaf(j)


def test_dkgith_roundtrip():
    k = 3
    gens = [b.G1.rand(RNG).normalize() for _ in range(k)]
    witnesses = [F.rand(RNG) for _ in range(k)]
    Y = msm(gens, witnesses).normalize()
    enc_g = b.G1.generator()
    sk, pk = keygen(RNG, enc_g)

    proof = DkgithProof.new(RNG, witnesses, Y, gens, pk, enc_g,
                            n_parties=4, reps=8)
    assert proof.verify(Y, gens, pk, enc_g)

    # wrong statement fails
    Y2 = msm(gens, [w + F(1) for w in witnesses]).normalize()
    assert not proof.verify(Y2, gens, pk, enc_g)

    # tampered delta fails
    bad = DkgithProof(salt=proof.salt, challenge=proof.challenge,
                      deltas=[[d + F(1) for d in row] for row in proof.deltas],
                      openings=proof.openings, hidden_cts=proof.hidden_cts,
                      n_parties=proof.n_parties, reps=proof.reps)
    assert not bad.verify(Y, gens, pk, enc_g)

    # compression + decryption recovers the committed witnesses
    compressed = proof.compress(subset_size=3)
    dec = compressed.decrypt(sk, Y, gens)
    assert dec == witnesses


def test_rdkgith_roundtrip():
    from crypto_tpu.verifiable_encryption.rdkgith import RdkgithProof
    from crypto_tpu.hashing import n_group_elements
    wc = 3
    gens = [p.normalize() for p in
            n_group_elements(b.G1, 0, wc, b"rdk-ck")]
    enc_gen = b.G1.generator()
    sk, pk = keygen(RNG, enc_gen)
    witnesses = [F.rand(RNG) for _ in range(wc)]
    commitment = msm(gens, witnesses).normalize()

    proof = RdkgithProof.new(RNG, witnesses, gens, pk, enc_gen,
                             num_parties=8, threshold=5)
    assert proof.verify(commitment, gens, pk, enc_gen)
    bad = msm(gens, [witnesses[0] + F(1)] + witnesses[1:]).normalize()
    assert not proof.verify(bad, gens, pk, enc_gen)

    compressed = proof.compress(subset_size=2)
    dec = compressed.decrypt(sk, commitment, gens)
    assert dec == witnesses
