"""Set commitments and mercurial signatures (delegatable credentials core)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.delegatable_credentials.set_commitment import (
    SetCommitmentSRS, SetCommitment, SubsetWitness, SetCommitmentError)
from crypto_tpu.delegatable_credentials.mercurial_sig import (
    MercurialSecretKey, MercurialPublicKey, MercurialSignature)

F = b.Fr
RNG = random.Random(1515)


def test_set_commitment_subset_opening():
    srs = SetCommitmentSRS.generate(RNG, 8)
    members = {int(F.rand(RNG)) for _ in range(5)}
    comm, rho = SetCommitment.new(RNG, members, srs)
    subset = set(list(members)[:2])
    wit = SubsetWitness.new(members, subset, rho, srs)
    assert wit.verify(subset, comm, srs)
    # full set and empty set
    wit_all = SubsetWitness.new(members, set(members), rho, srs)
    assert wit_all.verify(set(members), comm, srs)
    wit_none = SubsetWitness.new(members, set(), rho, srs)
    assert wit_none.verify(set(), comm, srs)
    # non-subset rejected at creation; forged witness fails verification
    stranger = int(F.rand(RNG))
    with pytest.raises(SetCommitmentError):
        SubsetWitness.new(members, {stranger}, rho, srs)
    assert not wit.verify({stranger}, comm, srs)
    # deterministic trapdoor SRS (test fixture mode)
    srs2 = SetCommitmentSRS.generate_with_trapdoor_seed(b"seed", 4)
    srs3 = SetCommitmentSRS.generate_with_trapdoor_seed(b"seed", 4)
    assert srs2.P1_powers == srs3.P1_powers


def test_set_commitment_randomization():
    srs = SetCommitmentSRS.generate(RNG, 6)
    members = {1, 2, 3}
    comm, rho = SetCommitment.new(RNG, members, srs)
    wit = SubsetWitness.new(members, {1}, rho, srs)
    mu = F.rand_nonzero(RNG)
    comm2 = comm.randomize(mu)
    wit2 = wit.randomize(mu)
    assert wit2.verify({1}, comm2, srs)


def test_mercurial_signature():
    sk = MercurialSecretKey.generate(RNG, 3)
    pk = MercurialPublicKey.generate(sk)
    msgs = [b.G1.rand(RNG).normalize() for _ in range(3)]
    sig = MercurialSignature.new(RNG, msgs, sk)
    assert sig.verify(msgs, pk)
    # wrong message fails
    bad = list(msgs)
    bad[0] = b.G1.rand(RNG).normalize()
    assert not sig.verify(bad, pk)

    # key-class conversion
    mu = F.rand_nonzero(RNG)
    pk2 = pk.convert(mu)
    sig2 = sig.convert(RNG, mu)
    assert sig2.verify(msgs, pk2)
    assert not sig2.verify(msgs, pk)

    # message-class change of representative (unlinkable re-randomization)
    rho = F.rand_nonzero(RNG)
    msgs3, sig3 = sig.change_rep(RNG, msgs, rho)
    assert sig3.verify(msgs3, pk)
    assert sig3.Z != sig.Z and sig3.Y != sig.Y
