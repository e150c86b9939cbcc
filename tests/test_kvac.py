"""BBDT16 KVAC tests (reference `kvac/src/bbdt_2016/` test shapes)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.kvac.bbdt16 import (MAC, MACParams, KVACSecretKey,
                                    KVACPublicKey, ProofOfValidityOfMAC,
                                    PoKOfMACProtocol)
from crypto_tpu.bbs_plus.proof import MessageOrBlinding
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge
from crypto_tpu.utils.msm import msm

F = b.Fr
RNG = random.Random(303)


@pytest.fixture(scope="module")
def setup():
    n = 4
    params = MACParams.new(b"kvac-params", n)
    sk = KVACSecretKey.generate(RNG)
    pk = KVACPublicKey.generate(sk, params)
    messages = [F.rand(RNG) for _ in range(n)]
    return params, sk, pk, messages


def test_mac_issue_verify(setup):
    params, sk, pk, messages = setup
    mac = MAC.new(RNG, messages, sk, params)
    assert mac.verify(messages, sk, params)
    bad = list(messages)
    bad[0] = bad[0] + F(1)
    assert not mac.verify(bad, sk, params)


def test_proof_of_validity(setup):
    params, sk, pk, messages = setup
    mac = MAC.new(RNG, messages, sk, params)
    pov = ProofOfValidityOfMAC.new(RNG, mac, sk, pk, params)
    assert pov.verify(mac, messages, pk, params)
    other_sk = KVACSecretKey.generate(RNG)
    other_pk = KVACPublicKey.generate(other_sk, params)
    assert not pov.verify(mac, messages, other_pk, params)


def test_blind_issuance(setup):
    params, sk, pk, messages = setup
    hidden = {1, 3}
    blinding = F.rand(RNG)
    bases = [params.g] + [params.g_vec[i] for i in sorted(hidden)]
    scalars = [blinding] + [messages[i] for i in sorted(hidden)]
    commitment = msm(bases, scalars).normalize()
    uncommitted = {i: m for i, m in enumerate(messages) if i not in hidden}
    blind_mac = MAC.new_with_committed_messages(
        RNG, commitment, uncommitted, sk, params)
    mac = blind_mac.unblind(blinding)
    assert mac.verify(messages, sk, params)


def test_pok_of_mac(setup):
    params, sk, pk, messages = setup
    mac = MAC.new(RNG, messages, sk, params)
    revealed_ids = {0}
    mabs = [MessageOrBlinding.reveal_message(m) if i in revealed_ids
            else MessageOrBlinding.blind_randomly(m)
            for i, m in enumerate(messages)]
    prot = PoKOfMACProtocol.init(RNG, mac, params, mabs)
    revealed = {i: messages[i] for i in revealed_ids}
    w = ByteWriter()
    prot.challenge_contribution(revealed, params, w)
    c = compute_random_oracle_challenge(F, w.bytes())
    proof = prot.gen_proof(c)

    w2 = ByteWriter()
    proof.challenge_contribution(revealed, params, w2)
    assert compute_random_oracle_challenge(F, w2.bytes()) == c
    assert proof.verify(revealed, c, sk, params)
    # wrong key fails
    assert not proof.verify(revealed, c, KVACSecretKey.generate(RNG), params)
    # wrong revealed value fails
    assert not proof.verify({0: messages[0] + F(1)}, c, sk, params)
