"""Coconut / PS signature tests (reference `coconut/src/tests.rs` shapes)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.coconut import core as ps
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge

F = b.Fr
RNG = random.Random(88)


@pytest.fixture(scope="module")
def setup():
    n = 4
    params = ps.PSSignatureParams.new(b"ps-params", n)
    sk = ps.PSSecretKey.generate(RNG, n)
    pk = ps.PSPublicKey.generate(sk, params)
    messages = [F.rand(RNG) for _ in range(n)]
    return params, sk, pk, messages


def test_sign_verify(setup):
    params, sk, pk, messages = setup
    sig = ps.PSSignature.new(RNG, messages, sk, params)
    assert sig.verify(messages, pk, params)
    bad = list(messages)
    bad[1] = bad[1] + F(1)
    assert not sig.verify(bad, pk, params)


def test_deterministic_sign(setup):
    params, sk, pk, messages = setup
    s1 = ps.PSSignature.new_deterministic(messages, sk)
    s2 = ps.PSSignature.new_deterministic(messages, sk)
    assert s1 == s2
    assert s1.verify(messages, pk, params)


def test_blind_issuance(setup):
    params, sk, pk, messages = setup
    hidden = {0, 2}
    h = b.G1.rand(RNG).normalize()
    blindings = {j: F.rand(RNG) for j in hidden}
    items = []
    for i, m in enumerate(messages):
        if i in hidden:
            items.append(ps.MessageCommitment.new(params.g, blindings[i], h, m))
        else:
            items.append(m)
    blind_sig = ps.blind_sign(items, sk, h)
    sig = ps.unblind(blind_sig, sorted(blindings.items()), pk, h)
    assert sig.verify(messages, pk, params)


def test_threshold_signing(setup):
    params, _, _, messages = setup
    t, n_signers = 3, 5
    sks, tsk, tpk = ps.threshold_keygen(RNG, t, n_signers, len(messages), params)
    shares = [(i + 1, ps.PSSignature.new_deterministic(messages, sks[i]))
              for i in (0, 2, 4)]
    agg = ps.aggregate_signatures(shares)
    assert agg.verify(messages, tpk, params)
    # too few shares -> invalid signature
    agg2 = ps.aggregate_signatures(shares[:2])
    assert not agg2.verify(messages, tpk, params)


def test_signature_pok(setup):
    params, sk, pk, messages = setup
    sig = ps.PSSignature.new(RNG, messages, sk, params)
    revealed = {1}
    prot = ps.PSSignaturePoKProtocol.init(
        RNG, sig, messages, revealed, pk, params)
    w = ByteWriter()
    prot.challenge_contribution(pk, params, w)
    c = compute_random_oracle_challenge(F, w.bytes())
    proof = prot.gen_proof(c)

    w2 = ByteWriter()
    proof.challenge_contribution(pk, params, w2)
    assert compute_random_oracle_challenge(F, w2.bytes()) == c
    assert proof.verify(c, {1: messages[1]}, pk, params)
    # wrong revealed value fails
    assert not proof.verify(c, {1: messages[1] + F(1)}, pk, params)
    # unlinkability: two shows of the same credential differ
    prot2 = ps.PSSignaturePoKProtocol.init(
        RNG, sig, messages, revealed, pk, params)
    assert prot2.randomized.sigma_1 != proof.randomized.sigma_1
