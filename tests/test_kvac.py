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


def test_keyed_proof_validity_invalidity():
    from crypto_tpu.kvac.keyed_proof import (KeyedProof,
                                             PublicVerificationKey)
    params = MACParams.new(b"kp-test", 2)
    sk = KVACSecretKey.generate(RNG)
    B_0 = (b.G1.generator() * 12345).normalize()
    good = KeyedProof(B_0=B_0, C=(B_0 * int(sk.x)).normalize())
    assert good.verify(sk.x)
    # pairing-based public verification
    pvk = PublicVerificationKey.new(b"kp-pvk", sk.x)
    assert good.verify_with_public_verification_key(pvk)
    bad = KeyedProof(B_0=B_0, C=(B_0 * 999).normalize())
    assert not bad.verify(sk.x)
    assert not bad.verify_with_public_verification_key(pvk)

    pk = (params.g * int(sk.x)).normalize()
    pov = good.create_proof_of_validity(RNG, sk.x, pk, params.g)
    assert pov.verify(good, pk, params.g)
    assert not pov.verify(bad, pk, params.g)

    poi = bad.create_proof_of_invalidity(RNG, sk.x, pk, params.g)
    assert poi.verify(bad, pk, params.g)
    assert not poi.verify(good, pk, params.g)
    # proving invalidity of a VALID proof must fail at init
    import pytest as _pytest
    from crypto_tpu.schnorr.inequality import InequalityError
    with _pytest.raises(InequalityError):
        good.create_proof_of_invalidity(RNG, sk.x, pk, params.g)


def test_bbdt16_to_keyed_proof():
    params = MACParams.new(b"kvac-kp", 3)
    sk = KVACSecretKey.generate(RNG)
    messages = [F.rand(RNG) for _ in range(3)]
    mac = MAC.new(RNG, messages, sk, params)
    mbs = [MessageOrBlinding.blind_randomly(m) for m in messages]
    prot = PoKOfMACProtocol.init(RNG, mac, params, mbs)
    w = ByteWriter()
    prot.challenge_contribution({}, params, w)
    chal = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(chal)
    kp = proof.to_keyed_proof()
    assert kp.verify(sk.x)
    pov = kp.create_proof_of_validity(RNG, sk.x,
                                      (params.g * int(sk.x)).normalize(),
                                      params.g)
    assert pov.verify(kp, (params.g * int(sk.x)).normalize(), params.g)


def test_bbdt16_original_show():
    """Original Fig.2(2) show protocol with the E commitment over f
    (reference `bbdt_2016/proof.rs`)."""
    from crypto_tpu.kvac.bbdt16 import PoKOfMACOriginalProtocol
    from crypto_tpu.hashing import group_elem_from_try_and_incr

    params = MACParams.new(b"orig-show", 4)
    sk = KVACSecretKey.generate(RNG)
    messages = [F.rand(RNG) for _ in range(4)]
    mac = MAC.new(RNG, messages, sk, params)
    f = group_elem_from_try_and_incr(b.G1, b"pseudonym-base").normalize()

    revealed = {1: messages[1]}
    mabs = [MessageOrBlinding.reveal_message(m) if i in revealed
            else MessageOrBlinding.blind_randomly(m)
            for i, m in enumerate(messages)]
    prot = PoKOfMACOriginalProtocol.init(RNG, mac, params, mabs, f)
    w = ByteWriter()
    prot.challenge_contribution(revealed, params, f, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)

    # transcripts agree between prover and verifier
    w2 = ByteWriter()
    proof.challenge_contribution(revealed, params, f, w2)
    assert bytes(w2.buf) == bytes(w.buf)

    # anyone can check the Schnorr part; the key holder the full proof
    assert proof.verify_schnorr(revealed, c, params, f)
    assert proof.verify(revealed, c, sk, params, f)
    # delegated keyed part
    assert proof.to_keyed_proof().verify(sk.x)
    # wrong revealed message fails
    assert not proof.verify_schnorr({1: messages[1] + F(1)}, c, params, f)
    # wrong key fails
    assert not proof.verify(revealed, c, KVACSecretKey.generate(RNG),
                            params, f)
    # hidden-message responses exist and revealed raise
    proof.get_resp_for_message(0, set(revealed))
    with pytest.raises(Exception):
        proof.get_resp_for_message(1, set(revealed))
