"""BBS+ end-to-end (BASELINE.md parity config #2): sign/verify, blind
signing, PoK with selective disclosure.  Mirrors reference tests in
`bbs_plus/src/signature.rs` and `bbs_plus/src/proof.rs`."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.bbs_plus.setup import (KeypairG2, SecretKey, SignatureParamsG1,
                                       PublicKeyG2)
from crypto_tpu.bbs_plus.signature import SignatureG1, BBSPlusError
from crypto_tpu.bbs_plus.proof import (MessageOrBlinding, PoKOfSignatureG1Protocol)
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge
from crypto_tpu.utils.checkers import RandomizedPairingChecker
from crypto_tpu.utils.msm import msm


@pytest.fixture(scope="module")
def setup():
    rng = random.Random(0)
    n = 6
    params = SignatureParamsG1.new(b"test-params", n)
    keypair = KeypairG2.generate(rng, params)
    messages = [b.Fr.rand(rng) for _ in range(n)]
    return rng, params, keypair, messages


def test_params_deterministic():
    p1 = SignatureParamsG1.new(b"lbl", 3)
    p2 = SignatureParamsG1.new(b"lbl", 3)
    assert p1.g1 == p2.g1 and p1.g2 == p2.g2 and p1.h == p2.h
    p3 = SignatureParamsG1.new(b"other", 3)
    assert p1.g1 != p3.g1
    assert p1.is_valid()


def test_sign_verify(setup):
    rng, params, keypair, messages = setup
    sig = SignatureG1.new(rng, messages, keypair.secret_key, params)
    assert sig.verify(messages, keypair.public_key, params)
    # tampered message fails
    bad = list(messages)
    bad[0] = bad[0] + b.Fr(1)
    assert not sig.verify(bad, keypair.public_key, params)
    # wrong pk fails
    other = KeypairG2.generate(rng, params)
    assert not sig.verify(messages, other.public_key, params)


def test_sign_verify_with_pairing_checker(setup):
    rng, params, keypair, messages = setup
    sig = SignatureG1.new(rng, messages, keypair.secret_key, params)
    ch = RandomizedPairingChecker(b.Fr.rand(rng), lazy=True)
    sig.verify_with_pairing_checker(messages, keypair.public_key, params, ch)
    sig2 = SignatureG1.new(rng, messages, keypair.secret_key, params)
    sig2.verify_with_pairing_checker(messages, keypair.public_key, params, ch)
    assert ch.verify()


def test_blind_signing(setup):
    rng, params, keypair, messages = setup
    # requester hides messages 0 and 2
    hidden = {0, 2}
    blinding = b.Fr.rand(rng)
    bases = [params.h_0] + [params.h[i] for i in sorted(hidden)]
    scalars = [blinding] + [messages[i] for i in sorted(hidden)]
    commitment = msm(bases, scalars).normalize()
    uncommitted = {i: messages[i] for i in range(len(messages)) if i not in hidden}
    blind_sig = SignatureG1.new_with_committed_messages(
        rng, commitment, uncommitted, keypair.secret_key, params)
    sig = blind_sig.unblind(blinding)
    assert sig.verify(messages, keypair.public_key, params)


def test_pok_selective_disclosure(setup):
    rng, params, keypair, messages = setup
    sig = SignatureG1.new(rng, messages, keypair.secret_key, params)
    revealed_ids = {1, 3}
    mabs = [
        MessageOrBlinding.reveal_message(m) if i in revealed_ids
        else MessageOrBlinding.blind_randomly(m)
        for i, m in enumerate(messages)
    ]
    protocol = PoKOfSignatureG1Protocol.init(rng, sig, params, mabs)
    revealed = {i: messages[i] for i in revealed_ids}

    w = ByteWriter()
    protocol.challenge_contribution(revealed, params, w)
    challenge_p = compute_random_oracle_challenge(b.Fr, w.bytes())
    proof = protocol.gen_proof(challenge_p)

    w2 = ByteWriter()
    proof.challenge_contribution(revealed, params, w2)
    challenge_v = compute_random_oracle_challenge(b.Fr, w2.bytes())
    assert challenge_p == challenge_v
    assert proof.verify(revealed, challenge_v, keypair.public_key, params)

    # wrong revealed message fails
    bad_revealed = dict(revealed)
    bad_revealed[1] = bad_revealed[1] + b.Fr(1)
    with pytest.raises(BBSPlusError):
        proof.verify(bad_revealed, challenge_v, keypair.public_key, params)

    # randomized pairing checker path
    ch = RandomizedPairingChecker(b.Fr.rand(rng), lazy=False)
    proof.verify_with_randomized_pairing_checker(
        revealed, challenge_v, keypair.public_key, params, ch)
    assert ch.verify()


def test_pok_reveal_none_and_all_but_one(setup):
    rng, params, keypair, messages = setup
    sig = SignatureG1.new(rng, messages, keypair.secret_key, params)
    for revealed_ids in (set(), set(range(len(messages) - 1))):
        mabs = [
            MessageOrBlinding.reveal_message(m) if i in revealed_ids
            else MessageOrBlinding.blind_randomly(m)
            for i, m in enumerate(messages)
        ]
        protocol = PoKOfSignatureG1Protocol.init(rng, sig, params, mabs)
        revealed = {i: messages[i] for i in revealed_ids}
        w = ByteWriter()
        protocol.challenge_contribution(revealed, params, w)
        c = compute_random_oracle_challenge(b.Fr, w.bytes())
        proof = protocol.gen_proof(c)
        assert proof.verify(revealed, c, keypair.public_key, params)


def test_pok_message_equality_via_responses(setup):
    """Same blinding for a shared message across two proofs => equal Schnorr
    responses (the cross-statement equality mechanism of the composite proof
    system, reference `proof_system` lib.rs:25-33)."""
    rng, params, keypair, messages = setup
    sig = SignatureG1.new(rng, messages, keypair.secret_key, params)
    shared_blinding = b.Fr.rand(rng)

    def make(msg_idx):
        mabs = [
            MessageOrBlinding.blind_with(m, shared_blinding) if i == msg_idx
            else MessageOrBlinding.blind_randomly(m)
            for i, m in enumerate(messages)
        ]
        prot = PoKOfSignatureG1Protocol.init(rng, sig, params, mabs)
        return prot

    p1, p2 = make(2), make(2)
    w = ByteWriter()
    p1.challenge_contribution({}, params, w)
    p2.challenge_contribution({}, params, w)
    c = compute_random_oracle_challenge(b.Fr, w.bytes())
    pr1, pr2 = p1.gen_proof(c), p2.gen_proof(c)
    assert pr1.get_resp_for_message(2) == pr2.get_resp_for_message(2)
    assert pr1.verify({}, c, keypair.public_key, params)
    assert pr2.verify({}, c, keypair.public_key, params)
