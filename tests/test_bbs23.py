"""BBS (2023) signature + PoK tests."""

import random

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.bbs_plus.setup import SecretKey
from crypto_tpu.bbs_plus.bbs23 import (SignatureParams23G1, PublicKey23G2,
                                       Signature23G1,
                                       PoKOfSignature23G1Protocol)
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge

F = b.Fr
RNG = random.Random(404)


def _setup(n=5):
    params = SignatureParams23G1.new(b"bbs23-params", n)
    sk = SecretKey.generate(RNG)
    pk = PublicKey23G2.generate(sk, params)
    messages = [F.rand(RNG) for _ in range(n)]
    return params, sk, pk, messages


def test_sign_verify():
    params, sk, pk, messages = _setup()
    sig = Signature23G1.new(RNG, messages, sk, params)
    assert sig.verify(messages, pk, params)
    bad = list(messages)
    bad[2] = bad[2] + F(1)
    assert not sig.verify(bad, pk, params)


def test_pok():
    params, sk, pk, messages = _setup()
    sig = Signature23G1.new(RNG, messages, sk, params)
    revealed_ids = {1, 4}
    prot = PoKOfSignature23G1Protocol.init(
        RNG, sig, params, messages, revealed_ids)
    revealed = {i: messages[i] for i in revealed_ids}
    w = ByteWriter()
    prot.challenge_contribution(revealed, params, w)
    c = compute_random_oracle_challenge(F, w.bytes())
    proof = prot.gen_proof(c)
    w2 = ByteWriter()
    proof.challenge_contribution(revealed, params, w2)
    assert compute_random_oracle_challenge(F, w2.bytes()) == c
    assert proof.verify(revealed, c, pk, params)
    assert not proof.verify({1: messages[1] + F(1), 4: messages[4]}, c, pk, params)


def test_message_equality_across_signatures():
    """Shared signature randomizer + shared blinding => equal responses for
    the shared message (`proof_23.rs` doc requirement)."""
    params, sk, pk, messages = _setup()
    messages2 = list(messages)
    messages2[3] = F.rand(RNG)  # different except message 2
    sig1 = Signature23G1.new(RNG, messages, sk, params)
    sig2 = Signature23G1.new(RNG, messages2, sk, params)
    r = F.rand_nonzero(RNG)
    shared_blinding = F.rand(RNG)
    p1 = PoKOfSignature23G1Protocol.init(
        RNG, sig1, params, messages, set(), sig_randomizer=r,
        blindings={2: shared_blinding})
    p2 = PoKOfSignature23G1Protocol.init(
        RNG, sig2, params, messages2, set(), sig_randomizer=r,
        blindings={2: shared_blinding})
    w = ByteWriter()
    p1.challenge_contribution({}, params, w)
    p2.challenge_contribution({}, params, w)
    c = compute_random_oracle_challenge(F, w.bytes())
    pr1, pr2 = p1.gen_proof(c), p2.gen_proof(c)
    assert pr1.verify({}, c, pk, params)
    assert pr2.verify({}, c, pk, params)
    # responses for message index 2 (witness m*r) are equal
    i1 = pr1.hidden_indices.index(2) + 1
    i2 = pr2.hidden_indices.index(2) + 1
    assert pr1.response.get_response(i1) == pr2.response.get_response(i2)


def test_bbs23_ietf_pok():
    from crypto_tpu.bbs_plus.bbs23 import (PoKOfSignature23IETFProtocol)
    from crypto_tpu.serialize import ByteWriter
    from crypto_tpu.hashing import compute_random_oracle_challenge
    n = 5
    params = SignatureParams23G1.new(b"bbs23-ietf", n)
    sk = SecretKey.generate(RNG)
    pk = PublicKey23G2.generate(sk, params)
    messages = [F.rand(RNG) for _ in range(n)]
    sig = Signature23G1.new(RNG, messages, sk, params)
    revealed = {0: messages[0], 3: messages[3]}
    prot = PoKOfSignature23IETFProtocol.init(RNG, sig, params, messages,
                                             set(revealed))
    w = ByteWriter()
    prot.challenge_contribution(revealed, params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    w2 = ByteWriter()
    proof.challenge_contribution(revealed, params, w2)
    assert bytes(w2.buf) == bytes(w.buf)
    assert proof.verify(revealed, c, pk, params)
    bad = dict(revealed)
    bad[0] = revealed[0] + F(1)
    assert not proof.verify(bad, c, pk, params)
    from crypto_tpu.utils.checkers import RandomizedPairingChecker
    ck = RandomizedPairingChecker(F.rand(RNG), lazy=True)
    assert proof.verify(revealed, c, pk, params, pairing_checker=ck)
    assert ck.verify()


def test_bbs23_cdl_pok():
    from crypto_tpu.bbs_plus.bbs23 import PoKOfSignature23CDLProtocol
    from crypto_tpu.serialize import ByteWriter
    from crypto_tpu.hashing import compute_random_oracle_challenge
    n = 4
    params = SignatureParams23G1.new(b"bbs23-cdl", n)
    sk = SecretKey.generate(RNG)
    pk = PublicKey23G2.generate(sk, params)
    messages = [F.rand(RNG) for _ in range(n)]
    sig = Signature23G1.new(RNG, messages, sk, params)
    revealed = {1: messages[1]}
    prot = PoKOfSignature23CDLProtocol.init(RNG, sig, params, messages,
                                            set(revealed))
    w = ByteWriter()
    prot.challenge_contribution(revealed, params, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = prot.gen_proof(c)
    assert proof.verify(revealed, c, pk, params)
    assert not proof.verify({1: messages[1] + F(1)}, c, pk, params)
