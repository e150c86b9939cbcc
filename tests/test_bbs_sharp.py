"""BBS# end-to-end: MAC issuance + validity proof, PoK with Schnorr and
ECDSA hardware signatures, designated-verifier proofs, HOL tokens
(reference `kvac/src/bbs_sharp/{mac,proof,hol}.rs` tests)."""

import random

from crypto_tpu.bbs_plus.proof import MessageOrBlinding
from crypto_tpu.curves.extra_curves import ecdsa_sign, ecdsa_verify, secp256r1
from crypto_tpu.hashing import compute_random_oracle_challenge
from crypto_tpu.kvac.bbs_sharp import (ECDSA, SCHNORR, HOLSignerProtocol,
                                       HOLUserProtocol, MAC, MACParams,
                                       PoKOfMAC, PoKOfMACProtocol,
                                       ProofOfValidityOfMAC, SecretKey,
                                       SignerPublicKey, UserPublicKey)
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.utils.schnorr_signature import SchnorrSignature

RNG = random.Random(909)
F = secp256r1.scalar_field
N_MSGS = 5


def _setup(ecdsa_hw=False):
    params = MACParams.new(b"bbs-sharp-test", N_MSGS)
    if ecdsa_hw:
        # ECDSA verifies against the canonical generator, so the user key
        # base must be it (reference `proof.rs:1185`)
        params.g = secp256r1.generator().normalize()
    signer_sk = SecretKey.new(RNG, F)
    signer_pk = SignerPublicKey.new_from_params(signer_sk, params)
    user_sk = SecretKey.new(RNG, F)
    user_pk = UserPublicKey.new_from_params(user_sk, params)
    messages = [F.rand(RNG) for _ in range(N_MSGS)]
    mac = MAC.new(RNG, messages, user_pk, signer_sk, params)
    return params, signer_sk, signer_pk, user_sk, user_pk, messages, mac


def test_mac_and_validity_proof():
    params, ssk, spk, usk, upk, messages, mac = _setup()
    assert mac.verify(messages, upk, ssk, params)
    bad = [messages[0] + F(1)] + messages[1:]
    assert not mac.verify(bad, upk, ssk, params)

    proof = ProofOfValidityOfMAC.new(RNG, mac, ssk, spk, params)
    assert proof.verify(mac, messages, upk, spk, params)
    assert not proof.verify(mac, bad, upk, spk, params)
    # designated-verifier variant
    dv = ProofOfValidityOfMAC.new(RNG, mac, ssk, spk, params,
                                  user_public_key=upk)
    assert dv.designated_verifier_pk_proof is not None
    assert dv.verify(mac, messages, upk, spk, params)


def _pok_roundtrip(hw_sig_type, verifier_pk=None, verifier_sk=None):
    params, ssk, spk, usk, upk, messages, mac = _setup(
        ecdsa_hw=(hw_sig_type == ECDSA))
    revealed = {0: messages[0], 2: messages[2]}
    mbs = [MessageOrBlinding.reveal_message(m) if i in revealed
           else MessageOrBlinding.blind_randomly(m)
           for i, m in enumerate(messages)]
    pok = PoKOfMACProtocol.init(RNG, mac, params, mbs, upk,
                                hw_sig_type=hw_sig_type,
                                verifier_pub_key=verifier_pk)
    w = ByteWriter()
    pok.challenge_contribution(revealed, params, w)
    chal = compute_random_oracle_challenge(F, bytes(w.buf))

    # the hardware signs a session message; user transforms for blinded pk
    auth_msg = b"session-binding-12345"
    if hw_sig_type == SCHNORR:
        hw_sig = SchnorrSignature.new(RNG, auth_msg, usk.x, params.g)
        assert hw_sig.verify(auth_msg, upk.point, params.g)
        tsig = pok.transform_schnorr_sig(hw_sig)
    else:
        m = F(int.from_bytes(auth_msg, "big"))
        m_t = pok.transform_message_for_ecdsa_sig(m)
        hw_sig = ecdsa_sign(RNG, int(m_t).to_bytes(32, "big"), int(usk.x))
        tsig = pok.transform_ecdsa_sig(hw_sig)

    proof = pok.gen_proof(chal)
    w2 = ByteWriter()
    proof.challenge_contribution(revealed, params, w2)
    assert bytes(w2.buf) == bytes(w.buf)

    # verify transformed hardware signature against the blinded pk
    if hw_sig_type == SCHNORR:
        assert tsig.verify(auth_msg, proof.blinded_pk, params.g)
    else:
        assert ecdsa_verify(int(m).to_bytes(32, "big"), tsig,
                            proof.blinded_pk)

    assert proof.verify(revealed, chal, ssk, params,
                        verifier_pub_key=verifier_pk)
    # keyed proof for signer-side check
    assert proof.to_keyed_proof().verify(ssk)
    # wrong revealed message fails
    bad_rev = dict(revealed)
    bad_rev[0] = revealed[0] + F(1)
    assert not proof.verify(bad_rev, chal, ssk, params,
                            verifier_pub_key=verifier_pk)
    return proof


def test_pok_of_mac_schnorr_hw():
    proof = _pok_roundtrip(SCHNORR)
    assert proof.designated_verifier_pk_proof is None


def test_pok_of_mac_ecdsa_hw():
    _pok_roundtrip(ECDSA)


def test_pok_of_mac_designated_verifier():
    vsk = SecretKey.new(RNG, F)
    params = MACParams.new(b"bbs-sharp-test", N_MSGS)
    vpk = (params.g_tilde * int(vsk.x)).normalize()
    proof = _pok_roundtrip(SCHNORR, verifier_pk=vpk, verifier_sk=vsk)
    assert proof.designated_verifier_pk_proof is not None


def test_hol_tokens():
    params, ssk, spk, usk, upk, messages, mac = _setup()
    num_tokens = 3
    user = HOLUserProtocol.init(RNG, num_tokens, mac, messages, upk, params)
    signer, pre_chal = HOLSignerProtocol.init(RNG, num_tokens, mac.A, params)
    blinded = user.compute_challenge(pre_chal, params)
    responses = signer.compute_response(blinded, ssk)
    tokens, validity_proofs = user.process_response(responses)
    for pv in validity_proofs:
        assert pv.verify(spk, params)

    # present with a token: verifier needs NO signer key
    revealed = {1: messages[1]}
    mbs = [MessageOrBlinding.reveal_message(m) if i in revealed
           else MessageOrBlinding.blind_randomly(m)
           for i, m in enumerate(messages)]
    pok = PoKOfMACProtocol.init_using_token(
        RNG, tokens[0], validity_proofs[0], params, mbs, upk,
        hw_sig_type=SCHNORR)
    w = ByteWriter()
    pok.challenge_contribution(revealed, params, w)
    chal = compute_random_oracle_challenge(F, bytes(w.buf))
    proof = pok.gen_proof(chal)
    assert proof.verify_given_proof_of_validity(revealed, chal, spk, params)
    # and also against sk directly
    assert proof.verify(revealed, chal, ssk, params)
    wrong_spk = SignerPublicKey.new_from_params(SecretKey.new(RNG, F), params)
    assert not proof.verify_given_proof_of_validity(revealed, chal,
                                                    wrong_spk, params)
