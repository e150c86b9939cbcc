"""SAVER + LegoGroth16 wrapper (reference `saver/src/saver_legogroth16.rs`
test `encrypt_and_snark_verification`)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.saver import core as saver
from crypto_tpu.saver import lego
from crypto_tpu.legogroth16 import snark

F = bls.Fr


@pytest.fixture(scope="module")
def setup():
    rng = random.Random(0)
    chunk_bit_size = 8
    gens = saver.EncryptionGens.new(b"test-lego-saver")
    srs = lego.generate_srs(chunk_bit_size, gens, rng)
    sk, ek, dk = lego.keygen(rng, chunk_bit_size, gens, srs)
    return rng, chunk_bit_size, gens, srs, sk, ek, dk


def test_protocol1_roundtrip(setup):
    rng, cbs, gens, srs, sk, ek, dk = setup
    g_i = lego.get_gs_for_encryption(srs.pk.vk)
    message = F.rand(rng)
    ct, r = saver.encrypt(rng, message, ek, g_i, cbs)

    # decryption recovers the message through the Lego CRS bases
    dec, nu = saver.decrypt(ct, sk, dk, g_i, cbs)
    assert dec == message

    v = F.rand(rng)
    proof = lego.protocol1_create_proof(message, v, r, srs, ek, cbs, rng)
    pvk = snark.PreparedVerifyingKey.from_vk(srs.pk.vk)
    assert saver.verify_ciphertext_commitment(ct, ek, gens)
    assert lego.protocol1_verify_proof(pvk, proof, ct)

    # D opens to the chunks with randomness v
    chunks = [F(c) for c in saver.decompose(message, cbs)]
    assert snark.verify_commitment(srs.pk.vk, proof.proof, [], chunks, v)

    # tampered ciphertext rejected
    bad = saver.Ciphertext(X_r=ct.X_r,
                           enc_chunks=[ct.enc_chunks[0] + ct.enc_chunks[1]]
                           + ct.enc_chunks[1:],
                           commitment=ct.commitment)
    assert not lego.protocol1_verify_proof(pvk, proof, bad)


def test_protocol2_roundtrip(setup):
    rng, cbs, gens, srs, sk, ek, dk = setup
    g_i = lego.get_gs_for_encryption(srs.pk.vk)
    message = F.rand(rng)
    ct2, r = lego.encrypt_alt(rng, message, ek, g_i, cbs)
    v = F.rand(rng)
    proof = lego.protocol2_create_proof(message, v, r, srs, ek, cbs, rng)
    pvk = snark.PreparedVerifyingKey.from_vk(srs.pk.vk)
    ct_plain = saver.Ciphertext(X_r=ct2.X_r, enc_chunks=ct2.enc_chunks,
                                commitment=ct2.commitment)
    assert saver.verify_ciphertext_commitment(ct_plain, ek, gens)
    assert lego.protocol2_verify_proof(pvk, proof, ct2)

    chunks = [F(c) for c in saver.decompose(message, cbs)]
    assert snark.verify_commitment(srs.pk.vk, proof, [], chunks, v)

    # wrong X_r_sum rejected
    bad = lego.CiphertextAlt(X_r=ct2.X_r, enc_chunks=ct2.enc_chunks,
                             commitment=ct2.commitment,
                             X_r_sum=(ct2.X_r_sum + ct2.X_r).normalize())
    assert not lego.protocol2_verify_proof(pvk, proof, bad)
