"""SAVER verifiable encryption round-trip (BASELINE.md parity config #4
at test scale: chunk size 8 over the full scalar field)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.saver import core as saver
from crypto_tpu.legogroth16 import snark

F = b.Fr
RNG = random.Random(202)


def test_chunk_decompose_compose():
    for cb in (4, 8, 16):
        m = F.rand(RNG)
        chunks = saver.decompose(m, cb)
        assert len(chunks) == saver.chunks_count(cb)
        assert all(0 <= c < (1 << cb) for c in chunks)
        assert saver.compose(chunks, cb) == m


@pytest.fixture(scope="module")
def setup():
    cb = 8
    gens = saver.EncryptionGens.new(b"saver-gens")
    spk = saver.generate_srs(cb, gens, RNG)
    g_i = saver.get_gs_for_encryption(spk.pk.vk)
    sk, ek, dk = saver.keygen(RNG, cb, gens, g_i, spk.pk.delta_g1,
                              spk.gamma_g1)
    return cb, gens, spk, g_i, sk, ek, dk


def test_encrypt_decrypt(setup):
    cb, gens, spk, g_i, sk, ek, dk = setup
    # small message for fast BSGS in GT; full range covered by chunk tests
    msg = F(int.from_bytes(bytes(range(30)), "big") % b.R)
    ct, r = saver.encrypt(RNG, msg, ek, g_i, cb)
    assert saver.verify_ciphertext_commitment(ct, ek, gens)
    dec, nu = saver.decrypt(ct, sk, dk, g_i, cb)
    assert dec == msg
    assert saver.verify_decryption(ct, msg, nu, dk, g_i, gens, cb)
    # wrong message fails decryption check
    assert not saver.verify_decryption(ct, msg + F(1), nu, dk, g_i, gens, cb)


def test_encrypt_with_snark_proof(setup):
    cb, gens, spk, g_i, sk, ek, dk = setup
    msg = F.rand(RNG)
    ct, r, proof = saver.encrypt_with_proof(RNG, msg, ek, spk, cb)
    assert saver.verify_ciphertext_commitment(ct, ek, gens)
    pvk = snark.PreparedVerifyingKey.from_vk(spk.pk.vk)
    assert saver.verify_ciphertext_proof(ct, proof, pvk)
    # tampered ciphertext fails the snark check
    bad = saver.Ciphertext(X_r=ct.X_r,
                           enc_chunks=[ct.enc_chunks[0]] + ct.enc_chunks[1:],
                           commitment=ct.commitment)
    bad.enc_chunks[0] = (bad.enc_chunks[0] + g_i[0]).normalize()
    assert not saver.verify_ciphertext_proof(bad, proof, pvk)
    dec, nu = saver.decrypt(ct, sk, dk, g_i, cb)
    assert dec == msg
