"""equality_across_groups: committed point add/scalar-mult, cross-group
equality (with BP++ range proofs), ECDSA pubkey PoK (reference
`equality_across_groups/src/` test strategy)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.curves.extra_curves import (ecdsa_keygen, ecdsa_sign,
                                            secp256r1, tom256)
from crypto_tpu.hashing import compute_random_oracle_challenge
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.transcript.transcript import Transcript
from crypto_tpu.utils.commitment import PedersenCommitmentKey
from crypto_tpu.equality_across_groups import (
    CommitmentWithOpening, EqParams, PointAdditionProtocol,
    PointCommitmentWithOpening, PoKEcdsaSigCommittedPublicKeyProtocol,
    Proof, ProofLargeWitness, ScalarMultiplicationProtocol,
    TransformedEcdsaSig)
from crypto_tpu.bulletproofs_pp.range_proof import SetupParams

RNG = random.Random(2024)
Ft = tom256.scalar_field
Fs = secp256r1.scalar_field


def _ck(curve, label):
    return PedersenCommitmentKey.new(curve, label)


def test_point_addition_committed():
    ck = _ck(tom256, b"pa-ck")
    g = secp256r1.generator()
    a = g.mul_raw(777).normalize()
    bb = g.mul_raw(31337).normalize()
    t = (a + bb).normalize()
    ca = PointCommitmentWithOpening.new(RNG, a, ck)
    cb = PointCommitmentWithOpening.new(RNG, bb, ck)
    ct = PointCommitmentWithOpening.new(RNG, t, ck)
    prot = PointAdditionProtocol.init(RNG, ca, cb, ct, a, bb, t, ck)
    w = ByteWriter()
    prot.challenge_contribution(w)
    c = compute_random_oracle_challenge(Ft, bytes(w.buf))
    proof = prot.gen_proof(c)
    w2 = ByteWriter()
    proof.challenge_contribution(w2)
    assert bytes(w2.buf) == bytes(w.buf)
    assert proof.verify(ca.comm, cb.comm, ct.comm, c, ck)
    assert not proof.verify(cb.comm, ca.comm, ct.comm, c, ck)
    assert not proof.verify(ca.comm, cb.comm, ca.comm, c, ck)


def test_scalar_mult_committed():
    ck_t = _ck(tom256, b"sm-ck-t")
    ck_s = _ck(secp256r1, b"sm-ck-s")
    g = secp256r1.generator()
    omega = Fs.rand(RNG)
    result = (g * int(omega)).normalize()
    comm_scalar = CommitmentWithOpening.new(RNG, omega, ck_s)
    comm_result = PointCommitmentWithOpening.new(RNG, result, ck_t)
    prot = ScalarMultiplicationProtocol.init(
        RNG, comm_scalar, comm_result, result, g, ck_s, ck_t, num_reps=8)
    w = ByteWriter()
    prot.challenge_contribution(w)
    chal = compute_random_oracle_challenge(Ft, bytes(w.buf)).to_bytes_le()
    proof = prot.gen_proof(chal)
    assert proof.verify(comm_scalar.comm, comm_result.comm, g, chal,
                        ck_s, ck_t)
    bad = bytearray(chal)
    bad[0] ^= 1
    assert not proof.verify(comm_scalar.comm, comm_result.comm, g,
                            bytes(bad), ck_s, ck_t)
    other = CommitmentWithOpening.new(RNG, Fs.rand(RNG), ck_s)
    assert not proof.verify(other.comm, comm_result.comm, g, chal,
                            ck_s, ck_t)


def test_eq_across_groups_secp_bls():
    """52-bit witness committed on secp256r1 and BLS12-381 G1."""
    ck1 = _ck(secp256r1, b"eq-ck1")
    ck2 = _ck(b.G1, b"eq-ck2")
    x = RNG.getrandbits(52)
    x1, x2 = Fs(x), b.Fr(x)
    r1, r2 = Fs.rand(RNG), b.Fr.rand(RNG)
    c1 = ck1.commit(x1, r1)
    c2 = ck2.commit(x2, r2)
    params = EqParams(wit_bits=52, chal_bits=192, abort_param=8, num_reps=1)

    t = Transcript(b"eq-test")
    t.append(b"c1", c1)
    t.append(b"c2", c2)
    proof = Proof.new(RNG, x1, r1, r2, ck1, ck2, t, params)
    tv = Transcript(b"eq-test")
    tv.append(b"c1", c1)
    tv.append(b"c2", c2)
    assert proof.verify(c1, c2, ck1, ck2, tv)
    # wrong commitment fails
    tv = Transcript(b"eq-test")
    tv.append(b"c1", c1)
    tv.append(b"c2", c2)
    assert not proof.verify(c2 if False else ck1.commit(Fs(x + 1), r1), c2,
                            ck1, ck2, tv)
    # multi-rep variant (120-bit challenges, 2 reps)
    p2 = EqParams(wit_bits=52, chal_bits=120, abort_param=80, num_reps=2)
    t = Transcript(b"eq-test2")
    proof = Proof.new(RNG, x1, r1, r2, ck1, ck2, t, p2)
    tv = Transcript(b"eq-test2")
    assert proof.verify(c1, c2, ck1, ck2, tv)


@pytest.mark.slow
def test_eq_across_groups_with_range_proof():
    """Equality + BP++ range proof on the G1 (tom256) side."""
    bpp = SetupParams.new_for_perfect_range_proof(b"eq-rp", 2, 64, 1,
                                                  curve=tom256)
    ck1 = PedersenCommitmentKey(bpp.G, bpp.H_vec[0])
    ck2 = _ck(b.G1, b"eq-rp-ck2")
    x = RNG.getrandbits(52)
    x1, x2 = Ft(x), b.Fr(x)
    r1, r2 = Ft.rand(RNG), b.Fr.rand(RNG)
    c1 = ck1.commit(x1, r1)
    c2 = ck2.commit(x2, r2)
    params = EqParams(wit_bits=64, chal_bits=180, abort_param=8, num_reps=1)
    t = Transcript(b"eq-rp")
    proof = Proof.new_with_range_proof(RNG, x1, r1, r2, ck1, ck2, 2, c1,
                                       bpp, t, params)
    tv = Transcript(b"eq-rp")
    assert proof.verify_with_range_proof(c1, c2, ck1, ck2, bpp, tv)


@pytest.mark.slow
def test_eq_across_groups_large_witness():
    """Full-size scalar chunked into 4x64-bit pieces, aggregated BP++."""
    bpp = SetupParams.new_for_perfect_range_proof(b"eq-lw", 16, 64, 4,
                                                  curve=tom256)
    ck1 = PedersenCommitmentKey(bpp.G, bpp.H_vec[0])
    ck2 = _ck(b.G1, b"eq-lw-ck2")
    x = RNG.getrandbits(250)
    x1, x2 = Ft(x), b.Fr(x)
    r1, r2 = Ft.rand(RNG), b.Fr.rand(RNG)
    c1 = ck1.commit(x1, r1)
    c2 = ck2.commit(x2, r2)
    params = EqParams(wit_bits=64, chal_bits=180, abort_param=8, num_reps=1)
    t = Transcript(b"eq-lw")
    proof = ProofLargeWitness.new(RNG, x1, r1, r2, ck1, ck2, 16, bpp, t,
                                  chunk_bits=64, params=params)
    tv = Transcript(b"eq-lw")
    assert proof.verify(c1, c2, ck1, ck2, bpp, tv)
    tv = Transcript(b"eq-lw")
    assert not proof.verify(ck1.commit(Ft(x + 1), r1), c2, ck1, ck2, bpp, tv)


@pytest.mark.slow
def test_pok_ecdsa_committed_pubkey():
    sk, pk = ecdsa_keygen(RNG)
    msg_hash = bytes(RNG.getrandbits(8) for _ in range(32))
    sig = ecdsa_sign(RNG, msg_hash, sk)
    hashed_m = Fs(int.from_bytes(msg_hash, "big"))
    tsig = TransformedEcdsaSig.new(sig, hashed_m, pk)
    assert tsig.verify_prehashed(hashed_m, pk)

    ck_tom = _ck(tom256, b"pok-ck-t")
    ck_secp = _ck(secp256r1, b"pok-ck-s")
    comm_pk = PointCommitmentWithOpening.new(RNG, pk, ck_tom)
    prot = PoKEcdsaSigCommittedPublicKeyProtocol.init(
        RNG, tsig, hashed_m, pk, comm_pk, ck_secp, ck_tom, num_reps=8)
    w = ByteWriter()
    prot.challenge_contribution(w)
    c = compute_random_oracle_challenge(Ft, bytes(w.buf))
    proof = prot.gen_proof(c)
    w2 = ByteWriter()
    proof.challenge_contribution(w2)
    assert bytes(w2.buf) == bytes(w.buf)
    assert proof.verify(hashed_m, comm_pk.comm, c, ck_secp, ck_tom)
    # wrong message hash fails
    assert not proof.verify(hashed_m + Fs(1), comm_pk.comm, c, ck_secp,
                            ck_tom)
    # wrong public key commitment fails
    other_pk = PointCommitmentWithOpening.new(
        RNG, secp256r1.generator().mul_raw(123).normalize(), ck_tom)
    assert not proof.verify(hashed_m, other_pk.comm, c, ck_secp, ck_tom)
