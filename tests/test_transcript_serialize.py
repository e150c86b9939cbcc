"""Transcript (merlin/STROBE) and serialization tests."""

import hashlib
import random

from crypto_tpu.transcript.merlin import MerlinTranscript
from crypto_tpu.transcript.keccak import keccak_f1600
from crypto_tpu.transcript.transcript import Transcript
from crypto_tpu.curves import bls12_381 as b
from crypto_tpu import serialize as ser
from crypto_tpu import hashing


def test_merlin_known_vector():
    """Vector from the merlin crate's equivalence test — proves bit-exact
    Fiat-Shamir compatibility with the reference's transcript core."""
    t = MerlinTranscript(b"test protocol")
    t.append_message(b"some label", b"some data")
    c = t.challenge_bytes(b"challenge", 32)
    assert c.hex() == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_keccak_vs_hashlib_sha3():
    def sha3_256(msg: bytes) -> bytes:
        rate = 136
        st = bytearray(200)
        m = bytearray(msg)
        m.append(0x06)
        while len(m) % rate:
            m.append(0)
        m[-1] |= 0x80
        for i in range(0, len(m), rate):
            for j in range(rate):
                st[j] ^= m[i + j]
            keccak_f1600(st)
        return bytes(st[:32])

    for msg in (b"", b"abc", b"x" * 500):
        assert sha3_256(msg) == hashlib.sha3_256(msg).digest()


def test_transcript_determinism_and_sensitivity():
    def run(data):
        t = Transcript(b"proto")
        t.append_message(b"m", data)
        return t.challenge_scalar(b.Fr, b"c")

    a, a2, c = run(b"hello"), run(b"hello"), run(b"world")
    assert a == a2
    assert a != c
    assert not a.is_zero()


def test_transcript_challenge_group_elem():
    t = Transcript(b"proto")
    t.append_message(b"m", b"seed")
    p = t.challenge_group_elem(b.G1, b"g")
    assert p.is_on_curve()
    assert p.mul_raw(b.R).is_infinity()


def test_point_serialization_roundtrip():
    rng = random.Random(3)
    for curve in (b.G1, b.G2):
        p = curve.rand(rng)
        for compressed in (True, False):
            data = ser.serialize_point(p, compressed)
            q = ser.deserialize_point(curve, data, compressed)
            assert q == p
        # infinity
        data = ser.serialize_point(curve.infinity())
        assert ser.deserialize_point(curve, data).is_infinity()


def test_point_serialization_sizes():
    assert ser.point_nbytes(b.G1, True) == 48
    assert ser.point_nbytes(b.G1, False) == 96
    assert ser.point_nbytes(b.G2, True) == 96
    assert ser.point_nbytes(b.G2, False) == 192


def test_deserialize_rejects_bad_points():
    import pytest
    rng = random.Random(4)
    p = b.G1.rand(rng)
    data = bytearray(ser.serialize_point(p))
    data[0] ^= 1  # corrupt x
    try:
        q = ser.deserialize_point(b.G1, bytes(data))
        # if it decompressed, it must differ from p
        assert q != p
    except ValueError:
        pass


def test_hash_to_group():
    p = hashing.group_elem_from_try_and_incr(b.G1, b"test label")
    q = hashing.group_elem_from_try_and_incr(b.G1, b"test label")
    r = hashing.group_elem_from_try_and_incr(b.G1, b"other label")
    assert p == q and p != r
    assert p.is_on_curve() and p.mul_raw(b.R).is_infinity()
    p2 = hashing.group_elem_from_try_and_incr(b.G2, b"g2 label")
    assert p2.is_on_curve() and p2.mul_raw(b.R).is_infinity()


def test_hash_to_field():
    x = hashing.field_elem_from_try_and_incr(b.Fr, b"data")
    y = hashing.field_elem_from_try_and_incr(b.Fr, b"data")
    z = hashing.field_elem_from_try_and_incr(b.Fr, b"data2")
    assert x == y != z
