"""FROST and Gennaro DKG tests (all participants in-process)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.secret_sharing.common import SSError, Share, Shares
from crypto_tpu.secret_sharing.schemes import reconstruct_secret
from crypto_tpu.secret_sharing.dkg import (FrostDKGParticipant,
                                           GennaroDKGParticipant)

F = b.Fr
RNG = random.Random(1212)


def test_frost_dkg():
    g = b.G1.generator()
    n, t = 4, 3
    parts = {i: FrostDKGParticipant(i, t, n, b"frost-ctx", g)
             for i in range(1, n + 1)}
    r1 = {i: p.start(RNG) for i, p in parts.items()}
    for i, p in parts.items():
        for j, (comms, pok) in r1.items():
            if i != j:
                p.receive_round1(j, comms, pok)
    for i, p in parts.items():
        for j, dealer in parts.items():
            if i != j:
                p.receive_share(j, dealer.shares.shares[i - 1])
    results = {i: p.finish() for i, p in parts.items()}
    tpk = results[1][1]
    assert all(r[1] == tpk for r in results.values())
    sk = reconstruct_secret(Shares([Share(i, t, results[i][0])
                                    for i in (1, 2, 4)]))
    assert (g * int(sk)).normalize() == tpk
    # pk share consistency
    for i, (ski, _, pki) in results.items():
        assert (g * int(ski)).normalize() == pki


def test_frost_dkg_rejects_bad_pok():
    g = b.G1.generator()
    parts = {i: FrostDKGParticipant(i, 2, 3, b"frost-ctx", g)
             for i in range(1, 4)}
    r1 = {i: p.start(RNG) for i, p in parts.items()}
    comms2, pok2 = r1[2]
    # replay dealer 2's PoK under dealer 3's identity (rogue-key attempt)
    with pytest.raises(SSError, match="PoK"):
        parts[1].receive_round1(3, comms2, pok2)


def test_gennaro_dkg():
    g = b.G1.generator()
    h = (g * 1234567).normalize()
    n, t = 4, 2
    parts = {i: GennaroDKGParticipant(i, t, n, g, h) for i in range(1, n + 1)}
    p1 = {i: p.phase1(RNG) for i, p in parts.items()}
    for i, p in parts.items():
        for j, dealer in parts.items():
            if i != j:
                p.receive_phase1(j, p1[j], dealer.ped_shares[i - 1])
    p2 = {i: p.phase2() for i, p in parts.items()}
    for i, p in parts.items():
        for j in parts:
            if i != j:
                p.receive_phase2(j, p2[j])
    results = {i: p.finish() for i, p in parts.items()}
    tpk = results[1][1]
    assert all(r[1] == tpk for r in results.values())
    sk = reconstruct_secret(Shares([Share(i, t, results[i][0])
                                    for i in (2, 3)]))
    assert (g * int(sk)).normalize() == tpk


def test_gennaro_rejects_inconsistent_phase2():
    g = b.G1.generator()
    h = (g * 99).normalize()
    parts = {i: GennaroDKGParticipant(i, 2, 3, g, h) for i in range(1, 4)}
    p1 = {i: p.phase1(RNG) for i, p in parts.items()}
    for i, p in parts.items():
        for j, dealer in parts.items():
            if i != j:
                p.receive_phase1(j, p1[j], dealer.ped_shares[i - 1])
    # dealer 2 lies in phase 2 (commits to different coefficients)
    from crypto_tpu.secret_sharing.common import CommitmentToCoefficients
    fake = CommitmentToCoefficients([b.G1.rand(RNG).normalize()
                                     for _ in range(2)])
    with pytest.raises(SSError, match="inconsistent"):
        parts[1].receive_phase2(2, fake)
