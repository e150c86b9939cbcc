"""Secret sharing / VSS / DKG tests (reference test shapes in
`secret_sharing_and_dkg/src/*.rs` — all participants simulated in-process)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.secret_sharing.common import SSError, Shares
from crypto_tpu.secret_sharing import schemes as S

F = b.Fr
RNG = random.Random(55)


def test_shamir_roundtrip():
    secret, shares, coeffs = S.shamir_deal_random_secret(RNG, 3, 5)
    assert coeffs[0] == secret
    # any 3 shares reconstruct
    sub = Shares(shares.shares[1:4])
    assert S.reconstruct_secret(sub) == secret
    sub2 = Shares([shares.shares[0], shares.shares[2], shares.shares[4]])
    assert S.reconstruct_secret(sub2) == secret
    # 2 shares give wrong secret
    assert S.reconstruct_secret(Shares(shares.shares[:2])) != secret


def test_shamir_invalid_params():
    with pytest.raises(SSError):
        S.shamir_deal_secret(RNG, F(1), 6, 5)
    with pytest.raises(SSError):
        S.shamir_deal_secret(RNG, F(1), 1, 1)


def test_feldman_vss():
    g = b.G1.generator()
    secret = F.rand(RNG)
    shares, comms = S.feldman_deal_secret(RNG, secret, 3, 5, g)
    for sh in shares.shares:
        assert S.feldman_verify_share(sh, comms, g)
    # tampered share fails
    bad = S.Share(shares.shares[0].id, 3, shares.shares[0].share + F(1))
    assert not S.feldman_verify_share(bad, comms, g)
    assert S.reconstruct_secret(Shares(shares.shares[:3])) == secret
    assert comms.commitment_to_secret() == (g * int(secret)).normalize()


def test_pedersen_vss():
    g = b.G1.generator()
    h = (g * 7).normalize()
    secret = F.rand(RNG)
    shares, comms, blinding = S.pedersen_deal_secret(RNG, secret, 3, 5, g, h)
    for sh in shares:
        assert S.pedersen_verify_share(sh, comms, g, h)
    bad = S.PedersenVSSShare(shares[0].id, 3, shares[0].share + F(1),
                             shares[0].blinding_share)
    assert not S.pedersen_verify_share(bad, comms, g, h)
    # reconstruct both secret and blinding
    sub = Shares([S.Share(sh.id, 3, sh.share) for sh in shares[:3]])
    assert S.reconstruct_secret(sub) == secret


def test_feldman_dkg():
    g = b.G1.generator()
    n, t = 4, 3
    parts = [S.FeldmanDKGParticipant(i, t, n) for i in range(1, n + 1)]
    dealt = {}
    for pt in parts:
        dealt[pt.id] = pt.deal(RNG, g)
    # exchange shares
    for dealer in parts:
        shares, comms = dealt[dealer.id]
        for recv in parts:
            if recv.id == dealer.id:
                continue
            recv.receive(dealer.id, shares.shares[recv.id - 1], comms, g)
    results = [pt.finish() for pt in parts]
    tpk = results[0][1]
    assert all(r[1] == tpk for r in results)
    # threshold-reconstructed secret key matches the public key
    sk_shares = Shares([S.Share(pt.id, t, r[0])
                        for pt, r in zip(parts, results)][:t])
    sk = S.reconstruct_secret(sk_shares)
    assert (g * int(sk)).normalize() == tpk
    # bad share from a malicious dealer is rejected (addressed correctly but
    # inconsistent with the published commitments)
    evil_shares, evil_comms = dealt[1]
    bad_share = S.Share(parts[2].id, t,
                        evil_shares.shares[parts[2].id - 1].share + F(1))
    with pytest.raises(SSError, match="invalid share"):
        parts[2].receive(99, bad_share, evil_comms, g)
