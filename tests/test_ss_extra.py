"""Baghery VSS/PVSS, ABCP DKG, distributed dlog check (reference
`secret_sharing_and_dkg/src/{baghery_vss,baghery_pvss,abcp_dkg,
distributed_dlog_check}`)."""

import random

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.hashing import group_elem_from_try_and_incr
from crypto_tpu.secret_sharing.common import Share
from crypto_tpu.secret_sharing.schemes import reconstruct_secret
from crypto_tpu.secret_sharing import baghery, abcp_dkg, distributed_dlog

F = b.Fr
RNG = random.Random(515)


def test_baghery_vss():
    secret = F.rand(RNG)
    shares, f, proof = baghery.vss_deal_secret(RNG, secret, 3, 5)
    for s in shares.shares:
        assert proof.verify(s)
    bad = Share(id=2, threshold=3, share=shares.shares[1].share + F(1))
    assert not proof.verify(bad)
    assert reconstruct_secret(shares) == secret


def test_baghery_pvss_same_base():
    g = b.G1.generator()
    sks = [F.rand_nonzero(RNG) for _ in range(5)]
    pks = [(g * int(sk)).normalize() for sk in sks]
    secret = F.rand(RNG)
    enc_shares, proof, f = baghery.pvss_deal_secret(RNG, secret, 3, 5, pks)
    assert proof.verify(3, 5, pks, enc_shares)
    # tampered share rejected
    import copy
    bad = copy.deepcopy(enc_shares)
    bad[0].share = (bad[0].share * 2).normalize()
    assert not proof.verify(3, 5, pks, bad)
    # decrypt + combine == g * secret
    dec = [es.decrypt(sk) for es, sk in zip(enc_shares, sks)]
    combined = baghery.combine_share_commitments(dec)
    assert combined == (g * int(secret)).normalize()


def test_baghery_pvss_different_base():
    g = b.G1.generator()
    j = group_elem_from_try_and_incr(b.G1, b"pvss-other-base").normalize()
    sks = [F.rand_nonzero(RNG) for _ in range(4)]
    pks = [(g * int(sk)).normalize() for sk in sks]
    secret = F.rand(RNG)
    enc_shares, proof, f = baghery.pvss_deal_secret_different_base(
        RNG, secret, 2, 4, pks, g, j)
    assert proof.verify(2, 4, pks, enc_shares, g, j)
    dec = [es.decrypt(sk) for es, sk in zip(enc_shares, sks)]
    combined = baghery.combine_share_commitments(dec)
    assert combined == (j * int(secret)).normalize()


def test_abcp_dkg():
    g = b.G1.generator()
    comm_key = group_elem_from_try_and_incr(b.G1, b"abcp-ck").normalize()
    total, threshold = 4, 3
    r1, r1msgs = {}, {}
    for i in range(1, total + 1):
        r1[i], r1msgs[i] = abcp_dkg.Round1.start(RNG, i, threshold, total,
                                                 comm_key, g)
    for i in r1:
        for j in r1:
            if i != j:
                r1[i].add_received_message(r1msgs[j])
    r2, r2msgs = {}, {}
    for i in r1:
        r2[i], r2msgs[i] = r1[i].finish()
    for i in r2:
        for j in r2:
            if i != j:
                r2[i].add_received_message(r2msgs[j])
    for i in r2:
        for j in r2:
            if i != j:
                share_for_i = r2[j].round1_state.shares[i - 1]
                r2[i].add_received_share(j, share_for_i, comm_key, g)
    results = {i: r2[i].finish() for i in r2}
    tpks = {results[i][2] for i in results}
    assert len({(int(p.to_affine()[0]), int(p.to_affine()[1]))
                for p in tpks}) == 1
    total_secret = F(0)
    for i in results:
        total_secret = total_secret + results[i][0]
    some_tpk = next(iter(results.values()))[2]
    assert some_tpk == (g * int(total_secret)).normalize()
    # bad share is rejected
    bad = abcp_dkg.VerifiableShare(
        id=1, threshold=threshold,
        share=r2[2].round1_state.shares[0].share + F(1),
        blinding=r2[2].round1_state.shares[0].blinding,
        blinding_prime=r2[2].round1_state.shares[0].blinding_prime)
    try:
        r2[1].verify_share(2, bad, comm_key, g)
        assert False
    except Exception:
        pass


def test_distributed_dlog_semi_honest():
    from crypto_tpu.secret_sharing.schemes import shamir_deal_secret
    g = b.G1.generator()
    A = (g * 777777).normalize()
    J = group_elem_from_try_and_incr(b.G1, b"dlog-J").normalize()
    k = F.rand(RNG)
    B = (A * int(k)).normalize()
    shares, _ = shamir_deal_secret(RNG, k, 3, 5)
    comm = {s.id: distributed_dlog.ShareCommitment.new(s, J)
            for s in shares.shares}
    cshares = []
    for s in shares.shares[:3]:
        cs, proof = distributed_dlog.ComputationShare.new_with_proof(
            RNG, s, comm[s.id], J, A)
        assert proof.verify(cs, comm[s.id], J, A)
        cshares.append(cs)
    R = distributed_dlog.ComputationShare.combine(cshares)
    assert R == B


def test_distributed_dlog_maliciously_secure():
    g1 = b.G1.generator()
    ck = group_elem_from_try_and_incr(b.G1, b"mal-ck").normalize()
    J = group_elem_from_try_and_incr(b.G1, b"mal-J").normalize()
    k = F.rand(RNG)
    A = (g1 * 424242).normalize()
    B = (A * int(k)).normalize()
    shares, comms, P = distributed_dlog.deal_secret_in_g2(RNG, k, 2, 4, ck)
    for s in shares:
        assert s.verify(comms, ck)
    bad = distributed_dlog.SecretShareG2(
        id=1, threshold=2, share=(shares[0].share * 3).normalize(),
        share_base=P)
    assert not bad.verify(comms, ck)

    cshares, proofs = [], []
    for s in shares[:2]:
        share_comm = b.pairing(J, s.share)
        cs, proof = distributed_dlog.ComputationShareProofGT.new(
            RNG, s, share_comm, J, A)
        assert proof.verify(cs, share_comm, J, A)
        cshares.append(cs)
    R = distributed_dlog.ComputationShareGT.combine(cshares)
    assert R == b.pairing(B, P)


def test_shares_accumulator_feldman_dvss():
    from crypto_tpu.secret_sharing.common import (
        SharesAccumulator, reconstruct_threshold_public_key)
    from crypto_tpu.secret_sharing.schemes import feldman_deal_secret
    g = b.G1.generator()
    threshold, total = 3, 5
    accs = {i: SharesAccumulator(participant_id=i, threshold=threshold)
            for i in range(1, total + 1)}
    secrets = []
    for dealer in range(1, total + 1):
        secret = F.rand(RNG)
        secrets.append(secret)
        shares, comms = feldman_deal_secret(RNG, secret, threshold, total,
                                            g)
        for i in range(1, total + 1):
            sh = next(s for s in shares.shares if s.id == i)
            if i == dealer:
                accs[i].add_self_share(sh, comms)
            else:
                accs[i].add_received_share(dealer, sh, comms, g)
    finals = {i: accs[i].finalize() for i in accs}
    tpks = {str(f[1].to_affine()) for f in finals.values()}
    assert len(tpks) == 1
    total_secret = F(0)
    for s in secrets:
        total_secret = total_secret + s
    tpk = next(iter(finals.values()))[1]
    assert tpk == (g * int(total_secret)).normalize()
    # threshold pk from per-party public keys
    pks = [(i, (g * int(finals[i][0].share)).normalize())
           for i in (1, 3, 5)]
    assert reconstruct_threshold_public_key(pks, 3) == tpk
