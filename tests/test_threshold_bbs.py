"""Threshold BBS+ end-to-end: all participants simulated in one process
(the reference's test strategy, SURVEY.md §4.3) plus OT-stack unit tests."""

import random

import numpy as np
import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.fields.host import Fp

F = b.Fr
RNG = random.Random(606)


def test_base_ot():
    from crypto_tpu.ot.base_ot import do_base_ots
    g = b.G1.generator()
    choices = [RNG.randrange(2) for _ in range(16)]
    pairs, chosen = do_base_ots(RNG, g, choices)
    for (k0, k1), c, kc in zip(pairs, choices, chosen):
        assert kc == (k1 if c else k0)
        assert k0 != k1


def test_ot_extension():
    from crypto_tpu.ot.ot_extension import setup_ote_pair
    g = b.G1.generator()
    sender, receiver = setup_ote_pair(RNG, g)
    m = 64
    choices = np.array([RNG.randrange(2) for _ in range(m)], dtype=np.uint8)
    U, rkeys = receiver.process(choices)
    skeys = sender.process(m, U)
    for j in range(m):
        k0, k1 = skeys[j]
        assert rkeys[j] == (k1 if choices[j] else k0)
        assert k0 != k1


def test_gilboa_batch_mul():
    from crypto_tpu.ot.ot_extension import setup_ote_pair
    from crypto_tpu.ot import gilboa
    g = b.G1.generator()
    sender, receiver = setup_ote_pair(RNG, g)
    n = 2
    a_vals = [F.rand(RNG) for _ in range(n)]
    b_vals = [F.rand(RNG) for _ in range(n)]
    U, keys, choices = gilboa.batch_mul_party2_round1(receiver, b_vals)
    msgs, shares1 = gilboa.batch_mul_party1(sender, a_vals, U)
    shares2 = gilboa.batch_mul_party2_round2(keys, choices, msgs, n)
    for t in range(n):
        assert shares1[t] + shares2[t] == a_vals[t] * b_vals[t]


def test_cointoss_and_zero_sharing():
    from crypto_tpu.ot.cointoss import CointossParty
    from crypto_tpu.ot.zero_sharing import ZeroSharingParty
    ids = [1, 2, 3]
    parties, comms = {}, {}
    for i in ids:
        parties[i], comms[i] = CointossParty.commit(RNG, i, 2, b"ct-test")
    for i in ids:
        for j in ids:
            if i != j:
                parties[i].receive_commitments(j, comms[j])
    reveals = {i: parties[i].reveal() for i in ids}
    for i in ids:
        for j in ids:
            if i != j:
                parties[i].receive_reveals(j, reveals[j])
    joints = [parties[i].compute_joint() for i in ids]
    assert joints[0] == joints[1] == joints[2]

    zs, zcomms = {}, {}
    for i in ids:
        zs[i], zcomms[i] = ZeroSharingParty.init(
            RNG, i, 2, [j for j in ids if j != i], b"zs-test")
    for i in ids:
        for j in ids:
            if i != j:
                zs[i].receive_commitments(j, zcomms[j][i])
    zreveals = {i: zs[i].reveals() for i in ids}
    for i in ids:
        for j in ids:
            if i != j:
                zs[i].receive_reveals(j, zreveals[j][i])
    shares = {i: zs[i].compute_zero_shares() for i in ids}
    for t in range(2):
        acc = F(0)
        for i in ids:
            acc = acc + shares[i][t]
        assert acc.is_zero()


@pytest.mark.slow
def test_threshold_bbs_plus_signing():
    from crypto_tpu.bbs_plus.setup import SignatureParamsG1, SecretKey, PublicKeyG2
    from crypto_tpu.secret_sharing.schemes import shamir_deal_secret
    from crypto_tpu.bbs_plus.threshold.threshold_bbs_plus import (
        Phase1, BBSPlusSignatureShare, run_phase2_pairwise)

    n_msgs = 3
    params = SignatureParamsG1.new(b"threshold-issuer", n_msgs)
    sk = SecretKey.generate(RNG)
    pk = PublicKeyG2.generate(sk, params)
    shares, _ = shamir_deal_secret(RNG, sk.x, 3, 5)
    signer_ids = [1, 3, 4]
    messages = [F.rand(RNG) for _ in range(n_msgs)]

    # Phase 1
    phase1, ct_comms, zs_comms = {}, {}, {}
    for i in signer_ids:
        others = {j for j in signer_ids if j != i}
        phase1[i], ct_comms[i], zs_comms[i] = Phase1.init(
            RNG, 1, i, others, b"tbbs-test")
    for i in signer_ids:
        for j in signer_ids:
            if i != j:
                phase1[i].commitment_protocol.receive_commitments(j, ct_comms[j])
                phase1[i].zero_sharing_protocol.receive_commitments(j, zs_comms[j][i])
    ct_reveals = {i: phase1[i].commitment_protocol.reveal() for i in signer_ids}
    zs_reveals = {i: phase1[i].zero_sharing_protocol.reveals() for i in signer_ids}
    for i in signer_ids:
        for j in signer_ids:
            if i != j:
                phase1[i].commitment_protocol.receive_reveals(j, ct_reveals[j])
                phase1[i].zero_sharing_protocol.receive_reveals(j, zs_reveals[j][i])
    p1out = {}
    for i in signer_ids:
        x_i = next(s.share for s in shares.shares if s.id == i)
        p1out[i] = phase1[i].finish(x_i, signer_ids)

    # Phase 2 (pairwise OT multiplication)
    p2out = run_phase2_pairwise(RNG, p1out)

    # Shares + aggregation
    sig_shares = [
        BBSPlusSignatureShare.new(messages, 0, p1out[i], p2out[i], params)
        for i in signer_ids
    ]
    sig = BBSPlusSignatureShare.aggregate(sig_shares)
    assert sig.verify(messages, pk, params)


@pytest.mark.slow
def test_threshold_weak_bb():
    from crypto_tpu.short_group_sig.weak_bb import (WeakBBSecretKey,
                                                    WeakBBPublicKeyG2)
    from crypto_tpu.short_group_sig.threshold_weak_bb import (
        ThresholdWeakBBSigner, run_threshold_weak_bb)
    from crypto_tpu.secret_sharing.schemes import shamir_deal_secret
    from crypto_tpu.hashing import group_elem_from_try_and_incr

    g1 = group_elem_from_try_and_incr(b.G1, b"twbb-g1").normalize()
    g2 = group_elem_from_try_and_incr(b.G2, b"twbb-g2").normalize()
    sk = WeakBBSecretKey.generate(RNG)
    pk = WeakBBPublicKeyG2.generate(sk, g2)
    shares, _ = shamir_deal_secret(RNG, sk.x, 3, 5)
    signer_ids = [1, 2, 5]
    message = F.rand(RNG)
    signers = {
        i: ThresholdWeakBBSigner.init(
            RNG, i, next(s.share for s in shares.shares if s.id == i),
            signer_ids)
        for i in signer_ids
    }
    sig = run_threshold_weak_bb(RNG, signers, message, g1)
    assert sig.verify(message, pk, g1, g2)


def test_kos_ote_consistency_and_correlation():
    from crypto_tpu.ot.ot_extension import setup_ote_pair
    from crypto_tpu.ot.kos_ote import (KOSReceiverSetup, KOSSenderSetup,
                                       OTError)
    g = b.G1.generator()
    sender, receiver = setup_ote_pair(RNG, g)
    m = 16
    choices = [RNG.randrange(2) for _ in range(m)]
    recv_setup, U, rlc = KOSReceiverSetup.new(RNG, receiver, choices)
    send_setup = KOSSenderSetup.new(sender, m, U, rlc)

    alpha = [(F.rand(RNG), F.rand(RNG)) for _ in range(m)]
    t_A, tau = send_setup.transfer(alpha)
    t_B = recv_setup.receive(tau)
    for i in range(m):
        want = (alpha[i][0] * F(choices[i]), alpha[i][1] * F(choices[i]))
        assert t_A[i][0] + t_B[i][0] == want[0]
        assert t_A[i][1] + t_B[i][1] == want[1]

    # a tampered RLC must be caught by the consistency check
    import numpy as np
    bad_rlc = type(rlc)(x=rlc.x, t=bytes([rlc.t[0] ^ 1]) + rlc.t[1:])
    try:
        KOSSenderSetup.new(sender, m, U, bad_rlc)
        assert False, "consistency check should fail"
    except OTError:
        pass


@pytest.mark.slow
def test_dkls18_two_party_multiplication():
    from crypto_tpu.ot.ot_extension import setup_ote_pair
    from crypto_tpu.ot.dkls import (GadgetVector, MultiplicationOTEParams,
                                    Party1, Party2)
    g = b.G1.generator()
    params = MultiplicationOTEParams(kappa=256, ssp=80)
    gadget = GadgetVector.new(params, b"dkls-test")
    sender, receiver = setup_ote_pair(RNG, g, kappa=256)
    alpha, beta = F.rand(RNG), F.rand(RNG)
    p1 = Party1.new(RNG, alpha, sender, params)
    p2, U, kos_rlc = Party2.new(RNG, beta, receiver, gadget, params)
    share1, tau, rlc = p1.receive(U, kos_rlc, gadget)
    share2 = p2.receive(tau, rlc, gadget)
    assert share1 + share2 == alpha * beta


@pytest.mark.slow
def test_dkls19_batch_multiplication():
    from crypto_tpu.ot.ot_extension import setup_ote_pair
    from crypto_tpu.ot.dkls import (GadgetVector, MultiplicationOTEParams,
                                    batch_mul_party1, batch_mul_party2_round1,
                                    batch_mul_party2_round2)
    g = b.G1.generator()
    params = MultiplicationOTEParams(kappa=256, ssp=80)
    gadget = GadgetVector.new(params, b"dkls19-test")
    sender, receiver = setup_ote_pair(RNG, g, kappa=256)
    alpha = F.rand(RNG)
    betas = [F.rand(RNG) for _ in range(2)]
    state, U, kos_rlc = batch_mul_party2_round1(RNG, betas, receiver,
                                                gadget, params)
    shares1, tau, rlc = batch_mul_party1(RNG, alpha, len(betas), U, kos_rlc,
                                         sender, gadget, params)
    shares2 = batch_mul_party2_round2(state, tau, rlc, gadget, params)
    for s1, s2, beta in zip(shares1, shares2, betas):
        assert s1 + s2 == alpha * beta


def test_naor_pinkas_and_endemic_ot():
    from crypto_tpu.ot.base_ot_more import (EndemicReceiver, EndemicSender,
                                            NPReceiver, NPSender)
    g = b.G1.generator()
    n = 4
    sender = NPSender.setup(RNG, g, n)
    for choice in range(n):
        recv = NPReceiver.new(RNG, g, sender.C, choice)
        keys = sender.keys_for(recv.pk_0, n)
        k = recv.key(sender.g_r)
        assert k == keys[choice]
        assert sum(1 for kk in keys if kk == k) == 1

    for choice in (0, 1):
        er = EndemicReceiver.new(RNG, g, choice)
        es = EndemicSender.new(RNG, g)
        keys = es.keys(er.B)
        assert er.key(es.A) == keys[choice]
        assert keys[0] != keys[1]


def test_threshold_accumulator_ops():
    """Threshold witness generation + removal (reference
    `vb_accumulator/src/threshold/mod.rs` test flow)."""
    from crypto_tpu.accumulator.setup import AccumKeypair, AccumSetupParams
    from crypto_tpu.accumulator.core import PositiveAccumulator
    from crypto_tpu.accumulator.persistence import InMemoryState
    from crypto_tpu.accumulator.threshold import (
        make_threshold_managers, threshold_membership_witness,
        threshold_remove)
    from crypto_tpu.secret_sharing.schemes import shamir_deal_secret

    rng = random.Random(71)
    params = AccumSetupParams.new(b"thresh-accum")
    kp = AccumKeypair.generate(rng, params)
    state = InMemoryState()
    elems = [F.rand(rng) for _ in range(3)]
    accum = PositiveAccumulator.initialize(params)
    accum = accum.add_batch(elems, kp.secret_key, state)

    # share alpha among 5 managers, use 3
    shares, _ = shamir_deal_secret(rng, kp.secret_key.alpha, 3, 5)
    sub = {s.id: s.share for s in shares.shares[:3]}
    managers = make_threshold_managers(rng, sub)

    wit = threshold_membership_witness(rng, managers, elems[0],
                                       accum.value())
    assert accum.verify_membership(elems[0], wit, kp.public_key, params)

    managers2 = make_threshold_managers(rng, sub)
    V_new = threshold_remove(rng, managers2, elems[1], accum.value())
    direct = accum.remove(elems[1], kp.secret_key, state)
    assert V_new == direct.value()


def test_syra_threshold_issuance():
    """Threshold SyRA usk issuance (reference
    `syra/src/threshold_issuance.rs`)."""
    from crypto_tpu.syra.core import (IssuerPublicKey, IssuerSecretKey,
                                      SyraSetupParams)
    from crypto_tpu.syra.threshold_issuance import (make_threshold_issuers,
                                                    threshold_issue_usk)
    from crypto_tpu.secret_sharing.schemes import shamir_deal_secret

    rng = random.Random(72)
    params = SyraSetupParams.new(b"syra-thresh")
    isk = IssuerSecretKey.generate(rng)
    ipk = IssuerPublicKey.new(isk, params)
    uid = F.rand(rng)

    shares, _ = shamir_deal_secret(rng, isk.sk, 2, 4)
    sub = {s.id: s.share for s in shares.shares[1:3]}
    issuers = make_threshold_issuers(rng, sub)
    usk = threshold_issue_usk(rng, issuers, uid, params)
    assert usk.verify(uid, ipk, params)
    # and it matches central issuance
    from crypto_tpu.syra.core import UserSecretKey
    central = UserSecretKey.issue(uid, isk, params)
    assert usk.usk == central.usk


def test_threshold_bbs23_signing():
    """Threshold BBS-2023: same MPC flow, (A, e) signature
    (reference `bbs_plus/src/threshold/threshold_bbs.rs`)."""
    from crypto_tpu.bbs_plus.bbs23 import SignatureParams23G1, PublicKey23G2
    from crypto_tpu.bbs_plus.setup import SecretKey
    from crypto_tpu.secret_sharing.schemes import shamir_deal_secret
    from crypto_tpu.bbs_plus.threshold.threshold_bbs import (
        BBSPhase1, BBSSignatureShare, run_phase2_pairwise)

    n_msgs = 3
    params = SignatureParams23G1.new(b"threshold-bbs23", n_msgs)
    sk = SecretKey.generate(RNG)
    pk = PublicKey23G2.generate(sk, params)
    shares, _ = shamir_deal_secret(RNG, sk.x, 3, 5)
    signer_ids = [1, 2, 5]
    messages = [F.rand(RNG) for _ in range(n_msgs)]

    phase1, ct_comms, zs_comms = {}, {}, {}
    for i in signer_ids:
        others = {j for j in signer_ids if j != i}
        phase1[i], ct_comms[i], zs_comms[i] = BBSPhase1.init(
            RNG, 1, i, others, b"tbbs23-test")
    for i in signer_ids:
        for j in signer_ids:
            if i != j:
                phase1[i].commitment_protocol.receive_commitments(j, ct_comms[j])
                phase1[i].zero_sharing_protocol.receive_commitments(j, zs_comms[j][i])
    ct_reveals = {i: phase1[i].commitment_protocol.reveal() for i in signer_ids}
    zs_reveals = {i: phase1[i].zero_sharing_protocol.reveals() for i in signer_ids}
    for i in signer_ids:
        for j in signer_ids:
            if i != j:
                phase1[i].commitment_protocol.receive_reveals(j, ct_reveals[j])
                phase1[i].zero_sharing_protocol.receive_reveals(j, zs_reveals[j][i])
    p1out = {}
    for i in signer_ids:
        x_i = next(s.share for s in shares.shares if s.id == i)
        p1out[i] = phase1[i].finish(x_i, signer_ids)

    p2out = run_phase2_pairwise(RNG, p1out)
    sig_shares = [
        BBSSignatureShare.new(messages, 0, p1out[i], p2out[i], params)
        for i in signer_ids
    ]
    sig = BBSSignatureShare.aggregate(sig_shares)
    assert sig.verify(messages, pk, params)
