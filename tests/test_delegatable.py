"""Set commitments and mercurial signatures (delegatable credentials core)."""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.delegatable_credentials.set_commitment import (
    SetCommitmentSRS, SetCommitment, SubsetWitness, SetCommitmentError)
from crypto_tpu.delegatable_credentials.mercurial_sig import (
    MercurialSecretKey, MercurialPublicKey, MercurialSignature)

F = b.Fr
RNG = random.Random(1515)


def test_set_commitment_subset_opening():
    srs = SetCommitmentSRS.generate(RNG, 8)
    members = {int(F.rand(RNG)) for _ in range(5)}
    comm, rho = SetCommitment.new(RNG, members, srs)
    subset = set(list(members)[:2])
    wit = SubsetWitness.new(members, subset, rho, srs)
    assert wit.verify(subset, comm, srs)
    # full set and empty set
    wit_all = SubsetWitness.new(members, set(members), rho, srs)
    assert wit_all.verify(set(members), comm, srs)
    wit_none = SubsetWitness.new(members, set(), rho, srs)
    assert wit_none.verify(set(), comm, srs)
    # non-subset rejected at creation; forged witness fails verification
    stranger = int(F.rand(RNG))
    with pytest.raises(SetCommitmentError):
        SubsetWitness.new(members, {stranger}, rho, srs)
    assert not wit.verify({stranger}, comm, srs)
    # deterministic trapdoor SRS (test fixture mode)
    srs2 = SetCommitmentSRS.generate_with_trapdoor_seed(b"seed", 4)
    srs3 = SetCommitmentSRS.generate_with_trapdoor_seed(b"seed", 4)
    assert srs2.P1_powers == srs3.P1_powers


def test_set_commitment_randomization():
    srs = SetCommitmentSRS.generate(RNG, 6)
    members = {1, 2, 3}
    comm, rho = SetCommitment.new(RNG, members, srs)
    wit = SubsetWitness.new(members, {1}, rho, srs)
    mu = F.rand_nonzero(RNG)
    comm2 = comm.randomize(mu)
    wit2 = wit.randomize(mu)
    assert wit2.verify({1}, comm2, srs)


def test_mercurial_signature():
    sk = MercurialSecretKey.generate(RNG, 3)
    pk = MercurialPublicKey.generate(sk)
    msgs = [b.G1.rand(RNG).normalize() for _ in range(3)]
    sig = MercurialSignature.new(RNG, msgs, sk)
    assert sig.verify(msgs, pk)
    # wrong message fails
    bad = list(msgs)
    bad[0] = b.G1.rand(RNG).normalize()
    assert not sig.verify(bad, pk)

    # key-class conversion
    mu = F.rand_nonzero(RNG)
    pk2 = pk.convert(mu)
    sig2 = sig.convert(RNG, mu)
    assert sig2.verify(msgs, pk2)
    assert not sig2.verify(msgs, pk)

    # message-class change of representative (unlinkable re-randomization)
    rho = F.rand_nonzero(RNG)
    msgs3, sig3 = sig.change_rep(RNG, msgs, rho)
    assert sig3.verify(msgs3, pk)
    assert sig3.Z != sig.Z and sig3.Y != sig.Y


def test_sps_eq_uc_sign_verify_change_rep():
    from crypto_tpu.delegatable_credentials.sps_eq_uc import (
        RootIssuerPublicKey, RootIssuerSecretKey, SPSEQUCSignature,
        UserPublicKey, UserSecretKey)
    t, l = 6, 5
    srs = SetCommitmentSRS.generate(RNG, 10)
    isk = RootIssuerSecretKey.generate(RNG, l)
    ipk = RootIssuerPublicKey.generate(isk, srs)
    usk = UserSecretKey.generate(RNG)
    upk = UserPublicKey.generate(usk, srs)

    msgs1 = [F.rand(RNG) for _ in range(4)]
    msgs2 = [F.rand(RNG) for _ in range(5)]
    sig, comms, opens, uk = SPSEQUCSignature.new(
        RNG, [msgs1, msgs2], upk, 3, isk, t, srs)
    assert uk is not None and uk.start_index == 2
    assert sig.verify(comms, [msgs1, msgs2], opens, upk, ipk, srs)
    assert uk.verify(sig, ipk, t, srs)
    # wrong message set fails
    assert not sig.verify(comms, [msgs2, msgs1], opens, upk, ipk, srs)

    # unlinkable re-randomization
    mu, psi, chi = F.rand_nonzero(RNG), F.rand_nonzero(RNG), F.rand(RNG)
    nsig, ncomms, nopens, nuk, nupk = sig.change_rep(
        comms, opens, upk, uk, ipk, mu, psi, chi, t, srs)
    assert nsig.verify(ncomms, [msgs1, msgs2], nopens, nupk, ipk, srs)
    assert nuk.verify(nsig, ipk, t, srs)
    nusk = usk.randomize(psi, chi)
    assert nupk.pk == (srs.P1_powers[0] * int(nusk.x)).normalize()

    # delegation: append a block via the update key
    msgs3 = [F.rand(RNG) for _ in range(3)]
    rho = F.rand_nonzero(RNG)
    dsig, dcom, drho, _ = nsig.change_rel(msgs3, 2, None, nuk, rho, srs)
    assert dsig.verify(ncomms + [dcom], [msgs1, msgs2, msgs3],
                       nopens + [drho], nupk, ipk, srs)

    # orphan transfer to a new user
    orphan = dsig.to_orphan(nusk, ipk.X_0)
    usk2 = UserSecretKey.generate(RNG)
    upk2 = UserPublicKey.generate(usk2, srs)
    adopted = orphan.from_orphan(usk2, ipk.X_0)
    assert adopted.verify(ncomms + [dcom], [msgs1, msgs2, msgs3],
                          nopens + [drho], upk2, ipk, srs)


def test_msbm_credential_issue_delegate_show():
    from crypto_tpu.delegatable_credentials.sps_eq_uc import (
        RootIssuerPublicKey, RootIssuerSecretKey, UserPublicKey,
        UserSecretKey)
    from crypto_tpu.delegatable_credentials.msbm import (
        Credential, CredentialShowProtocol)
    from crypto_tpu.serialize import ByteWriter
    from crypto_tpu.hashing import compute_random_oracle_challenge

    t, l = 6, 5
    srs = SetCommitmentSRS.generate(RNG, 12)
    isk = RootIssuerSecretKey.generate(RNG, l)
    ipk = RootIssuerPublicKey.generate(isk, srs)
    usk = UserSecretKey.generate(RNG)
    upk = UserPublicKey.generate(usk, srs)

    attrs1 = [F.rand(RNG) for _ in range(4)]
    attrs2 = [F.rand(RNG) for _ in range(3)]
    cred, uk = Credential.issue_root(RNG, [attrs1, attrs2], upk, 3, isk,
                                     t, srs)
    assert cred.verify(upk, ipk, srs)

    # delegate: holder appends a new block
    attrs3 = [F.rand(RNG) for _ in range(2)]
    cred2, _ = cred.delegate_with_new_attributes(RNG, attrs3, None, uk, srs)
    assert cred2.verify(upk, ipk, srs)

    # unlinkable show disclosing a subset from each block
    disclose = [attrs1[:2], [], [attrs3[0]]]
    prot = CredentialShowProtocol.init(RNG, cred2, disclose, usk, upk,
                                       ipk, srs)
    w = ByteWriter()
    prot.challenge_contribution(srs, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    show = prot.gen_show(c)
    w2 = ByteWriter()
    show.challenge_contribution(srs, w2)
    assert bytes(w2.buf) == bytes(w.buf)
    assert show.verify(disclose, c, ipk, srs)
    # pseudonym differs from the real upk (unlinkability smoke check)
    assert show.pseudonym.pk != upk.pk
    # undisclosed attribute passed as disclosed fails
    bad = [attrs1[:2], [attrs2[0] + F(1)], [attrs3[0]]]
    assert not show.verify(bad, c, ipk, srs)

    # credential transfer to another user
    usk2 = UserSecretKey.generate(RNG)
    upk2 = UserPublicKey.generate(usk2, srs)
    cred3 = cred2.transfer(usk, usk2, ipk.X_0)
    assert cred3.verify(upk2, ipk, srs)


def test_protego_issue_show_audit():
    from crypto_tpu.delegatable_credentials.protego import (
        AuditorPublicKey, AuditorSecretKey, ProtegoIssuerPublicKey,
        ProtegoIssuerSecretKey, ProtegoShowProtocol, ProtegoUserPublicKey,
        ProtegoUserSecretKey, issue_credential)
    from crypto_tpu.serialize import ByteWriter
    from crypto_tpu.hashing import compute_random_oracle_challenge

    srs = SetCommitmentSRS.generate(RNG, 10)
    P1 = srs.P1_powers[0]
    ask = AuditorSecretKey.generate(RNG)
    apk = AuditorPublicKey.generate(ask, P1)
    isk = ProtegoIssuerSecretKey.generate(RNG, supports_audit=True)
    ipk = ProtegoIssuerPublicKey.generate(isk)
    usk = ProtegoUserSecretKey.generate(RNG)
    upk = ProtegoUserPublicKey.generate(usk, P1)

    attrs = [F.rand(RNG) for _ in range(5)]
    cred = issue_credential(RNG, attrs, usk, upk, isk, apk, srs)
    assert cred.verify(upk, apk, ipk, srs)

    disclose = attrs[:2]
    prot = ProtegoShowProtocol.init_with_usk(RNG, cred, disclose, usk, upk,
                                             apk, srs)
    w = ByteWriter()
    prot.challenge_contribution(srs, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    show = prot.gen_show(usk, c)
    w2 = ByteWriter()
    show.challenge_contribution(srs, w2)
    assert bytes(w2.buf) == bytes(w.buf)
    assert show.verify(c, disclose, ipk, apk, srs)
    # unlinkability: randomized C1 differs from the credential's
    assert show.C1 != cred.C1
    # wrong disclosed attribute fails
    assert not show.verify(c, [attrs[0], attrs[0] + F(1)], ipk, apk, srs)
    # auditor recovers the user public key
    assert show.audit(ask) == upk.pk

    # non-auditable issuer path
    isk2 = ProtegoIssuerSecretKey.generate(RNG, supports_audit=False)
    ipk2 = ProtegoIssuerPublicKey.generate(isk2)
    cred2 = issue_credential(RNG, attrs, usk, upk, isk2, None, srs)
    assert cred2.verify(upk, None, ipk2, srs)
    prot2 = ProtegoShowProtocol.init_with_usk(RNG, cred2, [], usk, None,
                                              None, srs)
    w = ByteWriter()
    prot2.challenge_contribution(srs, w)
    c2 = compute_random_oracle_challenge(F, bytes(w.buf))
    show2 = prot2.gen_show(None, c2)
    assert show2.verify(c2, [], ipk2, None, srs)


def test_delegatable_accumulator():
    from crypto_tpu.delegatable_credentials.accumulator import (
        AccumPublicKey, AccumSecretKey, DelegatableAccumulator,
        NonMembershipWitness)
    s = F.rand_nonzero(RNG)
    srs = SetCommitmentSRS.generate_with_trapdoor(s, 20)
    P1, P2 = srs.P1_powers[0], srs.P2_powers[0]
    P1_s = srs.P1_powers[1]
    sk = AccumSecretKey.generate(RNG)
    pk = AccumPublicKey.generate(sk, P2)
    members = [F.rand(RNG) for _ in range(6)]
    accum = DelegatableAccumulator.new(members, s, sk, P1)

    nm = F.rand(RNG)
    wit = NonMembershipWitness.new(nm, accum.members, s, P2)
    assert wit.verify(nm, accum.V, pk, P1_s, P1, P2)
    # a member has no witness
    try:
        NonMembershipWitness.new(members[0], accum.members, s, P2)
        assert False
    except Exception:
        pass
    # stale witness fails after addition; fresh one works
    accum.add([F.rand(RNG), F.rand(RNG)], s)
    assert not wit.verify(nm, accum.V, pk, P1_s, P1, P2)
    wit2 = NonMembershipWitness.new(nm, accum.members, s, P2)
    assert wit2.verify(nm, accum.V, pk, P1_s, P1, P2)
    # removal
    accum.remove([members[0]], s)
    wit3 = NonMembershipWitness.new(members[0], accum.members, s, P2)
    assert wit3.verify(members[0], accum.V, pk, P1_s, P1, P2)
    # randomized witness (Protego show form)
    mu, tau, usk2 = F.rand_nonzero(RNG), F.rand_nonzero(RNG), F.rand_nonzero(RNG)
    r = mu * tau * usk2
    rand_accum = (accum.V * int(r)).normalize()
    rwit = wit3.randomize(tau, r, P1)
    rand_factor = ((P1_s - P1 * int(members[0])) * int(r * tau.inverse())
                   ).normalize()
    assert rwit.verify(rand_accum, rand_factor, pk, P2)


def test_protego_signer_hidden_with_decoys():
    """Ring-hidden issuer (`signer_hidden_with_decoys.rs` tests)."""
    from crypto_tpu.delegatable_credentials.protego import (
        ProtegoIssuerPublicKey, ProtegoIssuerSecretKey,
        ProtegoUserPublicKey, ProtegoUserSecretKey, issue_credential)
    from crypto_tpu.delegatable_credentials.protego_anonymous import (
        ShowProtocolHiddenPk)
    from crypto_tpu.delegatable_credentials.one_of_n import OneOfNSrs
    from crypto_tpu.serialize import ByteWriter
    from crypto_tpu.hashing import compute_random_oracle_challenge

    srs = SetCommitmentSRS.generate(RNG, 10)
    P1 = srs.P1_powers[0]
    isk = ProtegoIssuerSecretKey.generate(RNG)
    ipk = ProtegoIssuerPublicKey.generate(isk)
    decoys = [ProtegoIssuerPublicKey.generate(
        ProtegoIssuerSecretKey.generate(RNG)) for _ in range(3)]
    one_of_n_srs, _ = OneOfNSrs.new(RNG, P1)
    usk = ProtegoUserSecretKey.generate(RNG)
    upk = ProtegoUserPublicKey.generate(usk, P1)

    attrs = [F.rand(RNG) for _ in range(4)]
    cred = issue_credential(RNG, attrs, usk, upk, isk, None, srs)

    disclose = attrs[:1]
    prot = ShowProtocolHiddenPk.init(RNG, cred, disclose, ipk, decoys,
                                     one_of_n_srs, usk, None, None, srs)
    w = ByteWriter()
    prot.challenge_contribution(srs, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    show = prot.gen_show(usk, c)
    possible = decoys + [ipk]
    assert show.verify(c, disclose, possible, one_of_n_srs, None, srs)
    # the randomized key is not any of the originals
    assert all(show.pubkey_anonymity_proof.randomized_pk.pk.X_hat
               != pk.pk.X_hat for pk in possible)
    # verification against a set NOT containing the issuer fails
    assert not show.verify(c, disclose, decoys, one_of_n_srs, None, srs)


def test_protego_signer_hidden_with_policy():
    """Delegation-policy-hidden issuer (`signer_hidden_with_policy.rs`)."""
    from crypto_tpu.delegatable_credentials.protego import (
        ProtegoIssuerPublicKey, ProtegoIssuerSecretKey,
        ProtegoUserPublicKey, ProtegoUserSecretKey, issue_credential)
    from crypto_tpu.delegatable_credentials.protego_anonymous import (
        DelegationPolicyPublicKey, DelegationPolicySecretKey,
        ShowProtocolWithDelegationPolicy)
    from crypto_tpu.serialize import ByteWriter
    from crypto_tpu.hashing import compute_random_oracle_challenge

    srs = SetCommitmentSRS.generate(RNG, 10)
    P1, P2 = srs.P1_powers[0], srs.P2_powers[0]
    isk = ProtegoIssuerSecretKey.generate(RNG)
    ipk = ProtegoIssuerPublicKey.generate(isk)
    policy_sk = DelegationPolicySecretKey.new(RNG, 5)
    policy_pk = DelegationPolicyPublicKey.new(policy_sk, P1)
    policy_sig = policy_sk.sign_public_key(RNG, ipk, P1, P2)
    assert policy_sig.verify(ipk.pk.X_hat, policy_pk.pk, P1=P1, P2=P2)

    usk = ProtegoUserSecretKey.generate(RNG)
    upk = ProtegoUserPublicKey.generate(usk, P1)
    attrs = [F.rand(RNG) for _ in range(4)]
    cred = issue_credential(RNG, attrs, usk, upk, isk, None, srs)

    prot = ShowProtocolWithDelegationPolicy.init(
        RNG, cred, attrs[:2], ipk, policy_sig, usk, None, None, srs)
    w = ByteWriter()
    prot.challenge_contribution(srs, w)
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    show = prot.gen_show(usk, c)
    assert show.verify(c, attrs[:2], policy_pk, None, srs)
    # a different policy authority rejects
    other_pk = DelegationPolicyPublicKey.new(
        DelegationPolicySecretKey.new(RNG, 5), P1)
    assert not show.verify(c, attrs[:2], other_pk, None, srs)


def test_aggregate_subset_witnesses():
    """Hash-weighted subset-witness aggregation: one pairing equation checks
    openings of multiple commitments at once
    (reference `set_commitment.rs:432-600`)."""
    from crypto_tpu.delegatable_credentials.set_commitment import (
        AggregateSubsetWitness)
    srs = SetCommitmentSRS.generate(RNG, 16)
    commitments, subsets, witnesses = [], [], []
    for k in range(3):
        members = {int(F.rand(RNG)) for _ in range(4 + k)}
        comm, rho = SetCommitment.new(RNG, members, srs)
        subset = set(list(members)[:2])
        wit = SubsetWitness.new(members, subset, rho, srs)
        commitments.append(comm)
        subsets.append(subset)
        witnesses.append(wit)
    agg = AggregateSubsetWitness.new(commitments, subsets, witnesses)
    assert agg.verify(commitments, subsets, srs)
    # wrong subset list rejected
    bad = [set(s) for s in subsets]
    bad[1] = {int(F.rand(RNG))}
    assert not agg.verify(commitments, bad, srs)
    # mismatched lengths rejected
    assert not agg.verify(commitments[:2], subsets, srs)
