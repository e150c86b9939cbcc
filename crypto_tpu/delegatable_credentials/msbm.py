"""MSBM delegatable anonymous credentials over SPSEQ-UC (reference
`delegatable_credentials/src/msbm/{issuance,show}.rs`).

A root issuer signs attribute blocks for a user; holders can DELEGATE by
appending blocks with the update key (optionally trimming it so delegatees
can't extend further), and SHOW unlinkably: re-randomize everything for a
fresh pseudonym, open only the disclosed attributes via one aggregated
subset witness, and prove knowledge of the pseudonym secret."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..schnorr.discrete_log import PokDiscreteLog, PokDiscreteLogProtocol
from ..serialize import ByteWriter
from .set_commitment import (AggregateSubsetWitness, SetCommitment,
                             SetCommitmentError, SetCommitmentSRS,
                             SubsetWitness)
from .sps_eq_uc import (RootIssuerPublicKey, RootIssuerSecretKey,
                        SPSEQUCSignature, UpdateKey, UserPublicKey,
                        UserSecretKey)

F = bls.Fr


@dataclass
class Credential:
    max_attributes_per_commitment: int
    attributes: list       # [[Fp]]
    commitments: list      # [SetCommitment]
    openings: list         # [rho]
    signature: SPSEQUCSignature

    @classmethod
    def issue_root(cls, rng, attributes: list, upk: UserPublicKey,
                   update_key_index: Optional[int],
                   sk: RootIssuerSecretKey, max_attrs: int,
                   srs: SetCommitmentSRS):
        sig, comms, opens, uk = SPSEQUCSignature.new(
            rng, attributes, upk, update_key_index, sk, max_attrs, srs)
        return cls(max_attributes_per_commitment=max_attrs,
                   attributes=attributes, commitments=comms,
                   openings=opens, signature=sig), uk

    def verify(self, upk: UserPublicKey, ipk: RootIssuerPublicKey,
               srs: SetCommitmentSRS) -> bool:
        return self.signature.verify(self.commitments, self.attributes,
                                     self.openings, upk, ipk, srs)

    def delegate_with_new_attributes(self, rng, attributes: list,
                                     new_uk_index: Optional[int],
                                     update_key: UpdateKey,
                                     srs: SetCommitmentSRS):
        """Holder appends a block via the update key; returns
        (new credential, trimmed update key?)."""
        rho = F.rand_nonzero(rng)
        insert_at = len(self.attributes)
        new_sig, com, o, new_uk = self.signature.change_rel(
            attributes, insert_at, new_uk_index, update_key, rho, srs)
        return Credential(
            max_attributes_per_commitment=self.max_attributes_per_commitment,
            attributes=self.attributes + [attributes],
            commitments=self.commitments + [com],
            openings=self.openings + [o],
            signature=new_sig), new_uk

    def transfer(self, old_usk: UserSecretKey, new_usk: UserSecretKey,
                 X_0: Point) -> "Credential":
        """Orphan + adopt: move the credential to a new user key."""
        orphan = self.signature.to_orphan(old_usk, X_0)
        return Credential(
            max_attributes_per_commitment=self.max_attributes_per_commitment,
            attributes=self.attributes, commitments=self.commitments,
            openings=self.openings,
            signature=orphan.from_orphan(new_usk, X_0))

    def randomize_for_show(self, rng, mu: Fp, upk: UserPublicKey,
                           ipk: RootIssuerPublicKey, max_attrs: int,
                           srs: SetCommitmentSRS):
        psi = F.rand_nonzero(rng)
        chi = F.rand(rng)
        new_sig, new_comms, new_opens, _, new_upk = \
            self.signature.change_rep(
                self.commitments, self.openings, upk, None, ipk, mu, psi,
                chi, max_attrs, srs)
        cred = Credential(
            max_attributes_per_commitment=self.max_attributes_per_commitment,
            attributes=self.attributes, commitments=new_comms,
            openings=new_opens, signature=new_sig)
        return cred, new_upk, psi, chi


@dataclass
class CredentialShowProtocol:
    commitments: list
    signature: SPSEQUCSignature
    disclosed_witness: AggregateSubsetWitness
    pseudonym: UserPublicKey
    schnorr: PokDiscreteLogProtocol

    @classmethod
    def init(cls, rng, credential: Credential, disclose_attrs: list,
             usk: UserSecretKey, upk: UserPublicKey,
             ipk: RootIssuerPublicKey, srs: SetCommitmentSRS):
        if len(credential.commitments) != len(disclose_attrs):
            raise SetCommitmentError("one disclosure set per block")
        mu = F.rand_nonzero(rng)
        rand_cred, nym, psi, chi = credential.randomize_for_show(
            rng, mu, upk, ipk, credential.max_attributes_per_commitment,
            srs)
        new_usk = usk.randomize(psi, chi)
        witnesses = []
        for i, d in enumerate(disclose_attrs):
            witnesses.append(SubsetWitness.new(
                set(rand_cred.attributes[i]), set(d),
                rand_cred.openings[i], srs))
        agg = AggregateSubsetWitness.new(
            rand_cred.commitments,
            [set(d) for d in disclose_attrs], witnesses)
        schnorr = PokDiscreteLogProtocol.init(new_usk.x, F.rand(rng),
                                              srs.P1_powers[0])
        return cls(commitments=rand_cred.commitments,
                   signature=rand_cred.signature, disclosed_witness=agg,
                   pseudonym=nym, schnorr=schnorr)

    def challenge_contribution(self, srs: SetCommitmentSRS,
                               writer: ByteWriter):
        self.schnorr.challenge_contribution(srs.P1_powers[0],
                                            self.pseudonym.pk, writer)

    def gen_show(self, challenge: Fp) -> "CredentialShow":
        return CredentialShow(
            commitments=self.commitments, signature=self.signature,
            disclosed_witness=self.disclosed_witness,
            pseudonym=self.pseudonym,
            schnorr=self.schnorr.gen_proof(challenge))


@dataclass
class CredentialShow:
    commitments: list
    signature: SPSEQUCSignature
    disclosed_witness: AggregateSubsetWitness
    pseudonym: UserPublicKey
    schnorr: PokDiscreteLog

    def challenge_contribution(self, srs: SetCommitmentSRS,
                               writer: ByteWriter):
        self.schnorr.challenge_contribution(srs.P1_powers[0],
                                            self.pseudonym.pk, writer)

    def verify(self, disclose_attrs: list, challenge: Fp,
               ipk: RootIssuerPublicKey, srs: SetCommitmentSRS) -> bool:
        if not self.signature.verify_sig(self.commitments, self.pseudonym,
                                         ipk, srs):
            return False
        if not self.disclosed_witness.verify(
                self.commitments, [set(d) for d in disclose_attrs], srs):
            return False
        return self.schnorr.verify(self.pseudonym.pk, srs.P1_powers[0],
                                   challenge)
