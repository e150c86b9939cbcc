"""Protego signer-hidden credential shows (reference
`delegatable_credentials/src/protego/show/{signer_hidden_with_decoys,
signer_hidden_with_policy}.rs`).

Two ways to hide WHICH issuer signed the credential:

* Decoys ("Protego" in the paper): randomize the issuer public key by
  rho and prove with a one-of-N ring proof that the randomized key came
  from a set containing the real issuer key and N-1 decoys.
* Delegation policy ("Protego Duo"): a policy authority mercurial-signs
  each approved issuer key (G2-message signature with a G1 public key);
  the holder randomizes key AND policy signature via ChangeRep, so the
  verifier learns only that SOME approved issuer signed.

In both, the credential's mercurial signature is converted to the
randomized key (ConvertSig with rho folded into the ChangeRep)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..curves import bls12_381 as bls
from ..fields.host import Fp
from ..serialize import ByteWriter
from .mercurial_sig import (MercurialPublicKey, MercurialPublicKeyG1,
                            MercurialSecretKey, MercurialSignatureG2)
from .one_of_n import OneOfNProof, OneOfNSrs
from .protego import (AuditorPublicKey, ProtegoCredential,
                      ProtegoIssuerPublicKey, ProtegoShow,
                      ProtegoShowProtocol, ProtegoUserPublicKey,
                      ProtegoUserSecretKey)
from .set_commitment import SetCommitmentSRS

F = bls.Fr


def _randomized_ipk(ipk: ProtegoIssuerPublicKey,
                    rho: Fp) -> ProtegoIssuerPublicKey:
    return ProtegoIssuerPublicKey(pk=ipk.pk.convert(rho),
                                  supports_audit=ipk.supports_audit)


# ---------------------------------------------------------------------------
# Signer hidden with decoys (`signer_hidden_with_decoys.rs`)
# ---------------------------------------------------------------------------

@dataclass
class PublicKeyAnonymityProof:
    randomized_pk: ProtegoIssuerPublicKey
    proof: OneOfNProof


@dataclass
class ShowProtocolHiddenPk:
    show_protocol: ProtegoShowProtocol
    pubkey_anonymity_proof: PublicKeyAnonymityProof

    @classmethod
    def init(cls, rng, credential: ProtegoCredential,
             disclosed_attributes: list, ipk: ProtegoIssuerPublicKey,
             decoy_public_keys: list, one_of_n_srs: OneOfNSrs,
             usk: ProtegoUserSecretKey,
             upk: Optional[ProtegoUserPublicKey],
             apk: Optional[AuditorPublicKey], srs: SetCommitmentSRS):
        rho = F.rand_nonzero(rng)
        randomized = _randomized_ipk(ipk, rho)
        P1 = srs.P1_powers[0]
        proof = OneOfNProof.new(
            rng, ipk.pk.X_hat,
            [d.pk.X_hat for d in decoy_public_keys],
            randomized.pk.X_hat, rho, one_of_n_srs, P1)
        show = ProtegoShowProtocol.init_with_usk(
            rng, credential, disclosed_attributes, usk, upk, apk, srs,
            sig_converter=rho)
        return cls(show_protocol=show,
                   pubkey_anonymity_proof=PublicKeyAnonymityProof(
                       randomized_pk=randomized, proof=proof))

    def challenge_contribution(self, srs: SetCommitmentSRS,
                               writer: ByteWriter):
        self.show_protocol.challenge_contribution(srs, writer)

    def gen_show(self, usk: Optional[ProtegoUserSecretKey],
                 challenge: Fp) -> "ShowHiddenPk":
        return ShowHiddenPk(
            show=self.show_protocol.gen_show(usk, challenge),
            pubkey_anonymity_proof=self.pubkey_anonymity_proof)


@dataclass
class ShowHiddenPk:
    show: ProtegoShow
    pubkey_anonymity_proof: PublicKeyAnonymityProof

    def challenge_contribution(self, srs, writer):
        self.show.challenge_contribution(srs, writer)

    def verify(self, challenge: Fp, disclosed_attributes: list,
               possible_public_keys: list, one_of_n_srs: OneOfNSrs,
               apk: Optional[AuditorPublicKey],
               srs: SetCommitmentSRS) -> bool:
        P1 = srs.P1_powers[0]
        anon = self.pubkey_anonymity_proof
        if not anon.proof.verify(
                [pk.pk.X_hat for pk in possible_public_keys],
                anon.randomized_pk.pk.X_hat, one_of_n_srs, P1):
            return False
        return self.show.verify(challenge, disclosed_attributes,
                                anon.randomized_pk, apk, srs)


# ---------------------------------------------------------------------------
# Signer hidden behind a delegation policy (`signer_hidden_with_policy.rs`)
# ---------------------------------------------------------------------------

@dataclass
class DelegationPolicySecretKey:
    sk: MercurialSecretKey

    @classmethod
    def new(cls, rng, max_public_key_size: int):
        return cls(sk=MercurialSecretKey.generate(rng, max_public_key_size))

    def sign_public_key(self, rng, ipk: ProtegoIssuerPublicKey,
                        P1, P2) -> MercurialSignatureG2:
        return MercurialSignatureG2.new(rng, ipk.pk.X_hat, self.sk,
                                        P1=P1, P2=P2)


@dataclass
class DelegationPolicyPublicKey:
    pk: MercurialPublicKeyG1

    @classmethod
    def new(cls, sk: DelegationPolicySecretKey, P1):
        return cls(pk=MercurialPublicKeyG1.generate(sk.sk, P1))


@dataclass
class DelegationPolicyProof:
    randomized_pk: ProtegoIssuerPublicKey
    signature: MercurialSignatureG2


@dataclass
class ShowProtocolWithDelegationPolicy:
    show_protocol: ProtegoShowProtocol
    pubkey_anonymity_proof: DelegationPolicyProof

    @classmethod
    def init(cls, rng, credential: ProtegoCredential,
             disclosed_attributes: list, ipk: ProtegoIssuerPublicKey,
             policy_signature: MercurialSignatureG2,
             usk: ProtegoUserSecretKey,
             upk: Optional[ProtegoUserPublicKey],
             apk: Optional[AuditorPublicKey], srs: SetCommitmentSRS):
        rho = F.rand_nonzero(rng)
        new_sig, new_key = policy_signature.change_rep(rng, rho,
                                                       ipk.pk.X_hat)
        randomized = ProtegoIssuerPublicKey(
            pk=MercurialPublicKey(X_hat=new_key),
            supports_audit=ipk.supports_audit)
        show = ProtegoShowProtocol.init_with_usk(
            rng, credential, disclosed_attributes, usk, upk, apk, srs,
            sig_converter=rho)
        return cls(show_protocol=show,
                   pubkey_anonymity_proof=DelegationPolicyProof(
                       randomized_pk=randomized, signature=new_sig))

    def challenge_contribution(self, srs: SetCommitmentSRS,
                               writer: ByteWriter):
        self.show_protocol.challenge_contribution(srs, writer)

    def gen_show(self, usk: Optional[ProtegoUserSecretKey],
                 challenge: Fp) -> "ShowWithDelegationPolicy":
        return ShowWithDelegationPolicy(
            show=self.show_protocol.gen_show(usk, challenge),
            pubkey_anonymity_proof=self.pubkey_anonymity_proof)


@dataclass
class ShowWithDelegationPolicy:
    show: ProtegoShow
    pubkey_anonymity_proof: DelegationPolicyProof

    def challenge_contribution(self, srs, writer):
        self.show.challenge_contribution(srs, writer)

    def verify(self, challenge: Fp, disclosed_attributes: list,
               policy_public_key: DelegationPolicyPublicKey,
               apk: Optional[AuditorPublicKey],
               srs: SetCommitmentSRS) -> bool:
        P1, P2 = srs.P1_powers[0], srs.P2_powers[0]
        anon = self.pubkey_anonymity_proof
        if not anon.signature.verify(anon.randomized_pk.pk.X_hat,
                                     policy_public_key.pk, P1=P1, P2=P2):
            return False
        return self.show.verify(challenge, disclosed_attributes,
                                anon.randomized_pk, apk, srs)
