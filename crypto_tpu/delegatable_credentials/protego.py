"""Protego: auditable anonymous credentials over mercurial signatures and
set commitments (reference `delegatable_credentials/src/protego/
{keys,issuance,show/known_signer}.rs`).

Issuance: the user's attribute set is committed with the USER SECRET KEY
as the commitment randomness (C1); the request proves knowledge of usk and
the issuer pairing-checks C1 against upk before signing the mercurial
message vector [C1, C2=C1*r4, P1 (+upk, apk if auditable)].

Show: change_rep by mu unlinkably re-randomizes signature and messages;
the holder proves knowledge of r4 (C2 = C1'*r4) and mu (C3 = P1*mu),
discloses attributes via a subset witness on C1', and — when auditable —
ElGamal-encrypts upk to the auditor with a proof (com1/z1 Schnorr + three
pairing identities over t1, t2, t3) that the encrypted key is the one
inside the credential.  Revocation (accumulator-based) is not wired here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..schnorr.discrete_log import PokDiscreteLog, PokDiscreteLogProtocol
from ..serialize import ByteWriter
from ..utils.elgamal import Ciphertext as ElgamalCiphertext
from ..utils.ff import poly_from_roots
from .mercurial_sig import (MercurialPublicKey, MercurialSecretKey,
                            MercurialSignature)
from .set_commitment import (SetCommitment, SetCommitmentError,
                             SetCommitmentSRS, SubsetWitness)

F = bls.Fr


@dataclass
class ProtegoIssuerSecretKey:
    msk: MercurialSecretKey
    supports_audit: bool

    @classmethod
    def generate(cls, rng, supports_audit: bool = False):
        size = 3 + (2 if supports_audit else 0)
        return cls(msk=MercurialSecretKey.generate(rng, size),
                   supports_audit=supports_audit)


@dataclass
class ProtegoIssuerPublicKey:
    pk: MercurialPublicKey
    supports_audit: bool

    @classmethod
    def generate(cls, sk: ProtegoIssuerSecretKey):
        return cls(pk=MercurialPublicKey.generate(sk.msk),
                   supports_audit=sk.supports_audit)


@dataclass
class AuditorSecretKey:
    x: Fp

    @classmethod
    def generate(cls, rng):
        return cls(x=F.rand_nonzero(rng))


@dataclass
class AuditorPublicKey:
    pk: Point

    @classmethod
    def generate(cls, sk: AuditorSecretKey, P1: Point):
        return cls(pk=(P1 * int(sk.x)).normalize())


@dataclass
class ProtegoUserSecretKey:
    x: Fp

    @classmethod
    def generate(cls, rng):
        return cls(x=F.rand_nonzero(rng))


@dataclass
class ProtegoUserPublicKey:
    pk: Point

    @classmethod
    def generate(cls, sk: ProtegoUserSecretKey, P1: Point):
        return cls(pk=(P1 * int(sk.x)).normalize())


# ---------------------------------------------------------------------------
# issuance
# ---------------------------------------------------------------------------

@dataclass
class SignatureRequestProtocol:
    usk_protocol: PokDiscreteLogProtocol
    auditable_sig: bool

    @classmethod
    def init(cls, rng, usk: ProtegoUserSecretKey, auditable_sig: bool,
             P1: Point):
        return cls(usk_protocol=PokDiscreteLogProtocol.init(
            usk.x, F.rand(rng), P1), auditable_sig=auditable_sig)

    def challenge_contribution(self, upk: ProtegoUserPublicKey, P1: Point,
                               writer: ByteWriter):
        self.usk_protocol.challenge_contribution(P1, upk.pk, writer)

    def gen_request(self, rng, attributes: list,
                    usk: ProtegoUserSecretKey, challenge: Fp,
                    srs: SetCommitmentSRS):
        """Returns (SignatureRequest, opening r4)."""
        attr_set = set(attributes)
        r4 = F.rand_nonzero(rng)
        comm = SetCommitment.new_with_randomness(attr_set, usk.x, srs)
        C2 = (comm.C * int(r4)).normalize()
        req = SignatureRequest(
            C1=comm.C, C2=C2,
            usk_proof=self.usk_protocol.gen_proof(challenge),
            auditable_sig=self.auditable_sig)
        return req, r4


@dataclass
class SignatureRequest:
    C1: Point
    C2: Point
    usk_proof: PokDiscreteLog
    auditable_sig: bool

    def verify(self, attributes: list, upk: ProtegoUserPublicKey,
               challenge: Fp, srs: SetCommitmentSRS) -> bool:
        coeffs = poly_from_roots([F(int(a)) for a in set(attributes)])
        ch_p2 = srs.eval_in_g2(coeffs)
        # e(C1, P2) == e(upk, Ch(attrs)*P2)
        ok = bls.multi_pairing([
            (self.C1, srs.P2_powers[0]),
            ((-upk.pk).normalize(), ch_p2)]).is_one()
        if not ok:
            return False
        return self.usk_proof.verify(upk.pk, srs.P1_powers[0], challenge)

    def messages(self, upk: Optional[ProtegoUserPublicKey],
                 apk: Optional[AuditorPublicKey], P1: Point) -> list:
        msgs = [self.C1, self.C2, P1]
        if self.auditable_sig:
            msgs.append(upk.pk)
            msgs.append(apk.pk)
        return msgs

    def sign(self, rng, isk: ProtegoIssuerSecretKey,
             upk: Optional[ProtegoUserPublicKey],
             apk: Optional[AuditorPublicKey],
             srs: SetCommitmentSRS) -> MercurialSignature:
        if self.auditable_sig and not isk.supports_audit:
            raise SetCommitmentError("issuer key does not support audit")
        msgs = self.messages(upk, apk, srs.P1_powers[0])
        y = F.rand_nonzero(rng)
        return MercurialSignature.new_with_given_randomness(
            y, msgs, isk.msk, P1=srs.P1_powers[0], P2=srs.P2_powers[0])


@dataclass
class ProtegoCredential:
    attributes: list
    C1: Point
    r4: Fp
    signature: MercurialSignature
    auditable_sig: bool

    def verify(self, upk: ProtegoUserPublicKey,
               apk: Optional[AuditorPublicKey],
               ipk: ProtegoIssuerPublicKey,
               srs: SetCommitmentSRS) -> bool:
        msgs = [self.C1, (self.C1 * int(self.r4)).normalize(),
                srs.P1_powers[0]]
        if self.auditable_sig:
            msgs += [upk.pk, apk.pk]
        return self.signature.verify(msgs, ipk.pk, P1=srs.P1_powers[0],
                                     P2=srs.P2_powers[0])


def issue_credential(rng, attributes: list, usk: ProtegoUserSecretKey,
                     upk: ProtegoUserPublicKey,
                     isk: ProtegoIssuerSecretKey,
                     apk: Optional[AuditorPublicKey],
                     srs: SetCommitmentSRS) -> ProtegoCredential:
    """In-process issuance round (request -> signer verify -> sign)."""
    auditable = isk.supports_audit
    prot = SignatureRequestProtocol.init(rng, usk, auditable,
                                         srs.P1_powers[0])
    w = ByteWriter()
    prot.challenge_contribution(upk, srs.P1_powers[0], w)
    from ..hashing import compute_random_oracle_challenge
    c = compute_random_oracle_challenge(F, bytes(w.buf))
    req, r4 = prot.gen_request(rng, attributes, usk, c, srs)
    if not req.verify(attributes, upk, c, srs):
        raise SetCommitmentError("invalid signature request")
    sig = req.sign(rng, isk, upk, apk, srs)
    return ProtegoCredential(attributes=list(attributes), C1=req.C1, r4=r4,
                             signature=sig, auditable_sig=auditable)


# ---------------------------------------------------------------------------
# show (known signer)
# ---------------------------------------------------------------------------

@dataclass
class CiphertextProofProtocol:
    C6: Point
    C7: Point
    alpha: Fp
    ct: ElgamalCiphertext
    r1: Fp
    com1: Point
    ciphertext_rand_protocol: PokDiscreteLogProtocol
    t1: Point
    t2: Point
    t3: Point


@dataclass
class CiphertextProof:
    C6: Point
    C7: Point
    com1: Point
    z1: Fp
    ciphertext_rand_proof: PokDiscreteLog
    t1: Point
    t2: Point
    t3: Point


@dataclass
class ProtegoShowProtocol:
    C1: Point
    C2: Point
    C3: Point
    signature: MercurialSignature
    attrib_comm_protocol: PokDiscreteLogProtocol
    attrib_comm_rand_protocol: PokDiscreteLogProtocol
    disclosed_witness: Optional[SubsetWitness]
    ct: Optional[CiphertextProofProtocol]
    r4: Fp

    @classmethod
    def init_with_usk(cls, rng, credential: ProtegoCredential,
                      disclosed_attributes: list,
                      usk: ProtegoUserSecretKey,
                      upk: Optional[ProtegoUserPublicKey],
                      apk: Optional[AuditorPublicKey],
                      srs: SetCommitmentSRS,
                      sig_converter: Optional[Fp] = None):
        """Show with selective disclosure (holder supplies usk to open the
        subset witness, mirroring the reference where the opening contains
        the set-commitment randomness = usk).  `sig_converter` additionally
        converts the signature to the randomized issuer key pk*rho
        (signer-hidden shows, `known_signer.rs:222-228`)."""
        P1, P2 = srs.P1_powers[0], srs.P2_powers[0]
        msgs = [credential.C1,
                (credential.C1 * int(credential.r4)).normalize(), P1]
        if credential.auditable_sig:
            msgs += [upk.pk, apk.pk]
        mu = F.rand_nonzero(rng)
        if sig_converter is not None:
            signature, c_prime = \
                credential.signature.change_rep_with_given_sig_converter(
                    rng, mu, sig_converter, msgs)
        else:
            signature, c_prime = \
                credential.signature.change_rep_with_given_randomness(
                    mu, F.rand_nonzero(rng).inverse(), msgs)
        witness = None
        if disclosed_attributes:
            witness = SubsetWitness.new(
                set(credential.attributes), set(disclosed_attributes),
                usk.x * mu, srs)
        prot_r4 = PokDiscreteLogProtocol.init(credential.r4, F.rand(rng),
                                              c_prime[0])
        prot_mu = PokDiscreteLogProtocol.init(mu, F.rand(rng), P1)
        ct_proto = None
        if credential.auditable_sig:
            alpha = F.rand_nonzero(rng)
            ct = ElgamalCiphertext(
                encrypted=(upk.pk + apk.pk * int(alpha)).normalize(),
                eph_pk=(P1 * int(alpha)).normalize())
            r1, r2 = F.rand(rng), F.rand(rng)
            beta = F.rand_nonzero(rng)
            com1 = (P1 * int(r1) + apk.pk * int(r2)).normalize()
            ct_rand = PokDiscreteLogProtocol.init(alpha, r2, P1)
            ct_proto = CiphertextProofProtocol(
                C6=c_prime[3], C7=c_prime[4], alpha=alpha, ct=ct, r1=r1,
                com1=com1, ciphertext_rand_protocol=ct_rand,
                t1=(P2 * int(beta)).normalize(),
                t2=(P2 * int(beta * mu)).normalize(),
                t3=(P2 * int(beta * alpha)).normalize())
        return cls(C1=c_prime[0], C2=c_prime[1], C3=c_prime[2],
                   signature=signature, attrib_comm_protocol=prot_r4,
                   attrib_comm_rand_protocol=prot_mu,
                   disclosed_witness=witness, ct=ct_proto,
                   r4=credential.r4)

    def challenge_contribution(self, srs: SetCommitmentSRS,
                               writer: ByteWriter):
        self.attrib_comm_protocol.challenge_contribution(self.C1, self.C2,
                                                         writer)
        self.attrib_comm_rand_protocol.challenge_contribution(
            srs.P1_powers[0], self.C3, writer)
        if self.ct is not None:
            writer.point(self.ct.com1)
            writer.point(self.ct.ct.eph_pk)
            writer.point(self.ct.ct.encrypted)

    def gen_show(self, usk: Optional[ProtegoUserSecretKey],
                 challenge: Fp) -> "ProtegoShow":
        ct, ct_proof = None, None
        if self.ct is not None:
            z1 = self.ct.r1 + usk.x * challenge
            ct = self.ct.ct
            ct_proof = CiphertextProof(
                C6=self.ct.C6, C7=self.ct.C7, com1=self.ct.com1, z1=z1,
                ciphertext_rand_proof=(
                    self.ct.ciphertext_rand_protocol.gen_proof(challenge)),
                t1=self.ct.t1, t2=self.ct.t2, t3=self.ct.t3)
        return ProtegoShow(
            C1=self.C1, C2=self.C2, C3=self.C3, signature=self.signature,
            attrib_comm_proof=self.attrib_comm_protocol.gen_proof(challenge),
            attrib_comm_rand_proof=(
                self.attrib_comm_rand_protocol.gen_proof(challenge)),
            disclosed_witness=self.disclosed_witness, ct=ct,
            ct_proof=ct_proof)


@dataclass
class ProtegoShow:
    C1: Point
    C2: Point
    C3: Point
    signature: MercurialSignature
    attrib_comm_proof: PokDiscreteLog
    attrib_comm_rand_proof: PokDiscreteLog
    disclosed_witness: Optional[SubsetWitness]
    ct: Optional[ElgamalCiphertext]
    ct_proof: Optional[CiphertextProof]

    def challenge_contribution(self, srs: SetCommitmentSRS,
                               writer: ByteWriter):
        self.attrib_comm_proof.challenge_contribution(self.C1, self.C2,
                                                      writer)
        self.attrib_comm_rand_proof.challenge_contribution(
            srs.P1_powers[0], self.C3, writer)
        if self.ct_proof is not None:
            writer.point(self.ct_proof.com1)
            writer.point(self.ct.eph_pk)
            writer.point(self.ct.encrypted)

    def verify(self, challenge: Fp, disclosed_attributes: list,
               ipk: ProtegoIssuerPublicKey,
               apk: Optional[AuditorPublicKey],
               srs: SetCommitmentSRS) -> bool:
        P1, P2 = srs.P1_powers[0], srs.P2_powers[0]
        if not self.attrib_comm_proof.verify(self.C2, self.C1, challenge):
            return False
        if not self.attrib_comm_rand_proof.verify(self.C3, P1, challenge):
            return False
        if disclosed_attributes:
            if self.disclosed_witness is None:
                return False
            if not self.disclosed_witness.verify(
                    set(disclosed_attributes), SetCommitment(C=self.C1),
                    srs):
                return False
        msgs = [self.C1, self.C2, self.C3]
        if self.ct_proof is not None:
            msgs += [self.ct_proof.C6, self.ct_proof.C7]
        if not self.signature.verify(msgs, ipk.pk, P1=P1, P2=P2):
            return False
        if self.ct_proof is not None:
            cp = self.ct_proof
            lhs = (P1 * int(cp.z1)
                   + apk.pk * int(cp.ciphertext_rand_proof.response)
                   - self.ct.encrypted * int(challenge)).normalize()
            if lhs != cp.com1:
                return False
            if not cp.ciphertext_rand_proof.verify(self.ct.eph_pk, P1,
                                                   challenge):
                return False
            if not bls.multi_pairing([
                    (self.ct.eph_pk, cp.t1),
                    ((-P1).normalize(), cp.t3)]).is_one():
                return False
            if not bls.multi_pairing([
                    (self.ct.eph_pk, cp.t2),
                    ((-self.C3).normalize(), cp.t3)]).is_one():
                return False
            if not bls.multi_pairing([
                    ((-self.ct.encrypted).normalize(), cp.t2),
                    (cp.C6, cp.t1),
                    (cp.C7, cp.t3)]).is_one():
                return False
        return True

    def audit(self, ask: AuditorSecretKey) -> Point:
        """Auditor recovers the user's public key from the ciphertext."""
        return (self.ct.encrypted
                - self.ct.eph_pk * int(ask.x)).normalize()
