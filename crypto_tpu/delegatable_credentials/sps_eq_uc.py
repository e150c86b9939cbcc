"""SPSEQ-UC: structure-preserving signatures on equivalence classes with
update functionality (reference
`delegatable_credentials/src/msbm/{sps_eq_uc_sig,keys}.rs`, from the MSBM
delegatable-credential construction).

A credential is a mercurial signature over a vector of SET COMMITMENTS
(one per attribute block) plus a tag T = P1*(x_1*y) + upk*x_0 binding the
holder's key.  Operations:
  - change_rep: unlinkable re-randomization (mu scales commitments, psi
    re-randomizes the signature, chi refreshes the user key)
  - change_rel: DELEGATION — an update key lets a holder append a new
    attribute block without the issuer (uses P1-power shares of the
    mercurial secret keys scaled by 1/y)
  - to_orphan / from_orphan: detach/attach the holder binding so a
    credential can be transferred to a new user key."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..utils.ff import poly_from_roots
from .mercurial_sig import (MercurialPublicKey, MercurialSecretKey,
                            MercurialSignature)
from .set_commitment import (SetCommitment, SetCommitmentError,
                             SetCommitmentSRS, SubsetWitness)

F = bls.Fr


@dataclass
class RootIssuerSecretKey:
    x0: Fp
    msk: MercurialSecretKey

    @classmethod
    def generate(cls, rng, size: int):
        return cls(x0=F.rand_nonzero(rng),
                   msk=MercurialSecretKey.generate(rng, size))


@dataclass
class RootIssuerPublicKey:
    X_0: Point
    X_0_hat: Point
    X: MercurialPublicKey

    @classmethod
    def generate(cls, sk: RootIssuerSecretKey, srs: SetCommitmentSRS):
        return cls(
            X_0=(srs.P1_powers[0] * int(sk.x0)).normalize(),
            X_0_hat=(srs.P2_powers[0] * int(sk.x0)).normalize(),
            X=MercurialPublicKey.generate(sk.msk))


@dataclass
class UserSecretKey:
    x: Fp

    @classmethod
    def generate(cls, rng):
        return cls(x=F.rand_nonzero(rng))

    def randomize(self, psi: Fp, chi: Fp) -> "UserSecretKey":
        return UserSecretKey(x=(self.x + chi) * psi)


@dataclass
class UserPublicKey:
    pk: Point

    @classmethod
    def generate(cls, sk: UserSecretKey, srs: SetCommitmentSRS):
        return cls(pk=(srs.P1_powers[0] * int(sk.x)).normalize())

    def randomize(self, psi: Fp, chi: Fp,
                  P1: Point) -> "UserPublicKey":
        return UserPublicKey(
            pk=((self.pk + P1 * int(chi)) * int(psi)).normalize())


@dataclass
class UpdateKey:
    start_index: int
    max_attributes_per_commitment: int
    keys: list   # [[P1_powers[j] * msk[i]/y]]

    @property
    def end_index(self) -> int:
        return self.start_index + len(self.keys) - 1

    def key_for_index(self, index: int) -> list:
        return self.keys[index - self.start_index]

    def randomize(self, r: Fp) -> "UpdateKey":
        return UpdateKey(
            start_index=self.start_index,
            max_attributes_per_commitment=self.max_attributes_per_commitment,
            keys=[[(p * int(r)).normalize() for p in row]
                  for row in self.keys])

    def trim_key(self, start: int, end: int) -> "UpdateKey":
        return UpdateKey(
            start_index=start,
            max_attributes_per_commitment=self.max_attributes_per_commitment,
            keys=self.keys[start - self.start_index:
                           end - self.start_index + 1])

    def verify(self, sig: "SPSEQUCSignature", ipk: RootIssuerPublicKey,
               t: int, srs: SetCommitmentSRS) -> bool:
        """e(sum_j P1_j, X_hat_i) == e(sum_j key[i][j], Y_hat) per index
        (`keys.rs:203-228`, batched into one multi-pairing)."""
        ssum = bls.G1.infinity()
        for p in srs.P1_powers[:t]:
            ssum = ssum + p
        ssum = ssum.normalize()
        pairs = []
        for i in range(len(self.keys)):
            x_hat = ipk.X.X_hat[self.start_index + i]
            key_sum = bls.G1.infinity()
            for p in self.keys[i]:
                key_sum = key_sum + p
            pairs.append((ssum, x_hat))
            pairs.append(((-key_sum).normalize(), sig.comm_sig.Y_hat))
        return bls.multi_pairing(pairs).is_one()


@dataclass
class SPSEQUCSignature:
    comm_sig: MercurialSignature
    T: Point

    @classmethod
    def new(cls, rng, message_sets: list, upk: UserPublicKey,
            update_key_index: Optional[int], sk: RootIssuerSecretKey,
            max_attributes_per_commitment: int, srs: SetCommitmentSRS):
        """message_sets: list of attribute lists.  Returns
        (sig, commitments, openings(rho), update_key?)."""
        commitments, openings = [], []
        for msgs in message_sets:
            rho = F.rand_nonzero(rng)
            commitments.append(
                SetCommitment.new_with_randomness(set(msgs), rho, srs))
            openings.append(rho)
        sig, uk = cls._new_sig_and_update_key(
            rng, commitments, upk, update_key_index, sk,
            max_attributes_per_commitment, srs)
        return sig, commitments, openings, uk

    @classmethod
    def _new_sig_and_update_key(cls, rng, commitments, upk, uk_index, sk,
                                max_attrs, srs):
        k = len(commitments)
        y = F.rand_nonzero(rng)
        y_inv = y.inverse()
        comm_sig = MercurialSignature.new_with_given_randomness(
            y, [c.C for c in commitments], sk.msk,
            P1=srs.P1_powers[0], P2=srs.P2_powers[0])
        T = (srs.P1_powers[0] * int(sk.msk.x[0] * y)
             + upk.pk * int(sk.x0)).normalize()
        sig = cls(comm_sig=comm_sig, T=T)
        uk = None
        if uk_index is not None:
            if uk_index < k or uk_index >= len(sk.msk.x):
                raise SetCommitmentError("bad update key index")
            powers = srs.P1_powers[:max_attrs]
            keys = [[(p * int(sk.msk.x[i] * y_inv)).normalize()
                     for p in powers]
                    for i in range(k, uk_index + 1)]
            uk = UpdateKey(start_index=k,
                           max_attributes_per_commitment=max_attrs,
                           keys=keys)
        return sig, uk

    def verify_sig(self, commitments, upk: UserPublicKey,
                   ipk: RootIssuerPublicKey,
                   srs: SetCommitmentSRS) -> bool:
        P1, P2 = srs.P1_powers[0], srs.P2_powers[0]
        if not self.comm_sig.verify([c.C for c in commitments], ipk.X,
                                    P1=P1, P2=P2):
            return False
        return bls.multi_pairing([
            (self.comm_sig.Y, ipk.X.X_hat[0]),
            (upk.pk, ipk.X_0_hat),
            ((-self.T).normalize(), P2)]).is_one()

    def verify(self, commitments, message_sets, openings,
               upk: UserPublicKey, ipk: RootIssuerPublicKey,
               srs: SetCommitmentSRS) -> bool:
        if not self.verify_sig(commitments, upk, ipk, srs):
            return False
        for com, msgs, rho in zip(commitments, message_sets, openings):
            expected = SetCommitment.new_with_randomness(set(msgs), rho,
                                                         srs)
            if expected.C != com.C:
                return False
        return True

    def change_rep(self, commitments, openings, upk: UserPublicKey,
                   update_key: Optional[UpdateKey],
                   ipk: RootIssuerPublicKey, mu: Fp, psi: Fp, chi: Fp,
                   max_attrs: int, srs: SetCommitmentSRS):
        """Returns (new_sig, new_comms, new_openings, new_uk, new_upk)."""
        psi_inv = psi.inverse()
        new_openings = [o * mu for o in openings]
        new_comm_sig, new_cs = self.comm_sig.change_rep_with_given_randomness(
            mu, psi, [c.C for c in commitments])
        new_T = (self.T * int(psi)
                 + ipk.X_0 * int(chi * psi)).normalize()
        new_upk = upk.randomize(psi, chi, srs.P1_powers[0])
        new_uk = None
        if update_key is not None:
            if not update_key.verify(self, ipk, max_attrs, srs):
                raise SetCommitmentError("invalid update key")
            new_uk = update_key.randomize(psi_inv)
        new_sig = SPSEQUCSignature(comm_sig=new_comm_sig, T=new_T)
        new_comms = [SetCommitment(C=c) for c in new_cs]
        return new_sig, new_comms, new_openings, new_uk, new_upk

    def change_rel(self, messages: list, insert_at: int,
                   new_uk_index: Optional[int], update_key: UpdateKey,
                   rho: Fp, srs: SetCommitmentSRS):
        """Delegation: append an attribute block using the update key.
        Returns (new_sig, new_commitment, opening rho, trimmed_uk?)."""
        if update_key.start_index > insert_at or \
                insert_at > update_key.end_index:
            raise SetCommitmentError("index outside update key range")
        if update_key.max_attributes_per_commitment < len(messages):
            raise SetCommitmentError("too many attributes for update key")
        msg_set = set(messages)
        coeffs = poly_from_roots([F(int(m)) for m in msg_set])
        key_row = update_key.key_for_index(insert_at)
        add = bls.G1.infinity()
        for c, p in zip(coeffs, key_row):
            add = add + p * int(c)
        new_z = (self.comm_sig.Z + add * int(rho)).normalize()
        new_sig = SPSEQUCSignature(
            comm_sig=MercurialSignature(Z=new_z, Y=self.comm_sig.Y,
                                        Y_hat=self.comm_sig.Y_hat),
            T=self.T)
        com = SetCommitment.new_with_randomness(msg_set, rho, srs)
        uk = None
        if new_uk_index is not None:
            if new_uk_index > update_key.end_index or \
                    new_uk_index < update_key.start_index:
                raise SetCommitmentError("bad trimmed update key index")
            uk = update_key.trim_key(insert_at + 1, new_uk_index)
        return new_sig, com, rho, uk

    def to_orphan(self, usk: UserSecretKey,
                  X_0: Point) -> "SPSEQUCSignature":
        return SPSEQUCSignature(
            comm_sig=self.comm_sig,
            T=(self.T - X_0 * int(usk.x)).normalize())

    def from_orphan(self, usk: UserSecretKey,
                    X_0: Point) -> "SPSEQUCSignature":
        return SPSEQUCSignature(
            comm_sig=self.comm_sig,
            T=(self.T + X_0 * int(usk.x)).normalize())
