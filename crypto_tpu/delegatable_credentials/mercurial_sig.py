"""Mercurial signatures — structure-preserving signatures on equivalence
classes (reference `delegatable_credentials/src/mercurial_sig.rs`,
Crites-Lysyanskaya CT-RSA'19), the signing layer of delegatable credentials.

Message: vector of G1 points (M_1..M_l).  sk = (x_1..x_l),
pk = (X_hat_i = P_hat * x_i).

Sign: y random;  Z = (sum M_i * x_i) * y;  Y = P * 1/y;  Y_hat = P_hat * 1/y.
Verify: prod e(M_i, X_hat_i) == e(Z, Y_hat)  and  e(Y, P_hat) == e(P, Y_hat).

Equivalence-class operations:
* ConvertSig (key class, factor mu):  valid under pk' = pk * mu via
  Z' = Z * mu (re-randomized).
* ChangeRep (message class, factor psi): message M' = M * psi with
  Z' = Z * psi (re-randomized) — signatures migrate within classes without
  the signer.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp

F = bls.Fr


@dataclass
class MercurialSecretKey:
    x: list

    @classmethod
    def generate(cls, rng, size: int):
        return cls([F.rand_nonzero(rng) for _ in range(size)])


@dataclass
class MercurialPublicKey:
    X_hat: list

    @classmethod
    def generate(cls, sk: MercurialSecretKey):
        g2 = bls.G2.generator()
        return cls([(g2 * int(x)).normalize() for x in sk.x])

    def convert(self, mu: Fp) -> "MercurialPublicKey":
        return MercurialPublicKey([(x * int(mu)).normalize()
                                   for x in self.X_hat])


@dataclass
class MercurialSignature:
    Z: Point
    Y: Point
    Y_hat: Point

    @classmethod
    def new(cls, rng, messages: list, sk: MercurialSecretKey):
        return cls.new_with_given_randomness(
            F.rand_nonzero(rng).inverse(), messages, sk)

    @classmethod
    def new_with_given_randomness(cls, y_inv: Fp, messages: list,
                                  sk: MercurialSecretKey, P1: Point = None,
                                  P2: Point = None):
        """Sign message vector with supplied randomness and generators
        (the SPSEQ-UC building block, reference
        `mercurial_sig.rs` `new_with_given_randomness`)."""
        assert len(messages) <= len(sk.x)
        P1 = P1 if P1 is not None else bls.G1.generator()
        P2 = P2 if P2 is not None else bls.G2.generator()
        y = y_inv.inverse()
        acc = bls.G1.infinity()
        for m, x in zip(messages, sk.x):
            acc = acc + m * int(x)
        return cls(
            Z=(acc * int(y)).normalize(),
            Y=(P1 * int(y_inv)).normalize(),
            Y_hat=(P2 * int(y_inv)).normalize())

    def verify(self, messages: list, pk: MercurialPublicKey,
               P1: Point = None, P2: Point = None) -> bool:
        if len(messages) > len(pk.X_hat):
            return False
        P1 = P1 if P1 is not None else bls.G1.generator()
        P2 = P2 if P2 is not None else bls.G2.generator()
        pairs = [(m, xh) for m, xh in zip(messages, pk.X_hat)]
        pairs.append(((-self.Z).normalize(), self.Y_hat))
        if not bls.multi_pairing(pairs).is_one():
            return False
        return bls.multi_pairing([
            (self.Y, P2),
            ((-P1).normalize(), self.Y_hat)]).is_one()

    def convert(self, rng, mu: Fp) -> "MercurialSignature":
        """Adapt to the converted key pk*mu (ConvertSig)."""
        psi = F.rand_nonzero(rng)
        psi_inv = psi.inverse()
        return MercurialSignature(
            Z=(self.Z * int(psi * mu)).normalize(),
            Y=(self.Y * int(psi_inv)).normalize(),
            Y_hat=(self.Y_hat * int(psi_inv)).normalize())

    def change_rep(self, rng, messages: list, rho: Fp):
        """Move to message representative M*rho (ChangeRep); returns
        (new messages, adapted signature)."""
        psi_inv = F.rand_nonzero(rng).inverse()
        sig, new_msgs = self.change_rep_with_given_randomness(
            rho, psi_inv, messages)
        return new_msgs, sig

    def change_rep_with_given_randomness(self, mu: Fp, psi_inv: Fp,
                                         messages: list):
        """Deterministic ChangeRep (reference
        `change_rep_with_given_randomness`): messages scale by mu, the
        signature re-randomizes by psi_inv.  Returns (sig, new messages)."""
        psi = psi_inv.inverse()
        new_msgs = [(m * int(mu)).normalize() for m in messages]
        sig = MercurialSignature(
            Z=(self.Z * int(psi * mu)).normalize(),
            Y=(self.Y * int(psi_inv)).normalize(),
            Y_hat=(self.Y_hat * int(psi_inv)).normalize())
        return sig, new_msgs

    def change_rep_with_given_sig_converter(self, rng, mu: Fp,
                                            sig_converter: Fp,
                                            messages: list):
        """ChangeRep + ConvertSig in one step (reference
        `change_rep_with_given_sig_converter`, mercurial_sig.rs:229-243):
        messages scale by mu while the signature additionally converts to
        the key pk*sig_converter — used when the issuer public key is
        hidden by randomizing it with `sig_converter`."""
        psi_inv = F.rand_nonzero(rng).inverse()
        psi = psi_inv.inverse()
        new_msgs = [(m * int(mu)).normalize() for m in messages]
        sig = MercurialSignature(
            Z=(self.Z * int(psi * mu * sig_converter)).normalize(),
            Y=(self.Y * int(psi_inv)).normalize(),
            Y_hat=(self.Y_hat * int(psi_inv)).normalize())
        return sig, new_msgs


# ---------------------------------------------------------------------------
# Dual scheme: messages in G2, public key in G1 (reference
# `mercurial_sig.rs` SignatureG2/PublicKeyG1, the macro instantiation with
# swapped groups).  Used by the Protego delegation-policy show to sign
# issuer public keys (which live in G2).
# ---------------------------------------------------------------------------

@dataclass
class MercurialPublicKeyG1:
    X: list    # [P1 * x_i]

    @classmethod
    def generate(cls, sk: MercurialSecretKey, P1: Point = None):
        P1 = P1 if P1 is not None else bls.G1.generator()
        return cls([(P1 * int(x)).normalize() for x in sk.x])

    def convert(self, mu: Fp) -> "MercurialPublicKeyG1":
        return MercurialPublicKeyG1([(x * int(mu)).normalize()
                                     for x in self.X])


@dataclass
class MercurialSignatureG2:
    """Signature on G2 messages: Z in G2, Y in G2, Y_tilde in G1."""
    Z: Point
    Y: Point
    Y_tilde: Point

    @classmethod
    def new(cls, rng, messages: list, sk: MercurialSecretKey,
            P1: Point = None, P2: Point = None):
        assert len(messages) <= len(sk.x)
        P1 = P1 if P1 is not None else bls.G1.generator()
        P2 = P2 if P2 is not None else bls.G2.generator()
        y_inv = F.rand_nonzero(rng)
        y = y_inv.inverse()
        acc = bls.G2.infinity()
        for m, x in zip(messages, sk.x):
            acc = acc + m * int(x)
        return cls(Z=(acc * int(y)).normalize(),
                   Y=(P2 * int(y_inv)).normalize(),
                   Y_tilde=(P1 * int(y_inv)).normalize())

    def verify(self, messages: list, pk: MercurialPublicKeyG1,
               P1: Point = None, P2: Point = None) -> bool:
        if len(messages) > len(pk.X):
            return False
        P1 = P1 if P1 is not None else bls.G1.generator()
        P2 = P2 if P2 is not None else bls.G2.generator()
        pairs = [(x, m) for x, m in zip(pk.X, messages)]
        pairs.append(((-self.Y_tilde).normalize(), self.Z))
        if not bls.multi_pairing(pairs).is_one():
            return False
        return bls.multi_pairing([
            (self.Y_tilde, P2),
            ((-P1).normalize(), self.Y)]).is_one()

    def change_rep(self, rng, rho: Fp, messages: list):
        """ChangeRep for G2 messages: returns (new sig, messages*rho)."""
        psi_inv = F.rand_nonzero(rng).inverse()
        psi = psi_inv.inverse()
        new_msgs = [(m * int(rho)).normalize() for m in messages]
        sig = MercurialSignatureG2(
            Z=(self.Z * int(psi * rho)).normalize(),
            Y=(self.Y * int(psi_inv)).normalize(),
            Y_tilde=(self.Y_tilde * int(psi_inv)).normalize())
        return sig, new_msgs
