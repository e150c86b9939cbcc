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
        assert len(messages) == len(sk.x)
        y = F.rand_nonzero(rng)
        acc = bls.G1.infinity()
        for m, x in zip(messages, sk.x):
            acc = acc + m * int(x)
        y_inv = y.inverse()
        return cls(
            Z=(acc * int(y)).normalize(),
            Y=(bls.G1.generator() * int(y_inv)).normalize(),
            Y_hat=(bls.G2.generator() * int(y_inv)).normalize())

    def verify(self, messages: list, pk: MercurialPublicKey) -> bool:
        if len(messages) != len(pk.X_hat):
            return False
        pairs = [(m, xh) for m, xh in zip(messages, pk.X_hat)]
        pairs.append(((-self.Z).normalize(), self.Y_hat))
        if not bls.multi_pairing(pairs).is_one():
            return False
        return bls.multi_pairing([
            (self.Y, bls.G2.generator()),
            ((-bls.G1.generator()).normalize(), self.Y_hat)]).is_one()

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
        psi = F.rand_nonzero(rng)
        psi_inv = psi.inverse()
        new_msgs = [(m * int(rho)).normalize() for m in messages]
        sig = MercurialSignature(
            Z=(self.Z * int(psi * rho)).normalize(),
            Y=(self.Y * int(psi_inv)).normalize(),
            Y_hat=(self.Y_hat * int(psi_inv)).normalize())
        return new_msgs, sig
