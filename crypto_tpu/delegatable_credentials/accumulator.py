"""Trapdoor-managed accumulator for Protego revocation (reference
`delegatable_credentials/src/accumulator.rs`).

The accumulator manager knows the set-commitment SRS trapdoor s, so
V = P1 * (f(s)/sk) for the characteristic polynomial f of the member set;
adds/removes are scalar multiplications by (s - y).  Non-membership
witness for y: split f(X) = q(X)(X - y) + d with d = f(y) != 0 and publish
(C = P2*q(s), d); verification is
  e(P1*(s-y), C) * e(P1*d, P2) == e(V, pk)."""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..utils.ff import poly_eval, poly_from_roots
from .set_commitment import SetCommitmentError, SetCommitmentSRS

F = bls.Fr


@dataclass
class AccumSecretKey:
    sk: Fp

    @classmethod
    def generate(cls, rng):
        return cls(sk=F.rand_nonzero(rng))


@dataclass
class AccumPublicKey:
    pk: Point   # P2 * sk

    @classmethod
    def generate(cls, sk: AccumSecretKey, P2: Point):
        return cls(pk=(P2 * int(sk.sk)).normalize())


def _poly_div_linear(coeffs, root: Fp):
    """f(X) / (X - root) -> (quotient coeffs, remainder f(root))."""
    n = len(coeffs)
    if n == 1:
        return [F(0)], coeffs[0]
    q = [F(0)] * (n - 1)
    q[n - 2] = coeffs[n - 1]
    for i in range(n - 2, 0, -1):
        q[i - 1] = coeffs[i] + root * q[i]
    rem = coeffs[0] + root * q[0]
    return q, rem


@dataclass
class DelegatableAccumulator:
    V: Point
    aux: Fp            # f(s)/sk
    eval: Fp           # f(s)
    members: list

    @classmethod
    def new(cls, members: list, trapdoor: Fp, sk: AccumSecretKey,
            P1: Point):
        coeffs = poly_from_roots([F(int(m)) for m in members])
        ev = poly_eval(coeffs, trapdoor)
        aux = sk.sk.inverse() * ev
        return cls(V=(P1 * int(aux)).normalize(), aux=aux, eval=ev,
                   members=list(members))

    def add(self, additions: list, trapdoor: Fp):
        ev = F(1)
        for a in additions:
            ev = ev * (trapdoor - a)
        self.V = (self.V * int(ev)).normalize()
        self.aux = self.aux * ev
        self.eval = self.eval * ev
        self.members += list(additions)

    def remove(self, removals: list, trapdoor: Fp):
        ev = F(1)
        for a in removals:
            ev = ev * (trapdoor - a)
        inv = ev.inverse()
        self.V = (self.V * int(inv)).normalize()
        self.aux = self.aux * inv
        self.eval = self.eval * inv
        self.members = [m for m in self.members if m not in set(removals)]


@dataclass
class NonMembershipWitness:
    C: Point            # P2 * q(s)
    d: Fp               # f(non_member)

    @classmethod
    def new(cls, non_member: Fp, members: list, trapdoor: Fp, P2: Point):
        coeffs = poly_from_roots([F(int(m)) for m in members])
        q, d = _poly_div_linear(coeffs, non_member)
        if d.is_zero():
            raise SetCommitmentError("already a member")
        return cls(C=(P2 * int(poly_eval(q, trapdoor))).normalize(), d=d)

    def verify(self, non_member: Fp, accumulated: Point,
               pk: AccumPublicKey, P1_s: Point, P1: Point,
               P2: Point) -> bool:
        e1 = (P1_s - P1 * int(non_member)).normalize()
        P1_d = (P1 * int(self.d)).normalize()
        return bls.multi_pairing([
            (e1, self.C),
            (P1_d, P2),
            ((-accumulated).normalize(), pk.pk)]).is_one()

    def randomize(self, tau: Fp, r: Fp, P1: Point
                  ) -> "RandomizedNonMembershipWitness":
        """(C*tau, P1*(d*r)) as used in the Protego revocation show."""
        return RandomizedNonMembershipWitness(
            C=(self.C * int(tau)).normalize(),
            D=(P1 * int(self.d * r)).normalize())


@dataclass
class RandomizedNonMembershipWitness:
    C: Point
    D: Point

    def verify(self, randomized_accumulated: Point,
               randomized_factor: Point, pk: AccumPublicKey,
               P2: Point) -> bool:
        return bls.multi_pairing([
            (randomized_factor, self.C),
            (self.D, P2),
            ((-randomized_accumulated).normalize(), pk.pk)]).is_one()
