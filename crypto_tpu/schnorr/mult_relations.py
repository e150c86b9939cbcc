"""Schnorr proofs of multiplicative relations between Pedersen-committed
values (reference `schnorr_pok/src/mult_relations.rs`).

- ProductProof: given commitments A, B, C to a, b, c, proves c = a*b.
  The trick: C also opens as  a_commitment^b * h^(r_c - r_a*b), so the
  third leg runs Schnorr on bases (A, h) with witnesses (b, r_c - r_a*b),
  sharing b's response with the second leg.
- SquareProof: c = a^2 (product with shared base A and witness a).
- InverseProof: a * a_inv = 1, i.e. the commitment key's g opens under
  bases (A, h) with witnesses (a_inv, -r_a*a_inv).

All field-generic: witnesses carry their field, so these run over any
short-Weierstrass group (used over Tom-256 by `equality_across_groups`).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves.sw import Point
from ..fields.host import Fp
from ..serialize import ByteWriter
from ..utils.commitment import PedersenCommitmentKey


class MultRelationError(Exception):
    pass


@dataclass
class ProductProtocol:
    v_a: Fp
    v_b: Fp
    r_a: Fp
    r_b: Fp
    r_c: Fp
    j_a: Fp
    j_b: Fp
    k_a: Fp
    k_b: Fp
    k_c: Fp
    t_a: Point
    t_b: Point
    t_c: Point

    @classmethod
    def init(cls, rng, a: Point, v_a: Fp, v_b: Fp, v_c: Fp, r_a: Fp,
             r_b: Fp, r_c: Fp, ck: PedersenCommitmentKey):
        """`a` is the commitment to v_a (base for the third leg)."""
        if v_a * v_b != v_c:
            raise MultRelationError("not a product")
        F = v_a.f
        j_a, j_b = F.rand(rng), F.rand(rng)
        k_a, k_b, k_c = F.rand(rng), F.rand(rng), F.rand(rng)
        t_a = ck.commit(j_a, k_a)
        t_b = ck.commit(j_b, k_b)
        t_c = (a * int(j_b) + ck.h * int(k_c)).normalize()
        return cls(v_a=v_a, v_b=v_b, r_a=r_a, r_b=r_b, r_c=r_c, j_a=j_a,
                   j_b=j_b, k_a=k_a, k_b=k_b, k_c=k_c, t_a=t_a, t_b=t_b,
                   t_c=t_c)

    def challenge_contribution(self, writer: ByteWriter):
        writer.point(self.t_a)
        writer.point(self.t_b)
        writer.point(self.t_c)

    def gen_proof(self, challenge: Fp) -> "ProductProof":
        return ProductProof(
            t_a=self.t_a, t_b=self.t_b, t_c=self.t_c,
            s_a=self.j_a + self.v_a * challenge,
            s_b=self.j_b + self.v_b * challenge,
            s_r_a=self.k_a + self.r_a * challenge,
            s_r_b=self.k_b + self.r_b * challenge,
            s_r_c=self.k_c + (self.r_c - self.r_a * self.v_b) * challenge)


@dataclass
class ProductProof:
    t_a: Point
    t_b: Point
    t_c: Point
    s_a: Fp
    s_b: Fp
    s_r_a: Fp
    s_r_b: Fp
    s_r_c: Fp

    def challenge_contribution(self, writer: ByteWriter):
        writer.point(self.t_a)
        writer.point(self.t_b)
        writer.point(self.t_c)

    def verify(self, a: Point, b: Point, c: Point, challenge: Fp,
               ck: PedersenCommitmentKey) -> bool:
        e = int(challenge)
        if ck.commit(self.s_a, self.s_r_a) != (self.t_a + a * e).normalize():
            return False
        if ck.commit(self.s_b, self.s_r_b) != (self.t_b + b * e).normalize():
            return False
        lhs = (a * int(self.s_b) + ck.h * int(self.s_r_c)).normalize()
        return lhs == (self.t_c + c * e).normalize()

    def verify_using_randomized_mult_checker(self, a, b, c, challenge, ck,
                                             rmc):
        minus_c = -challenge
        rmc.add_3(ck.g, self.s_a, ck.h, self.s_r_a, a, minus_c, self.t_a)
        rmc.add_3(ck.g, self.s_b, ck.h, self.s_r_b, b, minus_c, self.t_b)
        rmc.add_3(a, self.s_b, ck.h, self.s_r_c, c, minus_c, self.t_c)


@dataclass
class SquareProtocol:
    v_a: Fp
    r_a: Fp
    r_a_sqr: Fp
    j_a: Fp
    k_a: Fp
    k_a_sqr: Fp
    t_a: Point
    t_a_sqr: Point

    @classmethod
    def init(cls, rng, a: Point, v_a: Fp, v_a_sqr: Fp, r_a: Fp,
             r_a_sqr: Fp, ck: PedersenCommitmentKey):
        if v_a * v_a != v_a_sqr:
            raise MultRelationError("not a square")
        F = v_a.f
        j_a, k_a, k_a_sqr = F.rand(rng), F.rand(rng), F.rand(rng)
        t_a = ck.commit(j_a, k_a)
        t_a_sqr = (a * int(j_a) + ck.h * int(k_a_sqr)).normalize()
        return cls(v_a=v_a, r_a=r_a, r_a_sqr=r_a_sqr, j_a=j_a, k_a=k_a,
                   k_a_sqr=k_a_sqr, t_a=t_a, t_a_sqr=t_a_sqr)

    def challenge_contribution(self, writer: ByteWriter):
        writer.point(self.t_a)
        writer.point(self.t_a_sqr)

    def gen_proof(self, challenge: Fp) -> "SquareProof":
        return SquareProof(
            t_a=self.t_a, t_a_sqr=self.t_a_sqr,
            s_a=self.j_a + self.v_a * challenge,
            s_r_a=self.k_a + self.r_a * challenge,
            s_r_a_sqr=self.k_a_sqr
            + (self.r_a_sqr - self.r_a * self.v_a) * challenge)


@dataclass
class SquareProof:
    t_a: Point
    t_a_sqr: Point
    s_a: Fp
    s_r_a: Fp
    s_r_a_sqr: Fp

    def challenge_contribution(self, writer: ByteWriter):
        writer.point(self.t_a)
        writer.point(self.t_a_sqr)

    def verify(self, a: Point, a_sqr: Point, challenge: Fp,
               ck: PedersenCommitmentKey) -> bool:
        e = int(challenge)
        if ck.commit(self.s_a, self.s_r_a) != (self.t_a + a * e).normalize():
            return False
        lhs = (a * int(self.s_a) + ck.h * int(self.s_r_a_sqr)).normalize()
        return lhs == (self.t_a_sqr + a_sqr * e).normalize()

    def verify_using_randomized_mult_checker(self, a, a_sqr, challenge, ck,
                                             rmc):
        minus_c = -challenge
        rmc.add_3(ck.g, self.s_a, ck.h, self.s_r_a, a, minus_c, self.t_a)
        rmc.add_3(a, self.s_a, ck.h, self.s_r_a_sqr, a_sqr, minus_c,
                  self.t_a_sqr)


@dataclass
class InverseProtocol:
    v_a: Fp
    v_a_inv: Fp
    r_a: Fp
    r_a_inv: Fp
    j_a: Fp
    j_a_inv: Fp
    k_a: Fp
    k_a_inv: Fp
    k_one: Fp
    t_a: Point
    t_a_inv: Point
    t_one: Point

    @classmethod
    def init(cls, rng, a: Point, v_a: Fp, v_a_inv: Fp, r_a: Fp,
             r_a_inv: Fp, ck: PedersenCommitmentKey):
        F = v_a.f
        if v_a * v_a_inv != F(1):
            raise MultRelationError("not an inverse")
        j_a, j_a_inv = F.rand(rng), F.rand(rng)
        k_a, k_a_inv, k_one = F.rand(rng), F.rand(rng), F.rand(rng)
        t_a = ck.commit(j_a, k_a)
        t_a_inv = ck.commit(j_a_inv, k_a_inv)
        t_one = (a * int(j_a_inv) + ck.h * int(k_one)).normalize()
        return cls(v_a=v_a, v_a_inv=v_a_inv, r_a=r_a, r_a_inv=r_a_inv,
                   j_a=j_a, j_a_inv=j_a_inv, k_a=k_a, k_a_inv=k_a_inv,
                   k_one=k_one, t_a=t_a, t_a_inv=t_a_inv, t_one=t_one)

    def challenge_contribution(self, writer: ByteWriter):
        writer.point(self.t_a)
        writer.point(self.t_a_inv)
        writer.point(self.t_one)

    def gen_proof(self, challenge: Fp) -> "InverseProof":
        return InverseProof(
            t_a=self.t_a, t_a_inv=self.t_a_inv, t_one=self.t_one,
            s_a=self.j_a + self.v_a * challenge,
            s_a_inv=self.j_a_inv + self.v_a_inv * challenge,
            s_r_a=self.k_a + self.r_a * challenge,
            s_r_a_inv=self.k_a_inv + self.r_a_inv * challenge,
            s_r_one=self.k_one - (self.r_a * self.v_a_inv) * challenge)


@dataclass
class InverseProof:
    t_a: Point
    t_a_inv: Point
    t_one: Point
    s_a: Fp
    s_a_inv: Fp
    s_r_a: Fp
    s_r_a_inv: Fp
    s_r_one: Fp

    def challenge_contribution(self, writer: ByteWriter):
        writer.point(self.t_a)
        writer.point(self.t_a_inv)
        writer.point(self.t_one)

    def verify(self, a: Point, a_inv: Point, challenge: Fp,
               ck: PedersenCommitmentKey) -> bool:
        e = int(challenge)
        if ck.commit(self.s_a, self.s_r_a) != (self.t_a + a * e).normalize():
            return False
        if ck.commit(self.s_a_inv, self.s_r_a_inv) != \
                (self.t_a_inv + a_inv * e).normalize():
            return False
        lhs = (a * int(self.s_a_inv) + ck.h * int(self.s_r_one)).normalize()
        return lhs == (self.t_one + ck.g * e).normalize()

    def verify_using_randomized_mult_checker(self, a, a_inv, challenge, ck,
                                             rmc):
        minus_c = -challenge
        rmc.add_3(ck.g, self.s_a, ck.h, self.s_r_a, a, minus_c, self.t_a)
        rmc.add_3(ck.g, self.s_a_inv, ck.h, self.s_r_a_inv, a_inv, minus_c,
                  self.t_a_inv)
        rmc.add_3(a, self.s_a_inv, ck.h, self.s_r_one, ck.g, minus_c,
                  self.t_one)
