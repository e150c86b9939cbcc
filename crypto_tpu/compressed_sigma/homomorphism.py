"""Compressed sigma protocol for group homomorphisms (reference
`compressed_sigma/src/compressed_homomorphism.rs`, eprint 2020/152 §4):
prove knowledge of x with P = <g, x> and y = f(x) for a homomorphism
f: F^n -> G (here the MSM homomorphism f(x) = <h, x>), with an O(log n)
proof via the split-and-fold recursion applied simultaneously to the
commitment bases g and the homomorphism f.

Also the amortized variant (`amortized_homomorphism.rs`): many openings
x_1..x_s of commitments P_1..P_s with a claimed y_i = f(x_i) each collapse
into ONE compressed proof over z = r + sum c^i x_i."""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..hashing import blake2b512, field_elem_from_try_and_incr
from ..serialize import serialize_point
from ..utils.ff import powers
from ..utils.msm import msm


class CompSigmaError(Exception):
    pass

F = bls.Fr


@dataclass
class MSMHomomorphism:
    """f(x) = <bases, x>; split/scale/add mirror the reference's
    Homomorphism trait for the canonical MSM instance."""
    bases: list

    def size(self):
        return len(self.bases)

    def eval(self, x) -> Point:
        return msm(self.bases[:len(x)], x).normalize()

    def split_in_half(self):
        h = len(self.bases) // 2
        return (MSMHomomorphism(self.bases[:h]),
                MSMHomomorphism(self.bases[h:]))

    def scale(self, c: Fp):
        return MSMHomomorphism(
            [(b * int(c)).normalize() for b in self.bases])

    def add(self, other):
        return MSMHomomorphism(
            [(a + b).normalize() for a, b in zip(self.bases, other.bases)])


@dataclass
class HomRandomCommitment:
    r: list
    A_hat: Point
    t: Point

    @classmethod
    def new(cls, rng, g: list, f: MSMHomomorphism):
        if len(g) & (len(g) - 1):
            raise CompSigmaError("base count must be a power of two")
        r = [F.rand(rng) for _ in range(len(g))]
        return cls(r=r, A_hat=msm(g, r).normalize(), t=f.eval(r))

    def response(self, g: list, f: MSMHomomorphism, x: list,
                 challenge: Fp) -> "HomResponse":
        z = [xi * challenge + ri for xi, ri in zip(x, self.r)]
        return compressed_response(z, list(g), f)


def compressed_response(z, g, f: MSMHomomorphism,
                        digest=blake2b512) -> "HomResponse":
    byts = bytearray()
    As, Bs, a_s, b_s = [], [], [], []
    while len(z) > 2:
        m = len(g) // 2
        g_l, g_r = g[:m], g[m:]
        z_l, z_r = z[:m], z[m:]
        f_l, f_r = f.split_in_half()
        A = msm(g_r, z_l).normalize()
        B = msm(g_l, z_r).normalize()
        a = f_r.eval(z_l)
        b = f_l.eval(z_r)
        byts += serialize_point(A) + serialize_point(B)
        byts += serialize_point(a) + serialize_point(b)
        c = field_elem_from_try_and_incr(F, bytes(byts), digest)
        g = [(l * int(c) + r).normalize() for l, r in zip(g_l, g_r)]
        f = f_l.scale(c).add(f_r)
        z = [l + r * c for l, r in zip(z_l, z_r)]
        As.append(A)
        Bs.append(B)
        a_s.append(a)
        b_s.append(b)
    return HomResponse(z_prime=list(z), A=As, B=Bs, a=a_s, b=b_s)


@dataclass
class HomResponse:
    z_prime: list
    A: list
    B: list
    a: list
    b: list

    def is_valid(self, g: list, P: Point, y: Point, f: MSMHomomorphism,
                 A_hat: Point, t: Point, challenge: Fp,
                 digest=blake2b512) -> bool:
        Q = (P * int(challenge) + A_hat).normalize()
        Y = (y * int(challenge) + t).normalize()
        byts = bytearray()
        g = list(g)
        for A, B, a, b in zip(self.A, self.B, self.a, self.b):
            byts += serialize_point(A) + serialize_point(B)
            byts += serialize_point(a) + serialize_point(b)
            c = field_elem_from_try_and_incr(F, bytes(byts), digest)
            m = len(g) // 2
            g = [(l * int(c) + r).normalize()
                 for l, r in zip(g[:m], g[m:])]
            f_l, f_r = f.split_in_half()
            f = f_l.scale(c).add(f_r)
            c_sq = int(c * c)
            Q = (A + Q * int(c) + B * c_sq).normalize()
            Y = (a + Y * int(c) + b * c_sq).normalize()
        if len(g) != 2 or f.size() != 2 or len(self.z_prime) != 2:
            return False
        if msm(g, self.z_prime).normalize() != Q:
            return False
        return f.eval(self.z_prime) == Y


# ---------------------------------------------------------------------------
# amortization over many openings (`amortized_homomorphism.rs`)
# ---------------------------------------------------------------------------

@dataclass
class AmortizedHomProof:
    A_hat: Point
    t: Point
    response: HomResponse

    @classmethod
    def new(cls, rng, xs: list, g: list, f: MSMHomomorphism,
            challenge_seed: bytes, digest=blake2b512):
        """xs: list of witness vectors; returns proof + per-instance
        (P_i, y_i) the verifier computes itself."""
        rc = HomRandomCommitment.new(rng, g, f)
        c0 = field_elem_from_try_and_incr(
            F, challenge_seed + serialize_point(rc.A_hat)
            + serialize_point(rc.t), digest)
        cs = powers(c0, len(xs) + 1)[1:]
        n = len(g)
        z = list(rc.r)
        for x, c in zip(xs, cs):
            for i in range(n):
                z[i] = z[i] + x[i] * c
        return cls(A_hat=rc.A_hat, t=rc.t,
                   response=compressed_response(z, list(g), f))

    def verify(self, Ps: list, ys: list, g: list, f: MSMHomomorphism,
               challenge_seed: bytes, digest=blake2b512) -> bool:
        c0 = field_elem_from_try_and_incr(
            F, challenge_seed + serialize_point(self.A_hat)
            + serialize_point(self.t), digest)
        cs = powers(c0, len(Ps) + 1)[1:]
        Q = self.A_hat
        Y = self.t
        for P, y, c in zip(Ps, ys, cs):
            Q = (Q + P * int(c)).normalize()
            Y = (Y + y * int(c)).normalize()
        # reuse the compressed check with challenge folded to identity:
        # Q/Y already include the amortization, so pass challenge=0 shape
        byts = bytearray()
        gv = list(g)
        fv = f
        for A, B, a, b in zip(self.response.A, self.response.B,
                              self.response.a, self.response.b):
            byts += serialize_point(A) + serialize_point(B)
            byts += serialize_point(a) + serialize_point(b)
            c = field_elem_from_try_and_incr(F, bytes(byts), digest)
            m = len(gv) // 2
            gv = [(l * int(c) + r).normalize()
                  for l, r in zip(gv[:m], gv[m:])]
            f_l, f_r = fv.split_in_half()
            fv = f_l.scale(c).add(f_r)
            c_sq = int(c * c)
            Q = (A + Q * int(c) + B * c_sq).normalize()
            Y = (a + Y * int(c) + b * c_sq).normalize()
        if len(gv) != 2 or len(self.response.z_prime) != 2:
            return False
        if msm(gv, self.response.z_prime).normalize() != Q:
            return False
        return fv.eval(self.response.z_prime) == Y
