"""Amortized compressed-sigma variants (paper 2020/152 §3-3.4):

* `AmortizedLinearFormProof` — many witness vectors, ONE public linear form
  (reference `compressed_sigma/src/amortized_linear_form.rs`): one random
  commitment + one combined response proves every (P_i, y_i = L(x_i)).
* `AmortizedHomomorphismsProof` — ONE witness vector, many homomorphisms
  (reference `compressed_sigma/src/amortized_homomorphisms.rs`): the
  homomorphisms are folded with powers of a Fiat-Shamir challenge rho into
  a single f_rho, then the single-homomorphism argument runs on
  (P, sum rho^j y_j).

Completes the round-1 gap "amortized linear-form variants" (VERDICT.md
weak-crate list for compressed_sigma).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..hashing import blake2b512, field_elem_from_try_and_incr
from ..serialize import serialize_point, serialize_field
from ..utils.ff import powers
from ..utils.msm import msm
from .homomorphism import (MSMHomomorphism, HomRandomCommitment, HomResponse,
                           compressed_response, CompSigmaError)

F = bls.Fr


@dataclass
class AmortizedLinearFormProof:
    """Proves knowledge of x_1..x_s with P_i = <g, x_i> and L(x_i) = y_i
    (`amortized_linear_form.rs:19-141`): z = r + sum c^i x_i; checks
    <g, z> == A + sum c^i P_i and L(z) == t + sum c^i y_i."""
    A: Point
    t: Fp
    z: list

    @classmethod
    def new(cls, rng, xs: list, L: list, g: list,
            challenge_seed: bytes, digest=blake2b512):
        n = len(g)
        for x in xs:
            if len(x) != n:
                raise CompSigmaError("witness length mismatch")
        r = [F.rand(rng) for _ in range(n)]
        A = msm(g, r).normalize()
        t = sum((li * ri for li, ri in zip(L, r)), F(0))
        c0 = field_elem_from_try_and_incr(
            F, challenge_seed + serialize_point(A) + serialize_field(t),
            digest)
        cs = powers(c0, len(xs) + 1)[1:]
        z = list(r)
        for x, c in zip(xs, cs):
            for i in range(n):
                z[i] = z[i] + x[i] * c
        return cls(A=A, t=t, z=z)

    def verify(self, Ps: list, ys: list, L: list, g: list,
               challenge_seed: bytes, digest=blake2b512) -> bool:
        c0 = field_elem_from_try_and_incr(
            F, challenge_seed + serialize_point(self.A)
            + serialize_field(self.t), digest)
        cs = powers(c0, len(Ps) + 1)[1:]
        rhs = self.A
        y_rhs = self.t
        for P, y, c in zip(Ps, ys, cs):
            rhs = rhs + P * int(c)
            y_rhs = y_rhs + y * c
        if msm(g, self.z) != rhs:
            return False
        lz = sum((li * zi for li, zi in zip(L, self.z)), F(0))
        return lz == y_rhs


@dataclass
class AmortizedHomomorphismsProof:
    """Proves f_j(x) = y_j for homomorphisms f_1..f_m and ONE committed x
    (`amortized_homomorphisms.rs:24-180`): fold f_rho = sum rho^j f_j and
    prove the single-homomorphism relation on (P, y_rho)."""
    rho_seed: bytes
    A_hat: Point
    t: Point
    response: HomResponse

    @classmethod
    def fold(cls, fs: list, rho: Fp) -> MSMHomomorphism:
        rs = powers(rho, len(fs) + 1)[1:]
        acc = fs[0].scale(rs[0])
        for f_, c in zip(fs[1:], rs[1:]):
            acc = acc.add(f_.scale(c))
        return acc

    @classmethod
    def new(cls, rng, x: list, g: list, fs: list, ys: list,
            challenge_seed: bytes, digest=blake2b512):
        seed = challenge_seed + b"".join(serialize_point(y) for y in ys)
        rho = field_elem_from_try_and_incr(F, seed + b"rho", digest)
        f_rho = cls.fold(fs, rho)
        rc = HomRandomCommitment.new(rng, list(g), f_rho)
        c = field_elem_from_try_and_incr(
            F, seed + serialize_point(rc.A_hat) + serialize_point(rc.t),
            digest)
        z = [xi * c + ri for xi, ri in zip(x, rc.r)]
        return cls(rho_seed=b"rho", A_hat=rc.A_hat, t=rc.t,
                   response=compressed_response(z, list(g), f_rho))

    def verify(self, P: Point, g: list, fs: list, ys: list,
               challenge_seed: bytes, digest=blake2b512) -> bool:
        seed = challenge_seed + b"".join(serialize_point(y) for y in ys)
        rho = field_elem_from_try_and_incr(F, seed + b"rho", digest)
        f_rho = AmortizedHomomorphismsProof.fold(fs, rho)
        rs = powers(rho, len(ys) + 1)[1:]
        y_rho = bls.G1.infinity()
        for y, c in zip(ys, rs):
            y_rho = y_rho + y * int(c)
        c = field_elem_from_try_and_incr(
            F, seed + serialize_point(self.A_hat) + serialize_point(self.t),
            digest)
        return self.response.is_valid(list(g), P, y_rho.normalize(), f_rho,
                                      self.A_hat, self.t, c)
