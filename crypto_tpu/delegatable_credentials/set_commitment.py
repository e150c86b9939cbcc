"""Set commitments with subset openings (reference
`delegatable_credentials/src/set_commitment.rs`, the KZG-style scheme
underlying Protego/MSBM delegatable credentials).

SRS: powers of a trapdoor s in both groups: (P1*s^i), (P2*s^i), i <= n.
Commitment to set A (with randomness rho):
    C = P1 * (rho * f_A(s))   where f_A(X) = prod_{a in A} (X - a)
Subset opening for DSUBSET A:
    W = P1 * (rho * f_{A\\D}(s))
    verify: e(W, P2*f_D(s)) == e(C, P2)
f(s)*P1 is computed from the SRS via the coefficients of f (one MSM) —
the trapdoor never leaves setup.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..hashing import blake2b512, field_elem_from_try_and_incr
from ..utils.ff import poly_from_roots
from ..utils.msm import msm

F = bls.Fr


class SetCommitmentError(Exception):
    pass


@dataclass
class SetCommitmentSRS:
    P1_powers: list  # [P1 * s^i]
    P2_powers: list  # [P2 * s^i]

    @classmethod
    def generate(cls, rng, max_size: int):
        s = F.rand_nonzero(rng)
        return cls.generate_with_trapdoor(s, max_size)

    @classmethod
    def generate_with_trapdoor_seed(cls, seed: bytes, max_size: int):
        """Deterministic trapdoor from seed (reference
        `generate_with_trapdooor_seed`) — for tests/fixtures only."""
        return cls.generate_with_trapdoor(
            field_elem_from_try_and_incr(F, seed), max_size)

    @classmethod
    def generate_with_trapdoor(cls, s: Fp, max_size: int):
        g1, g2 = bls.G1.generator(), bls.G2.generator()
        p1, p2 = [], []
        acc = F(1)
        for _ in range(max_size + 1):
            p1.append((g1 * int(acc)).normalize())
            p2.append((g2 * int(acc)).normalize())
            acc = acc * s
        return cls(P1_powers=p1, P2_powers=p2)

    @property
    def max_size(self):
        return len(self.P1_powers) - 1

    def eval_in_g1(self, coeffs, scale: Fp = None) -> Point:
        if len(coeffs) > len(self.P1_powers):
            raise SetCommitmentError("polynomial exceeds SRS size")
        sc = coeffs if scale is None else [c * scale for c in coeffs]
        return msm(self.P1_powers[:len(coeffs)], sc).normalize()

    def eval_in_g2(self, coeffs) -> Point:
        if len(coeffs) > len(self.P2_powers):
            raise SetCommitmentError("polynomial exceeds SRS size")
        return msm(self.P2_powers[:len(coeffs)], coeffs).normalize()


@dataclass
class SetCommitment:
    C: Point

    @classmethod
    def new(cls, rng, members: set, srs: SetCommitmentSRS):
        rho = F.rand_nonzero(rng)
        return cls.new_with_randomness(members, rho, srs), rho

    @classmethod
    def new_with_randomness(cls, members: set, rho: Fp,
                            srs: SetCommitmentSRS):
        coeffs = poly_from_roots([F(int(m)) for m in members])
        return cls(C=srs.eval_in_g1(coeffs, rho))

    def randomize(self, factor: Fp) -> "SetCommitment":
        return SetCommitment(C=(self.C * int(factor)).normalize())


@dataclass
class SubsetWitness:
    W: Point

    @classmethod
    def new(cls, members: set, subset: set, rho: Fp,
            srs: SetCommitmentSRS) -> "SubsetWitness":
        if not subset <= members:
            raise SetCommitmentError("not a subset")
        rest = members - subset
        coeffs = poly_from_roots([F(int(m)) for m in rest]) if rest else [F(1)]
        return cls(W=srs.eval_in_g1(coeffs, rho))

    def verify(self, subset: set, commitment: SetCommitment,
               srs: SetCommitmentSRS) -> bool:
        if not subset:
            return self.W == commitment.C
        coeffs = poly_from_roots([F(int(m)) for m in subset])
        f_d_g2 = srs.eval_in_g2(coeffs)
        return bls.multi_pairing([
            (self.W, f_d_g2),
            ((-commitment.C).normalize(), srs.P2_powers[0])]).is_one()

    def randomize(self, factor: Fp) -> "SubsetWitness":
        return SubsetWitness(W=(self.W * int(factor)).normalize())


@dataclass
class AggregateSubsetWitness:
    """Hash-weighted aggregation of subset witnesses (reference
    `set_commitment.rs:432-600`): W = sum t_i * W_i with t_i derived from
    the (commitments, subsets) transcript; one pairing equation checks all
    subset openings at once:
      e(W, P2(union)) == prod e(C_i, P2(union \\ s_i))^{t_i}."""
    W: Point

    @staticmethod
    def _challenges(commitments, subsets, digest=blake2b512):
        from ..serialize import serialize_point
        buf = bytearray()
        for c in commitments:
            buf += serialize_point(c.C)
        for s in subsets:
            for m in sorted(int(x) for x in s):
                buf += m.to_bytes(32, "little")
        return [field_elem_from_try_and_incr(
            F, bytes(buf) + i.to_bytes(4, "little"))
            for i in range(len(commitments))]

    @classmethod
    def new(cls, commitments: list, subsets: list, witnesses: list,
            digest=blake2b512):
        t = cls._challenges(commitments, subsets, digest)
        W = bls.G1.infinity()
        for w, ti in zip(witnesses, t):
            W = W + w.W * int(ti)
        return cls(W=W.normalize())

    def randomize(self, r: Fp) -> "AggregateSubsetWitness":
        return AggregateSubsetWitness(W=(self.W * int(r)).normalize())

    def verify(self, commitments: list, subsets: list,
               srs: SetCommitmentSRS, digest=blake2b512) -> bool:
        if len(commitments) != len(subsets):
            return False
        t = self._challenges(commitments, subsets, digest)
        union = set()
        for s in subsets:
            union |= set(s)
        if len(union) > srs.max_size:
            return False
        union_poly = poly_from_roots([F(int(m)) for m in union]) \
            if union else [F(1)]
        union_eval = srs.eval_in_g2(union_poly)
        pairs = []
        for c, s, ti in zip(commitments, subsets, t):
            diff = union - set(s)
            coeffs = poly_from_roots([F(int(m)) for m in diff]) \
                if diff else [F(1)]
            p2 = (srs.eval_in_g2(coeffs) * int(ti)).normalize()
            pairs.append((c.C, p2))
        pairs.append(((-self.W).normalize(), union_eval))
        return bls.multi_pairing(pairs).is_one()
