"""Proof that a committed point equals a committed scalar times a public
base (reference `equality_across_groups/src/ec/sw_scalar_mult.rs`, from
ZKAttest with the CDLS'23 fix: the response opens commitments rather than
revealing blinded points).

Cut-and-choose over `num_reps` repetitions (soundness 2^-num_reps): each
rep commits a fresh scalar alpha (in group P) and the points alpha*B and
alpha*B - omega*B (coordinate-wise in group C), plus a point-addition proof
that result + (alpha*B - result) = alpha*B.  Challenge bit 0 opens alpha
and its point; bit 1 opens alpha - omega and the offset point.  The
point-addition proof runs with the fixed challenge -1/+1 per the bit.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves.sw import Point
from ..fields.host import Fp
from ..serialize import ByteWriter
from ..utils.commitment import PedersenCommitmentKey
from .commitments import (CommitmentWithOpening, EqAcrossGroupsError,
                          PointCommitment, PointCommitmentWithOpening)
from .point_addition import PointAdditionProof, PointAdditionProtocol


@dataclass
class ScalarMultiplicationRep:
    comm_alpha: CommitmentWithOpening
    comm_alpha_point: PointCommitmentWithOpening
    comm_alpha_minus_omega_point: PointCommitmentWithOpening
    add: PointAdditionProtocol


@dataclass
class ScalarMultiplicationProtocol:
    omega: Fp
    omega_rand: Fp
    reps: list
    num_reps: int

    @classmethod
    def init(cls, rng, comm_scalar: CommitmentWithOpening,
             comm_result: PointCommitmentWithOpening, result: Point,
             base: Point, ck_p: PedersenCommitmentKey,
             ck_c: PedersenCommitmentKey, num_reps: int = 128):
        """ck_p commits scalars in group P; ck_c commits coordinates in C."""
        Fp_scalar = comm_scalar.value.f
        twice = comm_scalar.value + comm_scalar.value
        alphas = []
        while len(alphas) < num_reps:
            a = Fp_scalar.rand(rng)
            if a.is_zero() or a == comm_scalar.value or a == twice:
                continue
            alphas.append(a)
        minus_result = -result
        reps = []
        for a in alphas:
            alpha_point = (base * int(a)).normalize()
            alpha_minus_omega_point = (alpha_point + minus_result).normalize()
            comm_alpha = CommitmentWithOpening.new(rng, a, ck_p)
            comm_alpha_point = PointCommitmentWithOpening.new(
                rng, alpha_point, ck_c)
            comm_amo_point = PointCommitmentWithOpening.new(
                rng, alpha_minus_omega_point, ck_c)
            add = PointAdditionProtocol.init(
                rng, comm_result, comm_amo_point, comm_alpha_point,
                result, alpha_minus_omega_point, alpha_point, ck_c)
            reps.append(ScalarMultiplicationRep(
                comm_alpha=comm_alpha, comm_alpha_point=comm_alpha_point,
                comm_alpha_minus_omega_point=comm_amo_point, add=add))
        return cls(omega=comm_scalar.value, omega_rand=comm_scalar.randomness,
                   reps=reps, num_reps=num_reps)

    def challenge_contribution(self, writer: ByteWriter):
        for r in self.reps:
            writer.point(r.comm_alpha.comm)
            writer.point(r.comm_alpha_point.comm.x)
            writer.point(r.comm_alpha_point.comm.y)
            writer.point(r.comm_alpha_minus_omega_point.comm.x)
            writer.point(r.comm_alpha_minus_omega_point.comm.y)
            r.add.challenge_contribution(writer)

    def gen_proof(self, challenge: bytes) -> "ScalarMultiplicationProof":
        if len(challenge) * 8 < self.num_reps:
            raise EqAcrossGroupsError("challenge too short")
        Fc = self.reps[0].comm_alpha_point.x.f
        one, minus_one = Fc(1), -Fc(1)
        out = []
        for i, p in enumerate(self.reps):
            bit = (challenge[i // 8] >> (i % 8)) & 1
            if bit == 0:
                out.append(ScalarMultiplicationRepProof(
                    comm_alpha=p.comm_alpha.comm,
                    comm_alpha_point=p.comm_alpha_point.comm,
                    comm_alpha_minus_omega_point=(
                        p.comm_alpha_minus_omega_point.comm),
                    add=p.add.gen_proof(minus_one),
                    z1=p.comm_alpha.value, z2=p.comm_alpha.randomness,
                    z3=p.comm_alpha_point.r_x, z4=p.comm_alpha_point.r_y))
            else:
                out.append(ScalarMultiplicationRepProof(
                    comm_alpha=p.comm_alpha.comm,
                    comm_alpha_point=p.comm_alpha_point.comm,
                    comm_alpha_minus_omega_point=(
                        p.comm_alpha_minus_omega_point.comm),
                    add=p.add.gen_proof(one),
                    z1=p.comm_alpha.value - self.omega,
                    z2=p.comm_alpha.randomness - self.omega_rand,
                    z3=p.comm_alpha_minus_omega_point.r_x,
                    z4=p.comm_alpha_minus_omega_point.r_y))
        return ScalarMultiplicationProof(reps=out, num_reps=self.num_reps)


@dataclass
class ScalarMultiplicationRepProof:
    comm_alpha: Point
    comm_alpha_point: PointCommitment
    comm_alpha_minus_omega_point: PointCommitment
    add: PointAdditionProof
    z1: Fp
    z2: Fp
    z3: Fp
    z4: Fp


@dataclass
class ScalarMultiplicationProof:
    reps: list
    num_reps: int

    def challenge_contribution(self, writer: ByteWriter):
        for r in self.reps:
            writer.point(r.comm_alpha)
            writer.point(r.comm_alpha_point.x)
            writer.point(r.comm_alpha_point.y)
            writer.point(r.comm_alpha_minus_omega_point.x)
            writer.point(r.comm_alpha_minus_omega_point.y)
            r.add.challenge_contribution(writer)

    def verify(self, comm_scalar: Point, comm_result: PointCommitment,
               base: Point, challenge: bytes, ck_p: PedersenCommitmentKey,
               ck_c: PedersenCommitmentKey) -> bool:
        if len(self.reps) != self.num_reps:
            return False
        if len(challenge) * 8 < self.num_reps:
            return False
        Fc = ck_c.g.curve.scalar_field
        one, minus_one = Fc(1), -Fc(1)
        for i, p in enumerate(self.reps):
            bit = (challenge[i // 8] >> (i % 8)) & 1
            pt = (base * int(p.z1)).normalize()
            try:
                p_comm = PointCommitmentWithOpening.new_given_randomness(
                    pt, p.z3, p.z4, ck_c)
            except EqAcrossGroupsError:
                return False
            opened = ck_p.commit(p.z1, p.z2)
            if bit == 0:
                if p.comm_alpha != opened:
                    return False
                if p_comm.comm != p.comm_alpha_point:
                    return False
                if not p.add.verify(comm_result,
                                    p.comm_alpha_minus_omega_point,
                                    p.comm_alpha_point, minus_one, ck_c):
                    return False
            else:
                if (p.comm_alpha - comm_scalar).normalize() != opened:
                    return False
                if p_comm.comm != p.comm_alpha_minus_omega_point:
                    return False
                if not p.add.verify(comm_result,
                                    p.comm_alpha_minus_omega_point,
                                    p.comm_alpha_point, one, ck_c):
                    return False
        return True
