"""Proof that committed points satisfy a + b = t on curve P, all three
committed coordinate-wise on curve C (reference
`equality_across_groups/src/ec/sw_point_addition.rs`, from the paper
"ZKAttest: Ring and Group Signatures for Existing ECDSA Keys").

The chord-addition law for distinct points:
    tau = (by - ay)/(bx - ax)
    tx  = tau^2 - ax - bx
    ty  = tau*(ax - tx) - ay
is proved with commitment arithmetic on C plus four sub-proofs:
  - tau:          product  (bx-ax) * tau = (by-ay)
  - tau_sqr:      square   tau^2 = ax + bx + tx     (committed as sum)
  - tau(ax - tx): product  tau * (ax-tx) = ay + ty
  - bx != ax:     inequality of committed value with public 0
  - ay opening:   PoK of (ay, r) in the y-commitment of a
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves.sw import Point
from ..fields.host import Fp
from ..schnorr.discrete_log import (PokPedersenCommitment,
                                    PokPedersenCommitmentProtocol)
from ..schnorr.inequality import (DiscreteLogInequalityProtocol,
                                  InequalityProof)
from ..schnorr.mult_relations import (ProductProof, ProductProtocol,
                                      SquareProof, SquareProtocol)
from ..serialize import ByteWriter
from ..utils.commitment import PedersenCommitmentKey
from .commitments import (CommitmentWithOpening, EqAcrossGroupsError,
                          PointCommitment, PointCommitmentWithOpening)


def ensure_addition_possible(a: Point, b: Point, t: Point):
    """The chord law needs distinct, non-infinity points with ax != bx
    (`sw_point_addition.rs:163-180`)."""
    if a.is_infinity() or b.is_infinity() or t.is_infinity():
        raise EqAcrossGroupsError("point at infinity")
    if a == b:
        raise EqAcrossGroupsError("cannot add equal points")
    if a.to_affine()[0] == b.to_affine()[0]:
        raise EqAcrossGroupsError("x coordinates equal")


@dataclass
class PointAdditionProtocol:
    comm_tau: CommitmentWithOpening
    tau: ProductProtocol
    tau_sqr: SquareProtocol
    tau_ax_minus_tx: ProductProtocol
    bx_minus_ax: DiscreteLogInequalityProtocol
    ay: PokPedersenCommitmentProtocol

    @classmethod
    def init(cls, rng, comm_a: PointCommitmentWithOpening,
             comm_b: PointCommitmentWithOpening,
             comm_t: PointCommitmentWithOpening,
             a: Point, b: Point, t: Point, ck: PedersenCommitmentKey):
        ensure_addition_possible(a, b, t)
        if (a + b).normalize() != t.normalize():
            raise EqAcrossGroupsError("a + b != t")
        F = ck.g.curve.scalar_field

        comm_b_minus_a = comm_b - comm_a
        comm_a_plus_t = comm_a + comm_t
        by_minus_ay = comm_b_minus_a.y
        bx_minus_ax = comm_b_minus_a.x
        tau = by_minus_ay * bx_minus_ax.inverse()
        tau_sqr = tau * tau

        comm_tau = CommitmentWithOpening.new(rng, tau, ck)
        tau_prot = ProductProtocol.init(
            rng, comm_b_minus_a.comm.x, bx_minus_ax, tau, by_minus_ay,
            comm_b_minus_a.r_x, comm_tau.randomness, comm_b_minus_a.r_y, ck)
        # tau^2 = ax + bx + tx; randomness of that sum commitment
        tau_sqr_prot = SquareProtocol.init(
            rng, comm_tau.comm, tau, tau_sqr, comm_tau.randomness,
            comm_a_plus_t.r_x + comm_b.r_x, ck)
        tau_ax_minus_tx = ProductProtocol.init(
            rng, comm_tau.comm, tau, comm_a.x - comm_t.x, comm_a_plus_t.y,
            comm_tau.randomness, comm_a.r_x - comm_t.r_x,
            comm_a_plus_t.r_y, ck)
        bx_minus_ax_prot = DiscreteLogInequalityProtocol.init_with_public_value(
            rng, comm_b_minus_a.x, comm_b_minus_a.r_x,
            comm_b_minus_a.comm.x, F(0), ck)
        ay = PokPedersenCommitmentProtocol.init(
            comm_a.y, F.rand(rng), ck.g, comm_a.r_y, F.rand(rng), ck.h)
        return cls(comm_tau=comm_tau, tau=tau_prot, tau_sqr=tau_sqr_prot,
                   tau_ax_minus_tx=tau_ax_minus_tx,
                   bx_minus_ax=bx_minus_ax_prot, ay=ay)

    def challenge_contribution(self, writer: ByteWriter):
        writer.point(self.comm_tau.comm)
        self.tau.challenge_contribution(writer)
        self.tau_sqr.challenge_contribution(writer)
        self.tau_ax_minus_tx.challenge_contribution(writer)
        writer.point(self.bx_minus_ax.b)
        writer.point(self.bx_minus_ax.sc_c.t)
        writer.point(self.bx_minus_ax.sc_b.t)
        writer.point(self.bx_minus_ax.sc_b_ped.t)
        writer.point(self.ay.t)

    def gen_proof(self, challenge: Fp) -> "PointAdditionProof":
        return PointAdditionProof(
            comm_tau=self.comm_tau.comm,
            tau=self.tau.gen_proof(challenge),
            tau_sqr=self.tau_sqr.gen_proof(challenge),
            tau_ax_minus_tx=self.tau_ax_minus_tx.gen_proof(challenge),
            bx_minus_ax=self.bx_minus_ax.gen_proof(challenge),
            ay=self.ay.gen_proof(challenge))


@dataclass
class PointAdditionProof:
    comm_tau: Point
    tau: ProductProof
    tau_sqr: SquareProof
    tau_ax_minus_tx: ProductProof
    bx_minus_ax: InequalityProof
    ay: PokPedersenCommitment

    def challenge_contribution(self, writer: ByteWriter):
        writer.point(self.comm_tau)
        self.tau.challenge_contribution(writer)
        self.tau_sqr.challenge_contribution(writer)
        self.tau_ax_minus_tx.challenge_contribution(writer)
        writer.point(self.bx_minus_ax.b)
        writer.point(self.bx_minus_ax.sc_c.t)
        writer.point(self.bx_minus_ax.sc_b.t)
        writer.point(self.bx_minus_ax.sc_b_ped.t)
        writer.point(self.ay.t)

    def verify(self, comm_a: PointCommitment, comm_b: PointCommitment,
               comm_t: PointCommitment, challenge: Fp,
               ck: PedersenCommitmentKey) -> bool:
        F = ck.g.curve.scalar_field
        comm_b_minus_a = comm_b - comm_a
        comm_a_plus_t = comm_a + comm_t
        if not self.tau.verify(comm_b_minus_a.x, self.comm_tau,
                               comm_b_minus_a.y, challenge, ck):
            return False
        if not self.tau_sqr.verify(
                self.comm_tau, (comm_a_plus_t.x + comm_b.x).normalize(),
                challenge, ck):
            return False
        if not self.tau_ax_minus_tx.verify(
                self.comm_tau, (comm_a.x - comm_t.x).normalize(),
                comm_a_plus_t.y, challenge, ck):
            return False
        if not self.bx_minus_ax.verify_with_public_value(
                comm_b_minus_a.x, F(0), challenge, ck):
            return False
        return self.ay.verify(comm_a.y, ck.g, ck.h, challenge)
