"""Proof of knowledge of an ECDSA signature verifiable under a public key
that is only COMMITTED (coordinate-wise on Tom-256), never revealed
(reference `equality_across_groups/src/pok_ecdsa_pubkey.rs`).

An ECDSA signature (r, s) on message hash t under key Q satisfies
R = (t/s)G + (r/s)Q with r = R.x.  Transformed with z = s/r:
    z*R - (t/r)*G = Q.
The proof commits z (in the secp256r1 group) and the point -z*R
(coordinate-wise on Tom-256), then proves:
  - scalar mult:  committed -z*R equals committed z times public -R
  - point add:    (-z*R) + Q = -(t/r)*G, where the right side is public
                  (its commitment randomness is revealed in the proof)
linking to the same Q commitment used elsewhere (e.g. a BBS# credential).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves.extra_curves import secp256r1, tom256
from ..curves.sw import Point
from ..fields.host import Fp
from ..serialize import ByteWriter
from ..utils.commitment import PedersenCommitmentKey
from .commitments import (CommitmentWithOpening, EqAcrossGroupsError,
                          PointCommitment, PointCommitmentWithOpening)
from .point_addition import PointAdditionProof, PointAdditionProtocol
from .scalar_mult import (ScalarMultiplicationProof,
                          ScalarMultiplicationProtocol)

Fs = secp256r1.scalar_field    # secp256r1 Fr
Ft = tom256.scalar_field       # Tom-256 Fr == secp256r1 Fq


@dataclass
class TransformedEcdsaSig:
    """(R, z) with z = s * r^{-1} (`pok_ecdsa_pubkey.rs:50-90`)."""
    R: Point
    z: Fp

    @classmethod
    def new(cls, sig, hashed_message: Fp, public_key: Point
            ) -> "TransformedEcdsaSig":
        """sig: (r, s) ints from `extra_curves.ecdsa_sign`."""
        r, s = sig
        s_inv = Fs(s).inverse()
        u1 = hashed_message * s_inv
        u2 = Fs(r) * s_inv
        R = (secp256r1.generator() * int(u1)
             + public_key * int(u2)).normalize()
        return cls(R=R, z=Fs(s) * Fs(r).inverse())

    @staticmethod
    def r_inv(R: Point) -> Fp:
        rx, _ = R.to_affine()
        v = Fs(int(rx))
        if v.is_zero():
            raise EqAcrossGroupsError("R.x not invertible")
        return v.inverse()

    def verify_prehashed(self, hashed_message: Fp,
                         public_key: Point) -> bool:
        t_r_inv = hashed_message * self.r_inv(self.R)
        lhs = (self.R * int(self.z)
               - secp256r1.generator() * int(t_r_inv)).normalize()
        return lhs == public_key.normalize()


def _minus_g_t_r_inv(hashed_message: Fp, R: Point) -> Point:
    return (-(secp256r1.generator()
              * int(hashed_message * TransformedEcdsaSig.r_inv(R)))
            ).normalize()


@dataclass
class PoKEcdsaSigCommittedPublicKeyProtocol:
    R: Point
    comm_z: Point
    comm_minus_zR: PointCommitment
    comm_minus_g_t_r_inv_rand: tuple
    protocol_minus_zR: ScalarMultiplicationProtocol
    protocol_add: PointAdditionProtocol

    @classmethod
    def init(cls, rng, sig: TransformedEcdsaSig, hashed_message: Fp,
             public_key: Point,
             comm_public_key: PointCommitmentWithOpening,
             ck_secp: PedersenCommitmentKey, ck_tom: PedersenCommitmentKey,
             num_reps: int = 128):
        minus_R = (-sig.R).normalize()
        minus_zR = (minus_R * int(sig.z)).normalize()
        mgtr = _minus_g_t_r_inv(hashed_message, sig.R)
        comm_z = CommitmentWithOpening.new(rng, sig.z, ck_secp)
        comm_minus_zR = PointCommitmentWithOpening.new(rng, minus_zR, ck_tom)
        comm_mgtr = PointCommitmentWithOpening.new(rng, mgtr, ck_tom)
        protocol_minus_zR = ScalarMultiplicationProtocol.init(
            rng, comm_z, comm_minus_zR, minus_zR, minus_R, ck_secp, ck_tom,
            num_reps=num_reps)
        protocol_add = PointAdditionProtocol.init(
            rng, comm_minus_zR, comm_public_key, comm_mgtr,
            minus_zR, public_key, mgtr, ck_tom)
        return cls(R=sig.R, comm_z=comm_z.comm, comm_minus_zR=comm_minus_zR.comm,
                   comm_minus_g_t_r_inv_rand=(comm_mgtr.r_x, comm_mgtr.r_y),
                   protocol_minus_zR=protocol_minus_zR,
                   protocol_add=protocol_add)

    def challenge_contribution(self, writer: ByteWriter):
        writer.point(self.R)
        writer.point(self.comm_z)
        writer.point(self.comm_minus_zR.x)
        writer.point(self.comm_minus_zR.y)
        writer.field(self.comm_minus_g_t_r_inv_rand[0])
        writer.field(self.comm_minus_g_t_r_inv_rand[1])
        self.protocol_minus_zR.challenge_contribution(writer)
        self.protocol_add.challenge_contribution(writer)

    def gen_proof(self, challenge: Fp) -> "PoKEcdsaSigCommittedPublicKey":
        challenge_bytes = challenge.to_bytes_le()
        return PoKEcdsaSigCommittedPublicKey(
            R=self.R, comm_z=self.comm_z, comm_minus_zR=self.comm_minus_zR,
            comm_minus_g_t_r_inv_rand=self.comm_minus_g_t_r_inv_rand,
            proof_minus_zR=self.protocol_minus_zR.gen_proof(challenge_bytes),
            proof_add=self.protocol_add.gen_proof(challenge))


@dataclass
class PoKEcdsaSigCommittedPublicKey:
    R: Point
    comm_z: Point
    comm_minus_zR: PointCommitment
    comm_minus_g_t_r_inv_rand: tuple
    proof_minus_zR: ScalarMultiplicationProof
    proof_add: PointAdditionProof

    def challenge_contribution(self, writer: ByteWriter):
        writer.point(self.R)
        writer.point(self.comm_z)
        writer.point(self.comm_minus_zR.x)
        writer.point(self.comm_minus_zR.y)
        writer.field(self.comm_minus_g_t_r_inv_rand[0])
        writer.field(self.comm_minus_g_t_r_inv_rand[1])
        self.proof_minus_zR.challenge_contribution(writer)
        self.proof_add.challenge_contribution(writer)

    def verify(self, hashed_message: Fp, comm_public_key: PointCommitment,
               challenge: Fp, ck_secp: PedersenCommitmentKey,
               ck_tom: PedersenCommitmentKey) -> bool:
        minus_R = (-self.R).normalize()
        mgtr = _minus_g_t_r_inv(hashed_message, self.R)
        comm_mgtr = PointCommitmentWithOpening.new_given_randomness(
            mgtr, self.comm_minus_g_t_r_inv_rand[0],
            self.comm_minus_g_t_r_inv_rand[1], ck_tom)
        challenge_bytes = challenge.to_bytes_le()
        if not self.proof_minus_zR.verify(
                self.comm_z, self.comm_minus_zR, minus_R, challenge_bytes,
                ck_secp, ck_tom):
            return False
        return self.proof_add.verify(
            self.comm_minus_zR, comm_public_key, comm_mgtr.comm,
            challenge, ck_tom)
