"""Distributed discrete-log check (reference
`secret_sharing_and_dkg/src/distributed_dlog_check/{semi_honest,
maliciously_secure}.rs`): a threshold of parties jointly check B = A*k
without any single party holding k.

Semi-honest: parties hold scalar Shamir shares k_i; each publishes
R_i = A*k_i (optionally with a dual-Schnorr proof against a published
commitment J*k_i); Lagrange-combining gives A*k.

Maliciously secure: the dealer hands out GROUP-element shares P*k_i
(shares of P*k), so no threshold can reconstruct the scalar k.  Share
validity uses pairings against Feldman-style coefficient commitments in
the OTHER group: e(g, s_i) == e(sum_j C_j * i^j, P).  Computation shares
are R_i = e(A, P*k_i) in GT, combined by Lagrange exponents and compared
with e(B, P).  Correctness proofs are Schnorr with a GROUP-element
witness: t = e(base, blinding_point), response = blinding + share*c."""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..hashing import blake2b512, compute_random_oracle_challenge
from ..serialize import serialize_point
from ..utils.ff import powers
from ..utils.msm import msm
from .common import (SSError, Share, lagrange_basis_at_0_for_all)
from .schemes import shamir_deal_secret

F = bls.Fr


# ---------------------------------------------------------------------------
# semi-honest
# ---------------------------------------------------------------------------

@dataclass
class ShareCommitment:
    id: int
    commitment: Point

    @classmethod
    def new(cls, share: Share, ck: Point):
        return cls(id=share.id, commitment=(ck * int(share.share)).normalize())


@dataclass
class ComputationShare:
    id: int
    threshold: int
    share: Point

    @classmethod
    def new(cls, share: Share, base: Point) -> "ComputationShare":
        return cls(id=share.id, threshold=share.threshold,
                   share=(base * int(share.share)).normalize())

    @classmethod
    def new_with_proof(cls, rng, share: Share,
                       share_commitment: ShareCommitment,
                       share_comm_ck: Point, base: Point,
                       digest=blake2b512):
        from ..schnorr.discrete_log import PokDiscreteLogProtocol
        from ..serialize import ByteWriter
        cs = cls.new(share, base)
        blinding = share.share.f.rand(rng)
        sc_share = PokDiscreteLogProtocol.init(share.share, blinding, base)
        sc_comm = PokDiscreteLogProtocol.init(share.share, blinding,
                                              share_comm_ck)
        w = ByteWriter()
        sc_share.challenge_contribution(base, cs.share, w)
        sc_comm.challenge_contribution(share_comm_ck,
                                       share_commitment.commitment, w)
        c = compute_random_oracle_challenge(share.share.f, bytes(w.buf),
                                            digest)
        return cs, ComputationShareProof(
            id=cs.id, sc_share=sc_share.gen_proof(c),
            sc_comm=sc_comm.gen_proof(c))

    @staticmethod
    def combine(shares: list) -> Point:
        threshold = shares[0].threshold
        if threshold > len(shares):
            raise SSError("below threshold")
        sub = shares[:threshold]
        basis = lagrange_basis_at_0_for_all([s.id for s in sub])
        return msm([s.share for s in sub], basis).normalize()


@dataclass
class ComputationShareProof:
    id: int
    sc_share: object
    sc_comm: object

    def verify(self, share: ComputationShare,
               share_commitment: ShareCommitment, share_comm_ck: Point,
               base: Point, digest=blake2b512) -> bool:
        from ..serialize import ByteWriter
        if share_commitment.id != share.id or self.id != share.id:
            return False
        if self.sc_share.response != self.sc_comm.response:
            return False
        w = ByteWriter()
        self.sc_share.challenge_contribution(base, share.share, w)
        self.sc_comm.challenge_contribution(share_comm_ck,
                                            share_commitment.commitment, w)
        c = compute_random_oracle_challenge(self.sc_share.response.f,
                                            bytes(w.buf), digest)
        if not self.sc_share.verify(share.share, base, c):
            return False
        return self.sc_comm.verify(share_commitment.commitment,
                                   share_comm_ck, c)


# ---------------------------------------------------------------------------
# maliciously secure (pairing-based, group-element shares)
# ---------------------------------------------------------------------------

@dataclass
class SecretShareG2:
    """Share P*k_i in G2; coefficient commitments in G1."""
    id: int
    threshold: int
    share: Point
    share_base: Point = None   # P, set by the dealer

    def verify(self, commitment_coeffs: list, ck_poly: Point) -> bool:
        """e(ck_poly-combination, P)==e(g, s_i): fold into one multi-pairing
        e(sum C_j i^j, P) * e(-g, s_i) == 1 with g=ck_poly... the reference
        checks e(g, s_i) == e(sum_j C_j*i^j, P) where the C are in G1 and
        the share in G2 (`maliciously_secure.rs:115-134`)."""
        if self.threshold > len(commitment_coeffs):
            return False
        pows = powers(F(self.id), self.threshold)
        combined = msm(commitment_coeffs, pows).normalize()
        # e(combined, P) == e(ck_poly, share) with P implicit in share's
        # base: the dealer commits via C_j = ck_poly * a_j, share = P*f(i):
        # check e(ck_poly, s_i) == e(combined, P)
        return bls.multi_pairing([
            (combined, self.share_base),
            ((-ck_poly).normalize(), self.share),
        ]).is_one()


def deal_secret_in_g2(rng, secret: Fp, threshold: int, total: int,
                      ck_poly: Point, P: Point = None):
    """Deal P*f(i) shares in G2 with G1 coefficient commitments.
    Returns (shares, commitments, P)."""
    P = P or bls.G2.generator()
    shares, f = shamir_deal_secret(rng, secret, threshold, total)
    commitments = [(ck_poly * int(c)).normalize() for c in f]
    out = []
    for s in shares.shares:
        ss = SecretShareG2(id=s.id, threshold=threshold,
                           share=(P * int(s.share)).normalize())
        ss.share_base = P
        out.append(ss)
    return out, commitments, P


@dataclass
class ComputationShareGT:
    """R_i = e(A, P*k_i) in GT."""
    id: int
    threshold: int
    share: object          # Fq12

    @classmethod
    def new(cls, share: SecretShareG2, base: Point):
        return cls(id=share.id, threshold=share.threshold,
                   share=bls.pairing(base, share.share))

    @staticmethod
    def combine(shares: list):
        threshold = shares[0].threshold
        if threshold > len(shares):
            raise SSError("below threshold")
        sub = shares[:threshold]
        basis = lagrange_basis_at_0_for_all([s.id for s in sub])
        acc = None
        for s, b in zip(sub, basis):
            term = s.share ** int(b)
            acc = term if acc is None else acc * term
        return acc


@dataclass
class PokGroupElemDiscreteLog:
    """Schnorr with a group-element witness over a pairing: prove S in
    Y = e(base, S) for GT element Y (`maliciously_secure.rs` dlog proof)."""
    t: object              # GT
    response: Point        # G2

    @classmethod
    def prove(cls, witness: Point, blinding: Point, base: Point,
              challenge: Fp):
        return cls(t=bls.pairing(base, blinding),
                   response=(blinding + witness * int(challenge)).normalize())

    def verify(self, y, base: Point, challenge: Fp) -> bool:
        lhs = bls.pairing(base, self.response) * (y ** int(challenge)).inverse()
        return lhs == self.t


@dataclass
class ComputationShareProofGT:
    id: int
    sc_share: PokGroupElemDiscreteLog
    sc_comm: PokGroupElemDiscreteLog

    @classmethod
    def new(cls, rng, share: SecretShareG2, share_commitment,
            share_comm_ck: Point, base: Point, digest=blake2b512):
        """share_commitment: GT element e(J, P*k_i)."""
        cs = ComputationShareGT.new(share, base)
        blinding = (bls.G2.generator()
                    * int(F.rand(rng))).normalize()
        t_share = bls.pairing(base, blinding)
        t_comm = bls.pairing(share_comm_ck, blinding)
        c = _gt_challenge(t_share, t_comm, cs.share, share_commitment,
                          digest)
        resp = (blinding + share.share * int(c)).normalize()
        return cs, cls(
            id=share.id,
            sc_share=PokGroupElemDiscreteLog(t=t_share, response=resp),
            sc_comm=PokGroupElemDiscreteLog(t=t_comm, response=resp))

    def verify(self, share: ComputationShareGT, share_commitment,
               share_comm_ck: Point, base: Point,
               digest=blake2b512) -> bool:
        if self.id != share.id:
            return False
        if self.sc_share.response != self.sc_comm.response:
            return False
        c = _gt_challenge(self.sc_share.t, self.sc_comm.t, share.share,
                          share_commitment, digest)
        if not self.sc_share.verify(share.share, base, c):
            return False
        return self.sc_comm.verify(share_commitment, share_comm_ck, c)


def _gt_challenge(t_share, t_comm, y_share, y_comm, digest):
    buf = (t_share.to_bytes_le() + y_share.to_bytes_le()
           + t_comm.to_bytes_le() + y_comm.to_bytes_le())
    return compute_random_oracle_challenge(F, buf, digest)
