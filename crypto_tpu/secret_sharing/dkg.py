"""Distributed key generation: FROST-style and Gennaro
(reference `secret_sharing_and_dkg/src/{frost_dkg,gennaro_dkg}.rs`).

Both are dealerless: every participant deals a VSS of a random secret and
the key share is the sum of received shares.

* FROST: Feldman VSS + a Schnorr proof of knowledge of the dealt secret
  bound to the participant id and a context string (stops rogue-key
  attacks); threshold public key = sum of the secret commitments.
* Gennaro: phase 1 uses PEDERSEN VSS (hiding commitments) so no information
  about the final key leaks before the qualified set is fixed; phase 2
  reveals Feldman commitments which are checked against the same shares.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..serialize import ByteWriter
from ..schnorr.discrete_log import PokDiscreteLog, PokDiscreteLogProtocol
from ..hashing import compute_random_oracle_challenge
from .common import SSError, Share, CommitmentToCoefficients
from .schemes import (feldman_deal_secret, feldman_verify_share,
                      pedersen_deal_secret, pedersen_verify_share,
                      PedersenVSSShare)

F = bls.Fr


# ---------------------------------------------------------------------------
# FROST
# ---------------------------------------------------------------------------

def _frost_pok_challenge(id: int, ctx: bytes, comm_secret: Point,
                         t: Point) -> Fp:
    w = ByteWriter()
    w.write(id.to_bytes(2, "little"))
    w.write(ctx)
    w.point(comm_secret)
    w.point(t)
    return compute_random_oracle_challenge(F, w.bytes())


@dataclass
class FrostDKGParticipant:
    id: int
    threshold: int
    total: int
    ctx: bytes
    g: Point
    secret: Fp = None
    shares: object = None
    comms: CommitmentToCoefficients = None
    pok: PokDiscreteLog = None
    received: dict = dc_field(default_factory=dict)
    received_comms: dict = dc_field(default_factory=dict)

    def start(self, rng):
        """Round 1 broadcast: (commitments, PoK of the dealt secret)."""
        self.secret = F.rand(rng)
        self.shares, self.comms = feldman_deal_secret(
            rng, self.secret, self.threshold, self.total, self.g)
        prot = PokDiscreteLogProtocol.init(self.secret, F.rand(rng), self.g)
        c = _frost_pok_challenge(self.id, self.ctx,
                                 self.comms.commitment_to_secret(), prot.t)
        self.pok = prot.gen_proof(c)
        self._accept(self.id, self.comms, self.pok)
        return self.comms, self.pok

    def _accept(self, dealer_id, comms, pok):
        c = _frost_pok_challenge(dealer_id, self.ctx,
                                 comms.commitment_to_secret(), pok.t)
        if not pok.verify(comms.commitment_to_secret(), self.g, c):
            raise SSError(f"invalid PoK from dealer {dealer_id}")
        self.received_comms[dealer_id] = comms

    def receive_round1(self, dealer_id: int, comms, pok):
        if dealer_id in self.received_comms:
            raise SSError("duplicate dealer")
        self._accept(dealer_id, comms, pok)

    def receive_share(self, dealer_id: int, share: Share):
        comms = self.received_comms.get(dealer_id)
        if comms is None:
            raise SSError("share before round 1")
        if share.id != self.id:
            raise SSError("misaddressed share")
        if not feldman_verify_share(share, comms, self.g):
            raise SSError(f"invalid share from dealer {dealer_id}")
        self.received[dealer_id] = share

    def finish(self):
        self.received[self.id] = self.shares.shares[self.id - 1]
        if len(self.received) != self.total:
            raise SSError("missing dealers")
        sk = F(0)
        for s in self.received.values():
            sk = sk + s.share
        tpk = None
        for comms in self.received_comms.values():
            c0 = comms.commitment_to_secret()
            tpk = c0 if tpk is None else tpk + c0
        # this participant's public key share: evaluate summed commitments
        return sk, tpk.normalize(), (self.g * int(sk)).normalize()


# ---------------------------------------------------------------------------
# Gennaro
# ---------------------------------------------------------------------------

@dataclass
class GennaroDKGParticipant:
    id: int
    threshold: int
    total: int
    g: Point
    h: Point
    secret: Fp = None
    ped_shares: list = None
    ped_comms: CommitmentToCoefficients = None
    feld_comms: CommitmentToCoefficients = None
    coeffs: list = None
    received: dict = dc_field(default_factory=dict)       # Pedersen shares
    received_ped: dict = dc_field(default_factory=dict)
    received_feld: dict = dc_field(default_factory=dict)

    def phase1(self, rng):
        """Broadcast hiding (Pedersen) commitments; send shares privately."""
        self.secret = F.rand(rng)
        from .schemes import shamir_deal_secret
        shares_obj, coeffs = shamir_deal_secret(
            rng, self.secret, self.threshold, self.total)
        blinding = F.rand(rng)
        _, bcoeffs = shamir_deal_secret(rng, blinding, self.threshold, self.total)
        from .common import poly_eval_int
        self.coeffs = coeffs
        self.ped_comms = CommitmentToCoefficients([
            (self.g * int(a) + self.h * int(b)).normalize()
            for a, b in zip(coeffs, bcoeffs)])
        self.ped_shares = [
            PedersenVSSShare(i, self.threshold, poly_eval_int(coeffs, i),
                             poly_eval_int(bcoeffs, i))
            for i in range(1, self.total + 1)]
        self.received_ped[self.id] = self.ped_comms
        self.received[self.id] = self.ped_shares[self.id - 1]
        return self.ped_comms

    def receive_phase1(self, dealer_id: int, comms, share: PedersenVSSShare):
        if share.id != self.id:
            raise SSError("misaddressed share")
        if not pedersen_verify_share(share, comms, self.g, self.h):
            raise SSError(f"invalid Pedersen share from {dealer_id}")
        self.received_ped[dealer_id] = comms
        self.received[dealer_id] = share

    def phase2(self):
        """After the qualified set is fixed: reveal Feldman commitments."""
        self.feld_comms = CommitmentToCoefficients([
            (self.g * int(a)).normalize() for a in self.coeffs])
        self.received_feld[self.id] = self.feld_comms
        return self.feld_comms

    def receive_phase2(self, dealer_id: int, feld_comms):
        share = self.received.get(dealer_id)
        if share is None:
            raise SSError("phase 2 from unqualified dealer")
        plain = Share(share.id, share.threshold, share.share)
        if not feldman_verify_share(plain, feld_comms, self.g):
            raise SSError(f"Feldman commitments inconsistent from {dealer_id}")
        self.received_feld[dealer_id] = feld_comms

    def finish(self):
        if len(self.received_feld) != self.total:
            raise SSError("missing phase-2 dealers")
        sk = F(0)
        for s in self.received.values():
            sk = sk + s.share
        tpk = None
        for comms in self.received_feld.values():
            c0 = comms.commitment_to_secret()
            tpk = c0 if tpk is None else tpk + c0
        return sk, tpk.normalize()
