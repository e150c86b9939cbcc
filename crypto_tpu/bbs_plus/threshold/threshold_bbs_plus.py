"""Threshold BBS+ signing (reference `bbs_plus/src/threshold/`, paper
2023/602 "Threshold BBS+ Signatures for Distributed Anonymous Credential
Issuance").

t-of-n signers hold Shamir shares x_i of the signing key.  Per signature:

Phase 1 (`randomness_generation_phase.rs` + `threshold_bbs_plus.rs:51-130`):
  * each signer picks r_i; cointoss yields joint e and s (everyone learns
    the sums); pairwise zero-sharing yields alpha_i, beta_i with
    sum alpha = sum beta = 0
  * masked signing-key share:  msk_i = alpha_i + lambda_i * x_i
    masked r share:            mr_i  = beta_i + r_i
    so  sum msk_i = x  and  sum mr_i = r := sum r_i.

Phase 2 (`multiplication_phase.rs` -> Gilboa over OT extension): every
ordered pair (i, j) computes additive shares of mr_i * msk_j.

Share (`utils.rs compute_R_and_u`):
  b = g1 + h_0*s + sum h_k*m_k  (computable by everyone)
  R_i = b * r_i ;  u_i = mr_i*(e + msk_i) + sum of pairwise shares
Aggregate: R = sum R_i, u = sum u_i = r*(e+x);
  A = R * 1/u = b/(e+x)  ->  standard SignatureG1 (A, e, s).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ...curves import bls12_381 as bls
from ...curves.sw import Point
from ...fields.host import Fp
from ...secret_sharing.common import lagrange_basis_at_0
from ...ot.cointoss import CointossParty
from ...ot.zero_sharing import ZeroSharingParty
from ...ot import gilboa
from ...ot.ot_extension import setup_ote_pair
from ..setup import SignatureParamsG1
from ..signature import SignatureG1

F = bls.Fr


@dataclass
class Phase1:
    id: int
    batch_size: int
    r: list
    commitment_protocol: CointossParty
    zero_sharing_protocol: ZeroSharingParty

    @classmethod
    def init(cls, rng, batch_size: int, id: int, others: set,
             protocol_id: bytes):
        r = [F.rand(rng) for _ in range(batch_size)]
        ct, ct_comms = CointossParty.commit(rng, id, 2 * batch_size,
                                            protocol_id)
        zs, zs_comms = ZeroSharingParty.init(rng, id, 2 * batch_size,
                                             others, protocol_id)
        return cls(id=id, batch_size=batch_size, r=r,
                   commitment_protocol=ct, zero_sharing_protocol=zs), \
            ct_comms, zs_comms

    def finish(self, signing_key_share: Fp, all_ids: list) -> "Phase1Output":
        joint = self.commitment_protocol.compute_joint()
        e = joint[: self.batch_size]
        s = joint[self.batch_size:]
        zero_shares = self.zero_sharing_protocol.compute_zero_shares()
        alphas = zero_shares[: self.batch_size]
        betas = zero_shares[self.batch_size:]
        others = [i for i in all_ids if i != self.id]
        lam = lagrange_basis_at_0(all_ids, self.id)
        msk = [a + lam * signing_key_share for a in alphas]
        mr = [b + r for b, r in zip(betas, self.r)]
        return Phase1Output(id=self.id, batch_size=self.batch_size,
                            r=list(self.r), e=e, s=s,
                            masked_signing_key_shares=msk, masked_rs=mr,
                            others=others)


@dataclass
class Phase1Output:
    id: int
    batch_size: int
    r: list
    e: list
    s: list
    masked_signing_key_shares: list
    masked_rs: list
    others: list


@dataclass
class Phase2Output:
    """Per-party sum of pairwise multiplication shares, per batch index."""
    id: int
    shares: list  # [Fp] per signature index

    def compute_u_term(self, index: int) -> Fp:
        return self.shares[index]


def run_phase2_pairwise(rng, phase1_outputs: dict) -> dict:
    """In-process pairwise Gilboa multiplications (the caller transports
    (U, msgs) in a networked deployment).  For every ordered pair (i, j):
    shares of mr_i * msk_j split between i and j."""
    ids = sorted(phase1_outputs)
    batch = phase1_outputs[ids[0]].batch_size
    acc = {i: [F(0)] * batch for i in ids}
    g = bls.G1.generator()
    for i in ids:
        for j in ids:
            if i == j:
                continue
            # party j holds msk_j (OTE sender / party1);
            # party i holds mr_i (OTE receiver / party2)
            ote_sender, ote_receiver = setup_ote_pair(rng, g)
            mr_i = phase1_outputs[i].masked_rs
            msk_j = phase1_outputs[j].masked_signing_key_shares
            U, keys, choices = gilboa.batch_mul_party2_round1(ote_receiver, mr_i)
            msgs, shares_j = gilboa.batch_mul_party1(ote_sender, msk_j, U)
            shares_i = gilboa.batch_mul_party2_round2(keys, choices, msgs, batch)
            for t in range(batch):
                acc[i][t] = acc[i][t] + shares_i[t]
                acc[j][t] = acc[j][t] + shares_j[t]
    return {i: Phase2Output(id=i, shares=acc[i]) for i in ids}


@dataclass
class BBSPlusSignatureShare:
    id: int
    e: Fp
    s: Fp
    u: Fp
    R: Point

    @classmethod
    def new(cls, messages, sig_index: int, phase1: Phase1Output,
            phase2: Phase2Output,
            params: SignatureParamsG1) -> "BBSPlusSignatureShare":
        e = phase1.e[sig_index]
        s = phase1.s[sig_index]
        b = params.b(list(enumerate(messages)), s)
        r_i = phase1.r[sig_index]
        mr = phase1.masked_rs[sig_index]
        msk = phase1.masked_signing_key_shares[sig_index]
        R = (b * int(r_i)).normalize()
        u = mr * (e + msk) + phase2.compute_u_term(sig_index)
        return cls(id=phase1.id, e=e, s=s, u=u, R=R)

    @staticmethod
    def aggregate(shares: list) -> SignatureG1:
        e = shares[0].e
        s = shares[0].s
        R = bls.G1.infinity()
        u = F(0)
        for sh in shares:
            if sh.e != e or sh.s != s:
                raise ValueError("mismatched e/s across shares")
            R = R + sh.R
            u = u + sh.u
        A = R * int(u.inverse())
        return SignatureG1(A=A.normalize(), e=e, s=s)
