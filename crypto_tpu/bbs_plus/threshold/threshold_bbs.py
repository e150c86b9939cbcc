"""Threshold BBS (2023) signing (reference
`bbs_plus/src/threshold/threshold_bbs.rs`, paper 2023/602).

Identical MPC skeleton to threshold BBS+ (`threshold_bbs_plus.py`) with the
BBS-2023 signature shape (A, e) — no `s` term:

  Phase 1: cointoss yields joint e (one value per signature, not two);
           zero-sharing masks alpha/beta; msk_i = alpha_i + lambda_i x_i,
           mr_i = beta_i + r_i.
  Phase 2: pairwise Gilboa multiplication of mr_i * msk_j (unchanged).
  Share:   b = g1 + sum h_k m_k;  R_i = b * r_i;
           u_i = mr_i (e + msk_i) + pairwise shares.
  Aggregate: A = (sum R_i) / (sum u_i) = b / (e + x) -> Signature23G1 (A, e).
"""

from __future__ import annotations

from dataclasses import dataclass

from ...curves import bls12_381 as bls
from ...curves.sw import Point
from ...fields.host import Fp
from ...secret_sharing.common import lagrange_basis_at_0
from ...ot.cointoss import CointossParty
from ...ot.zero_sharing import ZeroSharingParty
from ..bbs23 import Signature23G1, SignatureParams23G1
from .threshold_bbs_plus import Phase2Output, run_phase2_pairwise  # noqa: F401

F = bls.Fr


@dataclass
class BBSPhase1:
    id: int
    batch_size: int
    r: list
    commitment_protocol: CointossParty
    zero_sharing_protocol: ZeroSharingParty

    @classmethod
    def init(cls, rng, batch_size: int, id: int, others: set,
             protocol_id: bytes):
        r = [F.rand(rng) for _ in range(batch_size)]
        ct, ct_comms = CointossParty.commit(rng, id, batch_size, protocol_id)
        zs, zs_comms = ZeroSharingParty.init(rng, id, 2 * batch_size,
                                             others, protocol_id)
        return cls(id=id, batch_size=batch_size, r=r,
                   commitment_protocol=ct, zero_sharing_protocol=zs), \
            ct_comms, zs_comms

    def finish(self, signing_key_share: Fp, all_ids: list) -> "BBSPhase1Output":
        e = self.commitment_protocol.compute_joint()
        zero_shares = self.zero_sharing_protocol.compute_zero_shares()
        alphas = zero_shares[: self.batch_size]
        betas = zero_shares[self.batch_size:]
        lam = lagrange_basis_at_0(all_ids, self.id)
        msk = [a + lam * signing_key_share for a in alphas]
        mr = [b + r for b, r in zip(betas, self.r)]
        return BBSPhase1Output(
            id=self.id, batch_size=self.batch_size, r=list(self.r), e=e,
            masked_signing_key_shares=msk, masked_rs=mr,
            others=[i for i in all_ids if i != self.id])


@dataclass
class BBSPhase1Output:
    id: int
    batch_size: int
    r: list
    e: list
    masked_signing_key_shares: list
    masked_rs: list
    others: list


@dataclass
class BBSSignatureShare:
    id: int
    e: Fp
    u: Fp
    R: Point

    @classmethod
    def new(cls, messages, sig_index: int, phase1: BBSPhase1Output,
            phase2: Phase2Output,
            params: SignatureParams23G1) -> "BBSSignatureShare":
        e = phase1.e[sig_index]
        b = params.commitment_to_messages(list(enumerate(messages)))
        r_i = phase1.r[sig_index]
        mr = phase1.masked_rs[sig_index]
        msk = phase1.masked_signing_key_shares[sig_index]
        R = (b * int(r_i)).normalize()
        u = mr * (e + msk) + phase2.compute_u_term(sig_index)
        return cls(id=phase1.id, e=e, u=u, R=R)

    @staticmethod
    def aggregate(shares: list) -> Signature23G1:
        e = shares[0].e
        R = bls.G1.infinity()
        u = F(0)
        for sh in shares:
            if sh.e != e:
                raise ValueError("mismatched e across shares")
            R = R + sh.R
            u = u + sh.u
        A = R * int(u.inverse())
        return Signature23G1(A=A.normalize(), e=e)
