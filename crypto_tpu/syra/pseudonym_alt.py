"""SyRA pseudonyms, faster variant (reference `syra/src/pseudonym_alt.rs`):
the pseudonym is T = e(usk, Z) for context point Z, with
  - a pairing-Schnorr PoK of usk in T (group-element witness), and
  - a CDH weak-BB PoK that usk is the issuer's signature on the user id,
linked by checking T'^c * J == T^{resp_r} where T' = e(A', Z) for the
randomized signature A' = usk*r and J = T^{r_blinding}."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..schnorr.discrete_log_pairing import (
    PoKG1DiscreteLogInPairing, PoKG1DiscreteLogInPairingProtocol)
from ..serialize import ByteWriter
from ..short_group_sig.weak_bb import (PoKWeakBBSig, PoKWeakBBSigProtocol)
from .core import (IssuerPublicKey, IssuerSecretKey, SyraError,
                   SyraSetupParams, UserSecretKey)

F = bls.Fr


@dataclass
class PseudonymGenProtocolAlt:
    pok_usk: PoKG1DiscreteLogInPairingProtocol
    pok_usk_bb_sig: PoKWeakBBSigProtocol
    T: object
    T_prime: object
    J: object

    @classmethod
    def init(cls, rng, Z: Point, user_id: Fp,
             user_sk: UserSecretKey, params: SyraSetupParams,
             blinding: Optional[Fp] = None):
        usk_point = user_sk.usk
        T = bls.pairing(usk_point, Z)
        r = F.rand_nonzero(rng)
        r_blinding = F.rand(rng)
        msg_blinding = blinding if blinding is not None else F.rand(rng)
        rand_pt = (bls.G1.generator() * int(F.rand(rng))).normalize()
        pok_usk = PoKG1DiscreteLogInPairingProtocol.init(
            usk_point, rand_pt, Z)
        pok_bb = PoKWeakBBSigProtocol.init_with_given_randomness(
            r, msg_blinding, r_blinding, usk_point, user_id, params.g)
        return cls(pok_usk=pok_usk, pok_usk_bb_sig=pok_bb, T=T,
                   T_prime=T ** int(r), J=T ** int(r_blinding))

    def challenge_contribution(self, Z: Point, ipk: IssuerPublicKey,
                               g: Point, writer: ByteWriter):
        writer.point(ipk.ivk_hat)
        writer.write(self.J.to_bytes_le())
        self.pok_usk.challenge_contribution(Z, self.T, writer)
        self.pok_usk_bb_sig.challenge_contribution(g, writer)

    def gen_proof(self, challenge: Fp) -> "PseudonymProofAlt":
        return PseudonymProofAlt(
            pok_usk=self.pok_usk.gen_proof(challenge),
            pok_usk_bb_sig=self.pok_usk_bb_sig.gen_proof(challenge),
            T=self.T, J=self.J)


@dataclass
class PseudonymProofAlt:
    pok_usk: PoKG1DiscreteLogInPairing
    pok_usk_bb_sig: PoKWeakBBSig
    T: object
    J: object

    def challenge_contribution(self, Z: Point, ipk: IssuerPublicKey,
                               g: Point, writer: ByteWriter):
        writer.point(ipk.ivk_hat)
        writer.write(self.J.to_bytes_le())
        self.pok_usk.challenge_contribution(Z, self.T, writer)
        self.pok_usk_bb_sig.challenge_contribution(g, writer)

    def verify(self, challenge: Fp, Z: Point, ipk: IssuerPublicKey,
               params: SyraSetupParams) -> bool:
        if not self.pok_usk.verify(self.T, Z, challenge):
            return False
        # randomizer linkage: T'^c * J == T^{resp_r}
        T_prime = bls.pairing(self.pok_usk_bb_sig.A_prime, Z)
        lhs = (T_prime ** int(challenge)) * self.J
        if lhs != self.T ** int(self.pok_usk_bb_sig.sc.response1):
            return False
        from ..short_group_sig.weak_bb import WeakBBPublicKeyG2
        pk = WeakBBPublicKeyG2(w=ipk.ivk_hat)
        return self.pok_usk_bb_sig.verify(challenge, pk, params.g,
                                          params.g_hat)
