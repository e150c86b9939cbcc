"""SyRA sybil-resilient anonymous signatures / VRF pseudonyms
(reference `syra/` crate, paper 2024/379).

* Asymmetric Dodis-Yampolskiy VRF (`vrf.rs`): output = e(g, g_hat)^(1/(m+sk))
  with proof (g^(1/(m+sk)), g_hat^(1/(m+sk))).
* Pseudonym protocol (`pseudonym_alt.rs` header): the user's secret key is a
  weak-BB signature usk = g*(1/(sk+s)) on their identity s; the pseudonym
  for context Z (hashed to G2) is T = e(usk, Z).  The user proves:
  1. knowledge of usk with e(usk, Z) = T      (pairing-Schnorr: K = e(R,Z),
     S = R + usk*c; check e(S, Z) == K * T^c)
  2. knowledge of (s, r) with V' = V*(-s) + g*r  and  T' = T^r, where
     V = usk*r, T' = e(V, Z) (computed by the verifier), sharing r's
     blinding across the two relations
  3. verifier also checks e(V', g_hat) == e(V, ivk_hat).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..hashing import blake2b512, concat_slices, group_elem_from_try_and_incr
from ..serialize import ByteWriter, serialize_point
from ..short_group_sig.weak_bb import WeakBBSecretKey, WeakBBSig

F = bls.Fr


class SyraError(Exception):
    pass


@dataclass
class SyraSetupParams:
    g: Point       # G1
    g_hat: Point   # G2

    @classmethod
    def new(cls, label: bytes, digest=blake2b512):
        return cls(
            g=group_elem_from_try_and_incr(
                bls.G1, concat_slices(label, b" : g"), digest).normalize(),
            g_hat=group_elem_from_try_and_incr(
                bls.G2, concat_slices(label, b" : g_hat"), digest).normalize())

    @property
    def pairing(self):
        return bls.pairing(self.g, self.g_hat)


@dataclass
class IssuerSecretKey:
    sk: Fp

    @classmethod
    def generate(cls, rng):
        return cls(F.rand_nonzero(rng))


@dataclass
class IssuerPublicKey:
    ivk_hat: Point  # g_hat * sk

    @classmethod
    def new(cls, sk: IssuerSecretKey, params: SyraSetupParams):
        return cls((params.g_hat * int(sk.sk)).normalize())


@dataclass
class UserSecretKey:
    """usk = g * 1/(sk + s) — a weak-BB signature on the user id."""
    usk: Point

    @classmethod
    def issue(cls, user_id: Fp, issuer_sk: IssuerSecretKey,
              params: SyraSetupParams):
        return cls((params.g * int((user_id + issuer_sk.sk).inverse())).normalize())

    def verify(self, user_id: Fp, ipk: IssuerPublicKey,
               params: SyraSetupParams) -> bool:
        rhs = (params.g_hat * int(user_id) + ipk.ivk_hat).normalize()
        return bls.multi_pairing([(self.usk, rhs), (-params.g, params.g_hat)]).is_one()


# ---------------------------------------------------------------------------
# VRF (`vrf.rs`)
# ---------------------------------------------------------------------------

def vrf_generate(message: Fp, sk: IssuerSecretKey, params: SyraSetupParams):
    exp = (message + sk.sk).inverse()
    out = params.pairing ** int(exp)
    proof = ((params.g * int(exp)).normalize(), (params.g_hat * int(exp)).normalize())
    return out, proof


def vrf_verify(message: Fp, output, proof, ipk: IssuerPublicKey,
               params: SyraSetupParams) -> bool:
    p0, p1 = proof
    if bls.pairing(p0, (params.g_hat * int(message) + ipk.ivk_hat).normalize()) \
            != params.pairing:
        return False
    if bls.pairing(p0, params.g_hat) != output:
        return False
    return bls.multi_pairing([(params.g, p1), (-p0, params.g_hat)]).is_one()


# ---------------------------------------------------------------------------
# pseudonym (pseudonym_alt protocol)
# ---------------------------------------------------------------------------

def hash_context_to_z(context: bytes, digest=blake2b512) -> Point:
    return group_elem_from_try_and_incr(
        bls.G2, concat_slices(b"SyRA-context", context), digest).normalize()


@dataclass
class PseudonymProof:
    T: object        # GT pseudonym
    K: object        # GT commitment of relation 1
    S: Point         # G1 response of relation 1
    V: Point
    V_prime: Point
    t_Vp: Point      # Schnorr commitment for V' relation
    K2: object       # GT commitment for T' = T^r
    resp_s: Fp
    resp_r: Fp

    @classmethod
    def new(cls, rng, usk: UserSecretKey, user_id: Fp, context: bytes,
            params: SyraSetupParams):
        Z = hash_context_to_z(context)
        T = bls.pairing(usk.usk, Z)
        # relation 1 commit
        R = bls.G1.rand(rng).normalize()
        K = bls.pairing(R, Z)
        # relation 2 values
        r = F.rand_nonzero(rng)
        V = (usk.usk * int(r)).normalize()
        V_prime = (V * int(-user_id) + params.g * int(r)).normalize()
        # Schnorr commitments: V' = V*(-s) + g*r  and  T' = T^r (shared rho_r)
        rho_s, rho_r = F.rand(rng), F.rand(rng)
        t_Vp = (V * int(rho_s) + params.g * int(rho_r)).normalize()
        K2 = T ** int(rho_r)
        c = cls._challenge(T, K, V, V_prime, t_Vp, K2, Z, params)
        S = (R + usk.usk * int(c)).normalize()
        resp_s = rho_s + (-user_id) * c
        resp_r = rho_r + r * c
        return cls(T=T, K=K, S=S, V=V, V_prime=V_prime, t_Vp=t_Vp, K2=K2,
                   resp_s=resp_s, resp_r=resp_r)

    @staticmethod
    def _challenge(T, K, V, V_prime, t_Vp, K2, Z, params) -> Fp:
        from ..hashing import compute_random_oracle_challenge
        w = ByteWriter()
        w.write(T.to_bytes_le())
        w.write(K.to_bytes_le())
        w.point(V)
        w.point(V_prime)
        w.point(t_Vp)
        w.write(K2.to_bytes_le())
        w.point(Z)
        w.point(params.g)
        return compute_random_oracle_challenge(F, w.bytes())

    def verify(self, context: bytes, ipk: IssuerPublicKey,
               params: SyraSetupParams) -> bool:
        Z = hash_context_to_z(context)
        c = self._challenge(self.T, self.K, self.V, self.V_prime, self.t_Vp,
                            self.K2, Z, params)
        # relation 1: e(S, Z) == K * T^c
        if bls.pairing(self.S, Z) != self.K * (self.T ** int(c)):
            return False
        # relation 2a: V*resp_s + g*resp_r - V'*c == t_Vp
        lhs = (self.V * int(self.resp_s) + params.g * int(self.resp_r)
               - self.V_prime * int(c)).normalize()
        if lhs != self.t_Vp:
            return False
        # relation 2b: T' = e(V, Z); T^resp_r == K2 * T'^c
        T_prime = bls.pairing(self.V, Z)
        if self.T ** int(self.resp_r) != self.K2 * (T_prime ** int(c)):
            return False
        # signature structure: e(V', g_hat) == e(V, ivk_hat)
        return bls.multi_pairing([
            (self.V_prime, params.g_hat),
            ((-self.V).normalize(), ipk.ivk_hat)]).is_one()
