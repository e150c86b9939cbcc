"""Baghery's hash-based VSS and publicly verifiable secret sharing (PVSS)
(reference `secret_sharing_and_dkg/src/baghery_vss.rs` and
`baghery_pvss/{same_base,different_base}.rs`; "A Unified Framework for
Verifiable Secret Sharing", eprint 2023/1669, Fig. 4 and 7).

VSS: the dealer commits to each share with a salted hash
H(share || "PI_LA" || r(i)) for a random masking polynomial r, publishes a
response polynomial z = r + d*f (d from a random oracle over the
commitments); share i verifies by recomputing its commitment from
r(i) = z(i) - d*share.

PVSS: shares are ENCRYPTED as pk_i * f(i) so the dealing can live on a
public bulletin board; the aggregate Schnorr-with-polynomial-response
proves every ciphertext encrypts the correct Shamir evaluation.  Party i
decrypts its share commitment g*f(i) = enc^(1/sk_i); any t of those
Lagrange-combine to the commitment to the secret g*f(0).  The
different-base variant additionally conveys j*f(i) for an unrelated base j
(ElGamal-style, mask pk_i*f(i), masked share (j+g)*f(i))."""

from __future__ import annotations

from dataclasses import dataclass

from ..curves.sw import Point
from ..fields.host import Fp
from ..hashing import blake2b512, compute_random_oracle_challenge
from ..serialize import serialize_point
from ..utils.ff import poly_eval
from ..utils.msm import msm
from .common import SSError, Share, Shares, lagrange_basis_at_0_for_all
from .schemes import shamir_deal_secret

DOMAIN_SEPARATOR = b"PI_LA"


def _rand_poly(rng, F, degree):
    return [F.rand(rng) for _ in range(degree + 1)]


def hash_commitment(msg: Fp, r: Fp, digest=blake2b512) -> bytes:
    return digest(msg.to_bytes_le() + DOMAIN_SEPARATOR + r.to_bytes_le())


# ---------------------------------------------------------------------------
# VSS (Fig. 4): hash commitments, no group operations at all
# ---------------------------------------------------------------------------

@dataclass
class VSSProof:
    commitments: list      # [bytes] per share
    resp: list             # polynomial z coefficients
    challenge: Fp

    def verify(self, share: Share, digest=blake2b512) -> bool:
        if len(self.resp) - 1 != share.threshold - 1:
            return False
        F = share.share.f
        chal = b"".join(self.commitments)
        d = compute_random_oracle_challenge(F, chal, digest)
        if d != self.challenge:
            return False
        r = poly_eval(self.resp, F(share.id)) - d * share.share
        return self.commitments[share.id - 1] == \
            hash_commitment(share.share, r, digest)


def vss_deal_secret(rng, secret: Fp, threshold: int, total: int,
                    digest=blake2b512):
    """Returns (Shares, sharing poly f, VSSProof)."""
    F = secret.f
    shares, f = shamir_deal_secret(rng, secret, threshold, total)
    r = _rand_poly(rng, F, threshold - 1)
    commitments = [
        hash_commitment(shares.shares[i].share, poly_eval(r, F(i + 1)),
                        digest)
        for i in range(total)]
    d = compute_random_oracle_challenge(F, b"".join(commitments), digest)
    z = [r_c + d * f_c for r_c, f_c in zip(r, f)]
    return shares, f, VSSProof(commitments=commitments, resp=z, challenge=d)


# ---------------------------------------------------------------------------
# PVSS, same base (Fig. 7)
# ---------------------------------------------------------------------------

@dataclass
class EncryptedShare:
    id: int
    threshold: int
    share: Point           # pk_i * f(i)

    def decrypt(self, sk: Fp) -> Share:
        """Share here is a COMMITMENT g*f(i), not the scalar."""
        return Share(id=self.id, threshold=self.threshold,
                     share=(self.share * int(sk.inverse())).normalize())


@dataclass
class PVSSProof:
    challenge: Fp
    resp: list             # polynomial z

    def verify(self, threshold: int, total: int, public_keys: list,
               enc_shares: list, digest=blake2b512) -> bool:
        if len(enc_shares) != len(public_keys):
            return False
        if len(self.resp) != threshold:
            return False
        F = self.challenge.f
        buf = bytearray()
        for pk, es in zip(public_keys, enc_shares):
            t = (pk * int(poly_eval(self.resp, F(es.id)))
                 - es.share * int(self.challenge)).normalize()
            buf += serialize_point(pk)
            buf += serialize_point(t)
            buf += serialize_point(es.share)
        return compute_random_oracle_challenge(F, bytes(buf), digest) == \
            self.challenge


def pvss_deal_secret(rng, secret: Fp, threshold: int, total: int,
                     public_keys: list, digest=blake2b512):
    """Returns ([EncryptedShare], PVSSProof, sharing poly f)."""
    F = secret.f
    shares, f = shamir_deal_secret(rng, secret, threshold, total)
    r = _rand_poly(rng, F, threshold - 1)
    buf = bytearray()
    enc_shares = []
    for i, pk in enumerate(public_keys):
        s_i = shares.shares[i]
        t = (pk * int(poly_eval(r, F(s_i.id)))).normalize()
        enc = (pk * int(s_i.share)).normalize()
        buf += serialize_point(pk)
        buf += serialize_point(t)
        buf += serialize_point(enc)
        enc_shares.append(EncryptedShare(id=s_i.id, threshold=threshold,
                                         share=enc))
    d = compute_random_oracle_challenge(F, bytes(buf), digest)
    z = [r_c + d * f_c for r_c, f_c in zip(r, f)]
    return enc_shares, PVSSProof(challenge=d, resp=z), f


def combine_share_commitments(shares: list) -> Point:
    """Lagrange-combine decrypted share commitments -> g * f(0)."""
    threshold = shares[0].threshold
    if threshold > len(shares):
        raise SSError("below threshold")
    sub = shares[:threshold]
    basis = lagrange_basis_at_0_for_all([s.id for s in sub])
    return msm([s.share for s in sub], basis).normalize()


# ---------------------------------------------------------------------------
# PVSS, different base: dealer conveys j*f(i) for independent base j
# ---------------------------------------------------------------------------

@dataclass
class EncryptedShareDB:
    id: int
    threshold: int
    masked_share: Point    # (j + g) * f(i)
    mask: Point            # pk_i * f(i)

    def decrypt(self, sk: Fp) -> Share:
        """Returns the commitment j*f(i) = masked - g*f(i)."""
        g_fi = self.mask * int(sk.inverse())
        return Share(id=self.id, threshold=self.threshold,
                     share=(self.masked_share - g_fi).normalize())


@dataclass
class PVSSProofDB:
    challenge: Fp
    resp: list

    def verify(self, threshold: int, total: int, public_keys: list,
               enc_shares: list, pk_base: Point, target_base: Point,
               digest=blake2b512) -> bool:
        if len(enc_shares) != len(public_keys) or len(self.resp) != threshold:
            return False
        F = self.challenge.f
        mask_base = (target_base + pk_base).normalize()
        buf = bytearray(serialize_point(mask_base))
        for pk, es in zip(public_keys, enc_shares):
            resp_i = poly_eval(self.resp, F(es.id))
            t_mask = (pk * int(resp_i)
                      - es.mask * int(self.challenge)).normalize()
            t_masked = (mask_base * int(resp_i)
                        - es.masked_share * int(self.challenge)).normalize()
            buf += serialize_point(pk)
            buf += serialize_point(t_mask)
            buf += serialize_point(t_masked)
            buf += serialize_point(es.mask)
            buf += serialize_point(es.masked_share)
        return compute_random_oracle_challenge(F, bytes(buf), digest) == \
            self.challenge


def pvss_deal_secret_different_base(rng, secret: Fp, threshold: int,
                                    total: int, public_keys: list,
                                    pk_base: Point, target_base: Point,
                                    digest=blake2b512):
    F = secret.f
    shares, f = shamir_deal_secret(rng, secret, threshold, total)
    r = _rand_poly(rng, F, threshold - 1)
    mask_base = (target_base + pk_base).normalize()
    buf = bytearray(serialize_point(mask_base))
    enc_shares = []
    for i, pk in enumerate(public_keys):
        s_i = shares.shares[i]
        blinding = poly_eval(r, F(s_i.id))
        t_mask = (pk * int(blinding)).normalize()
        mask = (pk * int(s_i.share)).normalize()
        t_masked = (mask_base * int(blinding)).normalize()
        masked = (mask_base * int(s_i.share)).normalize()
        buf += serialize_point(pk)
        buf += serialize_point(t_mask)
        buf += serialize_point(t_masked)
        buf += serialize_point(mask)
        buf += serialize_point(masked)
        enc_shares.append(EncryptedShareDB(
            id=s_i.id, threshold=threshold, masked_share=masked, mask=mask))
    d = compute_random_oracle_challenge(F, bytes(buf), digest)
    z = [r_c + d * f_c for r_c, f_c in zip(r, f)]
    return enc_shares, PVSSProofDB(challenge=d, resp=z), f
