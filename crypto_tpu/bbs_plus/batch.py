"""Data-parallel batch verification for BBS+ (the TPU scaling surface).

Random-linear-combination batching (SURVEY.md §2.4, reference
`utils/src/randomized_pairing_check.rs` accumulation pattern) specialised to
BBS+ so that verifying N signatures or N PoK proofs costs:

  * signatures:  2 G1 MSMs of size N (device Pippenger) + ONE small MSM over
    the signature params + ONE 2-pairing product.
        sig_i valid  <=>  e(A_i, pk + e_i g2) == e(b_i, g2)
        batch: sum_i r^i [ e(A_i, pk) + e(e_i A_i - b_i, g2) ] == 1
        with the shared-g2 legs collapsed:
          e(sum_i r^i A_i, pk) * e(sum_i r^i e_i A_i - sum_i r^i b_i, g2) == 1
        and sum_i r^i b_i = sum_j P_j (sum_i r^i c_ij)   (single params MSM).
  * PoK proofs: per-proof Schnorr checks accumulate into a
    RandomizedMultChecker (ONE MSM) and the pairing legs collapse the same
    way:  e(sum r^i A'_i, pk) * e(-sum r^i Abar_i, g2) == 1.

Reference behavior anchors: `bbs_plus/src/signature.rs:272-295` (2-pairing
check), `bbs_plus/src/proof.rs:494-525` (PoK pairing legs + checker).
Soundness: standard Schwartz-Zippel over the random weights (same argument
as the reference's RandomizedPairingChecker docs).
"""

from __future__ import annotations

import random as _random

from ..curves import bls12_381 as bls
from ..utils.msm import msm as msm_host
from ..utils.checkers import RandomizedMultChecker
from .setup import SignatureParamsG1, PublicKeyG2
from .signature import SignatureG1, BBSPlusError

Fr = bls.Fr
DEVICE_MSM_THRESHOLD = 256


def _msm(points, scalars):
    if len(points) >= DEVICE_MSM_THRESHOLD:
        from ..ops.msm_v2 import msm_device_scheduled
        return msm_device_scheduled(points[0].curve,
                                    [p.normalize() for p in points],
                                    [int(s) for s in scalars])
    return msm_host(points, scalars)


def batch_verify_signatures(sigs: list, messages_list: list,
                            pk: PublicKeyG2, params: SignatureParamsG1,
                            rng=None) -> bool:
    """Verify N (signature, messages) pairs under one public key with one
    randomized combined check.  Device MSM + device multi-pairing above
    thresholds."""
    if len(sigs) != len(messages_list):
        raise BBSPlusError("sigs/messages length mismatch")
    if not sigs:
        return True
    rng = rng or _random.Random()
    n_msgs = params.supported_message_count
    for m in messages_list:
        if len(m) != n_msgs:
            raise BBSPlusError("message count incompatible with params")

    weights = [Fr.rand_nonzero(rng) for _ in sigs]
    # combined params-side scalars: c_ij over bases [g1, h_0, h_1..h_M]
    p = Fr.p
    acc_g1 = 0
    acc_h0 = 0
    acc_h = [0] * n_msgs
    for w, sig, msgs in zip(weights, sigs, messages_list):
        wi = int(w)
        acc_g1 = (acc_g1 + wi) % p
        acc_h0 = (acc_h0 + wi * int(sig.s)) % p
        for j, m in enumerate(msgs):
            acc_h[j] = (acc_h[j] + wi * int(m)) % p
    b_comb = msm_host([params.g1, params.h_0] + list(params.h),
                      [Fr(acc_g1), Fr(acc_h0)] + [Fr(x) for x in acc_h])

    A_pts = [sig.A for sig in sigs]
    U = _msm(A_pts, weights)                                   # sum r^i A_i
    T = _msm(A_pts, [w * sig.e for w, sig in zip(weights, sigs)])
    lhs = (T - b_comb).normalize()
    out = _multi_pairing([(U.normalize(), pk.w), (lhs, params.g2)])
    return out.is_one()


def batch_verify_proofs(proofs: list, revealed_list: list, challenges: list,
                        pk: PublicKeyG2, params: SignatureParamsG1,
                        rng=None) -> bool:
    """Verify N PoKOfSignatureG1 proofs: Schnorr legs via ONE randomized
    MSM, pairing legs via ONE combined 2-pairing product."""
    if not proofs:
        return True
    rng = rng or _random.Random()
    rmc = RandomizedMultChecker(Fr.rand_nonzero(rng))
    for proof, revealed, ch in zip(proofs, revealed_list, challenges):
        if proof.A_prime.is_infinity():
            return False
        proof.verify_schnorr_with_randomized_mult_checker(
            revealed, ch, params, rmc)
    if not rmc.verify():
        return False
    weights = [Fr.rand_nonzero(rng) for _ in proofs]
    U = _msm([pr.A_prime for pr in proofs], weights)
    V = _msm([pr.A_bar for pr in proofs], weights)
    out = _multi_pairing([(U.normalize(), pk.w),
                          ((-V).normalize(), params.g2)])
    return out.is_one()


def _multi_pairing(pairs):
    import os
    backend = os.environ.get("CRYPTO_TPU_PAIRING_BACKEND")
    if backend == "device":
        from ..curves.jpairing import jpairing_for
        return jpairing_for("bls12_381").multi_pairing(pairs)
    return bls.multi_pairing(pairs)
