"""SyRA threshold issuance (reference `syra/src/threshold_issuance.rs`):
the issuer secret key sk is Shamir-shared; usk = g * 1/(user_id + sk) is
issued jointly via the shared-inverse machinery (Phase1 cointossed masks
+ Phase2 pairwise Gilboa multiplications in the reference; our in-process
equivalent lives in `short_group_sig.threshold_weak_bb`)."""

from __future__ import annotations

from ..fields.host import Fp
from ..short_group_sig.threshold_weak_bb import (ThresholdWeakBBSigner,
                                                 shared_inverse_times_base)
from .core import SyraSetupParams, UserSecretKey


def make_threshold_issuers(rng, sk_shares: dict) -> dict:
    ids = sorted(sk_shares)
    return {i: ThresholdWeakBBSigner.init(rng, i, sk_shares[i], ids)
            for i in ids}


def threshold_issue_usk(rng, issuers: dict, user_id: Fp,
                        params: SyraSetupParams) -> UserSecretKey:
    """Jointly issue usk = g * 1/(user_id + sk); the aggregate verifies
    against the (whole-key) issuer public key exactly like a centrally
    issued key (`threshold_issuance.rs` `UserSecretKeyShare::aggregate`)."""
    return UserSecretKey(usk=shared_inverse_times_base(
        rng, issuers, user_id, params.g))
