"""BBS+ data-parallel batch verification (one randomized check for N items).

Reference anchors: `bbs_plus/src/signature.rs:272-295`,
`bbs_plus/src/proof.rs:494-525` + `utils/src/randomized_pairing_check.rs`
accumulation; this is the SURVEY §2.4 batching surface.
"""

import random

import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.bbs_plus.setup import KeypairG2, SignatureParamsG1
from crypto_tpu.bbs_plus.signature import SignatureG1
from crypto_tpu.bbs_plus.proof import PoKOfSignatureG1Protocol, MessageOrBlinding
from crypto_tpu.bbs_plus.batch import (batch_verify_signatures,
                                       batch_verify_proofs)
from crypto_tpu.serialize import ByteWriter
from crypto_tpu.hashing import compute_random_oracle_challenge


@pytest.fixture(scope="module")
def setup():
    rng = random.Random(11)
    params = SignatureParamsG1.new(b"batch-test", 4)
    kp = KeypairG2.generate(rng, params)
    sigs, msgs_list = [], []
    for _ in range(6):
        msgs = [b.Fr.rand(rng) for _ in range(4)]
        sigs.append(SignatureG1.new(rng, msgs, kp.secret_key, params))
        msgs_list.append(msgs)
    return rng, params, kp, sigs, msgs_list


def test_batch_verify_signatures(setup):
    rng, params, kp, sigs, msgs_list = setup
    assert batch_verify_signatures(sigs, msgs_list, kp.public_key, params, rng)


def test_batch_verify_signatures_rejects_bad(setup):
    rng, params, kp, sigs, msgs_list = setup
    bad = [list(m) for m in msgs_list]
    bad[3][2] = bad[3][2] + b.Fr(1)
    assert not batch_verify_signatures(sigs, bad, kp.public_key, params, rng)
    # wrong key
    other = KeypairG2.generate(rng, params)
    assert not batch_verify_signatures(sigs, msgs_list, other.public_key,
                                       params, rng)


def test_batch_verify_proofs(setup):
    rng, params, kp, sigs, msgs_list = setup
    proofs, revealed_list, challenges = [], [], []
    for sig, msgs in zip(sigs[:4], msgs_list[:4]):
        mabs = [MessageOrBlinding.reveal_message(m) if i == 0
                else MessageOrBlinding.blind_randomly(m)
                for i, m in enumerate(msgs)]
        prot = PoKOfSignatureG1Protocol.init(rng, sig, params, mabs)
        revealed = {0: msgs[0]}
        w = ByteWriter()
        prot.challenge_contribution(revealed, params, w)
        ch = compute_random_oracle_challenge(b.Fr, w.bytes())
        proofs.append(prot.gen_proof(ch))
        revealed_list.append(revealed)
        challenges.append(ch)
    assert batch_verify_proofs(proofs, revealed_list, challenges,
                               kp.public_key, params, rng)
    # tamper: wrong revealed message in one proof
    bad_revealed = list(revealed_list)
    bad_revealed[1] = {0: revealed_list[1][0] + b.Fr(1)}
    assert not batch_verify_proofs(proofs, bad_revealed, challenges,
                                   kp.public_key, params, rng)
