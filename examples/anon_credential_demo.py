#!/usr/bin/env python
"""End-to-end anonymous-credential walkthrough on crypto_tpu.

One composite zero-knowledge proof shows, without revealing the holder's
identity or attributes:
  1. possession of a BBS+ credential from a known issuer,
  2. the credential's `user_id` attribute is accumulated (not revoked),
  3. the `age` attribute lies in [18, 128) via a Bulletproofs++ range leg,
  4. the `user_id` is verifiably encrypted to an auditor (TZ21), who can
     de-anonymize if required.
All four statements are linked with shared-blinding witness equalities.

Run: python examples/anon_credential_demo.py   (CPU ok; TPU accelerates the
MSM/NTT underneath the SNARK/accumulator layers transparently)
"""

import random
import sys
import time

sys.path.insert(0, ".")

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.accumulator.core import PositiveAccumulator
from crypto_tpu.accumulator.persistence import InMemoryState
from crypto_tpu.accumulator.setup import (AccumPublicKey, AccumSecretKey,
                                          AccumSetupParams)
from crypto_tpu.bbs_plus.setup import (PublicKeyG2, SecretKey,
                                       SignatureParamsG1)
from crypto_tpu.bbs_plus.signature import SignatureG1
from crypto_tpu.bulletproofs_pp.range_proof import SetupParams as BppParams
from crypto_tpu.hashing import n_group_elements
from crypto_tpu.proof_system.base import ProofSpec
from crypto_tpu.proof_system.proof import Proof
from crypto_tpu.proof_system.statements import (AccumMembershipWit,
                                                BBSWitness,
                                                PoKBBSSignatureG1,
                                                VBAccumulatorMembershipCDH)
from crypto_tpu.proof_system.statements_ranges import (BoundCheckBpp,
                                                       VerifiableEncryptionTZ21)
from crypto_tpu.utils.elgamal import keygen

F = bls.Fr
rng = random.Random(20260817)


def main():
    print("== setup ==")
    # Issuer: BBS+ over [user_id, age, country]
    sig_params = SignatureParamsG1.new(b"demo-issuer", 3)
    issuer_sk = SecretKey.generate(rng)
    issuer_pk = PublicKeyG2.generate(issuer_sk, sig_params)
    # Revocation authority: VB accumulator
    acc_params = AccumSetupParams.new(b"demo-accum")
    acc_sk = AccumSecretKey.generate(rng)
    acc_pk = AccumPublicKey.generate(acc_sk, acc_params)
    state = InMemoryState()
    accum = PositiveAccumulator.initialize(acc_params)
    # Range-proof generators and auditor keys
    bpp = BppParams.new_for_perfect_range_proof(b"demo-bpp", 2, 64, 2)
    enc_gen = bls.G1.generator()
    auditor_sk, auditor_pk = keygen(rng, enc_gen)
    ve_ck = [p.normalize() for p in n_group_elements(bls.G1, 0, 2,
                                                     b"demo-ve")]

    print("== issuance ==")
    user_id, age, country = F.rand(rng), F(42), F(840)
    messages = [user_id, age, country]
    credential = SignatureG1.new(rng, messages, issuer_sk, sig_params)
    assert credential.verify(messages, issuer_pk, sig_params)
    accum = accum.add(user_id, acc_sk, state)
    revocation_witness = accum.get_membership_witness(user_id, acc_sk,
                                                      state)
    print("   credential signed; user_id accumulated")

    print("== presentation (composite proof) ==")
    t0 = time.time()
    spec = ProofSpec(context=b"demo-verifier-session-0001")
    s_bbs = spec.add_statement(PoKBBSSignatureG1(
        params=sig_params, public_key=issuer_pk,
        revealed_messages={2: country}))       # country revealed
    s_acc = spec.add_statement(VBAccumulatorMembershipCDH(
        accumulator_value=accum.value(), params=acc_params,
        public_key=acc_pk))
    s_rng = spec.add_statement(BoundCheckBpp(
        min_val=18, max_val=128, bpp_params=bpp))
    s_ve = spec.add_statement(VerifiableEncryptionTZ21(
        comm_key=ve_ck, enc_pk=auditor_pk, enc_gen=enc_gen,
        n_parties=4, reps=8))
    spec.add_witness_equality([(s_bbs, 0), (s_acc, 0), (s_ve, 0)])
    spec.add_witness_equality([(s_bbs, 1), (s_rng, 0)])
    witnesses = [
        BBSWitness(signature=credential, messages=messages),
        AccumMembershipWit(element=user_id, witness=revocation_witness),
        age,
        [user_id],
    ]
    proof = Proof.new(rng, spec, witnesses, nonce=b"n-42")
    print(f"   proof created in {time.time() - t0:.2f}s")

    t0 = time.time()
    assert proof.verify(rng, spec, nonce=b"n-42")
    print(f"   proof verified in {time.time() - t0:.2f}s")

    print("== audit ==")
    ve_proof = proof.statement_proofs[s_ve]
    decrypted = ve_proof.ve_proof.compress(subset_size=4).decrypt(
        auditor_sk, ve_proof.commitment, ve_ck[:2])
    assert decrypted[0] == user_id
    print("   auditor recovered user_id from the ciphertexts\n== done ==")


if __name__ == "__main__":
    main()
