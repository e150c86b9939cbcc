"""Golden-byte stability fixtures for the five BASELINE.md parity configs.

Locks the byte layout of serialized params/proofs/challenges under fixed
seeds: any drift in compressed-point encoding (flag bits!), transcript
labels, challenge reduction or proof field order breaks these
(`reference/schnorr_pok/src/discrete_log.rs:138-147` hashes compressed
encodings — a single flag-bit mistake silently breaks interop).

The goldens are self-generated once and committed
(`tests/fixtures/parity_vectors.json`); regenerate deliberately with
CRYPTO_TPU_REGEN_FIXTURES=1 after an INTENTIONAL format change.
"""

import json
import os
import random

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "parity_vectors.json")


def _collect() -> dict:
    from crypto_tpu.curves import bls12_381 as b
    from crypto_tpu.serialize import ByteWriter, serialize_point
    from crypto_tpu.hashing import compute_random_oracle_challenge

    out = {}
    F = b.Fr

    # -- config 1: Schnorr PoK of discrete log on G1 ----------------------
    rng = random.Random(101)
    base = b.G1.rand(rng).normalize()
    wit = F.rand(rng)
    y = (base * int(wit)).normalize()
    from crypto_tpu.schnorr.discrete_log import PokDiscreteLogProtocol
    proto = PokDiscreteLogProtocol.init(wit, F.rand(rng), base)
    w = ByteWriter()
    proto.challenge_contribution(base, y, w)
    ch = compute_random_oracle_challenge(F, w.bytes())
    proof = proto.gen_proof(ch)
    assert proof.verify(y, base, ch)
    out["schnorr"] = {
        "base": serialize_point(base).hex(),
        "y": serialize_point(y).hex(),
        "contribution": w.bytes().hex(),
        "challenge": ch.to_bytes_le().hex(),
        "t": serialize_point(proof.t).hex(),
        "response": proof.response.to_bytes_le().hex(),
    }

    # -- config 2: BBS+ sign + PoK over 32 messages -----------------------
    rng = random.Random(202)
    from crypto_tpu.bbs_plus.setup import KeypairG2, SignatureParamsG1
    from crypto_tpu.bbs_plus.signature import SignatureG1
    from crypto_tpu.bbs_plus.proof import (PoKOfSignatureG1Protocol,
                                           MessageOrBlinding)
    params = SignatureParamsG1.new(b"parity-bbs", 32)
    kp = KeypairG2.generate(rng, params)
    msgs = [F.rand(rng) for _ in range(32)]
    sig = SignatureG1.new(rng, msgs, kp.secret_key, params)
    assert sig.verify(msgs, kp.public_key, params)
    mabs = [MessageOrBlinding.reveal_message(m) if i < 4
            else MessageOrBlinding.blind_randomly(m)
            for i, m in enumerate(msgs)]
    prot = PoKOfSignatureG1Protocol.init(rng, sig, params, mabs)
    revealed = {i: msgs[i] for i in range(4)}
    w = ByteWriter()
    prot.challenge_contribution(revealed, params, w)
    ch = compute_random_oracle_challenge(F, w.bytes())
    pok = prot.gen_proof(ch)
    assert pok.verify(revealed, ch, kp.public_key, params)
    out["bbs_plus"] = {
        "params_g1": serialize_point(params.g1).hex(),
        "params_h0": serialize_point(params.h_0).hex(),
        "params_h5": serialize_point(params.h[5]).hex(),
        "pk_w": serialize_point(kp.public_key.w).hex(),
        "sig_A": serialize_point(sig.A).hex(),
        "sig_e": sig.e.to_bytes_le().hex(),
        "sig_s": sig.s.to_bytes_le().hex(),
        "challenge": ch.to_bytes_le().hex(),
        "A_prime": serialize_point(pok.A_prime).hex(),
    }

    # -- config 3: VB positive accumulator batch ops ----------------------
    rng = random.Random(303)
    from crypto_tpu.accumulator.setup import AccumKeypair, AccumSetupParams
    from crypto_tpu.accumulator.core import PositiveAccumulator
    from crypto_tpu.accumulator.persistence import InMemoryState
    from crypto_tpu.accumulator.batch_utils import Omega
    aparams = AccumSetupParams.new(b"parity-accum")
    akp = AccumKeypair.generate(rng, aparams)
    st = InMemoryState()
    acc = PositiveAccumulator.initialize(aparams)
    elems = [F.rand(rng) for _ in range(16)]
    acc = acc.add_batch(elems[:12], akp.secret_key, st)
    omega = Omega.new(elems[12:14], [elems[0]], acc.value(), akp.secret_key)
    acc2 = acc.batch_updates(elems[12:14], [elems[0]], akp.secret_key, st)
    wit = acc2.get_membership_witness(elems[1], akp.secret_key, st)
    assert acc2.verify_membership(elems[1], wit, akp.public_key, aparams)
    out["accumulator"] = {
        "P": serialize_point(aparams.P).hex(),
        "value_after_batch": serialize_point(acc2.value()).hex(),
        "witness_C": serialize_point(wit.C).hex(),
        "omega_0": serialize_point(omega.points[0]).hex(),
    }

    # -- config 4: SAVER generators + chunked decomposition ---------------
    # (full encrypt/decrypt round-trips live in test_saver.py; here we lock
    # the derived-generator and chunk-layout bytes)
    from crypto_tpu.saver.core import EncryptionGens, decompose
    gens = EncryptionGens.new(b"parity-saver")
    chunks = decompose(F(0xDEADBEEF_12345678), 8)
    out["saver"] = {
        "gen_G": serialize_point(gens.G).hex(),
        "gen_H": serialize_point(gens.H).hex(),
        "chunks_tail": [int(c) for c in chunks[-8:]],
    }

    # -- config 5: LegoGroth16 prove/verify (small circuit) ----------------
    rng = random.Random(505)
    from crypto_tpu.legogroth16 import snark
    from crypto_tpu.r1cs.cs import ConstraintSystem, LinearCombination

    def mul_circuit(x=None, y=None, z=None):
        def c(cs):
            zz = cs.new_input(z)
            xx = cs.new_witness(x)
            yy = cs.new_witness(y)
            cs.enforce(LinearCombination.from_var(xx),
                       LinearCombination.from_var(yy),
                       LinearCombination.from_var(zz))
        return c

    pk = snark.generate_random_parameters(mul_circuit(), 1, rng)
    x, y = F(3), F(41)
    proof, v, committed = snark.create_proof(mul_circuit(x, y, x * y), pk, rng)
    pvk = snark.PreparedVerifyingKey.from_vk(pk.vk)
    assert snark.verify_proof(pvk, proof, [x * y])
    out["legogroth16"] = {
        "vk_alpha": serialize_point(pk.vk.alpha_g1).hex(),
        "vk_gamma_abc0": serialize_point(pk.vk.gamma_abc_g1[0]).hex(),
        "proof_a": serialize_point(proof.a).hex(),
        "proof_b": serialize_point(proof.b).hex(),
        "proof_c": serialize_point(proof.c).hex(),
        "proof_d": serialize_point(proof.d).hex(),
    }
    return out


def test_parity_vectors():
    got = _collect()
    if not os.path.exists(FIXTURE) or os.environ.get(
            "CRYPTO_TPU_REGEN_FIXTURES"):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        with open(FIXTURE, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        pytest.skip("parity fixtures (re)generated; commit the file")
    with open(FIXTURE) as f:
        want = json.load(f)
    for section, fields in want.items():
        assert section in got, f"missing section {section}"
        for k, v in fields.items():
            assert got[section].get(k) == v, \
                f"byte drift in {section}.{k}:\n want {v}\n got {got[section].get(k)}"
