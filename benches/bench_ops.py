#!/usr/bin/env python
"""Micro-benchmark suite mirroring the reference's Criterion set
(reference `benches/benches/*.rs`, SURVEY.md §6, BASELINE.md): BBS+ /
BBS-2023 / PS signatures and PoKs, Schnorr, accumulator ops + witness
updates, KOS OTE, DKLS19 batch multiplication, SyRA pseudonyms, device
MSM and NTT sweeps.

Prints a table and (with --json PATH) a JSON report.  Select groups with
--only bbs,accum,... ; sizes are kept small by default so the whole suite
runs in minutes on CPU — pass --full for reference-scale sizes.

Usage:
    python benches/bench_ops.py [--only bbs,schnorr] [--json out.json]
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _t(fn, *a, reps=1, **kw):
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*a, **kw)
    return (time.perf_counter() - t0) / reps, out


RESULTS = []


def report(group, name, seconds, extra=""):
    RESULTS.append(dict(group=group, name=name, ms=seconds * 1000,
                        extra=extra))
    print(f"  {name:<48} {seconds * 1000:10.2f} ms  {extra}")


def bench_schnorr(rng, F, b, full):
    from crypto_tpu.schnorr.discrete_log import (PokDiscreteLog,
                                                 PokDiscreteLogProtocol)
    from crypto_tpu.hashing import compute_random_oracle_challenge
    from crypto_tpu.serialize import ByteWriter
    g = b.G1.generator()
    x = F.rand(rng)
    y = (g * int(x)).normalize()

    def prove():
        prot = PokDiscreteLogProtocol.init(x, F.rand(rng), g)
        w = ByteWriter()
        prot.challenge_contribution(g, y, w)
        c = compute_random_oracle_challenge(F, w.bytes())
        return prot.gen_proof(c), c

    dt, (proof, c) = _t(prove, reps=10)
    report("schnorr", "PokDiscreteLog prove", dt)
    dt, _ = _t(proof.verify, y, g, c, reps=10)
    report("schnorr", "PokDiscreteLog verify", dt)


def bench_bbs(rng, F, b, full):
    from crypto_tpu.bbs_plus.setup import KeypairG2, SignatureParamsG1
    from crypto_tpu.bbs_plus.signature import SignatureG1
    from crypto_tpu.bbs_plus.proof import (MessageOrBlinding,
                                           PoKOfSignatureG1Protocol)
    from crypto_tpu.hashing import compute_random_oracle_challenge
    from crypto_tpu.serialize import ByteWriter
    for n in ([2, 8, 32] if full else [2, 32]):
        params = SignatureParamsG1.new(b"bench", n)
        kp = KeypairG2.generate(rng, params)
        msgs = [F.rand(rng) for _ in range(n)]
        dt, sig = _t(SignatureG1.new, rng, msgs, kp.secret_key, params)
        report("bbs", f"BBS+ sign ({n} msgs)", dt)
        dt, ok = _t(sig.verify, msgs, kp.public_key, params)
        report("bbs", f"BBS+ verify ({n} msgs)", dt)
        assert ok

        def prove():
            mabs = [MessageOrBlinding.blind_randomly(m) for m in msgs]
            prot = PoKOfSignatureG1Protocol.init(rng, sig, params, mabs)
            w = ByteWriter()
            prot.challenge_contribution({}, params, w)
            c = compute_random_oracle_challenge(F, w.bytes())
            return prot.gen_proof(c), c

        dt, (proof, c) = _t(prove)
        report("bbs", f"BBS+ PoK prove ({n} msgs hidden)", dt)
        dt, _ = _t(proof.verify, {}, c, kp.public_key, params)
        report("bbs", f"BBS+ PoK verify ({n} msgs hidden)", dt)


def bench_ps(rng, F, b, full):
    from crypto_tpu.coconut.core import (PSPublicKey, PSSecretKey,
                                         PSSignature, PSSignatureParams)
    n = 8
    params = PSSignatureParams.new(b"ps-bench", n)
    sk = PSSecretKey.generate(rng, n)
    pk = PSPublicKey.generate(sk, params)
    msgs = [F.rand(rng) for _ in range(n)]
    dt, sig = _t(PSSignature.new, rng, msgs, sk, params)
    report("ps", f"PS sign ({n} msgs)", dt)
    dt, ok = _t(sig.verify, msgs, pk, params)
    report("ps", f"PS verify ({n} msgs)", dt)
    assert ok


def bench_accum(rng, F, b, full):
    from crypto_tpu.accumulator.setup import AccumKeypair, AccumSetupParams
    from crypto_tpu.accumulator.core import PositiveAccumulator
    from crypto_tpu.accumulator.persistence import InMemoryState
    from crypto_tpu.accumulator.batch_utils import Omega
    from crypto_tpu.accumulator.witness import (
        update_membership_with_public_info,)
    n = (1 << 14) if full else (1 << 8)
    params = AccumSetupParams.new(b"accum-bench")
    kp = AccumKeypair.generate(rng, params)
    state = InMemoryState()
    accum = PositiveAccumulator.initialize(params)
    elems = [F.rand(rng) for _ in range(n)]
    dt, accum = _t(accum.add_batch, elems, kp.secret_key, state)
    report("accum", f"positive add_batch ({n})", dt)
    dt, wit = _t(accum.get_membership_witness, elems[0], kp.secret_key,
                 state)
    report("accum", "membership witness gen", dt)

    additions = [F.rand(rng) for _ in range(16)]
    removals = elems[1:9]
    dt, om = _t(Omega.new, additions, removals, accum.value(),
                kp.secret_key)
    report("accum", "Omega (16 add / 8 rem)", dt)
    new_accum = accum.batch_updates(additions, removals, kp.secret_key,
                                    state)
    dt, new_wit = _t(update_membership_with_public_info,
                     wit, elems[0], additions, removals, om)
    report("accum", "witness update w/ public info", dt)
    assert new_accum.verify_membership(elems[0], new_wit, kp.public_key,
                                       params)


def bench_ot(rng, F, b, full):
    from crypto_tpu.ot.ot_extension import setup_ote_pair
    from crypto_tpu.ot import gilboa
    g = b.G1.generator()
    dt, (sender, receiver) = _t(setup_ote_pair, rng, g)
    report("ot", "OT-extension setup (128 base OTs)", dt)

    def batch_mul(k):
        s, r = setup_ote_pair(rng, g)
        alphas = [F.rand(rng) for _ in range(k)]
        betas = [F.rand(rng) for _ in range(k)]
        U, keys, choices = gilboa.batch_mul_party2_round1(r, betas)
        msgs, sh1 = gilboa.batch_mul_party1(s, alphas, U)
        sh2 = gilboa.batch_mul_party2_round2(keys, choices, msgs, k)
        return sh1, sh2

    k = 8 if full else 2
    dt, _ = _t(batch_mul, k)
    report("ot", f"DKLS19-style batch mult ({k} products)", dt)


def bench_syra(rng, F, b, full):
    from crypto_tpu.syra.core import (IssuerPublicKey, IssuerSecretKey,
                                      SyraSetupParams, UserSecretKey,
                                      hash_context_to_z)
    from crypto_tpu.syra.pseudonym_alt import PseudonymGenProtocolAlt
    from crypto_tpu.hashing import compute_random_oracle_challenge
    from crypto_tpu.serialize import ByteWriter
    params = SyraSetupParams.new(b"syra-bench")
    isk = IssuerSecretKey.generate(rng)
    ipk = IssuerPublicKey.new(isk, params)
    uid = F.rand(rng)
    usk = UserSecretKey.issue(uid, isk, params)
    Z = hash_context_to_z(b"bench-context")

    def gen():
        prot = PseudonymGenProtocolAlt.init(rng, Z, uid, usk, params)
        w = ByteWriter()
        prot.challenge_contribution(Z, ipk, params.g, w)
        c = compute_random_oracle_challenge(F, w.bytes())
        return prot.gen_proof(c), c

    dt, (proof, c) = _t(gen)
    report("syra", "pseudonym generate + proof", dt)
    dt, ok = _t(proof.verify, c, Z, ipk, params)
    report("syra", "pseudonym verify", dt)
    assert ok


def bench_msm_ntt(rng, F, b, full):
    import numpy as np
    import jax
    from crypto_tpu.curves.jcurve import jcurve_for
    from crypto_tpu.ops import msm as msm_ops
    from crypto_tpu.ops.ntt import domain_for
    jc = jcurve_for(b.G1)
    logn = 14 if full else 10
    n = 1 << logn
    base = b.G1.generator()
    pts = [base]
    for _ in range(5):
        pts.append(pts[-1].double().normalize())
    pack = jc.pack_points(pts * (n // len(pts)) +
                          pts[:n - (n // len(pts)) * len(pts)])
    scalars = [int(x) for x in
               np.random.default_rng(0).integers(1, 1 << 62, size=n)]
    msm_ops.msm_device(b.G1, pack, scalars)   # compile
    dt, _ = _t(msm_ops.msm_device, b.G1, pack, scalars)
    report("device", f"G1 MSM 2^{logn} (device)", dt,
           f"{n / dt:,.0f} pts/s")

    logd = 16 if full else 12
    d = 1 << logd
    dom = domain_for(F, d)
    vals = [int(x) for x in
            np.random.default_rng(1).integers(0, F.p, size=d)]
    dom.ntt_ints(vals)   # compile
    dt, evals = _t(dom.ntt_ints, vals)
    report("device", f"NTT 2^{logd} (device, incl. packing)", dt)
    dt, back = _t(dom.ntt_ints, evals, True)
    report("device", f"iNTT 2^{logd} (device, incl. packing)", dt)
    assert back[:4] == vals[:4]


GROUPS = dict(schnorr=bench_schnorr, bbs=bench_bbs, ps=bench_ps,
              accum=bench_accum, ot=bench_ot, syra=bench_syra,
              device=bench_msm_ntt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import crypto_tpu.jax_setup  # noqa: F401  (compile cache)
    from crypto_tpu.curves import bls12_381 as b
    F = b.Fr
    rng = random.Random(0)

    only = set(args.only.split(",")) if args.only else set(GROUPS)
    for name, fn in GROUPS.items():
        if name not in only:
            continue
        print(f"[{name}]")
        fn(rng, F, b, args.full)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(RESULTS, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
