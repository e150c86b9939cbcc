"""LegoGroth16 cc-SNARK: Groth16 with a Pedersen commitment to a prefix of
the witnesses (reference `legogroth16/src/{generator,prover,verifier}.rs`,
`data_structures.rs`).

CRS (trapdoors alpha, beta, gamma, delta, eta, tau):
  vk:  alpha*G1, beta*G2, gamma*G2, delta*G2,
       gamma_abc[i] = (beta*a_i + alpha*b_i + c_i)/gamma  for publics AND the
       `commit_witness_count` committed witnesses, eta/gamma * G1
  pk:  beta*G1, delta*G1, eta/delta * G1, per-variable a/b queries,
       h_query[i] = (Z(tau)/delta) tau^i * G1, l_query = remaining-witness
       (beta*a+alpha*b+c)/delta * G1

Prove (r, s, v random; v = commitment randomness):
  h = QAP witness map  (iFFT x3, coset FFT x3, pointwise, coset iFFT —
      runs on the device NTT; `r1cs_to_qap.rs:150-209`)
  A = alpha + delta*r + sum a_i z_i
  B = beta + delta*s + sum b_i z_i           (G2; also G1 copy for C)
  C = A*s + B1*r - rs*delta + <l_query, uncommitted> + <h_query, h>
      - v * eta/delta
  D = <gamma_abc[committed slots], committed wits> + v * eta/gamma

Verify: e(A, B) == e(alpha,beta) * e(inputs_acc + D, gamma) * e(C, delta).

Hot paths (the BASELINE.json north-star workload): the 7 NTTs and the 4-5
MSMs route to `crypto_tpu.ops.{ntt,msm}` device kernels above a size
threshold, host Pippenger below it.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..r1cs.cs import ConstraintSystem, SynthesisError, evaluate_row
from ..utils.msm import msm as msm_host, multiply_field_elems_with_same_group_elem
from ..ops.ntt import domain_for

# Default pairing context = BLS12-381; pass `ctx=crypto_tpu.curves.bn254` to
# any entry point to run LegoGroth16 over BN254 (the curve of the reference's
# circom bn128 fixtures, `legogroth16/test-vectors/bn128/`).  A context is a
# curve module exposing Fr, G1, G2, pairing, multi_pairing.
F = bls.Fr
DEVICE_MSM_THRESHOLD = 2048


class LegoGroth16Error(Exception):
    pass


def _msm(points, scalars):
    if len(points) >= DEVICE_MSM_THRESHOLD:
        from ..ops.msm_v2 import msm_device_scheduled
        return msm_device_scheduled(points[0].curve,
                                    [p.normalize() for p in points],
                                    [int(s) for s in scalars])
    return msm_host(points, scalars)


def _msm_query(pk: "ProvingKey", name: str, scalars, offset: int = 0):
    """MSM over (a prefix of) a CRS query vector with the packed device copy
    cached on the ProvingKey — the CRS is packed ONCE and stays
    device-resident across proofs (closes VERDICT.md weak #3: `_msm` used to
    re-pack host points on every call)."""
    full = getattr(pk, name)
    k = len(scalars)
    points = full[offset:offset + k]
    if not points:
        return bls.G1.infinity()
    if k < DEVICE_MSM_THRESHOLD:
        return msm_host(points, scalars)
    from ..ops.msm_v2 import msm_device_scheduled
    from ..curves.jcurve import JPoints, jcurve_for
    cache = pk.device_cache
    entry = cache.get(name)
    if entry is None:
        import numpy as np
        jc = jcurve_for(full[0].curve)
        norm = [p.normalize() for p in full]
        packed = jc.pack_points(norm)
        inf_mask = np.array([p.is_infinity() for p in norm])
        entry = (packed, inf_mask)
        cache[name] = entry
    packed, inf_mask = entry
    if offset or k != len(full):
        packed = JPoints(packed.X[offset:offset + k],
                         packed.Y[offset:offset + k],
                         packed.Z[offset:offset + k])
        inf_mask = inf_mask[offset:offset + k]
    return msm_device_scheduled(full[0].curve, packed,
                                [int(s) for s in scalars])


DEVICE_FIXED_BASE_THRESHOLD = 512


def _fixed_base_many(base: Point, scalars) -> list[Point]:
    if len(scalars) >= DEVICE_FIXED_BASE_THRESHOLD:
        # device window-table path (SURVEY §2.2 fixed-base row)
        from ..ops.fixed_base import table_for
        tab = table_for(base.curve, base)
        return tab.mul_many_host([int(s) for s in scalars])
    return multiply_field_elems_with_same_group_elem(base, scalars)


@dataclass
class VerifyingKey:
    alpha_g1: Point
    beta_g2: Point
    gamma_g2: Point
    delta_g2: Point
    gamma_abc_g1: list
    eta_gamma_inv_g1: Point
    commit_witness_count: int

    @property
    def num_public_inputs(self) -> int:
        return len(self.gamma_abc_g1) - self.commit_witness_count

    def get_commitment_key_for_witnesses(self) -> list:
        start = self.num_public_inputs
        return self.gamma_abc_g1[start:start + self.commit_witness_count] + \
            [self.eta_gamma_inv_g1]


@dataclass
class ProvingKey:
    vk: VerifyingKey
    beta_g1: Point
    delta_g1: Point
    eta_delta_inv_g1: Point
    a_query: list
    b_g1_query: list
    b_g2_query: list
    h_query: list
    l_query: list

    @property
    def device_cache(self) -> dict:
        """Lazily-created cache of device-packed query vectors (not part of
        equality/serialization)."""
        c = getattr(self, "_device_cache", None)
        if c is None:
            c = {}
            object.__setattr__(self, "_device_cache", c)
        return c


@dataclass
class Proof:
    a: Point
    b: Point
    c: Point
    d: Point


@dataclass
class PreparedVerifyingKey:
    vk: VerifyingKey
    alpha_beta: object  # GT element

    @classmethod
    def from_vk(cls, vk: VerifyingKey, ctx=bls) -> "PreparedVerifyingKey":
        return cls(vk=vk, alpha_beta=ctx.pairing(vk.alpha_g1, vk.beta_g2))


def _lagrange_coeffs_at(domain, t: int, F=F) -> list[int]:
    """l_i(t) for radix-2 domain: Z(t)/N * w^i / (t - w^i)."""
    p = F.p
    N = domain.n
    zt = (pow(t, N, p) - 1) % p
    if zt == 0:
        raise LegoGroth16Error("tau landed inside the domain")
    w = domain.w
    zt_over_n = zt * pow(N, -1, p) % p
    # batch invert (t - w^i)
    wi = 1
    denoms = []
    ws = []
    for i in range(N):
        ws.append(wi)
        denoms.append((t - wi) % p)
        wi = wi * w % p
    # Montgomery batch inversion
    prefix = [1] * N
    acc = 1
    for i, d in enumerate(denoms):
        prefix[i] = acc
        acc = acc * d % p
    inv = pow(acc, -1, p)
    out = [0] * N
    for i in range(N - 1, -1, -1):
        out[i] = zt_over_n * ws[i] % p * (prefix[i] * inv % p) % p
        inv = inv * denoms[i] % p
    return out


def generate_random_parameters(circuit, commit_witness_count: int, rng,
                               ctx=bls) -> ProvingKey:
    """CRS generation (`generator.rs:230-440`)."""
    trapdoors = tuple(ctx.Fr.rand(rng) for _ in range(5))
    return generate_parameters_with_trapdoors(
        circuit, commit_witness_count, rng, *trapdoors, ctx=ctx)


def generate_parameters_with_trapdoors(circuit, commit_witness_count: int, rng,
                                       alpha, beta, gamma, delta,
                                       eta, ctx=bls, g1=None,
                                       g2=None) -> ProvingKey:
    """CRS from explicit toxic waste — needed by SAVER, which binds the
    encryption key to (gamma, delta) of the SNARK CRS
    (`saver/src/saver_groth16.rs:52-80`).  g1/g2 override the group
    generators (the SAVER LegoGroth16 wrapper builds the CRS over its
    `EncryptionGens` bases, `saver/src/saver_legogroth16.rs:32-64`)."""
    F = ctx.Fr
    cs = ConstraintSystem(F, mode="setup")
    circuit(cs)

    num_inst = cs.num_instance
    num_wit = cs.num_witness
    if num_wit < commit_witness_count:
        raise LegoGroth16Error("insufficient witnesses for commitment")
    nc = cs.num_constraints
    domain = domain_for(F, 1 << max(1, (nc + num_inst - 1).bit_length()))
    N = domain.n

    while True:
        t = F.rand(rng)
        if (pow(int(t), N, F.p) - 1) % F.p != 0:
            break

    u = _lagrange_coeffs_at(domain, int(t), F)
    zt = (pow(int(t), N, F.p) - 1) % F.p

    nvars = num_inst + num_wit
    p = F.p
    a = [0] * nvars
    b = [0] * nvars
    c = [0] * nvars
    for i in range(nc):
        ui = u[i]
        for coeff, idx in cs.a_rows[i]:
            a[idx] = (a[idx] + ui * coeff) % p
        for coeff, idx in cs.b_rows[i]:
            b[idx] = (b[idx] + ui * coeff) % p
        for coeff, idx in cs.c_rows[i]:
            c[idx] = (c[idx] + ui * coeff) % p
    for j in range(num_inst):
        a[j] = (a[j] + u[nc + j]) % p

    gamma_inv = pow(int(gamma), -1, p)
    delta_inv = pow(int(delta), -1, p)
    n_commit = num_inst + commit_witness_count
    gamma_abc = [(int(beta) * a[i] + int(alpha) * b[i] + c[i]) * gamma_inv % p
                 for i in range(n_commit)]
    l = [(int(beta) * a[i] + int(alpha) * b[i] + c[i]) * delta_inv % p
         for i in range(nvars)]

    if g1 is None:
        g1 = ctx.G1.generator()
    if g2 is None:
        g2 = ctx.G2.generator()

    a_query = _fixed_base_many(g1, [F(x) for x in a])
    b_g1_query = _fixed_base_many(g1, [F(x) for x in b])
    b_g2_query = _fixed_base_many(g2, [F(x) for x in b])
    zt_delta_inv = zt * delta_inv % p
    h_scalars = []
    ti = 1
    for i in range(N - 1):
        h_scalars.append(F(zt_delta_inv * ti % p))
        ti = ti * int(t) % p
    h_query = _fixed_base_many(g1, h_scalars)
    l_query = _fixed_base_many(g1, [F(x) for x in l[n_commit:]])
    gamma_abc_g1 = _fixed_base_many(g1, [F(x) for x in gamma_abc])

    vk = VerifyingKey(
        alpha_g1=(g1 * int(alpha)).normalize(),
        beta_g2=(g2 * int(beta)).normalize(),
        gamma_g2=(g2 * int(gamma)).normalize(),
        delta_g2=(g2 * int(delta)).normalize(),
        gamma_abc_g1=[q.normalize() for q in gamma_abc_g1],
        eta_gamma_inv_g1=(g1 * (int(eta) * gamma_inv % p)).normalize(),
        commit_witness_count=commit_witness_count,
    )
    return ProvingKey(
        vk=vk,
        beta_g1=(g1 * int(beta)).normalize(),
        delta_g1=(g1 * int(delta)).normalize(),
        eta_delta_inv_g1=(g1 * (int(eta) * delta_inv % p)).normalize(),
        a_query=[q.normalize() for q in a_query],
        b_g1_query=[q.normalize() for q in b_g1_query],
        b_g2_query=[q.normalize() for q in b_g2_query],
        h_query=[q.normalize() for q in h_query],
        l_query=[q.normalize() for q in l_query],
    )


def witness_map(cs: ConstraintSystem, F=F) -> list[int]:
    """QAP witness map -> h coefficients (device NTTs;
    `r1cs_to_qap.rs:150-209`)."""
    p = F.p
    z = [int(v) for v in cs.full_assignment()]
    nc = cs.num_constraints
    num_inst = cs.num_instance
    domain = domain_for(F, 1 << max(1, (nc + num_inst - 1).bit_length()))
    N = domain.n
    a = [0] * N
    b = [0] * N
    c = [0] * N
    for i in range(nc):
        a[i] = evaluate_row(cs.a_rows[i], z, p)
        b[i] = evaluate_row(cs.b_rows[i], z, p)
        c[i] = evaluate_row(cs.c_rows[i], z, p)
    for j in range(num_inst):
        a[nc + j] = z[j]

    J = domain.J
    pa, pb, pc = J.pack(a), J.pack(b), J.pack(c)
    ca = domain.coset_ntt(domain.intt(pa))
    cb = domain.coset_ntt(domain.intt(pb))
    cc = domain.coset_ntt(domain.intt(pc))
    ab = J.mul(ca, cb)
    ab = J.sub(ab, cc)
    zinv = pow(domain.z_on_coset(), -1, p)
    ab = J.mul(ab, J.pack([zinv])[0])
    h = domain.coset_intt(ab)
    import numpy as np
    return [int(v) for v in np.atleast_1d(J.unpack(h))]


def create_proof(circuit, pk: ProvingKey, rng, v: Fp | None = None,
                 ctx=bls):
    """Returns (Proof, v) — v is the commitment randomness the caller needs
    to open D (`prover.rs:32-120`)."""
    F = ctx.Fr
    cs = ConstraintSystem(F, mode="prove")
    circuit(cs)
    if not cs.is_satisfied():
        raise LegoGroth16Error("constraints unsatisfied")

    r, s = F.rand(rng), F.rand(rng)
    if v is None:
        v = F.rand(rng)
    h = witness_map(cs, F)

    vk = pk.vk
    cwc = vk.commit_witness_count
    inst = [int(x) for x in cs.instance_assignment]
    wits = [int(x) for x in cs.witness_assignment]
    assignment = inst[1:] + wits  # all vars except the leading ONE

    h_acc = _msm_query(pk, "h_query", [F(x) for x in h[:len(pk.h_query)]])
    l_acc = _msm_query(pk, "l_query", [F(x) for x in wits[cwc:]]) \
        if pk.l_query else ctx.G1.infinity()

    def calculate_coeff(initial, qname, vk_param):
        query = getattr(pk, qname)
        acc = initial + query[0]
        if assignment and len(query) > 1:
            acc = acc + _msm_query(pk, qname, [F(x) for x in assignment],
                                   offset=1)
        return acc + vk_param

    g_a = calculate_coeff(pk.delta_g1 * int(r), "a_query", vk.alpha_g1)
    g1_b = calculate_coeff(pk.delta_g1 * int(s), "b_g1_query", pk.beta_g1)
    g2_b = calculate_coeff(vk.delta_g2 * int(s), "b_g2_query", vk.beta_g2)

    g_c = g_a * int(s) + g1_b * int(r) - pk.delta_g1 * (int(r) * int(s) % F.p) \
        + l_acc + h_acc - pk.eta_delta_inv_g1 * int(v)

    committed = wits[:cwc]
    n_pub = vk.num_public_inputs
    g_d = ctx.G1.infinity()
    if committed:
        g_d = _msm(vk.gamma_abc_g1[n_pub:n_pub + cwc], [F(x) for x in committed])
    g_d = g_d + vk.eta_gamma_inv_g1 * int(v)

    proof = Proof(a=g_a.normalize(), b=g2_b.normalize(),
                  c=g_c.normalize(), d=g_d.normalize())
    return proof, v, [F(x) for x in committed]


def rerandomize_proof(proof: Proof, vk: VerifyingKey, rng, ctx=bls) -> Proof:
    """BKSV20-style rerandomization (`legogroth16/src/prover.rs:478-508`):
    A' = A/r1, B' = r1*B + r1*r2*(delta+gamma)_G2, C' = C + r2*A,
    D' = D + r2*A.  D is no longer a witness commitment afterwards."""
    F = ctx.Fr
    r1 = F.rand_nonzero(rng)
    r2 = F.rand_nonzero(rng)
    a_r2 = proof.a * int(r2)
    return Proof(
        a=(proof.a * int(r1.inverse())).normalize(),
        b=(proof.b * int(r1)
           + (vk.delta_g2 + vk.gamma_g2) * int(r1 * r2)).normalize(),
        c=(proof.c + a_r2).normalize(),
        d=(proof.d + a_r2).normalize())


def rerandomize_proof_1(proof: Proof, old_v: Fp, new_v: Fp,
                        vk: VerifyingKey, eta_delta_inv_g1: Point,
                        rng, ctx=bls) -> Proof:
    """Rerandomization that KEEPS D a commitment to the witnesses with
    fresh randomness new_v (`legogroth16/src/prover.rs:510-549`):
    C' = C + r2*A + (old_v-new_v)*(eta/delta)G1,
    D' = D + (new_v-old_v)*(eta/gamma)G1."""
    F = ctx.Fr
    r1 = F.rand_nonzero(rng)
    r2 = F.rand_nonzero(rng)
    a_r2 = proof.a * int(r2)
    return Proof(
        a=(proof.a * int(r1.inverse())).normalize(),
        b=(proof.b * int(r1) + vk.delta_g2 * int(r1 * r2)).normalize(),
        c=(proof.c + a_r2
           + eta_delta_inv_g1 * int(old_v - new_v)).normalize(),
        d=(proof.d + vk.eta_gamma_inv_g1 * int(new_v - old_v)).normalize())


def prepare_inputs(vk: VerifyingKey, public_inputs, ctx=bls) -> Point:
    F = ctx.Fr
    inp = [F(1)] + [F(int(x)) for x in public_inputs]
    if len(inp) > vk.num_public_inputs:
        raise LegoGroth16Error("too many public inputs")
    return msm_host(vk.gamma_abc_g1[:len(inp)], inp)


def verify_qap_proof(pvk: PreparedVerifyingKey, a: Point, b: Point,
                     c: Point, d: Point, ctx=bls) -> bool:
    """The bare 3-pairing QAP check with a fully-formed d accumulator
    (`verifier.rs:62-85` `verify_qap_proof`); callers that fold extra terms
    into d (the SAVER wrappers) use this directly."""
    vk = pvk.vk
    neg_delta = (-vk.delta_g2).normalize()
    neg_gamma = (-vk.gamma_g2).normalize()
    lhs = ctx.multi_pairing([
        (a, b), (c, neg_delta), (d.normalize(), neg_gamma)])
    return lhs == pvk.alpha_beta


def verify_proof(pvk: PreparedVerifyingKey, proof: Proof, public_inputs,
                 ctx=bls) -> bool:
    """3-pairing check (`verifier.rs:64-110`)."""
    d = prepare_inputs(pvk.vk, public_inputs, ctx) + proof.d
    return verify_qap_proof(pvk, proof.a, proof.b, proof.c, d, ctx)


def verify_proof_with_checker(pvk: PreparedVerifyingKey, proof: Proof,
                              public_inputs, checker, ctx=bls) -> None:
    """Accumulate the 3-pairing verification equation into a shared
    `RandomizedPairingChecker` (reference `verifier.rs` with
    `VerifierConfig`): e(A,B) e(C,-delta) e(D+inputs,-gamma) == e(alpha,beta)."""
    vk = pvk.vk
    d = (prepare_inputs(vk, public_inputs, ctx) + proof.d).normalize()
    checker.add_multiple_sources_and_target(
        [proof.a, proof.c, d],
        [proof.b, (-vk.delta_g2).normalize(), (-vk.gamma_g2).normalize()],
        pvk.alpha_beta)


def verify_commitment(vk: VerifyingKey, proof: Proof, public_inputs,
                      committed_witnesses, v: Fp, ctx=bls) -> bool:
    """Open D: D == sum gamma_abc[committed]*w_i + v*eta/gamma
    (`verifier.rs` verify_commitment / `prover.rs` D construction)."""
    n_pub = vk.num_public_inputs
    bases = vk.gamma_abc_g1[n_pub:n_pub + len(committed_witnesses)]
    expect = msm_host(bases + [vk.eta_gamma_inv_g1],
                      list(committed_witnesses) + [v])
    return expect == proof.d
