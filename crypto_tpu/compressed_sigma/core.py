"""Compressed sigma protocols (reference `compressed_sigma/` crate,
paper 2020/152 Attema-Cramer).

Proves knowledge of x with P = <g, x> and L(x) = y for a public linear form
L, with O(log n) proof size:

1. r random; A = <g, r>, t = L(r); challenge c0; z = r + c0*x.
2. The linear form is folded into the commitment with challenge rho:
   bases g'_i = g_i + h*(rho*L_i);  Q = A + c0*P + h*(rho*(t + c0*y))
   so that Q = <g', z>.
3. Bulletproofs-style halving: per round publish
   A_j = <g_R, z_L>, B_j = <g_L, z_R>; challenge c;
   z' = z_L + c*z_R, g' = c*g_L + g_R, Q' = A_j + c*Q + c^2*B_j.
   Recurse until |z| <= 2, then send z.

Also includes the k-of-n partial knowledge proof (prove knowledge of k of n
discrete logs without revealing which) via the CDS polynomial technique
(`partial_knowledge.rs`).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..hashing import blake2b512, concat_slices, group_elem_from_try_and_incr, n_group_elements
from ..transcript.transcript import Transcript
from ..utils.msm import msm
from ..utils.ff import poly_from_roots, poly_eval

F = bls.Fr


@dataclass
class CompSigmaParams:
    g: list
    h: Point

    @classmethod
    def new(cls, label: bytes, n: int, digest=blake2b512):
        g = [p.normalize() for p in n_group_elements(
            bls.G1, 0, n, concat_slices(label, b" : g_"), digest)]
        h = group_elem_from_try_and_incr(
            bls.G1, concat_slices(label, b" : h"), digest).normalize()
        return cls(g=g, h=h)


def _pad_pow2(vec, fill):
    n = len(vec)
    target = 1 << max(0, (n - 1).bit_length())
    return list(vec) + [fill] * (target - n)


@dataclass
class CompressedLinearFormProof:
    A: Point
    t: Fp
    rounds: list   # [(A_j, B_j)]
    z_final: list

    @classmethod
    def new(cls, rng, x, L, params: CompSigmaParams,
            transcript: Transcript) -> "CompressedLinearFormProof":
        n = len(x)
        g = list(params.g[:n])
        r = [F.rand(rng) for _ in range(n)]
        A = msm(g, r).normalize()
        t = sum((li * ri for li, ri in zip(L, r)), F(0))
        transcript.append(b"A", A)
        transcript.append(b"t", t)
        c0 = transcript.challenge_scalar(F, b"c0")
        z = [ri + c0 * xi for ri, xi in zip(r, x)]
        rho = transcript.challenge_scalar(F, b"rho")
        gp = [(gi + params.h * int(rho * li)).normalize()
              for gi, li in zip(g, L)]
        # pad to power of two
        z = _pad_pow2(z, F(0))
        gp = _pad_pow2(gp, bls.G1.infinity())

        rounds = []
        while len(z) > 2:
            half = len(z) // 2
            gL, gR = gp[:half], gp[half:]
            zL, zR = z[:half], z[half:]
            A_j = msm(gR, zL).normalize()
            B_j = msm(gL, zR).normalize()
            transcript.append(b"A_j", A_j)
            transcript.append(b"B_j", B_j)
            c = transcript.challenge_scalar(F, b"c")
            z = [a + c * b for a, b in zip(zL, zR)]
            gp = [(a * int(c) + b).normalize() for a, b in zip(gL, gR)]
            rounds.append((A_j, B_j))
        return cls(A=A, t=t, rounds=rounds, z_final=z)

    def verify(self, P: Point, L, y: Fp, params: CompSigmaParams,
               transcript: Transcript) -> bool:
        n = len(L)
        g = list(params.g[:n])
        transcript.append(b"A", self.A)
        transcript.append(b"t", self.t)
        c0 = transcript.challenge_scalar(F, b"c0")
        rho = transcript.challenge_scalar(F, b"rho")
        gp = [(gi + params.h * int(rho * li)).normalize()
              for gi, li in zip(g, L)]
        gp = _pad_pow2(gp, bls.G1.infinity())
        Q = (self.A + P * int(c0)
             + params.h * int(rho * (self.t + c0 * y))).normalize()
        for (A_j, B_j) in self.rounds:
            transcript.append(b"A_j", A_j)
            transcript.append(b"B_j", B_j)
            c = transcript.challenge_scalar(F, b"c")
            half = len(gp) // 2
            gp = [(a * int(c) + b).normalize()
                  for a, b in zip(gp[:half], gp[half:])]
            Q = (A_j + Q * int(c) + B_j * int(c * c)).normalize()
        if len(self.z_final) != len(gp):
            return False
        return msm(gp, self.z_final) == Q


# ---------------------------------------------------------------------------
# k-of-n partial knowledge (CDS-style polynomial trick, `partial_knowledge.rs`)
# ---------------------------------------------------------------------------

@dataclass
class PartialKnowledgeProof:
    """Prove knowledge of x_i for i in a k-subset S of {1..n} with
    P_i = g_i * x_i, without revealing S.

    Classic CDS with Shamir-shared challenges: the prover picks a degree
    n-k polynomial p with p(0) = 1 and p(i) = 0 for i NOT in S... here the
    dual: simulate proofs for i not in S with self-chosen challenges c_i,
    constrain sum-consistency via a polynomial of degree n-k through the
    simulated challenge points evaluated against the master challenge."""
    commitments: list   # t_i per statement
    challenges: list    # c_i per statement
    responses: list     # s_i per statement

    @classmethod
    def new(cls, rng, n: int, known: dict, bases: list, pubs: list,
            transcript: Transcript) -> "PartialKnowledgeProof":
        k = len(known)
        ts = [None] * n
        cs = [None] * n
        ss = [None] * n
        rs = {}
        # simulate for unknown indices
        for i in range(n):
            if i in known:
                rs[i] = F.rand(rng)
                ts[i] = (bases[i] * int(rs[i])).normalize()
            else:
                cs[i] = F.rand(rng)
                ss[i] = F.rand(rng)
                # t = g*s - P*c
                ts[i] = (bases[i] * int(ss[i])
                         - pubs[i] * int(cs[i])).normalize()
        for t in ts:
            transcript.append(b"t", t)
        c_master = transcript.challenge_scalar(F, b"c")
        # interpolate: find polynomial p of degree n-k with p(0) = c_master
        # and p(i+1) = c_i for the simulated i; real challenges c_i = p(i+1)
        xs = [F(0)] + [F(i + 1) for i in range(n) if i not in known]
        ys = [c_master] + [cs[i] for i in range(n) if i not in known]
        coeffs = _lagrange_interpolate(xs, ys)
        for i in range(n):
            if i in known:
                cs[i] = poly_eval(coeffs, F(i + 1))
                ss[i] = rs[i] + cs[i] * known[i]
        return cls(commitments=ts, challenges=cs, responses=ss)

    def verify(self, n: int, k: int, bases: list, pubs: list,
               transcript: Transcript) -> bool:
        for t in self.commitments:
            transcript.append(b"t", t)
        c_master = transcript.challenge_scalar(F, b"c")
        # all (i+1, c_i) plus (0, c_master) must lie on a degree n-k poly
        xs = [F(i + 1) for i in range(n)]
        pts = list(zip(xs, self.challenges))
        coeffs = _lagrange_interpolate([x for x, _ in pts[: n - k + 1]],
                                       [y for _, y in pts[: n - k + 1]])
        if len(coeffs) > n - k + 1:
            return False
        for x, y in pts[n - k + 1:]:
            if poly_eval(coeffs, x) != y:
                return False
        if poly_eval(coeffs, F(0)) != c_master:
            return False
        # Schnorr checks
        for i in range(n):
            lhs = (bases[i] * int(self.responses[i])
                   - pubs[i] * int(self.challenges[i]))
            if lhs != self.commitments[i]:
                return False
        return True


def _lagrange_interpolate(xs, ys):
    """Coefficients (low-first) of the unique poly through (xs, ys)."""
    n = len(xs)
    coeffs = [F(0)] * n
    for i in range(n):
        # basis poly prod_{j!=i} (X - x_j)/(x_i - x_j)
        num = [F(1)]
        denom = F(1)
        for j in range(n):
            if j == i:
                continue
            num = _poly_mul_lin(num, -xs[j])
            denom = denom * (xs[i] - xs[j])
        scale = ys[i] * denom.inverse()
        for d, c in enumerate(num):
            coeffs[d] = coeffs[d] + c * scale
    # trim leading zeros
    while len(coeffs) > 1 and coeffs[-1].is_zero():
        coeffs.pop()
    return coeffs


def _poly_mul_lin(p, root_neg):
    """p(X) * (X + root_neg)."""
    out = [F(0)] * (len(p) + 1)
    for i, c in enumerate(p):
        out[i] = out[i] + c * root_neg
        out[i + 1] = out[i + 1] + c
    return out
