"""Sigma protocol for equality of values committed in two different groups
(reference `equality_across_groups/src/eq_across_groups.rs`, from the paper
"Proofs of discrete logarithm equality across groups", eprint 2022/1593
Figure 1 + the section-5 chunked extension).

The witness x (< 2^wit_bits) is committed in G1 and G2 whose scalar fields
differ; the proof works over the INTEGERS: the prover samples an integer
k < 2^(wit_bits + chal_bits + abort_param), commits k in both groups, and
responds z = k + c*x as an integer.  z lies in a public range iff no
wrap-around happened in either field (abort + retry otherwise, rejection
sampling); the verifier checks the range and both Schnorr equations with z
reduced into each field.  Soundness per repetition is 2^-chal_bits, so
num_reps * chal_bits >= 128.

`ProofLargeWitness` splits a full-size scalar into `num_chunks` base-2^b
chunks, proves each chunk's equality, recombines commitments via powers of
2^b, and attaches one aggregated Bulletproofs++ range proof over all chunk
commitments in G1 (`eq_across_groups.rs:494-700`).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..bulletproofs_pp.range_proof import Prover as BppProver, SetupParams
from ..bulletproofs_pp.wnla import BppError
from ..curves.sw import Point
from ..fields.host import Fp
from ..transcript.transcript import Transcript
from ..utils.commitment import PedersenCommitmentKey
from ..utils.ff import powers
from ..utils.msm import msm
from .commitments import EqAcrossGroupsError


@dataclass
class EqParams:
    """Replaces the reference's const generics; same constraints
    (`eq_across_groups.rs:130-145`)."""
    wit_bits: int = 52
    chal_bits: int = 192
    abort_param: int = 8
    num_reps: int = 1

    def __post_init__(self):
        if self.num_reps * self.chal_bits < 128:
            raise EqAcrossGroupsError("num_reps * chal_bits < 128")

    @property
    def resp_bits(self) -> int:
        return self.wit_bits + self.chal_bits + self.abort_param

    @property
    def min_resp(self) -> int:
        return 1 << (self.wit_bits + self.chal_bits)

    @property
    def max_resp(self) -> int:
        return (1 << self.resp_bits) - 1

    def check_group_sizes(self, f1, f2):
        if self.resp_bits >= min(f1.p.bit_length(), f2.p.bit_length()):
            raise EqAcrossGroupsError("response would wrap in a group")


@dataclass
class ProofSingleRep:
    k1_com: Point
    s1: Fp
    k2_com: Point
    s2: Fp
    z: int


def _challenge_int(params: EqParams, k1_com: Point, k2_com: Point,
                   transcript: Transcript) -> int:
    """Append the per-rep commitments, squeeze a chal_bits-bit integer."""
    transcript.append(b"K1", k1_com)
    transcript.append(b"K2", k2_com)
    nbytes = (params.chal_bits + 7) // 8
    c_bytes = bytearray(transcript.challenge_bytes(b"challenge", nbytes))
    extra = 8 * nbytes - params.chal_bits
    if extra:
        c_bytes[-1] &= 0xFF >> extra
    return int.from_bytes(bytes(c_bytes), "little")


@dataclass
class Proof:
    """Equality proof; optionally carries a BP++ range proof on comm_g1."""
    eq: list                      # [ProofSingleRep] * num_reps
    params: EqParams
    rp: object = None             # bulletproofs_pp Proof or None

    @classmethod
    def new(cls, rng, witness: Fp, r1: Fp, r2: Fp,
            ck1: PedersenCommitmentKey, ck2: PedersenCommitmentKey,
            transcript: Transcript, params: EqParams = None) -> "Proof":
        params = params or EqParams()
        eq = cls._equality_proof_only(rng, witness, r1, r2, ck1, ck2,
                                      transcript, params)
        return cls(eq=eq, params=params)

    @classmethod
    def new_with_range_proof(cls, rng, witness: Fp, r1: Fp, r2: Fp,
                             ck1: PedersenCommitmentKey,
                             ck2: PedersenCommitmentKey, base: int,
                             comm_g1: Point, bpp_params: SetupParams,
                             transcript: Transcript,
                             params: EqParams = None) -> "Proof":
        params = params or EqParams()
        if params.wit_bits > 64:
            raise EqAcrossGroupsError("range proof limited to 64-bit")
        _ensure_bpp_gens(bpp_params, ck1)
        eq = cls._equality_proof_only(rng, witness, r1, r2, ck1, ck2,
                                      transcript, params)
        prover = BppProver(base, params.wit_bits, [comm_g1], [int(witness)],
                           [r1])
        rp = prover.prove(rng, bpp_params, transcript)
        return cls(eq=eq, params=params, rp=rp)

    @staticmethod
    def _equality_proof_only(rng, witness: Fp, r1: Fp, r2: Fp, ck1, ck2,
                             transcript: Transcript, params: EqParams):
        F1, F2 = r1.f, r2.f
        params.check_group_sizes(F1, F2)
        x = int(witness)
        if x >> params.wit_bits:
            raise EqAcrossGroupsError("witness bigger than expected")
        proofs = []
        while len(proofs) < params.num_reps:
            # abort-and-retry on a cloned transcript (rejection sampling)
            cur = transcript.clone()
            k = rng.getrandbits(params.resp_bits)
            k1, k2 = F1(k), F2(k)
            t1, t2 = F1.rand(rng), F2.rand(rng)
            k1_com = ck1.commit(k1, t1)
            k2_com = ck2.commit(k2, t2)
            c = _challenge_int(params, k1_com, k2_com, cur)
            z = k + c * x
            if z < params.min_resp or z > params.max_resp:
                continue          # abort this repetition
            transcript.replace_with(cur)
            s1 = t1 + F1(c) * r1
            s2 = t2 + F2(c) * r2
            proofs.append(ProofSingleRep(k1_com=k1_com, s1=s1,
                                         k2_com=k2_com, s2=s2, z=z))
        return proofs

    def verify(self, comm_g1: Point, comm_g2: Point,
               ck1: PedersenCommitmentKey, ck2: PedersenCommitmentKey,
               transcript: Transcript) -> bool:
        return self._verify_equality_only(self.eq, self.params, comm_g1,
                                          comm_g2, ck1, ck2, transcript)

    def verify_with_range_proof(self, comm_g1: Point, comm_g2: Point,
                                ck1: PedersenCommitmentKey,
                                ck2: PedersenCommitmentKey,
                                bpp_params: SetupParams,
                                transcript: Transcript) -> bool:
        if self.rp is None:
            return False
        _ensure_bpp_gens(bpp_params, ck1)
        if not self.verify(comm_g1, comm_g2, ck1, ck2, transcript):
            return False
        return self.rp.verify(self.params.wit_bits, [comm_g1], bpp_params,
                              transcript)

    @staticmethod
    def _verify_equality_only(eq, params: EqParams, comm_g1, comm_g2,
                              ck1, ck2, transcript: Transcript) -> bool:
        if len(eq) != params.num_reps:
            return False
        F1 = ck1.g.curve.scalar_field
        F2 = ck2.g.curve.scalar_field
        for rep in eq:
            if rep.z < params.min_resp or rep.z > params.max_resp:
                return False
            c = _challenge_int(params, rep.k1_com, rep.k2_com, transcript)
            if ck1.commit(F1(rep.z), rep.s1) != \
                    (rep.k1_com + comm_g1 * c).normalize():
                return False
            if ck2.commit(F2(rep.z), rep.s2) != \
                    (rep.k2_com + comm_g2 * c).normalize():
                return False
        return True


def decompose(x: int, chunk_bits: int, num_chunks: int):
    """Base-2^chunk_bits digits of x, little-endian (`decompose`)."""
    mask = (1 << chunk_bits) - 1
    out = []
    for _ in range(num_chunks):
        out.append(x & mask)
        x >>= chunk_bits
    if x:
        raise EqAcrossGroupsError("value too large for chunking")
    return out


def _ensure_bpp_gens(bpp_params: SetupParams, ck1: PedersenCommitmentKey):
    if bpp_params.G != ck1.g or bpp_params.H_vec[0] != ck1.h:
        raise EqAcrossGroupsError(
            "BP++ generators don't match commitment key")


@dataclass
class ProofLargeWitness:
    """Full-size witness via chunking; one aggregated BP++ range proof."""
    eq: list                      # list of per-chunk [ProofSingleRep]*reps
    comms_g1: list
    comms_g2: list
    rp: object
    params: EqParams
    chunk_bits: int
    num_chunks: int

    @classmethod
    def new(cls, rng, witness: Fp, r1: Fp, r2: Fp,
            ck1: PedersenCommitmentKey, ck2: PedersenCommitmentKey,
            base: int, bpp_params: SetupParams, transcript: Transcript,
            chunk_bits: int = 64, params: EqParams = None
            ) -> "ProofLargeWitness":
        F1, F2 = r1.f, r2.f
        num_chunks = (F1.p.bit_length() + chunk_bits - 1) // chunk_bits
        if num_chunks & (num_chunks - 1):
            raise EqAcrossGroupsError("num_chunks must be a power of two")
        if chunk_bits > 64:
            raise EqAcrossGroupsError("chunk size limited to 64 bits")
        params = params or EqParams(wit_bits=chunk_bits, chal_bits=180,
                                    abort_param=8, num_reps=1)
        w_chunks = decompose(int(witness), chunk_bits, num_chunks)
        r1_chunks = [F1(v) for v in decompose(int(r1), chunk_bits,
                                              num_chunks)]
        r2_chunks = [F2(v) for v in decompose(int(r2), chunk_bits,
                                              num_chunks)]
        comms_g1 = [ck1.commit(F1(w), r) for w, r in
                    zip(w_chunks, r1_chunks)]
        comms_g2 = [ck2.commit(F2(w), r) for w, r in
                    zip(w_chunks, r2_chunks)]
        eq = []
        for i in range(num_chunks):
            eq.append(Proof._equality_proof_only(
                rng, F1(w_chunks[i]), r1_chunks[i], r2_chunks[i], ck1, ck2,
                transcript, params))
        prover = BppProver(base, chunk_bits, list(comms_g1),
                           list(w_chunks), r1_chunks)
        rp = prover.prove(rng, bpp_params, transcript)
        return cls(eq=eq, comms_g1=comms_g1, comms_g2=comms_g2, rp=rp,
                   params=params, chunk_bits=chunk_bits,
                   num_chunks=num_chunks)

    def verify(self, comm_g1: Point, comm_g2: Point,
               ck1: PedersenCommitmentKey, ck2: PedersenCommitmentKey,
               bpp_params: SetupParams, transcript: Transcript) -> bool:
        _ensure_bpp_gens(bpp_params, ck1)
        F1 = ck1.g.curve.scalar_field
        F2 = ck2.g.curve.scalar_field
        for i in range(self.num_chunks):
            if not Proof._verify_equality_only(
                    self.eq[i], self.params, self.comms_g1[i],
                    self.comms_g2[i], ck1, ck2, transcript):
                return False
        # recombine: comm = sum 2^(b*i) * comm_i in both groups
        base_val = 1 << self.chunk_bits
        pows1 = powers(F1(base_val), self.num_chunks)
        pows2 = powers(F2(base_val), self.num_chunks)
        if msm(self.comms_g1, pows1).normalize() != comm_g1.normalize():
            return False
        if msm(self.comms_g2, pows2).normalize() != comm_g2.normalize():
            return False
        return self.rp.verify(self.chunk_bits, self.comms_g1, bpp_params,
                              transcript)
