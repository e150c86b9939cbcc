"""DKLS18/DKLS19 actively-secure 2-party multiplication over KOS OT
extension (reference `oblivious_transfer/src/ot_based_multiplication/
{dkls18_mul_2p,dkls19_batch_mul_2p}.rs`).

Party1 holds alpha, Party2 holds beta; they end with additive shares of
alpha*beta.  Party2 encodes beta as choice bits against the GADGET vector
g = (1, 2, 4, ..., 2^{kappa-1}, eta_1..eta_{kappa+2s}) — the first kappa
bits are the binary decomposition of beta - <eta, gamma> for random pad
bits gamma, so <g, encoded> = beta while the pad statistically hides it.
Each correlated OT i yields t_A_i + t_B_i = choice_i * (alpha, alpha_hat);
shares are gadget-weighted sums of the first components.  Active security:
the (chi, chi_hat) random linear combination lets Party2 check Party1 used
ONE consistent alpha in every OT.

The batch (DKLS19) variant multiplies the same alpha against a batch of
betas, re-using one KOS extension across the whole batch."""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..fields.host import Fp
from ..hashing import blake2b512, field_elem_from_try_and_incr
from .kos_ote import KOSReceiverSetup, KOSSenderSetup, OTError
from .ot_extension import OTEReceiver, OTESender

F = bls.Fr
DEFAULT_KAPPA = 256
DEFAULT_SSP = 80


@dataclass
class MultiplicationOTEParams:
    kappa: int = DEFAULT_KAPPA
    ssp: int = DEFAULT_SSP     # statistical security parameter

    @property
    def num_extensions(self) -> int:
        return 2 * (self.kappa + self.ssp)

    @property
    def overhead(self) -> int:
        return self.kappa + 2 * self.ssp


@dataclass
class GadgetVector:
    params: MultiplicationOTEParams
    g: list

    @classmethod
    def new(cls, params: MultiplicationOTEParams, label: bytes,
            digest=blake2b512):
        g = [F(1)]
        for _ in range(params.kappa - 1):
            g.append(g[-1] + g[-1])
        for i in range(params.overhead):
            g.append(field_elem_from_try_and_incr(
                F, label + b"-" + i.to_bytes(4, "big"), digest))
        return cls(params=params, g=g)


def encode_beta(rng, beta: Fp, gadget: GadgetVector) -> list:
    """Choice bits with <g, bits> = beta (`dkls18_mul_2p.rs` `encode`)."""
    p = gadget.params
    gamma = [rng.randrange(2) for _ in range(p.overhead)]
    ip = F(0)
    for i, gm in enumerate(gamma):
        if gm:
            ip = ip + gadget.g[p.kappa + i]
    adjusted = int(beta - ip)
    bits = [(adjusted >> i) & 1 for i in range(p.kappa)]
    return bits + gamma


@dataclass
class Party1:
    """Holds alpha; acts as KOS extension SENDER."""
    alpha: Fp
    alpha_hat: Fp
    params: MultiplicationOTEParams
    ote_sender: OTESender

    @classmethod
    def new(cls, rng, alpha: Fp, ote_sender: OTESender,
            params: MultiplicationOTEParams = None):
        params = params or MultiplicationOTEParams()
        if ote_sender.kappa != params.kappa:
            raise OTError("base-OT count != kappa")
        return cls(alpha=alpha, alpha_hat=F.rand(rng), params=params,
                   ote_sender=ote_sender)

    def receive(self, U, kos_rlc, gadget: GadgetVector):
        """Consumes Party2's extension message; returns
        (share, tau to send, RLC to send)."""
        n = self.params.num_extensions
        setup = KOSSenderSetup.new(self.ote_sender, n, U, kos_rlc,
                                   statistical_security=self.params.ssp)
        correlations = [(self.alpha, self.alpha_hat)] * n
        t_A, tau = setup.transfer(correlations)
        chi, chi_hat = _chis(tau)
        r = [chi * a + chi_hat * ah for a, ah in t_A]
        u = chi * self.alpha + chi_hat * self.alpha_hat
        share = F(0)
        for i, (a, _) in enumerate(t_A):
            share = share + a * gadget.g[i]
        return share, tau, DklsRLC(r=r, u=u)


@dataclass
class DklsRLC:
    r: list
    u: Fp


def _chis(tau):
    buf = bytearray()
    for t0, t1 in tau:
        buf += t0.to_bytes_le() + t1.to_bytes_le()
    chi = field_elem_from_try_and_incr(F, b"chi" + bytes(buf))
    chi_hat = field_elem_from_try_and_incr(F, b"chi_hat" + bytes(buf))
    return chi, chi_hat


@dataclass
class Party2:
    """Holds beta; acts as KOS extension RECEIVER."""
    beta: Fp
    encoded_beta: list
    params: MultiplicationOTEParams
    kos_setup: KOSReceiverSetup

    @classmethod
    def new(cls, rng, beta: Fp, ote_receiver: OTEReceiver,
            gadget: GadgetVector,
            params: MultiplicationOTEParams = None):
        """Returns (party, U, kos_rlc) — the extension message for P1."""
        params = params or MultiplicationOTEParams()
        encoded = encode_beta(rng, beta, gadget)
        setup, U, rlc = KOSReceiverSetup.new(
            rng, ote_receiver, encoded, statistical_security=params.ssp)
        return cls(beta=beta, encoded_beta=encoded, params=params,
                   kos_setup=setup), U, rlc

    def receive(self, tau, rlc: DklsRLC, gadget: GadgetVector) -> Fp:
        """Checks Party1's consistency RLC; returns the share."""
        t_B = self.kos_setup.receive(tau)
        chi, chi_hat = _chis(tau)
        for i, ((b0, b1), r_i) in enumerate(zip(t_B, rlc.r)):
            u_j = rlc.u if self.encoded_beta[i] else F(0)
            if chi * b0 + chi_hat * b1 != u_j - r_i:
                raise OTError("DKLS consistency check failed")
        share = F(0)
        for i, (b0, _) in enumerate(t_B):
            share = share + b0 * gadget.g[i]
        return share


# ---------------------------------------------------------------------------
# DKLS19 batch multiplication: same alpha, many betas, one extension
# ---------------------------------------------------------------------------

def batch_mul_party2_round1(rng, betas: list, ote_receiver: OTEReceiver,
                            gadget: GadgetVector,
                            params: MultiplicationOTEParams = None):
    params = params or MultiplicationOTEParams()
    encodings = [encode_beta(rng, b, gadget) for b in betas]
    flat = [bit for enc in encodings for bit in enc]
    setup, U, rlc = KOSReceiverSetup.new(
        rng, ote_receiver, flat, statistical_security=params.ssp)
    return (encodings, setup), U, rlc


def batch_mul_party1(rng, alpha: Fp, num_betas: int, U, kos_rlc,
                     ote_sender: OTESender, gadget: GadgetVector,
                     params: MultiplicationOTEParams = None):
    params = params or MultiplicationOTEParams()
    n = params.num_extensions * num_betas
    setup = KOSSenderSetup.new(ote_sender, n, U, kos_rlc,
                               statistical_security=params.ssp)
    alpha_hat = F.rand(rng)
    t_A, tau = setup.transfer([(alpha, alpha_hat)] * n)
    chi, chi_hat = _chis(tau)
    r = [chi * a + chi_hat * ah for a, ah in t_A]
    u = chi * alpha + chi_hat * alpha_hat
    m = params.num_extensions
    shares = []
    for k in range(num_betas):
        acc = F(0)
        for i in range(m):
            acc = acc + t_A[k * m + i][0] * gadget.g[i]
        shares.append(acc)
    return shares, tau, DklsRLC(r=r, u=u)


def batch_mul_party2_round2(state, tau, rlc: DklsRLC,
                            gadget: GadgetVector,
                            params: MultiplicationOTEParams = None) -> list:
    params = params or MultiplicationOTEParams()
    encodings, setup = state
    t_B = setup.receive(tau)
    chi, chi_hat = _chis(tau)
    flat_bits = [bit for enc in encodings for bit in enc]
    for i, ((b0, b1), r_i) in enumerate(zip(t_B, rlc.r)):
        u_j = rlc.u if flat_bits[i] else F(0)
        if chi * b0 + chi_hat * b1 != u_j - r_i:
            raise OTError("DKLS batch consistency check failed")
    m = params.num_extensions
    shares = []
    for k in range(len(encodings)):
        acc = F(0)
        for i in range(m):
            acc = acc + t_B[k * m + i][0] * gadget.g[i]
        shares.append(acc)
    return shares
