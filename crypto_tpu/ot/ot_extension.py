"""ALSZ OT extension (IKNP-style; reference
`oblivious_transfer/src/ot_extensions/alsz_ote.rs`) with the KOS
consistency check (`kos_ote.rs`) as an optional layer.

Roles (note the reversal): the extension SENDER was the base-OT RECEIVER
(it knows s in {0,1}^kappa and seeds k_i^{s_i}); the extension RECEIVER was
the base-OT SENDER (it knows all seed pairs).

Receiver (choices x in {0,1}^m):
  t_i = PRG(k_i^0, m),  u_i = t_i XOR PRG(k_i^1, m) XOR x   -> send U
Sender:
  q_i = PRG(k_i^{s_i}, m) XOR s_i * u_i;  rows q_j satisfy
  q_j = t_j XOR (x_j * s).  Keys: sender (H(j,q_j), H(j,q_j XOR s));
  receiver H(j,t_j) = the choice key.

The bit-matrix transpose (the reference's C/SSE component,
`oblivious_transfer/c/transpose.c`) is a numpy packbits-axis transpose here;
a native kernel can replace it transparently.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .prg import KAPPA, prg_bits, hash_key, key_to_field, bits_to_bytes
from ..curves import bls12_381 as bls
from ..fields.host import Fp

F = bls.Fr


def _transpose_bits(M: np.ndarray) -> np.ndarray:
    """Bit-matrix transpose; routes to the C++ kernel when shapes allow
    (the reference's `oblivious_transfer/c/transpose.c` slot)."""
    rows, cols = M.shape
    if rows % 8 == 0 and cols % 8 == 0:
        try:
            from ..native import bit_transpose_native
            out = bit_transpose_native(M, rows, cols)
            if out is not None:
                return out
        except Exception:
            pass
    return M.T.copy()


@dataclass
class OTESender:
    """Extension sender; holds base choices s and seeds k_i^{s_i}."""
    s_bits: np.ndarray           # (kappa,) 0/1
    seeds: list                  # kappa seeds (16B each)

    @classmethod
    def from_base(cls, base_choices, base_keys):
        return cls(s_bits=np.asarray(base_choices, dtype=np.uint8),
                   seeds=list(base_keys))

    @property
    def kappa(self) -> int:
        return len(self.seeds)

    def process(self, m: int, U: np.ndarray):
        """U: (kappa, m) bit matrix from receiver. Returns row keys:
        [(k0_j, k1_j)] for j < m."""
        KAPPA = self.kappa
        Q = np.zeros((KAPPA, m), dtype=np.uint8)
        for i in range(KAPPA):
            qi = prg_bits(self.seeds[i], m)
            if self.s_bits[i]:
                qi = qi ^ U[i]
            Q[i] = qi
        Qt = _transpose_bits(Q)  # (m, kappa)
        s_row = self.s_bits
        out = []
        for j in range(m):
            qj = Qt[j]
            out.append((hash_key(bits_to_bytes(qj), j),
                        hash_key(bits_to_bytes(qj ^ s_row), j)))
        return out


@dataclass
class OTEReceiver:
    """Extension receiver; holds all base seed pairs."""
    seed_pairs: list             # kappa pairs (k0, k1)

    @property
    def kappa(self) -> int:
        return len(self.seed_pairs)

    def process(self, choices: np.ndarray):
        """choices: (m,) bits. Returns (U matrix to send, derived keys)."""
        m = len(choices)
        KAPPA = self.kappa
        x = np.asarray(choices, dtype=np.uint8)
        T = np.zeros((KAPPA, m), dtype=np.uint8)
        U = np.zeros((KAPPA, m), dtype=np.uint8)
        for i in range(KAPPA):
            k0, k1 = self.seed_pairs[i]
            t_i = prg_bits(k0, m)
            U[i] = t_i ^ prg_bits(k1, m) ^ x
            T[i] = t_i
        Tt = _transpose_bits(T)
        keys = [hash_key(bits_to_bytes(Tt[j]), j) for j in range(m)]
        return U, keys


def setup_ote_pair(rng, g, seed_rng=None, kappa: int = KAPPA):
    """In-process base-OT phase for one ordered pair: returns
    (OTESender for party A, OTEReceiver for party B)."""
    from .base_ot import do_base_ots
    import random as _random
    r = seed_rng or rng
    base_choices = [r.randrange(2) for _ in range(kappa)]
    pairs, chosen = do_base_ots(rng, g, base_choices)
    # party B was base-OT sender (has pairs) -> becomes extension receiver
    # party A was base-OT receiver (has chosen keys) -> extension sender
    return OTESender.from_base(base_choices, chosen), OTEReceiver(pairs)


# ---------------------------------------------------------------------------
# correlated OT of field elements (for Gilboa multiplication)
# ---------------------------------------------------------------------------

def cot_sender_messages(row_keys, correlations):
    """Sender: for OT j with correlation c_j, pick rho_j = OTP(k0) and send
    the single pad d_j = rho_j + c_j + OTP(k1)... transmitted values:
    (e0_j, e1_j) = (rho_j - OTP-free?, ...).  We use the standard OTP form:
      e0_j = m0_j + H(k0_j),  e1_j = m1_j + H(k1_j)
    with m0_j random rho_j and m1_j = rho_j + c_j.
    Returns (pairs to send, [-sum rho] contribution per caller grouping)."""
    msgs = []
    rhos = []
    for j, ((k0, k1), corr) in enumerate(zip(row_keys, correlations)):
        rho = key_to_field(k0, b"rho")     # sender-only derivation
        m0 = rho
        m1 = rho + corr
        e0 = m0 + key_to_field(k0)
        e1 = m1 + key_to_field(k1)
        msgs.append((e0, e1))
        rhos.append(rho)
    return msgs, rhos


def cot_receiver_decode(keys, choices, msgs):
    """Receiver: decrypt the chosen pad per OT."""
    out = []
    for j, (key, c, (e0, e1)) in enumerate(zip(keys, choices, msgs)):
        e = e1 if c else e0
        out.append(e - key_to_field(key))
    return out
