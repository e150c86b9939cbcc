"""KOS15 actively-secure OT extension (reference
`oblivious_transfer/src/ot_extensions/kos_ote.rs`).

ALSZ/IKNP extension hardened with the KOS consistency check: the receiver
extends its choice vector with kappa + s random bits, and after sending U
both sides derive a random challenge matrix chi (XOF over U).  The
receiver reveals the random linear combinations
    x = XOR_i (choice_i ? chi_i : 0),   t = XOR_i (T_i AND chi_i)
and the sender verifies t == (XOR_i Q_i AND chi_i) XOR (x AND s) — a
cheating receiver that used inconsistent x in different U columns fails
this with overwhelming probability.

Also provides the correlated field-element transfer used by actively
secure multiplication: per OT i the sender holds alpha_i = (a, a') and
outputs t_A_i, sending tau_i = H(q_i XOR s) - H(q_i) + alpha_i; the
receiver outputs t_B_i with  t_A_i + t_B_i = choice_i * alpha_i.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from ..curves import bls12_381 as bls
from ..fields.host import Fp
from ..hashing import blake2b512, field_from_random_bytes_wide
from .ot_extension import OTEReceiver, OTESender, _transpose_bits
from .prg import KAPPA, bits_to_bytes, prg_bits

F = bls.Fr


class OTError(Exception):
    pass


@dataclass
class RLC:
    x: bytes
    t: bytes


def _gen_randomness(num_base: int, l_prime: int,
                    U_bytes: bytes) -> np.ndarray:
    """chi matrix via SHAKE-256 over U (reference `gen_randomness`)."""
    row_bytes = num_base // 8
    seed = num_base.to_bytes(4, "big") + l_prime.to_bytes(4, "big") + U_bytes
    out = hashlib.shake_256(seed).digest(l_prime * row_bytes)
    return np.frombuffer(out, dtype=np.uint8).reshape(l_prime, row_bytes)


def _rows_to_bytes(M_bits: np.ndarray) -> np.ndarray:
    """(n, kappa) bit rows -> (n, kappa/8) byte rows."""
    return np.packbits(M_bits, axis=1, bitorder="little")


def hash_to_field_pair(index: int, row: bytes) -> tuple:
    seed = index.to_bytes(4, "big") + row
    e0, _ = field_from_random_bytes_wide(F, blake2b512(b"KOS-OTE-0" + seed))
    e1, _ = field_from_random_bytes_wide(F, blake2b512(b"KOS-OTE-1" + seed))
    return e0, e1


@dataclass
class KOSReceiverSetup:
    choices: np.ndarray          # extended choices (l')
    T_rows: np.ndarray           # (l', ROW_BYTES) byte rows
    num_ot: int

    @classmethod
    def new(cls, rng, receiver: OTEReceiver, choices,
            statistical_security: int = 64):
        """Returns (setup, U bit-matrix to send, RLC to send)."""
        if statistical_security % 8:
            raise OTError("security parameter must be a multiple of 8")
        KAPPA = receiver.kappa
        base = np.asarray(choices, dtype=np.uint8)
        ext = np.array([rng.randrange(2)
                        for _ in range(KAPPA + statistical_security)],
                       dtype=np.uint8)
        x_all = np.concatenate([base, ext])
        l_prime = len(x_all)
        T = np.zeros((KAPPA, l_prime), dtype=np.uint8)
        U = np.zeros((KAPPA, l_prime), dtype=np.uint8)
        for i in range(KAPPA):
            k0, k1 = receiver.seed_pairs[i]
            t_i = prg_bits(k0, l_prime)
            U[i] = t_i ^ prg_bits(k1, l_prime) ^ x_all
            T[i] = t_i
        T_rows = _rows_to_bytes(_transpose_bits(T))
        U_bytes = _rows_to_bytes(U).tobytes()
        chi = _gen_randomness(KAPPA, l_prime, U_bytes)
        row_bytes = KAPPA // 8
        x = np.zeros(row_bytes, dtype=np.uint8)
        t = np.zeros(row_bytes, dtype=np.uint8)
        for i in range(l_prime):
            if x_all[i]:
                x ^= chi[i]
            t ^= T_rows[i] & chi[i]
        setup = cls(choices=x_all, T_rows=T_rows, num_ot=len(base))
        return setup, U, RLC(x=x.tobytes(), t=t.tobytes())

    def receive(self, tau: list) -> list:
        """Correlated transfer: returns t_B_i with
        t_A_i + t_B_i = choice_i * alpha_i (pairs of field elements)."""
        if len(tau) != self.num_ot:
            raise OTError("wrong number of correlations")
        out = []
        for i, (tau0, tau1) in enumerate(tau):
            h0, h1 = hash_to_field_pair(i, self.T_rows[i].tobytes())
            if self.choices[i]:
                out.append((tau0 - h0, tau1 - h1))
            else:
                out.append((-h0, -h1))
        return out


@dataclass
class KOSSenderSetup:
    Q_rows: np.ndarray           # (l', ROW_BYTES)
    s_row: np.ndarray            # (ROW_BYTES,) base choices as bytes
    num_ot: int

    @classmethod
    def new(cls, sender: OTESender, num_ot: int, U: np.ndarray, rlc: RLC,
            statistical_security: int = 64):
        if statistical_security % 8:
            raise OTError("security parameter must be a multiple of 8")
        KAPPA = sender.kappa
        row_bytes = KAPPA // 8
        l_prime = num_ot + KAPPA + statistical_security
        if U.shape != (KAPPA, l_prime):
            raise OTError("bad U shape")
        if len(rlc.x) != row_bytes or len(rlc.t) != row_bytes:
            raise OTError("bad RLC size")
        Q = np.zeros((KAPPA, l_prime), dtype=np.uint8)
        for i in range(KAPPA):
            qi = prg_bits(sender.seeds[i], l_prime)
            if sender.s_bits[i]:
                qi = qi ^ U[i]
            Q[i] = qi
        Q_rows = _rows_to_bytes(_transpose_bits(Q))
        U_bytes = _rows_to_bytes(U).tobytes()
        chi = _gen_randomness(KAPPA, l_prime, U_bytes)
        q = np.zeros(row_bytes, dtype=np.uint8)
        for i in range(l_prime):
            q ^= Q_rows[i] & chi[i]
        s_row = np.packbits(sender.s_bits, bitorder="little")
        x = np.frombuffer(rlc.x, dtype=np.uint8)
        if rlc.t != (q ^ (x & s_row)).tobytes():
            raise OTError("KOS consistency check failed")
        return cls(Q_rows=Q_rows, s_row=s_row, num_ot=num_ot)

    def transfer(self, alpha: list):
        """Returns (sender outputs t_A, correlation tags tau to send)."""
        if len(alpha) != self.num_ot:
            raise OTError("wrong number of correlations")
        t_A, tau = [], []
        for i, (a0, a1) in enumerate(alpha):
            q = self.Q_rows[i]
            h_q0, h_q1 = hash_to_field_pair(i, q.tobytes())
            h_s0, h_s1 = hash_to_field_pair(i, (q ^ self.s_row).tobytes())
            t_A.append((h_q0, h_q1))
            tau.append((h_s0 - h_q0 + a0, h_s1 - h_q1 + a1))
        return t_A, tau
