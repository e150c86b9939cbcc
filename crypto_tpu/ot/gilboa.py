"""Gilboa-style 2-party batch multiplication over OT extension
(the role of `dkls19_batch_mul_2p.rs` in the reference: additive shares of
a_t * b_t for batches of field-element pairs).

Party1 (OT-extension sender) holds a_t; Party2 (receiver) holds b_t.
For each multiplication t and bit position p of b_t:
  correlated OT with correlation a_t * 2^p:
    m0 = rho, m1 = rho + a_t*2^p; receiver selects by bit p of b_t.
  share2_t = sum_p received;  share1_t = -sum_p rho.
Then share1_t + share2_t = a_t * b_t.
"""

from __future__ import annotations

from ..curves import bls12_381 as bls
from ..fields.host import Fp
from .ot_extension import (OTESender, OTEReceiver, cot_sender_messages,
                           cot_receiver_decode)

import numpy as np

F = bls.Fr
NBITS = F.bits  # 255


def receiver_choices(b_values) -> np.ndarray:
    """Bit matrix of the receiver's inputs, LSB-first per value."""
    out = np.zeros(len(b_values) * NBITS, dtype=np.uint8)
    for t, b_val in enumerate(b_values):
        v = int(b_val)
        for p in range(NBITS):
            out[t * NBITS + p] = (v >> p) & 1
    return out


def batch_mul_party2_round1(ote_receiver: OTEReceiver, b_values):
    """Party2 (holds b): build OT-extension choices and the U matrix."""
    choices = receiver_choices(b_values)
    U, keys = ote_receiver.process(choices)
    return U, keys, choices


def batch_mul_party1(ote_sender: OTESender, a_values, U: np.ndarray):
    """Party1 (holds a): returns (messages to send, own shares)."""
    n = len(a_values)
    m = n * NBITS
    row_keys = ote_sender.process(m, U)
    correlations = []
    for t, a_val in enumerate(a_values):
        a_int = int(a_val)
        for p in range(NBITS):
            correlations.append(F((a_int << p) % F.p))
    msgs, rhos = cot_sender_messages(row_keys, correlations)
    shares = []
    for t in range(n):
        acc = F(0)
        for p in range(NBITS):
            acc = acc + rhos[t * NBITS + p]
        shares.append(-acc)
    return msgs, shares


def batch_mul_party2_round2(keys, choices, msgs, n: int):
    """Party2: decode and sum its shares."""
    received = cot_receiver_decode(keys, choices, msgs)
    shares = []
    for t in range(n):
        acc = F(0)
        for p in range(NBITS):
            acc = acc + received[t * NBITS + p]
        shares.append(acc)
    return shares
