"""ABCP20 hash-based distributed key generation (reference
`secret_sharing_and_dkg/src/abcp_dkg.rs`; "Aggregatable Distributed Key
Generation"-adjacent scheme from the ABCP paper).

Two broadcast rounds per participant:
  round 1: deal a Shamir sharing f of a fresh secret, commit to every
    share twice — C'_i = H(share_i, y'_i) and C_i = H(comm_key*b(i), y_i)
    for a masking polynomial b — plus C_0 = H(pk_gen*b_0, y_0) and
    C'_0 = H(pk_gen + h, y'_0) binding the public key h = pk_gen*secret.
    Broadcast the commitments with response polynomial r = b - d*f.
  round 2: broadcast (h, y_0, y'_0); privately send each party its
    (share_i, y_i, y'_i).  Receivers recompute all four hash commitments
    (using r(i) + share_i*d = b(i)) before accepting.
Final: threshold public key = sum of all participants' h."""

from __future__ import annotations

from dataclasses import dataclass, field

from ..curves.sw import Point
from ..fields.host import Fp
from ..hashing import blake2b512, compute_random_oracle_challenge
from ..serialize import serialize_point
from ..utils.ff import poly_eval
from .common import SSError
from .schemes import shamir_deal_secret

DOMAIN_SEPARATOR = b"abcp_dkg"
SALT_SIZE = 32


def hash_commitment(msg, salt: bytes, digest=blake2b512) -> bytes:
    if isinstance(msg, Point):
        data = serialize_point(msg)
    else:
        data = msg.to_bytes_le()
    return digest(data + DOMAIN_SEPARATOR + salt)


@dataclass
class VerifiableShare:
    id: int
    threshold: int
    share: Fp
    blinding: bytes
    blinding_prime: bytes


@dataclass
class Round1Msg:
    sender_id: int
    C: list
    C_prime: list
    C_0: bytes
    C_0_prime: bytes
    resp: list             # polynomial r = b - d*f


@dataclass
class Round2Msg:
    sender_id: int
    h: Point
    y_0: bytes
    y_0_prime: bytes


def _round1_challenge(comm_key: Point, C_0, C_0_prime, C, C_prime, F,
                      digest):
    buf = bytearray(serialize_point(comm_key))
    buf += C_0
    buf += C_0_prime
    for c, cp in zip(C, C_prime):
        buf += c
        buf += cp
    return compute_random_oracle_challenge(F, bytes(buf), digest)


@dataclass
class Round1:
    id: int
    threshold: int
    secret: Fp
    h: Point
    shares: list           # [VerifiableShare] to distribute
    y_0: bytes
    y_0_prime: bytes
    received_msgs: dict = field(default_factory=dict)

    @classmethod
    def start(cls, rng, participant_id: int, threshold: int, total: int,
              comm_key: Point, pk_gen: Point, digest=blake2b512):
        if participant_id == 0 or participant_id > total:
            raise SSError("invalid participant id")
        F = comm_key.curve.scalar_field
        secret = F.rand(rng)
        shares, f = shamir_deal_secret(rng, secret, threshold, total)
        b = [F.rand(rng) for _ in range(threshold)]
        salts = lambda: bytes(rng.getrandbits(8) for _ in range(SALT_SIZE))
        y = [salts() for _ in range(total)]
        y_prime = [salts() for _ in range(total)]
        y_0, y_0_prime = salts(), salts()
        h = (pk_gen * int(secret)).normalize()
        C_0 = hash_commitment(pk_gen * int(b[0]), y_0, digest)
        C_0_prime = hash_commitment((pk_gen + h).normalize(), y_0_prime,
                                    digest)
        C = [hash_commitment(comm_key * int(poly_eval(b, F(i + 1))), y[i],
                             digest) for i in range(total)]
        C_prime = [hash_commitment(shares.shares[i].share, y_prime[i],
                                   digest) for i in range(total)]
        d = _round1_challenge(comm_key, C_0, C_0_prime, C, C_prime, F,
                              digest)
        r = [b_c - d * f_c for b_c, f_c in zip(b, f)]
        msg = Round1Msg(sender_id=participant_id, C=C, C_prime=C_prime,
                        C_0=C_0, C_0_prime=C_0_prime, resp=r)
        vshares = [VerifiableShare(id=s.id, threshold=threshold,
                                   share=s.share, blinding=y[i],
                                   blinding_prime=y_prime[i])
                   for i, s in enumerate(shares.shares)]
        return cls(id=participant_id, threshold=threshold, secret=secret,
                   h=h, shares=vshares, y_0=y_0, y_0_prime=y_0_prime), msg

    def add_received_message(self, msg: Round1Msg):
        if msg.sender_id == self.id:
            raise SSError("sender == receiver")
        if msg.sender_id in self.received_msgs:
            raise SSError("already processed")
        if len(msg.resp) != self.threshold:
            raise SSError("bad threshold")
        if len(msg.C) != len(msg.C_prime) or len(msg.C) != len(self.shares):
            raise SSError("bad commitment count")
        self.received_msgs[msg.sender_id] = msg

    def finish(self):
        if self.threshold > len(self.received_msgs) + 1:
            raise SSError("below threshold")
        msg = Round2Msg(sender_id=self.id, h=self.h, y_0=self.y_0,
                        y_0_prime=self.y_0_prime)
        return Round2(round1_state=self), msg


@dataclass
class Round2:
    round1_state: Round1
    received_msgs: dict = field(default_factory=dict)
    received_shares: dict = field(default_factory=dict)

    def add_received_message(self, msg: Round2Msg):
        if msg.sender_id == self.round1_state.id:
            raise SSError("sender == receiver")
        if msg.sender_id in self.received_msgs:
            raise SSError("already processed")
        if msg.sender_id not in self.round1_state.received_msgs:
            raise SSError("not in round 1")
        self.received_msgs[msg.sender_id] = msg

    def add_received_share(self, sender_id: int, share: VerifiableShare,
                           comm_key: Point, pk_gen: Point,
                           digest=blake2b512):
        if sender_id == self.round1_state.id:
            raise SSError("sender == receiver")
        if share.id != self.round1_state.id:
            raise SSError("share id != my id")
        if sender_id in self.received_shares:
            raise SSError("already processed")
        self.verify_share(sender_id, share, comm_key, pk_gen, digest)
        self.received_shares[sender_id] = share

    def verify_share(self, sender_id: int, share: VerifiableShare,
                     comm_key: Point, pk_gen: Point, digest=blake2b512):
        r1 = self.round1_state.received_msgs.get(sender_id)
        if r1 is None:
            raise SSError("no round1 message from sender")
        r2 = self.received_msgs.get(sender_id)
        if r2 is None:
            raise SSError("no round2 message from sender")
        F = comm_key.curve.scalar_field
        idx = self.round1_state.id - 1
        if hash_commitment(share.share, share.blinding_prime, digest) != \
                r1.C_prime[idx]:
            raise SSError("invalid share (C')")
        if hash_commitment((pk_gen + r2.h).normalize(), r2.y_0_prime,
                           digest) != r1.C_0_prime:
            raise SSError("invalid share (C_0')")
        d = _round1_challenge(comm_key, r1.C_0, r1.C_0_prime, r1.C,
                              r1.C_prime, F, digest)
        h_prime = (pk_gen * int(r1.resp[0]) + r2.h * int(d)).normalize()
        if r1.C_0 != hash_commitment(h_prime, r2.y_0, digest):
            raise SSError("invalid share (C_0)")
        b_i = poly_eval(r1.resp, F(self.round1_state.id)) + share.share * d
        if r1.C[idx] != hash_commitment(comm_key * int(b_i), share.blinding,
                                        digest):
            raise SSError("invalid share (C)")

    def finish(self):
        """Returns (own secret, own h, threshold public key)."""
        st = self.round1_state
        if st.threshold > len(self.received_msgs) + 1:
            raise SSError("below threshold")
        if len(self.received_shares) != len(st.received_msgs):
            raise SSError("missing shares")
        tpk = st.h
        for m in self.received_msgs.values():
            tpk = tpk + m.h
        return st.secret, st.h, tpk.normalize()
