"""TZ21 verifiable encryption from MPC-in-the-head — DKG-in-the-head,
Protocol 4 (reference `verifiable_encryption/src/tz_21/{dkgith,seed_tree,encryption}.rs`,
paper 2021/1704).

Encrypts the openings (x_1..x_k) of a generalized Pedersen commitment
Y = sum G_i * x_i under a (batched hashed-)ElGamal public key, with a proof
that the ciphertext encrypts exactly the committed values.

Per repetition:
  * a GGM seed tree expands one root into N party seeds
  * party j's share of witness i and its ElGamal randomness derive from its
    seed; a per-witness delta fixes party 0's share so shares sum to x_i
  * commitments C_j = sum G_i * s_{i,j}; ciphertexts are batched ElGamal
  * Fiat-Shamir picks one party per repetition to HIDE; the proof reveals
    the seed-tree opening for all other leaves + the hidden party's
    ciphertext (its commitment is implied: C_hidden = Y - sum C_revealed
    - G*deltas when party 0 is revealed)
  * ciphertext compression: for a challenge-chosen subset of repetitions,
    revealed shares are summed into the hidden party's ciphertext,
    homomorphically producing an encryption of the witnesses themselves.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..serialize import ByteWriter, serialize_point
from ..utils.msm import msm
from ..utils.elgamal import (ElgamalPublicKey, ElgamalSecretKey,
                             _hash_shared_secret)

F = bls.Fr

SEED_SIZE = 16
SALT_SIZE = 32


# ---------------------------------------------------------------------------
# GGM seed tree (`seed_tree.rs`)
# ---------------------------------------------------------------------------

def _expand(seed: bytes, salt: bytes, rep: int, node: int) -> bytes:
    return hashlib.shake_256(
        b"seed-tree" + salt + rep.to_bytes(4, "little")
        + node.to_bytes(4, "little") + seed).digest(2 * SEED_SIZE)


class SeedTree:
    """Full binary tree with num_leaves (power of 2) leaves; node 0 = root."""

    def __init__(self, nodes: list, num_leaves: int):
        self.nodes = nodes
        self.num_leaves = num_leaves

    @classmethod
    def create(cls, root_seed: bytes, salt: bytes, rep: int,
               num_leaves: int) -> "SeedTree":
        total = 2 * num_leaves - 1
        nodes = [b""] * total
        nodes[0] = root_seed
        for i in range(num_leaves - 1):
            both = _expand(nodes[i], salt, rep, i)
            nodes[2 * i + 1] = both[:SEED_SIZE]
            nodes[2 * i + 2] = both[SEED_SIZE:]
        return cls(nodes, num_leaves)

    def leaf(self, j: int) -> bytes:
        return self.nodes[self.num_leaves - 1 + j]

    def open_all_but(self, hidden: int) -> list:
        """Sibling path covering every leaf except `hidden`."""
        path = []
        idx = self.num_leaves - 1 + hidden
        while idx > 0:
            sibling = idx + 1 if idx % 2 == 1 else idx - 1
            path.append(self.nodes[sibling])
            idx = (idx - 1) // 2
        return path

    @classmethod
    def reconstruct_leaves(cls, opening: list, hidden: int, salt: bytes,
                           rep: int, num_leaves: int) -> dict:
        """{leaf_index: seed} for all leaves except `hidden`."""
        total = 2 * num_leaves - 1
        nodes = [None] * total
        idx = num_leaves - 1 + hidden
        for sib_seed in opening:
            sibling = idx + 1 if idx % 2 == 1 else idx - 1
            nodes[sibling] = sib_seed
            idx = (idx - 1) // 2
        # expand everything derivable
        for i in range(num_leaves - 1):
            if nodes[i] is not None:
                both = _expand(nodes[i], salt, rep, i)
                nodes[2 * i + 1] = both[:SEED_SIZE]
                nodes[2 * i + 2] = both[SEED_SIZE:]
        out = {}
        for j in range(num_leaves):
            if j != hidden and nodes[num_leaves - 1 + j] is not None:
                out[j] = nodes[num_leaves - 1 + j]
        return out


# ---------------------------------------------------------------------------
# share / randomness derivation
# ---------------------------------------------------------------------------

def _share_from_seed(seed: bytes, wit_idx: int) -> Fp:
    d = hashlib.shake_256(b"tz21-share" + seed
                          + wit_idx.to_bytes(4, "little")).digest(64)
    return F(int.from_bytes(d, "little") % F.p)


def _eph_from_seed(seed: bytes) -> Fp:
    d = hashlib.shake_256(b"tz21-eph" + seed).digest(64)
    return F(int.from_bytes(d, "little") % F.p)


@dataclass
class BatchCt:
    """Batched hashed ElGamal: one ephemeral key, OTP per message index."""
    eph: Point
    cts: list  # [Fp]

    @classmethod
    def encrypt(cls, shares, eph_r: Fp, pk: ElgamalPublicKey, g: Point):
        shared = pk.y * int(eph_r)
        cts = [s + _hash_shared_secret(shared, i.to_bytes(4, "little"))
               for i, s in enumerate(shares)]
        return cls(eph=(g * int(eph_r)).normalize(), cts=cts)

    def decrypt(self, sk: ElgamalSecretKey):
        shared = self.eph * int(sk.x)
        return [c - _hash_shared_secret(shared, i.to_bytes(4, "little"))
                for i, c in enumerate(self.cts)]


# ---------------------------------------------------------------------------
# protocol
# ---------------------------------------------------------------------------

def _hidden_indices(challenge: bytes, reps: int, n_parties: int) -> list:
    out = []
    stream = hashlib.shake_256(b"tz21-hide" + challenge).digest(4 * reps)
    for r in range(reps):
        out.append(int.from_bytes(stream[4 * r:4 * r + 4], "little") % n_parties)
    return out


def _subset_indices(challenge: bytes, reps: int, subset: int) -> list:
    order = list(range(reps))
    stream = hashlib.shake_256(b"tz21-subset" + challenge).digest(4 * reps)
    order.sort(key=lambda r: stream[4 * r:4 * r + 4])
    return sorted(order[:subset])


@dataclass
class DkgithProof:
    salt: bytes
    challenge: bytes
    deltas: list           # [rep][wit] Fp
    openings: list         # [rep] tree opening
    hidden_cts: list       # [rep] BatchCt
    n_parties: int
    reps: int

    @classmethod
    def new(cls, rng, witnesses, Y: Point, gens, enc_pk: ElgamalPublicKey,
            enc_g: Point, n_parties: int = 8, reps: int = 16):
        import os
        k = len(witnesses)
        salt = os.urandom(SALT_SIZE)
        trees, all_deltas, all_cts, all_comms = [], [], [], []
        for rep in range(reps):
            tree = SeedTree.create(os.urandom(SEED_SIZE), salt, rep, n_parties)
            trees.append(tree)
            shares = [[_share_from_seed(tree.leaf(j), i)
                       for i in range(k)] for j in range(n_parties)]
            deltas = []
            for i in range(k):
                total = F(0)
                for j in range(n_parties):
                    total = total + shares[j][i]
                deltas.append(witnesses[i] - total)
            # effective share of party 0 includes delta
            eff0 = [shares[0][i] + deltas[i] for i in range(k)]
            cts = []
            comms = []
            for j in range(n_parties):
                sh = eff0 if j == 0 else shares[j]
                eph = _eph_from_seed(tree.leaf(j))
                cts.append(BatchCt.encrypt(sh, eph, enc_pk, enc_g))
                comms.append(msm(gens, sh).normalize())
            all_deltas.append(deltas)
            all_cts.append(cts)
            all_comms.append(comms)

        challenge = cls._transcript_challenge(salt, Y, all_comms, all_cts)
        hidden = _hidden_indices(challenge, reps, n_parties)
        openings = [trees[r].open_all_but(hidden[r]) for r in range(reps)]
        hidden_cts = [all_cts[r][hidden[r]] for r in range(reps)]
        return cls(salt=salt, challenge=challenge, deltas=all_deltas,
                   openings=openings, hidden_cts=hidden_cts,
                   n_parties=n_parties, reps=reps)

    @staticmethod
    def _transcript_challenge(salt, Y, all_comms, all_cts) -> bytes:
        h = hashlib.shake_256()
        h.update(b"tz21-dkgith")
        h.update(salt)
        h.update(serialize_point(Y))
        for comms in all_comms:
            for c in comms:
                h.update(serialize_point(c))
        for cts in all_cts:
            for ct in cts:
                h.update(serialize_point(ct.eph))
                for c in ct.cts:
                    h.update(c.to_bytes_le())
        return h.digest(32)

    def verify(self, Y: Point, gens, enc_pk: ElgamalPublicKey,
               enc_g: Point) -> bool:
        k = len(gens)
        hidden = _hidden_indices(self.challenge, self.reps, self.n_parties)
        all_comms, all_cts = [], []
        for rep in range(self.reps):
            leaves = SeedTree.reconstruct_leaves(
                self.openings[rep], hidden[rep], self.salt, rep,
                self.n_parties)
            if len(leaves) != self.n_parties - 1:
                return False
            comms = [None] * self.n_parties
            cts = [None] * self.n_parties
            acc = bls.G1.infinity()
            for j, seed in leaves.items():
                sh = [_share_from_seed(seed, i) for i in range(k)]
                if j == 0:
                    sh = [sh[i] + self.deltas[rep][i] for i in range(k)]
                comms[j] = msm(gens, sh).normalize()
                acc = acc + comms[j]
                cts[j] = BatchCt.encrypt(sh, _eph_from_seed(seed), enc_pk,
                                         enc_g)
            # hidden party's commitment implied by Y
            comms[hidden[rep]] = (Y - acc).normalize()
            cts[hidden[rep]] = self.hidden_cts[rep]
            all_comms.append(comms)
            all_cts.append(cts)
        expect = self._transcript_challenge(self.salt, Y, all_comms, all_cts)
        return expect == self.challenge

    def compress(self, subset_size: int = 4) -> "CompressedCiphertext":
        """Homomorphically fold revealed shares into the hidden ciphertexts
        for a challenge-chosen subset of repetitions."""
        k = len(self.deltas[0])
        hidden = _hidden_indices(self.challenge, self.reps, self.n_parties)
        subset = _subset_indices(self.challenge, self.reps, subset_size)
        out = []
        for rep in subset:
            leaves = SeedTree.reconstruct_leaves(
                self.openings[rep], hidden[rep], self.salt, rep,
                self.n_parties)
            sums = [F(0)] * k
            for j, seed in leaves.items():
                for i in range(k):
                    s = _share_from_seed(seed, i)
                    if j == 0:
                        s = s + self.deltas[rep][i]
                    sums[i] = sums[i] + s
            ct = self.hidden_cts[rep]
            folded = BatchCt(eph=ct.eph,
                             cts=[ct.cts[i] + sums[i] for i in range(k)])
            # if party 0 is the hidden one, its delta is inside its ct? No:
            # delta was folded into party 0's effective share at encryption.
            out.append(folded)
        return CompressedCiphertext(cts=out, subset=subset)


@dataclass
class CompressedCiphertext:
    cts: list
    subset: list

    def decrypt(self, sk: ElgamalSecretKey, Y: Point, gens) -> list:
        """Decrypt candidates; return the witnesses matching Y."""
        for ct in self.cts:
            cand = ct.decrypt(sk)
            if msm(gens, cand) == Y:
                return cand
        raise ValueError("no repetition decrypted to the committed opening")
