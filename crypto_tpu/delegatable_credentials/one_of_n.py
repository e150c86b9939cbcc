"""One-of-N discrete-log proof (reference
`delegatable_credentials/src/one_of_n_proof.rs`): prove an instance
sequence (b'_1..b'_m) in G2 equals witness * one of N public sequences,
without revealing which.  Ring structure: the per-branch challenges z_i
are group elements P1*c_i summing to the SRS point P1*z; decoy branches
use simulated (c_i, d_i), the real branch's challenge is forced by the
sum constraint."""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..serialize import serialize_point

F = bls.Fr


class OneOfNError(Exception):
    pass


def _map_key(pk_seq) -> bytes:
    return b"".join(serialize_point(p) for p in pk_seq)


@dataclass
class OneOfNSrs:
    Z: Point  # P1 * z

    @classmethod
    def new(cls, rng, P1: Point):
        z = F.rand(rng)
        return cls(Z=(P1 * int(z)).normalize()), z


@dataclass
class OneOfNProof:
    z: list
    d: list
    a: list   # per branch: list of G2 points

    @classmethod
    def new(cls, rng, actual: list, decoys: list, instance: list,
            witness: Fp, srs: OneOfNSrs, P1: Point) -> "OneOfNProof":
        if len(actual) != len(instance):
            raise OneOfNError("sequence length mismatch")
        m = len(actual)
        entries = {_map_key(actual): (0, actual)}
        for i, pk in enumerate(decoys):
            if len(pk) != m:
                raise OneOfNError("decoy length mismatch")
            entries[_map_key(pk)] = (i + 1, pk)
        s = F.rand(rng)
        rand_chals = [F.rand(rng) for _ in range(len(decoys))]
        z, d, a = [], [], []
        actual_at = 0
        for _, (i, pk) in sorted(entries.items()):
            if i == 0:
                actual_at = len(a)
                a.append([(p * int(s)).normalize() for p in pk])
                d.append(None)
                z.append(None)
            else:
                d_i = F.rand(rng)
                c_i = rand_chals[i - 1]
                a.append([(b * int(d_i) - bp * int(c_i)).normalize()
                          for b, bp in zip(pk, instance)])
                z.append((P1 * int(c_i)).normalize())
                d.append((P1 * int(d_i)).normalize())
        chal_sum = F(0)
        for c in rand_chals:
            chal_sum = chal_sum + c
        z[actual_at] = (srs.Z - P1 * int(chal_sum)).normalize()
        d[actual_at] = (z[actual_at] * int(witness)
                        + P1 * int(s)).normalize()
        return cls(z=z, d=d, a=a)

    def verify(self, possible: list, instance: list, srs: OneOfNSrs,
               P1: Point) -> bool:
        n = len(possible)
        if len(self.a) != n or len(self.d) != n or len(self.z) != n:
            return False
        acc = bls.G1.infinity()
        for zi in self.z:
            acc = acc + zi
        if acc.normalize() != srs.Z:
            return False
        ordered = [pk for _, pk in
                   sorted((_map_key(pk), pk) for pk in possible)]
        for i, pk in enumerate(ordered):
            if len(pk) != len(instance):
                return False
            for j in range(len(pk)):
                ok = bls.multi_pairing([
                    ((-self.d[i]).normalize(), pk[j]),
                    (self.z[i], instance[j]),
                    (P1, self.a[i][j]),
                ]).is_one()
                if not ok:
                    return False
        return True
