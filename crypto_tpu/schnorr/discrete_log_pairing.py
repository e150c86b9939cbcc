"""Schnorr PoK of a GROUP-element witness inside a pairing (reference
`schnorr_pok/src/discrete_log_pairing.rs`): prove knowledge of W in G1
with Y = e(W, Z) for public Z in G2.  The blinding is a random G1 point B;
t = e(B, Z), response = B + W*c, check e(response, Z) == t * Y^c."""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..serialize import ByteWriter


@dataclass
class PoKG1DiscreteLogInPairingProtocol:
    witness: Point
    blinding: Point
    t: object              # GT

    @classmethod
    def init(cls, witness: Point, blinding: Point, Z: Point):
        return cls(witness=witness, blinding=blinding,
                   t=bls.pairing(blinding, Z))

    def challenge_contribution(self, Z: Point, Y, writer: ByteWriter):
        writer.point(Z)
        writer.write(Y.to_bytes_le())
        writer.write(self.t.to_bytes_le())

    def gen_proof(self, challenge: Fp) -> "PoKG1DiscreteLogInPairing":
        return PoKG1DiscreteLogInPairing(
            t=self.t,
            response=(self.blinding
                      + self.witness * int(challenge)).normalize())


@dataclass
class PoKG1DiscreteLogInPairing:
    t: object
    response: Point

    def challenge_contribution(self, Z: Point, Y, writer: ByteWriter):
        writer.point(Z)
        writer.write(Y.to_bytes_le())
        writer.write(self.t.to_bytes_le())

    def verify(self, Y, Z: Point, challenge: Fp) -> bool:
        return bls.pairing(self.response, Z) == \
            self.t * (Y ** int(challenge))
