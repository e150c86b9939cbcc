"""Generalized Pedersen / Schnorr commitment over a vector of bases
(reference `schnorr_pok/src/pok_generalized_pedersen.rs:86-218`).

Prove knowledge of (x_1..x_n) with Y = sum_i G_i * x_i:
  T = sum G_i * r_i;  s_i = r_i + c * x_i;
  verify: sum G_i * s_i - Y*c == T   (one MSM).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from ..curves.sw import Point
from ..fields.host import Fp
from ..serialize import ByteWriter
from ..utils.msm import msm
from ..hashing import compute_random_oracle_challenge  # noqa: F401 (re-export)


@dataclass
class SchnorrCommitment:
    blindings: list
    t: Point

    @classmethod
    def new(cls, bases: Sequence[Point], blindings: Sequence[Fp]) -> "SchnorrCommitment":
        assert len(bases) == len(blindings)
        t = msm(list(bases), blindings).normalize()
        return cls(blindings=list(blindings), t=t)

    def response(self, witnesses: Sequence[Fp], challenge: Fp) -> "SchnorrResponse":
        assert len(witnesses) == len(self.blindings)
        return SchnorrResponse(
            [b + w * challenge for b, w in zip(self.blindings, witnesses)])

    def challenge_contribution(self, writer: ByteWriter) -> None:
        writer.point(self.t)


@dataclass
class SchnorrResponse:
    responses: list

    def is_valid(self, bases: Sequence[Point], y: Point, t: Point, challenge: Fp) -> bool:
        assert len(bases) == len(self.responses)
        lhs = msm(list(bases) + [y], list(self.responses) + [-challenge])
        return lhs == t

    def get_response(self, i: int) -> Fp:
        return self.responses[i]
