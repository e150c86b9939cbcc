"""Secret sharing common types (reference `secret_sharing_and_dkg/src/common.rs`).

Share ids are 1-based u16s (id 0 forbidden: basis evaluated at 0).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves import bls12_381 as bls
from ..curves.sw import Point
from ..fields.host import Fp
from ..utils.msm import msm

F = bls.Fr


class SSError(Exception):
    pass


@dataclass
class Share:
    id: int
    threshold: int
    share: Fp


@dataclass
class Shares:
    shares: list  # list[Share]

    def ids(self):
        return [s.id for s in self.shares]


@dataclass
class CommitmentToCoefficients:
    points: list  # [g*a_0, g*a_1, ...] (or Pedersen commitments)

    def commitment_to_secret(self) -> Point:
        return self.points[0]


def lagrange_basis_at_0(x_coords, i: int) -> Fp:
    """l_i(0) over the given x-coordinates (`common.rs:420-445`)."""
    num, den = F(1), F(1)
    i_f = F(i)
    for x in x_coords:
        if x == 0:
            raise SSError("x-coordinate cannot be 0")
        if x == i:
            continue
        xf = F(x)
        num = num * xf
        den = den * (xf - i_f)
    return num * den.inverse()


def lagrange_basis_at_0_for_all(x_coords) -> list:
    return [lagrange_basis_at_0(x_coords, i) for i in x_coords]


def poly_eval_int(coeffs, x: int) -> Fp:
    acc = F(0)
    for c in reversed(coeffs):
        acc = acc * F(x) + c
    return acc


def commit_to_poly(g: Point, coeffs) -> CommitmentToCoefficients:
    return CommitmentToCoefficients([(g * int(c)).normalize() for c in coeffs])


def verify_share_against_commitments(share: Share,
                                     comms: CommitmentToCoefficients,
                                     g: Point) -> bool:
    """g*share == sum_j C_j * id^j (Feldman check, `common.rs` Share::verify)."""
    if len(comms.points) != share.threshold:
        return False
    powers = []
    acc = F(1)
    for _ in comms.points:
        powers.append(acc)
        acc = acc * F(share.id)
    lhs = (g * int(share.share)).normalize()
    rhs = msm(comms.points, powers).normalize()
    return lhs == rhs
