"""Pedersen commitments to elliptic-curve points — one commitment per
affine coordinate (reference `equality_across_groups/src/ec/commitments.rs`).

A point on curve P (e.g. secp256r1) has coordinates in P's base field;
committing them requires a group C (e.g. Tom-256) whose SCALAR field equals
P's base field.  `point_coords_as_scalar_field_elements` enforces that
modulus equality (`commitments.rs:176-203`).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves.sw import Point
from ..fields.host import Fp
from ..utils.commitment import PedersenCommitmentKey


class EqAcrossGroupsError(Exception):
    pass


def point_coords_as_scalar_field_elements(point: Point, target_field):
    """(x, y) of `point` as elements of `target_field` (the committing
    group's scalar field); moduli must match exactly."""
    if point.curve.K.p != target_field.p:
        raise EqAcrossGroupsError("base field != committing scalar field")
    if point.is_infinity():
        raise EqAcrossGroupsError("cannot commit to the point at infinity")
    x, y = point.to_affine()
    return target_field(int(x)), target_field(int(y))


def from_base_field_to_scalar_field(c, target_field) -> Fp:
    """Base-field element as a scalar of the other group (mod reduction)."""
    return target_field(int(c))


@dataclass
class CommitmentWithOpening:
    """comm = g*value + h*randomness, with the opening retained."""
    comm: Point
    value: Fp
    randomness: Fp

    @classmethod
    def new(cls, rng, value: Fp, ck: PedersenCommitmentKey):
        r = value.f.rand(rng)
        return cls.new_given_randomness(value, r, ck)

    @classmethod
    def new_given_randomness(cls, value: Fp, randomness: Fp,
                             ck: PedersenCommitmentKey):
        return cls(comm=ck.commit(value, randomness), value=value,
                   randomness=randomness)


@dataclass
class PointCommitment:
    """Pair of commitments, one per coordinate."""
    x: Point
    y: Point

    def __add__(self, o: "PointCommitment") -> "PointCommitment":
        return PointCommitment(x=(self.x + o.x).normalize(),
                               y=(self.y + o.y).normalize())

    def __sub__(self, o: "PointCommitment") -> "PointCommitment":
        return PointCommitment(x=(self.x - o.x).normalize(),
                               y=(self.y - o.y).normalize())

    def __eq__(self, o) -> bool:
        return self.x == o.x and self.y == o.y


@dataclass
class PointCommitmentWithOpening:
    """Coordinates + per-coordinate randomness + the commitment pair."""
    x: Fp
    r_x: Fp
    y: Fp
    r_y: Fp
    comm: PointCommitment

    @classmethod
    def new(cls, rng, point: Point, ck: PedersenCommitmentKey):
        F = ck.g.curve.scalar_field
        return cls.new_given_randomness(point, F.rand(rng), F.rand(rng), ck)

    @classmethod
    def new_given_randomness(cls, point: Point, r_x: Fp, r_y: Fp,
                             ck: PedersenCommitmentKey):
        F = ck.g.curve.scalar_field
        x, y = point_coords_as_scalar_field_elements(point, F)
        return cls.new_given_randomness_and_coords(x, y, r_x, r_y, ck)

    @classmethod
    def new_given_randomness_and_coords(cls, x: Fp, y: Fp, r_x: Fp, r_y: Fp,
                                        ck: PedersenCommitmentKey):
        return cls(x=x, r_x=r_x, y=y, r_y=r_y,
                   comm=PointCommitment(x=ck.commit(x, r_x),
                                        y=ck.commit(y, r_y)))

    def __add__(self, o) -> "PointCommitmentWithOpening":
        return PointCommitmentWithOpening(
            x=self.x + o.x, r_x=self.r_x + o.r_x,
            y=self.y + o.y, r_y=self.r_y + o.r_y,
            comm=self.comm + o.comm)

    def __sub__(self, o) -> "PointCommitmentWithOpening":
        return PointCommitmentWithOpening(
            x=self.x - o.x, r_x=self.r_x - o.r_x,
            y=self.y - o.y, r_y=self.r_y - o.r_y,
            comm=self.comm - o.comm)
