"""Host-scheduled Pippenger MSM (`ops/pippenger.py`) vs host ground truth.

Mirrors the reference's MSM usage (arkworks `VariableBaseMSM::msm_bigint`,
e.g. `legogroth16/src/prover.rs:286-300`) — correctness incl. edge cases.
Runs on the CPU backend with the total-formula add path; the Pallas kernel
backend is exercised on real TPU by the driver bench.
"""

import random

import numpy as np
import pytest

from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.ops.pippenger import msm_pippenger, signed_digits, plan_window
from crypto_tpu.utils.msm import msm as msm_host


def test_signed_digits_roundtrip():
    rng = random.Random(0)
    sc = [rng.randrange(bls.R) for _ in range(50)] + [0, 1, bls.R - 1]
    for c in (5, 8, 16):
        d = signed_digits(sc, c, 255)
        rec = [int(sum(int(d[w, i]) << (c * w) for w in range(d.shape[0])))
               for i in range(len(sc))]
        assert rec == [s % bls.R for s in sc]
        assert np.abs(d).max() <= 1 << (c - 1)


def test_plan_window_add_count():
    # total adds = nonzero entries - nonempty buckets (Pippenger-optimal)
    rng = np.random.default_rng(0)
    digits = rng.integers(-32, 33, size=512).astype(np.int32)
    plan, _end = plan_window(digits, None, 7, 600)
    n_adds = sum(lv.n_pairs for lv in plan.levels)
    nonzero = int((digits != 0).sum())
    nonempty = len(np.unique(np.abs(digits[digits != 0])))
    assert n_adds == nonzero - nonempty


@pytest.mark.parametrize("n", [
    2, 9,
    pytest.param(1, marks=pytest.mark.slow),
    pytest.param(65, marks=pytest.mark.slow),
])
def test_msm_matches_host(n):
    rng = random.Random(n)
    pts = [bls.G1.rand(rng) for _ in range(n)]
    sc = [rng.randrange(bls.R) for _ in range(n)]
    sc[0] = 0
    if n > 4:
        pts[2] = bls.G1.infinity()
        pts[3] = -pts[4]
        sc[3] = sc[4]          # P + (-P) cancellation inside one bucket
    got = msm_pippenger(bls.G1, pts, sc, c=5)
    exp = msm_host(pts, [bls.Fr(s) for s in sc])
    assert got == exp


def test_msm_duplicate_points_degenerate_path():
    # duplicate bases with equal scalars force P+P pairs -> total-add fallback
    rng = random.Random(3)
    g = bls.G1.rand(rng)
    pts = [g, g, bls.G1.rand(rng)]
    sc = [12345, 12345, 999]
    got = msm_pippenger(bls.G1, pts, sc, c=5)
    exp = msm_host(pts, [bls.Fr(s) for s in sc])
    assert got == exp


def test_msm_all_zero_scalars():
    rng = random.Random(4)
    pts = [bls.G1.rand(rng) for _ in range(5)]
    assert msm_pippenger(bls.G1, pts, [0] * 5, c=5) == bls.G1.infinity()
