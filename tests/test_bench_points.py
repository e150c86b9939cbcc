"""bench.py's fixed-shape outer-sum point construction is correct: every
generated point equals dlog_fn(i) * G (spot-checked), so MSM benches run on
genuine distinct curve points."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_bench_points  # noqa: E402

from crypto_tpu.curves import bls12_381 as b  # noqa: E402
from crypto_tpu.curves.jcurve import jcurve_for  # noqa: E402


@pytest.mark.slow
def test_bench_points_match_dlogs(monkeypatch):
    n = 1 << 12
    jc = jcurve_for(b.G1)
    # CPU lane: the fused Pallas add/normalize kernels run in interpret mode
    from crypto_tpu.ops.pallas import curve_kernels as ck
    from crypto_tpu.ops.pallas import field_kernels as fk
    monkeypatch.setattr(ck, "_INTERPRET", True, raising=False)
    monkeypatch.setattr(fk, "_INTERPRET", True, raising=False)
    points, dlog = make_bench_points(b, jc, n, phase=lambda s: None)
    G = b.G1.generator()
    X = np.asarray(points.X)
    Y = np.asarray(points.Y)
    Z = np.asarray(points.Z)
    m2 = 1 if n // 64 <= 128 else (n // 64) // 128
    for i in (0, 1, m2, n // 64, n - 1):
        exp = jc.pack_points([G.mul_raw(dlog(i)).normalize()])
        assert np.array_equal(X[i], np.asarray(exp.X)[0]), f"X mismatch @{i}"
        assert np.array_equal(Y[i], np.asarray(exp.Y)[0]), f"Y mismatch @{i}"
        assert np.array_equal(Z[i], np.asarray(exp.Z)[0]), f"Z mismatch @{i}"
    # distinctness across the whole set (the fast-formula precondition)
    assert np.unique(X, axis=0).shape[0] == n
