"""Device-scheduled batched-affine MSM (ops/msm_v2.py) vs host ground truth.

Reference parity anchor: arkworks `VariableBaseMSM::msm_bigint`
(`legogroth16/src/prover.rs:286-300`).
"""

import random

import numpy as np
import pytest

from crypto_tpu.curves import bls12_381 as b
from crypto_tpu.fields.jfield import jfield_for
from crypto_tpu.ops import msm_v2

rng = random.Random(21)
F = jfield_for(b.Fq)


def test_batch_inv():
    vals = [b.Fq.rand(rng) for _ in range(8)]
    packed = F.pack([int(v) for v in vals])
    got = F.unpack_host(msm_v2.batch_inv(F, packed))
    for v, g in zip(vals, got):
        assert g == v.inverse()


def test_affine_pair_add_total():
    from crypto_tpu.ops.msm_v2 import AffinePoints, affine_pair_add
    P1 = b.G1.rand(rng).normalize()
    P2 = b.G1.rand(rng).normalize()
    cases = [
        (P1, P2, P1 + P2),               # generic
        (P1, P1, P1.double()),           # double
        (P1, -P1, b.G1.infinity()),      # inverse -> inf
        (b.G1.infinity(), P2, P2),       # left inf
        (P1, b.G1.infinity(), P1),       # right inf
        (b.G1.infinity(), b.G1.infinity(), b.G1.infinity()),
        (P2, P2, P2.double()),           # pad to pow2 batch
        (P1, P2.double(), P1 + P2.double()),
    ]

    def pack(pts):
        xs, ys, infs = [], [], []
        for p in pts:
            if p.is_infinity():
                xs.append(0); ys.append(0); infs.append(True)
            else:
                x, y = p.to_affine()
                xs.append(int(x)); ys.append(int(y)); infs.append(False)
        import jax.numpy as jnp
        return AffinePoints(F.pack(xs), F.pack(ys), jnp.asarray(np.array(infs)))

    A = pack([c[0] for c in cases])
    B = pack([c[1] for c in cases])
    out = affine_pair_add(F, A, B)
    xs = F.unpack_host(out.x)
    ys = F.unpack_host(out.y)
    infs = np.asarray(out.inf)
    for i, (_, _, expect) in enumerate(cases):
        if expect.is_infinity():
            assert bool(infs[i]), f"case {i}: expected infinity"
        else:
            ex, ey = expect.to_affine()
            assert not bool(infs[i]), f"case {i}: unexpected infinity"
            assert xs[i] == ex and ys[i] == ey, f"case {i} mismatch"


@pytest.mark.parametrize("n", [200])
def test_msm_v2_vs_host(n):
    # n=200 exercises the ragged pow2-padding path; the pow2 case rides the
    # same programs (dropped from the default lane: on the 4-core CI box
    # each eager-dispatch MSM costs ~1-3 min of wall clock)
    pts = [b.G1.rand(rng).normalize() for _ in range(n)]
    pts[3] = b.G1.infinity()
    # 32-bit scalars keep the eager CPU run fast (4 windows, not 32);
    # full-width digit extraction is covered by test_device_digits below
    # and full-width windows by test_engine_cross_check_v1_v2
    scs = [rng.randrange(0, 1 << 32) for _ in range(n)]
    scs[5] = 0
    got = msm_v2.msm_device_scheduled(b.G1, pts, scs, c=8, nbits=32)
    exp = b.G1.infinity()
    for p, s in zip(pts, scs):
        exp = exp + p * s
    assert got.normalize() == exp.normalize()


def test_msm_v2_duplicate_points():
    """Duplicate bases in one bucket exercise the unified double path."""
    p0 = b.G1.rand(rng).normalize()
    pts = [p0] * 8
    scs = [7] * 8     # same digit -> same bucket -> P+P pairs
    got = msm_v2.msm_device_scheduled(b.G1, pts, scs, c=8)
    exp = p0 * (7 * 8)
    assert got.normalize() == exp.normalize()


def test_device_digits_matches_host():
    import jax.numpy as jnp
    from crypto_tpu.ops.pippenger import signed_digits, scalars_to_bytes
    scs = [rng.randrange(0, int(b.Fr.p)) for _ in range(16)]
    nbits = 255
    c = 16
    W = (nbits + c) // c
    nbytes = (W * c + 7) // 8
    sb = scalars_to_bytes(scs, nbytes)
    host = signed_digits(scs, c, nbits)
    dev = np.asarray(msm_v2.device_digits(jnp.asarray(sb), c, nbits))
    assert (host == dev).all()


def test_engine_cross_check_v1_v2():
    """Same MSM through the host-scheduled v1 engine, the device-scheduled
    v2 engine and the host ground truth."""
    from crypto_tpu.ops.pippenger import msm_pippenger
    n = 48
    pts = [b.G1.rand(rng).normalize() for _ in range(n)]
    scs = [rng.randrange(0, 1 << 64) for _ in range(n)]
    v2 = msm_v2.msm_device_scheduled(b.G1, pts, scs, c=8, nbits=64)
    v1 = msm_pippenger(b.G1, pts, scs, c=8, nbits=64)
    exp = b.G1.infinity()
    for p, s in zip(pts, scs):
        exp = exp + p * s
    assert v2.normalize() == exp.normalize()
    assert v1.normalize() == exp.normalize()


def test_msm_cost_model():
    """Analytic work counters (SURVEY §5.5 metrics): slot count must match
    the band layout exactly and the mul count the documented 6-muls/add
    fast formula + tail estimate."""
    from crypto_tpu.ops.msm_v2 import _model_bands
    from crypto_tpu.utils.metrics import msm_cost_model
    N, c = 1 << 20, 16
    bands, _occ = _model_bands(N, c)
    m = msm_cost_model(N, c, bands, W=16, L=26, fast=True)
    assert m["slots"] == sum(Q * h for (Q, h, _) in bands)
    assert 1.0 < m["slots_per_point"] < 1.5
    per_window_adds = m["pair_adds"] // 16
    assert m["slots"] - (1 << 15) - len(bands) * (1 << 15) \
        <= per_window_adds <= m["slots"]
    assert m["field_muls"] == 16 * (per_window_adds * 6 + 2 * (1 << 15))
    assert m["gather_bytes"] == m["gather_rows"] * 512


def test_model_bands_cover_full_range_scalars():
    """The canonical model bands must cover the ACTUAL digit profile of
    uniform full-range Fr scalars — including the top window, whose digits
    only span the modulus' leading bits (round-5 fix: that window ran
    hotter than the body model, Poisson(N/29678) vs Poisson(N/32768) at
    c=16, and silently pushed every 2^20 MSM onto a second exact-bands
    compile)."""
    import numpy as np
    from crypto_tpu.ops.msm_v2 import (_model_bands, _bands_cover,
                                       MAX_PROFILE_RANK)
    n, c, W = 1 << 15, 16, 16
    B = 1 << (c - 1)
    R = b.Fr.p
    top_keys = (R >> ((W - 1) * c)) + 1
    bands, occm = _model_bands(n, c, max_h=64, top_keys=top_keys)
    rng2 = random.Random(77)
    occ_a = 0
    nprof = np.zeros(MAX_PROFILE_RANK, dtype=np.int64)
    digs = np.zeros((W, n), dtype=np.int64)
    for i in range(n):
        s = rng2.randrange(0, R)
        carry = 0
        for w in range(W):
            d = ((s >> (w * c)) & (2 * B - 1)) + carry
            carry = 1 if d >= B else 0
            digs[w, i] = d - 2 * B if carry else d
    for w in range(W):
        absd = np.abs(digs[w])
        cnt = np.bincount(np.where(absd > 0, absd - 1, B),
                          minlength=B + 1)[:B]
        occ_a = max(occ_a, int(cnt.max()))
        for r in range(min(int(cnt.max()), MAX_PROFILE_RANK)):
            nprof[r] = max(nprof[r], int((cnt > r).sum()))
    assert occ_a <= occm, f"actual occupancy {occ_a} > model {occm}"
    assert _bands_cover(bands, nprof, occ_a), "model bands do not cover"
