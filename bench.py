#!/usr/bin/env python
"""Benchmark entry point (driver contract): prints ONE JSON line.

Primary metric: G1 MSM throughput (points/s/chip) at 2^20 points on
BLS12-381 — the arkworks-Pippenger-equivalent workload every prover in the
reference leans on (BASELINE.json `metric`).

`vs_baseline` compares against a single-threaded arkworks-class CPU
Pippenger estimate (~2^20 points in ~4 s on one core => ~260k points/s);
the reference publishes no numbers (BASELINE.md), so this is the documented
stand-in ratio.

Env knobs:
  CRYPTO_TPU_BENCH_N     log2 number of points (default 20)
  CRYPTO_TPU_BENCH_FAST  if set, use 2^14 points (smoke mode)
"""

import json
import os
import sys
import time

import numpy as np

_T0 = time.time()


def _phase(msg: str) -> None:
    """Self-timing breadcrumbs on stderr: if the driver's budget is ever
    exceeded again (BENCH_r04 rc=124 was an opaque cold-compile timeout),
    the captured tail says exactly which phase ate the time."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _probe_tpu_relay() -> None:
    """Fail fast (exit 3) if the axon TPU relay is unreachable — a hung
    first device op would otherwise stall the caller indefinitely."""
    import socket
    host_port = os.environ.get("CRYPTO_TPU_RELAY", "127.0.0.1:8093")
    host, _, port = host_port.partition(":")
    try:
        with socket.create_connection((host, int(port)), timeout=10):
            return
    except OSError as e:
        print(f"TPU relay {host_port} unreachable: {e}", file=sys.stderr)
        sys.exit(3)


def make_bench_points(bls, jc, n: int, phase=_phase):
    """n DISTINCT curve points as a THREE-level outer sum A_i + (C_u + D_v)
    of three families with FULL-RANGE random discrete logs (seeded): point
    (i,u,v) has dlog a_i + c_u + d_v mod r, a uniform ~255-bit value, so
    both base collisions and in-bucket partial-sum collisions (subset-sum
    equalities — which small structured dlogs DO hit at 2^20 scale, raising
    the fast kernels' zero-denominator flag) have probability ~2^-215.
    Distinctness matters: duplicate bases inside one bucket are the
    degenerate P+P case the fast formula punts on, and real MSM workloads
    (CRS bases, commitment keys) are distinct.

    Fixed-shape construction: exactly TWO batched device adds (m1*m2 and n
    rows) + one normalize.  The previous doubling-loop built ~14
    distinct-shape add programs, each a multi-minute cold XLA compile
    through the relay — the bulk of the BENCH_r04 rc=124 timeout.

    Returns (points, dlog_fn) where dlog_fn(i) gives point i's discrete log
    (for correctness checks in tests)."""
    import random
    import jax
    import jax.numpy as jnp
    from crypto_tpu.ops.pallas.curve_kernels import (make_add_fns,
                                                     make_normalize_fn)
    k = 64
    m = n // k
    m1 = min(128, m)
    m2 = m // m1
    assert m1 * m2 * k == n, "n must be a power of two >= 2^12"
    hrng = random.Random(0xBE7C4)
    a_s = [hrng.randrange(1, bls.R) for _ in range(k)]
    c_s = [hrng.randrange(1, bls.R) for _ in range(m1)]
    d_s = [hrng.randrange(1, bls.R) for _ in range(m2)]
    base = bls.G1.generator()
    A = jc.pack_points([base.mul_raw(a).normalize() for a in a_s])
    C = jc.pack_points([base.mul_raw(cu).normalize() for cu in c_s])
    D = jc.pack_points([base.mul_raw(dv).normalize() for dv in d_s])
    phase("host base points done; device outer sums")
    add_fn, _aadd, _dbl = make_add_fns(jc)

    def outer_sum(P, Q):
        np_, nq = P.X.shape[0], Q.X.shape[0]
        Prep = type(P)(jnp.repeat(P.X, nq, axis=0),
                       jnp.repeat(P.Y, nq, axis=0),
                       jnp.repeat(P.Z, nq, axis=0))
        Qrep = type(Q)(jnp.tile(Q.X, (np_, 1)), jnp.tile(Q.Y, (np_, 1)),
                       jnp.tile(Q.Z, (np_, 1)))
        S, _f = add_fn(Prep, Qrep)
        return S

    B = outer_sum(C, D)                      # (m,) Jacobian
    jac_points = outer_sum(A, B)             # (n,) Jacobian
    points = make_normalize_fn(jc)(jac_points)
    jax.block_until_ready(points.X)

    def dlog_fn(i: int) -> int:
        a, rest = divmod(i, m)
        u, v = divmod(rest, m2)
        return (a_s[a] + c_s[u] + d_s[v]) % bls.R

    return points, dlog_fn


def main() -> None:
    if os.environ.get("JAX_PLATFORMS", "axon") == "axon":
        _probe_tpu_relay()
    import crypto_tpu.jax_setup  # persistent compile cache
    import jax

    # Kogge-Stone carries measured ~13% faster than scan at 2^20 on TPU
    # (both programs live in the persistent compile cache); override with
    # CRYPTO_TPU_CARRY=scan|ks.
    if not os.environ.get("CRYPTO_TPU_CARRY"):
        from crypto_tpu.fields.jfield import set_carry_mode
        set_carry_mode("ks")

    logn = int(os.environ.get("CRYPTO_TPU_BENCH_N", "20"))
    if os.environ.get("CRYPTO_TPU_BENCH_FAST"):
        logn = min(logn, 14)
    n = 1 << logn

    from crypto_tpu.curves import bls12_381 as bls
    from crypto_tpu.curves.jcurve import jcurve_for
    from crypto_tpu.ops.msm_v2 import msm_device_scheduled
    from crypto_tpu.ops.pippenger import scalars_to_bytes

    # scalars get a per-process seed: with the npz point cache, a FIXED
    # seed would make the timed run's (executable, args) identical across
    # bench processes — exactly the pair the axon relay memoizes, which
    # would time a replay instead of the chip
    rng = np.random.default_rng(time.time_ns() & 0xFFFFFFFF)
    jc = jcurve_for(bls.G1)
    import jax.numpy as jnp

    _phase(f"point-gen start (n=2^{logn})")
    # machine-local point cache: the generated set is deterministic, and
    # loading ~200 MB beats re-running the outer-sum programs (and protects
    # the driver's run from any point-gen compile-cache miss)
    from crypto_tpu.curves.jcurve import JPoints
    cache_dir = os.path.expanduser(os.environ.get(
        "CRYPTO_TPU_BENCH_CACHE", "~/.cache/crypto_tpu_bench"))
    cache_f = os.path.join(cache_dir, f"points_2e{logn}_v3.npz")
    if os.path.exists(cache_f):
        z = np.load(cache_f)
        points = JPoints(jax.device_put(jnp.asarray(z["X"])),
                         jax.device_put(jnp.asarray(z["Y"])),
                         jax.device_put(jnp.asarray(z["Z"])))
        jax.block_until_ready(points.X)
        _phase("points loaded from local cache")
    else:
        points, _dlog = make_bench_points(bls, jc, n)
        try:
            os.makedirs(cache_dir, exist_ok=True)
            tmp = f"{cache_f}.{os.getpid()}.tmp.npz"
            np.savez(tmp, X=np.asarray(points.X), Y=np.asarray(points.Y),
                     Z=np.asarray(points.Z))
            os.replace(tmp, cache_f)
        except OSError:
            pass
        _phase("points ready (cached for next run)")
    # full-range Fr scalars from 5x63-bit words (315 bits, reduced mod r).
    # 4 words only spanned 252 bits, which squeezed the top c=16 window
    # into 2^12 buckets (occupancy ~315 vs the uniform model's ~71) and
    # silently pushed every run onto the exact-bands fallback — compiling a
    # second ~274 MB window program per process.
    words = rng.integers(0, 1 << 63, size=(n, 5), dtype=np.int64).astype(object)
    scalars = [(int(w0) | (int(w1) << 63) | (int(w2) << 126)
                | (int(w3) << 189) | (int(w4) << 252)) % bls.R
               for (w0, w1, w2, w3, w4) in words]

    # engine: device-scheduled batched-affine Pippenger (ops/msm_v2.py) —
    # digits, bucket layout and all reductions on device.  Scalar bytes are
    # STAGED on device before timing: the axon relay tunnel moves host
    # arrays at ~50 MB/s (32 MB = ~0.7 s), an environment artifact of the
    # remote-TPU link, not chip throughput — on a real host PCIe ships
    # 32 MB in ~3 ms, and SNARK provers' scalars are device-resident
    # already.  Digit extraction itself stays inside the timed region.
    # TWO scalar sets: the axon relay memoizes identical (executable, args)
    # executions, so the timed run must not repeat the warmup's inputs
    half = n // 2
    scalars2 = scalars[half:] + scalars[:half]
    sbytes = jax.device_put(jnp.asarray(scalars_to_bytes(scalars, 32)))
    sbytes2 = jax.device_put(jnp.asarray(scalars_to_bytes(scalars2, 32)))
    jax.block_until_ready(sbytes2)
    _phase("scalars staged; warmup MSM (compiles window program if cold)")
    msm_device_scheduled(bls.G1, points, sbytes)
    _phase("warmup done; timed MSM")

    t0 = time.time()
    result = msm_device_scheduled(bls.G1, points, sbytes2)
    dt = time.time() - t0
    del result

    pts_per_s = n / dt
    baseline_cpu = 260_000.0  # arkworks-class single-core Pippenger, points/s
    out = {
        "metric": f"g1_msm_2^{logn}_points_per_s_per_chip",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / baseline_cpu, 3),
        # scalar bytes are device-staged before the timed region (see the
        # staging comment above): numbers from rounds 1-2 and external MSM
        # benches that include host->device transfer are not directly
        # comparable
        "scalars_staged": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
