"""Per-kernel work counters (SURVEY.md §5.5 metrics slot).

The reference exposes per-phase timers (`print-trace`) but no work
accounting; real hardware counters are not readable from JAX, so these are
ANALYTIC counters: exact op/byte counts derived from the compiled
structure (band layout, level widths, REDC shape).  They are what the
engine *submits* to the chip — paired with wall-clock from
`utils.timing.trace`, they give achieved-vs-peak utilisation per phase.

Enable JSON metric lines with CRYPTO_TPU_METRICS=1; read programmatically
via `msm_cost_model`.
"""

from __future__ import annotations

import json
import os
import sys


def _limb_products(L: int) -> int:
    """15-bit limb products per Montgomery mul: Karatsuba (3*(L/2)^2) when
    enabled plus two constant Toeplitz products of L^2-ish each."""
    from ..ops.pallas.field_kernels import use_karatsuba
    wide = 3 * (L // 2) ** 2 if use_karatsuba(L) else L * L
    redc = 2 * L * L          # ninv (L rows) + p (2L rows) Toeplitz, amortized
    return wide + redc


def msm_cost_model(N: int, c: int, bands: tuple, W: int, L: int,
                   fast: bool = True) -> dict:
    """Work counters for one device-scheduled MSM (all W windows).

    Returns exact slot/gather/add counts and derived field-mul / limb-mul /
    HBM-byte totals for the band engine (`ops/msm_v2.py`)."""
    B = 1 << (c - 1)
    slots = sum(Q * h for (Q, h, _) in bands)
    # halving chain: each band reduces Q*h -> Q (Q*(h-1) pair adds), plus
    # one width-Q combine per band after the first
    pair_adds = sum(Q * (h - 1) for (Q, h, _) in bands)
    pair_adds += sum(Q for (Q, _, _) in bands[1:])
    muls_per_add = 6 if fast else 7       # 3 inversion-amortized + formula
    field_muls = W * (pair_adds * muls_per_add + 2 * B)   # + Jacobian tail est
    gather_rows = W * slots
    gather_bytes = gather_rows * 128 * 4  # tile-padded packed payload rows
    limb_muls = field_muls * _limb_products(L)
    # levels traffic: ~13 field-element reads/writes per pair (see
    # curve_kernels chunked kernels)
    hbm_bytes = gather_bytes + W * pair_adds * 13 * L * 4
    return {
        "n": N, "c": c, "windows": W, "bands": len(bands), "slots": slots,
        "slots_per_point": round(slots / max(N, 1), 4),
        "pair_adds": W * pair_adds,
        "field_muls": field_muls,
        "limb_muls": limb_muls,
        "gather_rows": gather_rows,
        "gather_bytes": gather_bytes,
        "hbm_bytes_est": hbm_bytes,
    }


def emit(kind: str, payload: dict) -> None:
    """One JSON metrics line to stderr when CRYPTO_TPU_METRICS=1."""
    if not os.environ.get("CRYPTO_TPU_METRICS"):
        return
    print(json.dumps({"metric_kind": kind, **payload}), file=sys.stderr,
          flush=True)
