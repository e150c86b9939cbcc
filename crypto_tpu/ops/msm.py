"""Multi-scalar multiplication on TPU — the framework's hottest kernel.

Replaces arkworks' Pippenger `VariableBaseMSM::msm` (which the reference
calls from every prover/verifier, e.g. `legogroth16/src/prover.rs:286-300`,
`schnorr_pok/src/pok_generalized_pedersen.rs:96`).

TPU-first design — no scatter-heavy bucket accumulation:

1. split scalars into c-bit window digits (host numpy; digits are public)
2. per window: sort points by digit (dense argsort), then run a
   **segmented merge tree**: at each level, adjacent same-digit points are
   paired by intra-segment rank and added (one batched point-add per level),
   then compacted (order-preserving, dead slots to the back).  After
   ceil(log2 N) levels every digit has exactly one partial — guaranteed,
   because rank-based pairing halves every segment per level.
   Work: ~2N point-adds per window, all dense batched ops.
3. bucket-weighted reduction  sum_b b*B_b  via a 2-axis split
   (b = q*C + c): tree-reduce row/col sums, then two short sequential
   weighted scans — O(B) batched adds + O(sqrt B) scan steps.
4. window results combined by Horner on host (tiny).

Compile-size discipline (XLA compile time is superlinear in graph size):
* windows run as a `lax.scan` (identical shapes) — one window body compiled
* within a window, only the first few *shrinking* levels are unrolled;
  the remaining levels run as a `lax.scan` at a fixed array size
  (merge_level with out_size == S compacts in place)

Multi-chip: points are sharded over the mesh; each chip computes all window
partials for its shard (identical SPMD program), partials are combined with
one tiny `all_gather` over ICI (`crypto_tpu.parallel.sharded_msm`).
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..curves.sw import SWCurve, Point
from ..curves.jcurve import JCurve, JPoints, jcurve_for

SENTINEL = 1 << 30


def scalars_to_digits(scalars: Sequence[int], c: int, nbits: int) -> np.ndarray:
    """(windows, N) int32 digit matrix, window 0 = least significant."""
    windows = (nbits + c - 1) // c
    out = np.zeros((windows, len(scalars)), dtype=np.int32)
    mask = (1 << c) - 1
    for i, s in enumerate(scalars):
        s = int(s)
        for w in range(windows):
            out[w, i] = (s >> (w * c)) & mask
    return out


def _gather(p: JPoints, idx: jnp.ndarray) -> JPoints:
    return JPoints(p.X[idx], p.Y[idx], p.Z[idx])


# Max batch for a single point-add call: the limb-product intermediates are
# ~B * L^2 * 8 bytes each with several alive at once, so an unchunked add at
# 2^19 batch OOMs a 16G-HBM chip.  Chunking via lax.map serializes mini
# batches through one reused buffer.
ADD_CHUNK = 1 << int(__import__("os").environ.get("CRYPTO_TPU_MSM_ADD_CHUNK_LOG2", "14"))


def _chunked_add(jc: JCurve, A: JPoints, B: JPoints) -> JPoints:
    n = A.X.shape[0]
    if n <= ADD_CHUNK:
        return jc.add(A, B)
    pad = (-n) % ADD_CHUNK
    L = A.X.shape[-1]

    def padp(p):
        if pad == 0:
            return p
        inf = jc.infinity((pad,))
        return _concat(p, inf)

    Ap, Bp = padp(A), padp(B)
    k = (n + pad) // ADD_CHUNK

    def resh(t):
        return t.reshape(k, ADD_CHUNK, L)

    stacked = (resh(Ap.X), resh(Ap.Y), resh(Ap.Z),
               resh(Bp.X), resh(Bp.Y), resh(Bp.Z))

    def body(args):
        ax, ay, az, bx, by, bz = args
        out = jc.add(JPoints(ax, ay, az), JPoints(bx, by, bz))
        return out.X, out.Y, out.Z

    ox, oy, oz = jax.lax.map(body, stacked)
    out = JPoints(ox.reshape(-1, L)[:n], oy.reshape(-1, L)[:n],
                  oz.reshape(-1, L)[:n])
    return out


def _concat(p: JPoints, q: JPoints) -> JPoints:
    return JPoints(jnp.concatenate([p.X, q.X]),
                   jnp.concatenate([p.Y, q.Y]),
                   jnp.concatenate([p.Z, q.Z]))


def merge_level(jc: JCurve, out_size: int, g: jnp.ndarray, P: JPoints):
    """One merge level: size S -> out_size (out_size == S compacts in place).

    Pairs adjacent same-digit elements by intra-segment rank (so every
    segment shrinks by half each level, no alignment stalls), adds the pairs
    in one batched point-add, then compacts live elements to the front,
    preserving sorted order.  Dead slots carry SENTINEL digits."""
    S = g.shape[0]
    ar = jnp.arange(S, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones((1,), bool), g[1:] != g[:-1]])
    seg_start = jax.lax.cummax(jnp.where(start, ar, 0))
    r = ar - seg_start
    next_same = jnp.concatenate([g[:-1] == g[1:], jnp.zeros((1,), bool)])
    pair_start = (r % 2 == 0) & next_same & (g != SENTINEL)

    npairs = S // 2 + 1
    rank = jnp.cumsum(pair_start.astype(jnp.int32)) - 1
    src = jnp.full((npairs + 1,), S, dtype=jnp.int32).at[
        jnp.where(pair_start, rank, npairs)].set(ar)
    P_ext = _concat(P, jc.infinity((1,)))
    A = _gather(P_ext, jnp.minimum(src, S))
    B = _gather(P_ext, jnp.minimum(src + 1, S))
    M = _chunked_add(jc, A, B)             # (npairs+1,) batched adds

    dead = jnp.concatenate([jnp.zeros((1,), bool), pair_start[:-1]])
    live = (g != SENTINEL) & ~dead
    dest = jnp.cumsum(live.astype(jnp.int32)) - 1
    dest_m = jnp.where(live, jnp.minimum(dest, out_size - 1), out_size)
    srcmap = jnp.full((out_size + 1,), S, dtype=jnp.int32).at[dest_m].set(ar)
    srcmap = srcmap[:out_size]

    g_ext = jnp.concatenate([g, jnp.full((1,), SENTINEL, jnp.int32)])
    new_g = g_ext[srcmap]
    pair_j = jnp.concatenate([pair_start, jnp.zeros((1,), bool)])[srcmap]
    rank_j = jnp.concatenate([rank, jnp.zeros((1,), jnp.int32)])[srcmap]
    P_orig = _gather(P_ext, srcmap)
    P_merged = _gather(M, jnp.clip(rank_j, 0, npairs))
    new_P = jc.select(pair_j, P_merged, P_orig)
    return new_g, new_P


def _tree_sum_axis0(jc: JCurve, p: JPoints) -> JPoints:
    """Reduce points over leading axis by halving (pow2 length)."""
    n = p.X.shape[0]
    while n > 1:
        half = n // 2
        a = JPoints(p.X[:half], p.Y[:half], p.Z[:half])
        b = JPoints(p.X[half:n], p.Y[half:n], p.Z[half:n])
        p = jc.add(a, b)
        n = half
    return JPoints(p.X[0], p.Y[0], p.Z[0])


def weighted_reduce(jc: JCurve, buckets: JPoints, nbuckets: int) -> JPoints:
    """sum_b b * B_b over dense buckets, via b = q*C + c split:
    sum = C * sum_q q*S_q + sum_c c*T_c.  Each weighted sum over n points
    uses bit-decomposition of the index — log2(n) masked tree reductions
    done simultaneously (all-batched, log-depth; no sequential point adds)."""
    logB = nbuckets.bit_length() - 1
    assert (1 << logB) == nbuckets
    logC = (logB + 1) // 2
    C = 1 << logC
    R = nbuckets // C

    def weighted_sum_scan(points: JPoints, n: int) -> JPoints:
        """sum_i i * P_i via sequential suffix scan (small graph; CPU path)."""
        def body(carry, p):
            running, acc = carry
            running = jc.add(running, p)
            acc = jc.add(acc, running)
            return (running, acc), None

        rev = JPoints(points.X[-1:0:-1], points.Y[-1:0:-1], points.Z[-1:0:-1])
        init = (jc.infinity(()), jc.infinity(()))
        (_, acc), _ = jax.lax.scan(body, init, rev)
        return acc

    def weighted_sum(points: JPoints, n: int) -> JPoints:
        """sum_i i * P_i = sum_b 2^b * (sum_{i: bit b of i} P_i).
        Log-depth (TPU path); falls back to the scan form on CPU where
        compile time dominates.  (Independent of the carry mode: sequential
        point adds are the TPU bottleneck regardless.)"""
        if jax.default_backend() == "cpu":
            return weighted_sum_scan(points, n)
        nbits = (n - 1).bit_length()
        idx = jnp.arange(n, dtype=jnp.int32)
        masks = ((idx[None, :] >> jnp.arange(nbits, dtype=jnp.int32)[:, None]) & 1) > 0
        inf = jc.infinity((nbits, n))
        stacked = JPoints(jnp.broadcast_to(points.X[None], (nbits,) + points.X.shape),
                          jnp.broadcast_to(points.Y[None], (nbits,) + points.Y.shape),
                          jnp.broadcast_to(points.Z[None], (nbits,) + points.Z.shape))
        masked = jc.select(masks, stacked, inf)          # (nbits, n)
        # tree-reduce over axis 1
        m = n
        p = masked
        while m > 1:
            half = m // 2
            a = JPoints(p.X[:, :half], p.Y[:, :half], p.Z[:, :half])
            b = JPoints(p.X[:, half:m], p.Y[:, half:m], p.Z[:, half:m])
            p = jc.add(a, b)
            m = half
        bitsums = JPoints(p.X[:, 0], p.Y[:, 0], p.Z[:, 0])  # (nbits,)
        # Horner over bits: acc = 2*acc + S_b from high to low
        acc = JPoints(bitsums.X[nbits - 1], bitsums.Y[nbits - 1], bitsums.Z[nbits - 1])
        for bpos in range(nbits - 2, -1, -1):
            acc = jc.double(acc)
            acc = jc.add(acc, JPoints(bitsums.X[bpos], bitsums.Y[bpos], bitsums.Z[bpos]))
        return acc

    grid = JPoints(buckets.X.reshape(R, C, -1),
                   buckets.Y.reshape(R, C, -1),
                   buckets.Z.reshape(R, C, -1))
    Sq = _tree_sum_axis0(jc, JPoints(grid.X.swapaxes(0, 1), grid.Y.swapaxes(0, 1),
                                     grid.Z.swapaxes(0, 1)))  # (R,): summed over c
    Tc = _tree_sum_axis0(jc, grid)                            # (C,): summed over q
    part_q = weighted_sum(Sq, R)
    part_c = weighted_sum(Tc, C)
    for _ in range(logC):
        part_q = jc.double(part_q)
    return jc.add(part_q, part_c)


def scatter_buckets(jc: JCurve, g: jnp.ndarray, P: JPoints, nbuckets: int) -> JPoints:
    S = g.shape[0]
    ar = jnp.arange(S, dtype=jnp.int32)
    idx = jnp.where(g == SENTINEL, nbuckets, jnp.minimum(g, nbuckets))
    srcmap = jnp.full((nbuckets + 1,), S, dtype=jnp.int32).at[idx].set(ar)
    P_ext = _concat(P, jc.infinity((1,)))
    return _gather(P_ext, srcmap[:nbuckets])


def _level_plan(n: int, nbuckets: int) -> tuple[list[int], int, int]:
    """(unrolled shrinking sizes, fixed scan size, scan iterations).

    Unroll levels while the array is still shrinking fast; once the size
    bound N/2^k + B stops improving (within 2x of the floor), switch to a
    fixed-size scanned loop for the remaining levels."""
    total_levels = max(1, (n - 1).bit_length())
    sizes = []
    size = n
    k = 0
    while k < total_levels:
        k += 1
        bound = -(-n // (1 << k)) + nbuckets
        nxt = min(size, bound)
        if nxt > 2 * nbuckets and nxt < size:
            sizes.append(nxt)
            size = nxt
        else:
            break
    scan_iters = total_levels - len(sizes)
    return sizes, size, scan_iters


def _window_pipeline(jc: JCurve, P: JPoints, dg: jnp.ndarray, c: int) -> JPoints:
    """One Pippenger window: sort -> merge levels -> buckets -> weighted sum."""
    nbuckets = 1 << c
    n = dg.shape[0]
    shrink_sizes, fixed_size, scan_iters = _level_plan(n, nbuckets)
    g = jnp.where((dg == 0) | jc.is_infinity(P), SENTINEL, dg)
    order = jnp.argsort(g, stable=True)
    gs = g[order]
    Ps = _gather(P, order)
    for out_size in shrink_sizes:
        gs, Ps = merge_level(jc, out_size, gs, Ps)
    if fixed_size != gs.shape[0]:
        # pad up to the fixed scan size (only when n small)
        pad = fixed_size - gs.shape[0]
        if pad > 0:
            gs = jnp.concatenate([gs, jnp.full((pad,), SENTINEL, jnp.int32)])
            Ps = _concat(Ps, jc.infinity((pad,)))
        else:
            gs, Ps = merge_level(jc, fixed_size, gs, Ps)

    def fixed_level(carry, _x):
        g2, P2 = carry
        g2, P2 = merge_level(jc, fixed_size, g2, P2)
        return (g2, P2), None

    if scan_iters > 0:
        (gs, Ps), _ = jax.lax.scan(fixed_level, (gs, Ps), None, length=scan_iters)
    buckets = scatter_buckets(jc, gs, Ps, nbuckets)
    return weighted_reduce(jc, buckets, nbuckets)


def msm_program(jc: JCurve, P: JPoints, digits: jnp.ndarray, c: int) -> JPoints:
    """All-window MSM partials as one traceable program (scan over windows).
    digits: (W, n) int32.  Returns JPoints with leading axis W."""
    def window_body(_, dg):
        out = _window_pipeline(jc, P, dg, c)
        return None, (out.X, out.Y, out.Z)

    _, (wx, wy, wz) = jax.lax.scan(window_body, None, digits)
    return JPoints(wx, wy, wz)


@functools.lru_cache(maxsize=None)
def _msm_window_jit(jc: JCurve, c: int):
    return jax.jit(functools.partial(_window_pipeline, jc, c=c))


@functools.lru_cache(maxsize=None)
def _msm_program_jit(jc: JCurve, c: int):
    return jax.jit(functools.partial(msm_program, jc, c=c))


def msm_device(curve: SWCurve, points: list[Point] | JPoints,
               scalars: Sequence[int], c: int | None = None,
               nbits: int | None = None) -> Point:
    """Full MSM on device; returns a host Point.

    `points` may be pre-packed JPoints (device-resident) to amortize packing.
    """
    jc = jcurve_for(curve)
    n = len(scalars)
    if c is None:
        c = _auto_window(n)
    if nbits is None:
        nbits = curve.scalar_field.bits
    digits = scalars_to_digits([int(s) for s in scalars], c, nbits)
    if not isinstance(points, JPoints):
        points = jc.pack_points(points)
    import os
    if os.environ.get("CRYPTO_TPU_MSM_SPLIT_WINDOWS", "1") != "0" \
            and jax.default_backend() != "cpu":
        # one device call per window: keeps each call short (the remote TPU
        # relay kills multi-minute programs) and shows partial progress
        fn = _msm_window_jit(jc, c)
        outs = [fn(points, jnp.asarray(digits[w]))
                for w in range(digits.shape[0])]
        wins = JPoints(jnp.stack([o.X for o in outs]),
                       jnp.stack([o.Y for o in outs]),
                       jnp.stack([o.Z for o in outs]))
    else:
        wins = _msm_program_jit(jc, c)(points, jnp.asarray(digits))
    return horner_combine(jc, curve, wins, c)


def horner_combine(jc: JCurve, curve: SWCurve, wins: JPoints, c: int) -> Point:
    """Window results -> final point, Horner on host (tiny)."""
    host_pts = jc.unpack(wins)
    acc = curve.infinity()
    for wpt in reversed(host_pts):
        for _ in range(c):
            acc = acc.double()
        acc = acc + wpt
    return acc


def _auto_window(n: int) -> int:
    # c capped at 12: 2^12 buckets keep the weighted-reduction graphs small
    # enough for the (slow, remote) TPU compile path; the extra windows cost
    # ~15% more adds at 2^20 but compile time dominates iteration speed.
    import os
    override = os.environ.get("CRYPTO_TPU_MSM_WINDOW")
    if override:
        return int(override)
    if n < 64:
        return 4
    if n < 1 << 12:
        return 8
    return 12
