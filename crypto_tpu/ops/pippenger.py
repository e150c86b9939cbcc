"""Host-scheduled Pippenger MSM — the TPU-first variable-base MSM.

Replaces arkworks `VariableBaseMSM::msm_bigint` (reference call sites:
`legogroth16/src/prover.rs:286-300`, `schnorr_pok/src/pok_generalized_pedersen.rs:96`).

Design
------
Scalars (and therefore window digits) live on the host, so the *entire
bucket-accumulation schedule* is precomputed in numpy and the device only
executes dense, branch-free work: gathers + batched point-adds + one
contiguous write per level.  This removes the device argsort / cummax /
compaction bookkeeping of the older merge-tree design (`ops/msm.py`) and
reaches the Pippenger-optimal ~N-adds-per-window:

1. signed window digits (c bits, digits in [-2^(c-1), 2^(c-1)]) — halves the
   bucket count; negative digits negate the point at gather time.
2. per window: stable counting-sort of digits on host; pairwise same-bucket
   merge levels computed on host; after ceil(log2(max bucket occupancy))
   levels (~6 for 2^20 points / 2^15 buckets) every bucket has one partial.
   Total adds per window = (#nonzero digits) - (#nonempty buckets).
3. all partials live in one device-resident pool; each level's adds write
   contiguously at a host-known offset (`lax.dynamic_update_slice`); pair
   operands are gathered with host-built flat indices; carried (odd) points
   are never copied — later levels reference them in place.
4. dense bucket vector gathered from the pool via a host-built source map,
   then the weighted sum  sum_b b·B_b  runs as the two-axis split reduction
   (log-depth batched adds; no sequential scans).
5. window results are Horner-combined on host (W tiny points).

Degenerate pairs (P+P with equal points — e.g. duplicate input bases) cannot
be handled branch-free by the fast add formula; the add kernels emit a flag,
flags are OR-accumulated on device, checked once per MSM, and on the (never
in random workloads) hit the affected computation is redone with the total
(select-based, doubling-aware) `JCurve.add` path.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..curves.sw import SWCurve, Point
from ..curves.jcurve import JCurve, JPoints, jcurve_for


# ---------------------------------------------------------------------------
# host digit / schedule construction (numpy only)
# ---------------------------------------------------------------------------

def scalars_to_bytes(scalars: Sequence[int], nbytes: int) -> np.ndarray:
    """(N, nbytes) uint8 little-endian. Vectorized except the int->bytes loop."""
    buf = b"".join(int(s).to_bytes(nbytes, "little") for s in scalars)
    return np.frombuffer(buf, dtype=np.uint8).reshape(len(scalars), nbytes)


def signed_digits(scalars: Sequence[int], c: int, nbits: int) -> np.ndarray:
    """(W, N) int32 signed window digits, |digit| <= 2^(c-1), LSW first.

    d > 2^(c-1)  ->  d - 2^c  with +1 carried into the next window; one
    window of headroom beyond nbits absorbs the final carry (asserted).
    """
    W = (nbits + c) // c   # ceil((nbits+1)/c): top window needs carry room
    nbytes = (W * c + 7) // 8
    by = scalars_to_bytes(scalars, nbytes)
    if c == 16:
        raw = by.view("<u2").astype(np.int64)[:, :W]  # (N, W)
    elif c == 8:
        raw = by.astype(np.int64)[:, :W]
    else:
        bits = np.unpackbits(by, axis=1, bitorder="little")
        raw = np.zeros((len(scalars), W), dtype=np.int64)
        for w in range(W):
            sl = bits[:, w * c:(w + 1) * c]
            raw[:, w] = sl @ (1 << np.arange(sl.shape[1], dtype=np.int64))
    half = 1 << (c - 1)
    full = 1 << c
    out = np.zeros((len(scalars), W), dtype=np.int64)
    carry = np.zeros(len(scalars), dtype=np.int64)
    for w in range(W):
        d = raw[:, w] + carry
        wrap = d > half
        out[:, w] = np.where(wrap, d - full, d)
        carry = wrap.astype(np.int64)
    assert not carry.any(), "top-window carry: scalars exceed nbits"
    assert np.abs(out).max() <= half
    return out.T.astype(np.int32)


@dataclass
class LevelPlan:
    """One merge level: pairs (a_idx[i], b_idx[i]) from the pool are added and
    written at pool[out_offset + i].  sa/sb in {+1,-1} apply to affine inputs
    with negative digits (merged partials always carry +1)."""
    a_idx: np.ndarray
    b_idx: np.ndarray
    sa: np.ndarray
    sb: np.ndarray
    out_offset: int
    n_pairs: int
    affine: bool          # True when BOTH operands are original (Z=1) points


@dataclass
class WindowPlan:
    levels: list[LevelPlan]
    bucket_src: np.ndarray     # (nbuckets,) pool index per bucket (0 = inf slot)
    bucket_sign: np.ndarray    # (nbuckets,) int32 in {+1, -1}


def plan_window(digits: np.ndarray, inf_mask: np.ndarray | None,
                c: int, pool_base: int,
                points_affine: bool = True) -> tuple[WindowPlan, int]:
    """Build the merge schedule for one window.

    Pool layout: slot 0 = infinity; slots 1..N = input points; merged partials
    appended from `pool_base`.  Returns (plan, next_pool_offset).
    """
    N = digits.shape[0]
    d = digits.astype(np.int64)
    if inf_mask is not None and inf_mask.any():
        d = np.where(inf_mask, 0, d)
    live = np.nonzero(d != 0)[0]
    bucket = np.abs(d[live])              # 1..2^(c-1)
    sign = np.sign(d[live]).astype(np.int32)
    order = np.argsort(bucket, kind="stable")
    # current entries: pool index, bucket id, sign, affine?
    idx = (live[order] + 1).astype(np.int64)   # +1: slot 0 is infinity
    g = bucket[order]
    sg = sign[order]
    # is_orig: entry is an original input point -> its digit sign is applied
    # at consumption time (gather); merged partials already carry their sign.
    # is_aff: entry has Z == 1 -> eligible for the 4M+2S affine-add formula.
    is_orig = np.ones(len(idx), dtype=bool)
    is_aff = np.full(len(idx), points_affine, dtype=bool)

    levels: list[LevelPlan] = []
    offset = pool_base
    while len(g):
        same_next = np.zeros(len(g), dtype=bool)
        same_next[:-1] = g[:-1] == g[1:]
        # rank within segment
        start = np.ones(len(g), dtype=bool)
        start[1:] = g[1:] != g[:-1]
        seg_pos = np.maximum.accumulate(np.where(start, np.arange(len(g)), 0))
        rank = np.arange(len(g)) - seg_pos
        pair_a = (rank % 2 == 0) & same_next
        if not pair_a.any():
            break
        a_pos = np.nonzero(pair_a)[0]
        b_pos = a_pos + 1
        n_pairs = len(a_pos)
        affine_pairs = is_aff[a_pos] & is_aff[b_pos]
        all_affine = bool(affine_pairs.all())
        levels.append(LevelPlan(
            a_idx=idx[a_pos].astype(np.int32),
            b_idx=idx[b_pos].astype(np.int32),
            sa=np.where(is_orig[a_pos], sg[a_pos], 1).astype(np.int32),
            sb=np.where(is_orig[b_pos], sg[b_pos], 1).astype(np.int32),
            out_offset=offset, n_pairs=n_pairs, affine=all_affine))
        consumed = np.zeros(len(g), dtype=bool)
        consumed[a_pos] = True
        consumed[b_pos] = True
        # new entry list: merged pairs (at their a_pos position to stay
        # sorted) + carried; order by old position keeps bucket-sortedness
        new_idx = idx.copy()
        new_sg = sg.copy()
        new_aff = is_aff.copy()
        new_orig = is_orig.copy()
        new_idx[a_pos] = offset + np.arange(n_pairs)
        new_sg[a_pos] = 1
        new_aff[a_pos] = False
        new_orig[a_pos] = False
        keep = ~consumed
        keep[a_pos] = True
        idx = new_idx[keep]
        g = g[keep]
        sg = new_sg[keep]
        is_aff = new_aff[keep]
        is_orig = new_orig[keep]
        offset += n_pairs

    nbuckets = (1 << (c - 1)) + 1   # bucket ids 0..2^(c-1); 0 unused
    bucket_src = np.zeros(nbuckets, dtype=np.int32)       # 0 = infinity slot
    bucket_sign = np.ones(nbuckets, dtype=np.int32)
    bucket_src[g] = idx
    bucket_sign[g] = sg
    return WindowPlan(levels, bucket_src, bucket_sign), offset


# ---------------------------------------------------------------------------
# device execution
# ---------------------------------------------------------------------------

def _round_up(n: int, quantum: int = 4096) -> int:
    """Pad level sizes to powers of two so the jitted level programs are
    reused across levels/windows (each distinct shape costs a slow remote
    XLA+Mosaic compile; pow2-only keeps the program count ~log2(N))."""
    if n <= 256:
        return 256
    return 1 << (n - 1).bit_length()


class PippengerEngine:
    """Executes host-built window plans on device for one curve.

    `add_fn(A, B) -> (JPoints, flag)` and `affine_add_fn` are the batched
    point-add backends (flag = any degenerate same-point pair in the batch).
    Defaults use the total (select-based) `JCurve` formulas with flag=False;
    the fast Pallas kernels plug in on TPU.
    """

    def __init__(self, jc: JCurve,
                 add_fn: Callable | None = None,
                 affine_add_fn: Callable | None = None,
                 double_fn: Callable | None = None,
                 fuse_window: bool = True):
        self.jc = jc
        self.F = jc.F
        self.add_fn = add_fn or self._jc_add_chunked
        self.affine_add_fn = affine_add_fn or self.add_fn
        self.double_fn = double_fn or jc.double
        # fused: all levels + tail of a window in ONE device call (wins on
        # the remote TPU where every call costs an RTT); split: one jit per
        # level shape (wins on CPU where XLA compile time of the big fused
        # program dominates)
        self.fuse_window = fuse_window
        self._level_jit: dict = {}
        self._bucket_jit: dict = {}
        self._reduce_jit: dict = {}

    def _jc_add_chunked(self, A: JPoints, B: JPoints):
        """Total-formula add via `JCurve.add`, chunked with lax.map so the
        einsum limb-product intermediates (~2.6 KB/elem alive) never exceed
        HBM at 2^19+ batches."""
        jc = self.jc
        CH = 1 << 13
        ush = tuple(self.F.unit_shape)
        u = self.F.unit_ndim
        shape = A.X.shape
        bshape = shape[: len(shape) - u]
        n = int(np.prod(bshape)) if bshape else 1
        if n <= CH:
            return jc.add(A, B), jnp.zeros((), jnp.int32)
        flat = [t.reshape((-1,) + ush) for t in (A.X, A.Y, A.Z, B.X, B.Y, B.Z)]
        pad = (-n) % CH
        if pad:
            inf = jc.infinity((pad,))
            padder = [inf.X, inf.Y, inf.Z, inf.X, inf.Y, inf.Z]
            flat = [jnp.concatenate([t, p]) for t, p in zip(flat, padder)]
        stacked = [t.reshape((-1, CH) + ush) for t in flat]

        def body(ops):
            ax, ay, az, bx, by, bz = ops
            R = jc.add(JPoints(ax, ay, az), JPoints(bx, by, bz))
            return R.X, R.Y, R.Z

        ox, oy, oz = jax.lax.map(body, tuple(stacked))
        out = JPoints(ox.reshape((-1,) + ush)[:n].reshape(shape),
                      oy.reshape((-1,) + ush)[:n].reshape(shape),
                      oz.reshape((-1,) + ush)[:n].reshape(shape))
        return out, jnp.zeros((), jnp.int32)

    # -- traced bodies ------------------------------------------------------

    def _level_body(self, affine: bool, pool_x, pool_y, pool_z,
                    a_idx, b_idx, sa, sb, offset, flag):
        F = self.F
        add = self.affine_add_fn if affine else self.add_fn
        A = JPoints(pool_x[a_idx], pool_y[a_idx], pool_z[a_idx])
        B = JPoints(pool_x[b_idx], pool_y[b_idx], pool_z[b_idx])
        A = JPoints(A.X, F.select(sa < 0, F.neg(A.Y), A.Y), A.Z)
        B = JPoints(B.X, F.select(sb < 0, F.neg(B.Y), B.Y), B.Z)
        R, f = add(A, B)
        zeros = (0,) * self.F.unit_ndim
        pool_x = jax.lax.dynamic_update_slice(pool_x, R.X, (offset,) + zeros)
        pool_y = jax.lax.dynamic_update_slice(pool_y, R.Y, (offset,) + zeros)
        pool_z = jax.lax.dynamic_update_slice(pool_z, R.Z, (offset,) + zeros)
        return pool_x, pool_y, pool_z, flag | f.astype(jnp.int32)

    def _tail_body(self, pool_x, pool_y, pool_z, src, sign):
        """Bucket gather + two-axis weighted reduction: sum_b b*B_b where
        bucket value b sits at array position b-1."""
        jc = self.jc
        add = self.add_fn
        dbl = self.double_fn
        F = self.F

        def tree_sum(p: JPoints, axis_len: int):
            flag = jnp.zeros((), jnp.int32)
            while axis_len > 1:
                half = axis_len // 2
                a = JPoints(p.X[:half], p.Y[:half], p.Z[:half])
                b = JPoints(p.X[half:axis_len], p.Y[half:axis_len],
                            p.Z[half:axis_len])
                p, f = add(a, b)
                flag = flag | f.astype(jnp.int32)
                axis_len = half
            return JPoints(p.X[0], p.Y[0], p.Z[0]), flag

        def weighted_sum(points: JPoints, n: int):
            """sum_i i * P_i via bit-decomposition masked tree sums."""
            flag = jnp.zeros((), jnp.int32)
            nbits = (n - 1).bit_length()
            idx = jnp.arange(n, dtype=jnp.int32)
            masks = ((idx[None, :] >> jnp.arange(nbits, dtype=jnp.int32)[:, None]) & 1) > 0
            inf = jc.infinity((nbits, n))
            stacked = JPoints(
                jnp.broadcast_to(points.X[None], (nbits,) + points.X.shape),
                jnp.broadcast_to(points.Y[None], (nbits,) + points.Y.shape),
                jnp.broadcast_to(points.Z[None], (nbits,) + points.Z.shape))
            p = jc.select(masks, stacked, inf)
            m = n
            while m > 1:
                half = m // 2
                a = JPoints(p.X[:, :half], p.Y[:, :half], p.Z[:, :half])
                b = JPoints(p.X[:, half:m], p.Y[:, half:m], p.Z[:, half:m])
                p, f = add(a, b)
                flag = flag | f.astype(jnp.int32)
                m = half
            bitsums = JPoints(p.X[:, 0], p.Y[:, 0], p.Z[:, 0])
            acc = JPoints(bitsums.X[nbits - 1], bitsums.Y[nbits - 1],
                          bitsums.Z[nbits - 1])
            for bpos in range(nbits - 2, -1, -1):
                acc = dbl(acc)
                acc, f = add(acc, JPoints(bitsums.X[bpos], bitsums.Y[bpos],
                                          bitsums.Z[bpos]))
                flag = flag | f.astype(jnp.int32)
            return acc, flag

        bx = pool_x[src]
        by = pool_y[src]
        bz = pool_z[src]
        by = F.select(sign < 0, F.neg(by), by)
        n = bx.shape[0]
        logB = n.bit_length() - 1
        logC = (logB + 1) // 2
        C = 1 << logC
        R = n // C
        ush = tuple(self.F.unit_shape)
        grid = JPoints(bx.reshape((R, C) + ush), by.reshape((R, C) + ush),
                       bz.reshape((R, C) + ush))
        Sq_stack = JPoints(grid.X.swapaxes(0, 1), grid.Y.swapaxes(0, 1),
                           grid.Z.swapaxes(0, 1))
        Sq, f1 = tree_sum(Sq_stack, C)      # (R,): summed over c
        Tc, f2 = tree_sum(grid, R)          # (C,): summed over q
        part_q, f3 = weighted_sum(Sq, R)
        part_c, f4 = weighted_sum(Tc, C)
        for _ in range(logC):
            part_q = dbl(part_q)
        out, f5 = add(part_q, part_c)
        # weighted_sum weights by position index but bucket value b sits at
        # array position b-1: add the plain sum of all buckets (= Tc reduced
        # once more) to shift every weight by +1
        total, f6 = tree_sum(Tc, C)
        out2, f7 = add(out, total)
        flag = (f1 | f2 | f3 | f4 | f5.astype(jnp.int32)
                | f6 | f7.astype(jnp.int32))
        return out2.X, out2.Y, out2.Z, flag

    # -- one program per window signature ----------------------------------

    def _window_prog(self, sig: tuple, nb2: int):
        """Jitted program running ALL merge levels + the bucket tail of one
        window in a single device call.  `sig` = ((padded_size, affine), ...)
        — shared across windows (plans are padded to a canonical signature)
        so the whole MSM compiles ~once and runs in W calls (each device
        call costs an RTT through the remote TPU relay)."""
        key = (sig, nb2)
        if key not in self._level_jit:
            def prog(pool_x, pool_y, pool_z, offsets, src, sgn, *level_args):
                flag = jnp.zeros((), jnp.int32)
                i = 0
                for li, (size, affine) in enumerate(sig):
                    a_idx, b_idx, sa, sb = level_args[i:i + 4]
                    i += 4
                    pool_x, pool_y, pool_z, flag = self._level_body(
                        affine, pool_x, pool_y, pool_z, a_idx, b_idx, sa, sb,
                        offsets[li], flag)
                ox, oy, oz, f = self._tail_body(pool_x, pool_y, pool_z, src, sgn)
                return pool_x, pool_y, pool_z, ox, oy, oz, flag | f

            self._level_jit[key] = jax.jit(prog, donate_argnums=(0, 1, 2))
        return self._level_jit[key]

    def _level_step_jit(self, size: int, affine: bool):
        key = ("level", size, affine)
        if key not in self._level_jit:
            body = functools.partial(self._level_body, affine)
            if jax.default_backend() == "cpu":
                # eager on CPU: per-field-op cached jits, no mega-compiles
                self._level_jit[key] = body
            else:
                self._level_jit[key] = jax.jit(body, donate_argnums=(0, 1, 2))
        return self._level_jit[key]

    def _tail_jit(self, nb2: int):
        key = ("tail", nb2)
        if key not in self._level_jit:
            if jax.default_backend() == "cpu":
                self._level_jit[key] = self._tail_body
            else:
                self._level_jit[key] = jax.jit(self._tail_body)
        return self._level_jit[key]

    def run_window(self, pool: JPoints, plan: WindowPlan, c: int,
                   sig: tuple | None = None):
        """Execute one window plan; returns (pool arrays, partial, flag).

        `sig` is the canonical padded level signature (from
        `canonical_signature`); plans with fewer levels are padded with
        no-op levels (infinity + infinity written to the spare region)."""
        if sig is None:
            sig = canonical_signature([plan])
        px, py, pz = pool.X, pool.Y, pool.Z
        offsets = []
        args = []
        for li, (size, affine) in enumerate(sig):
            # padded / no-op writes land in the end-aligned spare region the
            # pool reserves beyond all real entries (see msm_pippenger)
            pad_off = px.shape[0] - size
            if li < len(plan.levels):
                lv = plan.levels[li]
                pad = size - lv.n_pairs
                args.append(np.concatenate([lv.a_idx, np.zeros(pad, np.int32)]))
                args.append(np.concatenate([lv.b_idx, np.zeros(pad, np.int32)]))
                args.append(np.concatenate([lv.sa, np.ones(pad, np.int32)]))
                args.append(np.concatenate([lv.sb, np.ones(pad, np.int32)]))
                offsets.append(lv.out_offset)
            else:
                zeros = np.zeros(size, np.int32)
                ones = np.ones(size, np.int32)
                args.extend([zeros, zeros, ones, ones])
                offsets.append(pad_off)
        nb2 = 1 << (c - 1)
        src = np.zeros(nb2, dtype=np.int32)
        sgn = np.ones(nb2, dtype=np.int32)
        src[:nb2] = plan.bucket_src[1:nb2 + 1]
        sgn[:nb2] = plan.bucket_sign[1:nb2 + 1]
        if self.fuse_window:
            prog = self._window_prog(sig, nb2)
            out = prog(px, py, pz, jnp.asarray(np.asarray(offsets, np.int32)),
                       jnp.asarray(src), jnp.asarray(sgn),
                       *[jnp.asarray(a) for a in args])
            px, py, pz, ox, oy, oz, flag = out
            return (px, py, pz), JPoints(ox, oy, oz), flag
        flag = jnp.zeros((), jnp.int32)
        for li, (size, affine) in enumerate(sig):
            if li >= len(plan.levels):
                break      # split mode needs no no-op padding levels
            a_idx, b_idx, sa, sb = args[li * 4:li * 4 + 4]
            step = self._level_step_jit(size, affine)
            px, py, pz, flag = step(px, py, pz, jnp.asarray(a_idx),
                                    jnp.asarray(b_idx), jnp.asarray(sa),
                                    jnp.asarray(sb), offsets[li], flag)
        ox, oy, oz, f = self._tail_jit(nb2)(px, py, pz, jnp.asarray(src),
                                            jnp.asarray(sgn))
        return (px, py, pz), JPoints(ox, oy, oz), flag | f


def canonical_signature(plans: list[WindowPlan]) -> tuple:
    """Max padded level sizes across windows -> one compiled window program.

    A level is marked affine only if EVERY window has that level and it is
    affine there: windows lacking the level run it as a no-op (infinity +
    infinity), which only the full-add formula handles without raising the
    degenerate flag."""
    n_levels = max((len(p.levels) for p in plans), default=0)
    sig = []
    for li in range(n_levels):
        size = 256
        affine = True
        for p in plans:
            if li < len(p.levels):
                size = max(size, _round_up(p.levels[li].n_pairs))
                affine = affine and p.levels[li].affine
            else:
                affine = False
        sig.append((size, affine))
    return tuple(sig)

def _pool_for(jc: JCurve, points: JPoints, pool_size: int) -> JPoints:
    """slot 0 = infinity, slots 1..N = inputs, rest scratch (infinity)."""
    ush = tuple(jc.F.unit_shape)
    zeros = (0,) * jc.F.unit_ndim
    one = jc.F.ones(())
    px = jnp.zeros((pool_size,) + ush, jnp.int32).at[0].set(one)
    py = jnp.zeros((pool_size,) + ush, jnp.int32).at[0].set(one)
    pz = jnp.zeros((pool_size,) + ush, jnp.int32)
    px = jax.lax.dynamic_update_slice(px, points.X, (1,) + zeros)
    py = jax.lax.dynamic_update_slice(py, points.Y, (1,) + zeros)
    pz = jax.lax.dynamic_update_slice(pz, points.Z, (1,) + zeros)
    return JPoints(px, py, pz)


@functools.lru_cache(maxsize=None)
def _engine_for(jc: JCurve, backend: str) -> PippengerEngine:
    if backend == "pallas":
        from .pallas.curve_kernels import make_add_fns
        add_fn, aadd_fn, dbl_fn = make_add_fns(jc)
        return PippengerEngine(jc, add_fn, aadd_fn, dbl_fn, fuse_window=True)
    return PippengerEngine(jc, fuse_window=False)


def _auto_c(n: int) -> int:
    if n >= 1 << 17:
        return 16
    if n >= 1 << 10:
        return 13
    return 8


def msm_pippenger(curve: SWCurve, points: list[Point] | JPoints,
                  scalars: Sequence[int], c: int | None = None,
                  nbits: int | None = None, backend: str | None = None,
                  inf_mask: np.ndarray | None = None,
                  points_affine: bool | None = None) -> Point:
    """Full MSM on device via host-scheduled Pippenger; returns a host Point.

    `points_affine`: True when every non-infinity input has Z == 1 (enables
    the 4M+2S affine-add formula on level 0).  Host `Point` lists are packed
    affine; device `JPoints` are assumed general Jacobian unless declared.
    """
    jc = jcurve_for(curve)
    n = len(scalars)
    if n == 0:
        return curve.infinity()
    if nbits is None:
        nbits = curve.scalar_field.bits
    if c is None:
        c = min(_auto_c(n), max(2, nbits))
    if backend is None:
        # "pallas": fused whole-point-op Mosaic kernels
        # (`pallas/curve_kernels.py`) — fastest steady-state; the Mosaic
        # compiles are minutes-long the FIRST time but persistently cached
        # (`jax_setup`).  "jc": composed-XLA curve formulas (field muls
        # still route through the Pallas Montgomery-mul kernel on TPU via
        # the JField.mul backend switch) — the CPU/test path and the only
        # path for extension-field curves (G2) for now.
        backend = os.environ.get(
            "CRYPTO_TPU_MSM_BACKEND",
            "pallas" if jax.default_backend() == "tpu" else "jc")
    if jc.F.unit_ndim != 1 and backend == "pallas":
        backend = "jc"   # fused kernels are prime-field-only today
    engine = _engine_for(jc, backend)

    digits = signed_digits(scalars, c, nbits)           # (W, N)
    if not isinstance(points, JPoints):
        points = jc.pack_points(points)   # packed affine (Z in {0,1})
        if points_affine is None:
            points_affine = True
        if inf_mask is None:
            inf_mask = np.asarray(jax.device_get(jc.is_infinity(points)))
    if points_affine is None:
        points_affine = False
    if inf_mask is None:
        inf_mask = np.asarray(jax.device_get(jc.is_infinity(points)))

    W = digits.shape[0]
    pool_base = n + 1
    plans = []
    pool_size = pool_base
    for w in range(W):
        plan, end = plan_window(digits[w], inf_mask, c, pool_base,
                                points_affine=points_affine)
        plans.append(plan)
        pool_size = max(pool_size, end)
        for lv in plan.levels:
            # level writes are padded to _round_up(n_pairs) rows; the pool
            # must cover the padded write or dynamic_update_slice clamps the
            # start index and corrupts earlier slots
            pool_size = max(pool_size, lv.out_offset + _round_up(lv.n_pairs))

    sig = canonical_signature(plans)
    # end-aligned spare region for padded / no-op level writes
    pool_size += max((s for s, _ in sig), default=0)
    pool0 = _pool_for(jc, points, pool_size)
    window_outs = []
    flags = []
    pool_arrays = (pool0.X, pool0.Y, pool0.Z)
    for w in range(W):
        pool = JPoints(*pool_arrays)
        pool_arrays_new, out, flag = engine.run_window(pool, plans[w], c, sig)
        # pool scratch region is dirty but indices never cross windows;
        # reuse the same buffers (donated through the level steps)
        pool_arrays = pool_arrays_new
        window_outs.append(out)
        flags.append(flag)

    any_flag = int(jax.device_get(functools.reduce(jnp.bitwise_or, flags)))
    if any_flag:
        # degenerate same-point pair hit: redo with the total add formula
        if backend != "jc":
            return msm_pippenger(curve, points, scalars, c=c, nbits=nbits,
                                 backend="jc", inf_mask=inf_mask,
                                 points_affine=points_affine)
        raise AssertionError("degenerate-pair flag raised by total add path")

    wins = JPoints(jnp.stack([o.X for o in window_outs]),
                   jnp.stack([o.Y for o in window_outs]),
                   jnp.stack([o.Z for o in window_outs]))
    host_pts = jc.unpack(wins)
    acc = curve.infinity()
    for wpt in reversed(host_pts):
        for _ in range(c):
            acc = acc.double()
        acc = acc + wpt
    return acc
