"""Device-scheduled Pippenger MSM with batched-affine bucket reduction.

v2 of the MSM engine (supersedes the host-scheduled `ops/pippenger.py` on
TPU).  Motivation, measured at 2^20 on v5e through the remote-TPU tunnel
(benches/dev_msm_profile.py):

    host digit extraction   4.1 s
    host window planning    5.7 s
    index-array transfer    5.4 s   (286 MB at ~53 MB/s!)
    device compute          7.4 s   (Jacobian adds, ~21 muls each)

v1 moves ~40 B of indices per point per window over a ~50 MB/s link; v2
keeps everything on device and cuts per-add cost ~3x:

1.  **Digits on device**: scalars arrive once as packed LE bytes (N x 32 B)
    or as an already-device-resident digit tensor (the SNARK prover's
    h-vector never leaves the device).  Signed 16-bit window digits are
    extracted with vectorized int ops.
2.  **Layout on device**: per window, a stable argsort of bucket keys
    groups points by bucket; searchsorted start offsets + in-bucket ranks
    place them in a bucket-major layout with power-of-two stride PAD
    (pure gathers, no scatter).  PAD is chosen from the max bucket
    occupancy (single scalar readback per MSM).
3.  **Batched-affine halving reduction**: log2(PAD) levels of adjacent-pair
    additions in AFFINE coordinates.  Each level inverts all pair
    denominators at once with a log-depth product tree (3 muls/elem
    amortized + one Fermat inversion of a single element), then applies
    the unified affine add/double formula (~7 muls total vs ~21 for the
    Jacobian full add).  The formula is TOTAL: doubling, P + (-P),
    infinity operands all handled by selects — no degenerate-pair flags,
    no retries.
4.  The per-bucket sums feed the same two-axis weighted-sum tail (also in
    batched-affine arithmetic), and windows Horner-combine on host.

All field muls route through `JField.mul` (the fused Pallas Montgomery
kernel on TPU), so no new Mosaic kernels are required.

Reference: replaces arkworks `VariableBaseMSM::msm_bigint` call sites
(`legogroth16/src/prover.rs:286-300` etc.).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..curves.sw import SWCurve, Point
from ..curves.jcurve import JCurve, JPoints, jcurve_for
from .pippenger import scalars_to_bytes


# ---------------------------------------------------------------------------
# digit extraction on device
# ---------------------------------------------------------------------------

def device_digits(sbytes: jnp.ndarray, c: int, nbits: int) -> jnp.ndarray:
    """(N, nbytes) uint8/int32 LE bytes -> (W, N) int32 signed digits in
    [-2^(c-1), 2^(c-1)].  Mirrors host `pippenger.signed_digits`."""
    assert c in (8, 16), "device digit extraction supports c in {8, 16}"
    W = (nbits + c) // c
    b = sbytes.astype(jnp.int32)
    if c == 16:
        raw = b[:, 0:2 * W:2] + (b[:, 1:2 * W:2] << 8)      # (N, W)
    else:
        raw = b[:, :W]
    half = 1 << (c - 1)
    full = 1 << c
    outs = []
    carry = jnp.zeros((raw.shape[0],), jnp.int32)
    for w in range(W):
        d = raw[:, w] + carry
        wrap = d > half
        outs.append(jnp.where(wrap, d - full, d))
        carry = wrap.astype(jnp.int32)
    return jnp.stack(outs)                                  # (W, N)


# ---------------------------------------------------------------------------
# batched-affine group arithmetic (struct: x, y, inf-mask)
# ---------------------------------------------------------------------------

def batch_inv(F, v: jnp.ndarray) -> jnp.ndarray:
    """Batched modular inversion via a log-depth product tree: ~3 muls per
    element + one Fermat inversion at the root.  v must be nonzero
    (callers select 1 into dead lanes); leading axis must be a power of 2."""
    n = v.shape[0]
    if n == 1:
        return F.inv(v)
    if n & (n - 1):
        # pad with ones to the next power of two
        m = 1 << n.bit_length()
        ones = jnp.broadcast_to(F.ones(()), (m - n,) + v.shape[1:]).astype(v.dtype)
        return batch_inv(F, jnp.concatenate([v, ones]))[:n]
    # up-sweep: pairwise products
    levels = [v]
    cur = v
    while cur.shape[0] > 1:
        cur = F.mul(cur[0::2], cur[1::2])
        levels.append(cur)
    root_inv = F.inv(cur)                       # (1, L)
    # down-sweep: inv of each child = parent_inv * sibling
    inv = root_inv
    for lev in reversed(levels[:-1]):
        # lev: (2m, ...), inv: (m, ...) = inverses of pairwise products
        left = lev[0::2]
        right = lev[1::2]
        inv_left = F.mul(inv, right)
        inv_right = F.mul(inv, left)
        out = jnp.stack([inv_left, inv_right], axis=1)
        inv = out.reshape((-1,) + out.shape[2:])
    return inv


class AffinePoints:
    """(x, y, inf) struct-of-arrays; x/y are field tensors, inf bool."""
    __slots__ = ("x", "y", "inf")

    def __init__(self, x, y, inf):
        self.x, self.y, self.inf = x, y, inf


def affine_pair_add(F, P: AffinePoints, Q: AffinePoints) -> AffinePoints:
    """Total unified affine add/double of elementwise pairs.

    ~7 field muls per pair: 1 square (3x^2 numerator), 3 amortized in
    `batch_inv`, lambda, lambda^2, y3.  Handles doubling, inverses and
    infinities via selects."""
    one = F.ones(())
    x1, y1, i1 = P.x, P.y, P.inf
    x2, y2, i2 = Q.x, Q.y, Q.inf
    same_x = F.eq(x1, x2)
    y_opp = F.eq(y1, F.neg(y2))
    both = (~i1) & (~i2)
    is_dbl = same_x & (~y_opp) & both
    is_inf3 = (same_x & y_opp & both) | (i1 & i2)
    # denominator: 2y1 for doubling else x2 - x1; 1 in dead lanes
    d = F.select(is_dbl, F.double(y1), F.sub(x2, x1))
    dead = ~both | is_inf3
    d = F.select(dead | is_inf3, jnp.broadcast_to(one, d.shape).astype(d.dtype), d)
    dinv = batch_inv(F, d)
    x1sq = F.square(x1)
    num = F.select(is_dbl, F.add(F.double(x1sq), x1sq), F.sub(y2, y1))
    lam = F.mul(num, dinv)
    x3 = F.sub(F.sub(F.square(lam), x1), x2)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
    # pass-throughs
    x3 = F.select(i1, x2, F.select(i2 & ~i1, x1, x3))
    y3 = F.select(i1, y2, F.select(i2 & ~i1, y1, y3))
    inf3 = is_inf3
    return AffinePoints(x3, y3, inf3)


def affine_halve(F, P: AffinePoints) -> AffinePoints:
    """One halving level: add element k to element k + n/2 (half-split
    pairing).  With the RANK-MAJOR bucket layout (slot = rank*B + bucket)
    the two halves hold the same bucket sequence, so half-split pairs are
    same-bucket AND contiguous — no strided relayouts on TPU."""
    n = P.x.shape[0]
    half = n // 2
    A = AffinePoints(P.x[:half], P.y[:half], P.inf[:half])
    B = AffinePoints(P.x[half:], P.y[half:], P.inf[half:])
    return affine_pair_add(F, A, B)


def affine_tree_sum(F, P: AffinePoints) -> AffinePoints:
    """Reduce the leading (pow2) axis to a single point."""
    while P.x.shape[0] > 1:
        P = affine_halve(F, P)
    return P


def affine_weighted_sum(F, P: AffinePoints) -> AffinePoints:
    """sum_i (i+1) * P_i over a pow2-length axis, via bit-decomposition
    masked tree sums + Horner doubling (mirrors pippenger._tail_body but
    with the +1 shift folded in: weight of position i is i+1)."""
    n = P.x.shape[0]
    nbits = n.bit_length()          # weights 1..n need ceil(log2(n+1)) bits
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)
    masks = ((idx[None, :] >> jnp.arange(nbits, dtype=jnp.int32)[:, None]) & 1) > 0
    xs = jnp.broadcast_to(P.x[None], (nbits,) + P.x.shape)
    ys = jnp.broadcast_to(P.y[None], (nbits,) + P.y.shape)
    infs = jnp.broadcast_to(P.inf[None], (nbits,) + P.inf.shape)
    stacked = AffinePoints(xs, ys, infs | ~masks)
    # reduce axis 1 (length n) to 1
    cur = stacked
    m = n
    while m > 1:
        half = m // 2
        A = AffinePoints(cur.x[:, :half], cur.y[:, :half], cur.inf[:, :half])
        B = AffinePoints(cur.x[:, half:m], cur.y[:, half:m], cur.inf[:, half:m])
        # flatten to pow2 leading axis for batch_inv
        flat = affine_pair_add(
            F,
            AffinePoints(A.x.reshape((-1,) + A.x.shape[2:]),
                         A.y.reshape((-1,) + A.y.shape[2:]),
                         A.inf.reshape(-1)),
            AffinePoints(B.x.reshape((-1,) + B.x.shape[2:]),
                         B.y.reshape((-1,) + B.y.shape[2:]),
                         B.inf.reshape(-1)))
        cur = AffinePoints(flat.x.reshape((nbits, half) + flat.x.shape[1:]),
                           flat.y.reshape((nbits, half) + flat.y.shape[1:]),
                           flat.inf.reshape(nbits, half))
        m = half
    bitsums = AffinePoints(cur.x[:, 0], cur.y[:, 0], cur.inf[:, 0])
    acc = AffinePoints(bitsums.x[nbits - 1:nbits], bitsums.y[nbits - 1:nbits],
                       bitsums.inf[nbits - 1:nbits])
    for bpos in range(nbits - 2, -1, -1):
        acc = affine_pair_add(F, acc, acc)          # double
        acc = affine_pair_add(
            F, acc, AffinePoints(bitsums.x[bpos:bpos + 1],
                                 bitsums.y[bpos:bpos + 1],
                                 bitsums.inf[bpos:bpos + 1]))
    return acc


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

def _layout_plan(dw, inf, B: int):
    """One window's bucket-sort plan: (order (N,), starts (B,), counts (B,))."""
    absd = jnp.abs(dw)
    live = (absd > 0) & (~inf)
    keys = jnp.where(live, absd - 1, B).astype(jnp.int32)
    order = jnp.argsort(keys, stable=True)
    sk = keys[order]
    starts = jnp.searchsorted(sk, jnp.arange(B, dtype=jnp.int32))
    ends = jnp.searchsorted(sk, jnp.arange(1, B + 1, dtype=jnp.int32))
    counts = (ends - starts).astype(jnp.int32)
    return order, starts.astype(jnp.int32), counts


@functools.partial(jax.jit, static_argnums=(2,))
def _plan_windows(digits, inf_mask, B):
    """All windows' plans in ONE program: digits (W, N) ->
    (order (W, N), starts (W, B), counts (W, B), occs (W,)).  The per-window
    bucket programs reuse this sort instead of re-sorting (the occupancy
    pass needed it anyway)."""
    orders, starts, counts = [], [], []
    for w in range(digits.shape[0]):
        o, s, cn = _layout_plan(digits[w], inf_mask, B)
        orders.append(o)
        starts.append(s)
        counts.append(cn)
    counts = jnp.stack(counts)
    return (jnp.stack(orders), jnp.stack(starts), counts,
            jnp.max(counts, axis=1))


# count-profile resolution for the staircase bands; occupancies above this
# fall back to the uniform-grid path (adversarially skewed digits)
MAX_PROFILE_RANK = 256


@functools.partial(jax.jit, static_argnums=(2,))
def _plan_windows_sorted(digits, inf_mask, B):
    """Like `_plan_windows`, plus per-window count-DESC bucket permutation
    and occupancy profile for the staircase-band layout:
    (order (W,N), starts_p (W,B), counts_p (W,B), invperm (W,B),
     nprofile (W, MAX_PROFILE_RANK) with nprofile[w,r] = #buckets with
     count > r, occs (W,))."""
    W = digits.shape[0]
    orders, starts_p, counts_p, invperms, nprof = [], [], [], [], []
    for w in range(W):
        o, s, cn = _layout_plan(digits[w], inf_mask, B)
        perm = jnp.argsort(-cn, stable=True)
        cp = cn[perm]
        invperm = jnp.zeros((B,), jnp.int32).at[perm].set(
            jnp.arange(B, dtype=jnp.int32))
        asc = cp[::-1]
        n_r = B - jnp.searchsorted(
            asc, jnp.arange(MAX_PROFILE_RANK, dtype=jnp.int32), side="right")
        orders.append(o)
        starts_p.append(s[perm])
        counts_p.append(cp)
        invperms.append(invperm)
        nprof.append(n_r.astype(jnp.int32))
    counts_p = jnp.stack(counts_p)
    return (jnp.stack(orders), jnp.stack(starts_p), counts_p,
            jnp.stack(invperms), jnp.stack(nprof),
            jnp.max(counts_p, axis=1))


def _build_bands(nprof: np.ndarray, occ: int, B: int,
                 max_h: int = 64, min_q: int = 4096) -> tuple:
    """Greedy staircase: cover ranks [0, occ) with (Q, h, r0) bands where
    Q = #buckets needing rank r0 rounded up to a multiple of B/16 (>=32),
    and h grows (pow2) until the profile drops below 3/4 Q.  Slots ~=
    integral of the occupancy profile, vs occ*B for the uniform grid.
    (Pow2-rounded Q lost up to 2x slots on shallow-decay profiles — the
    top window's truncated digit range, see `_model_bands` — the finer
    step keeps the maxed body+top profile at ~1.25N slots.)

    `min_q`: once the profile drops below this width, emit ONE final band
    covering all remaining ranks instead of a tail of ~10 skinny bands.
    Each band pays fixed per-level costs (kernel-block padding, inversion
    trees too small to amortize) that dwarf its compute: at 2^20/c=16 the
    merged tail adds ~5% slots but removes ~10 bands' overhead."""
    bands = []
    r = 0
    occ = int(occ)
    q_step = max(32, B >> 4)
    while r < occ:
        n_r = int(nprof[r]) if r < len(nprof) else 1
        n_r = max(n_r, 1)
        Q = min(B, -(-n_r // q_step) * q_step)
        if Q < min_q or Q * (occ - r) <= 2 * min_q:
            # final merged band: cover the remaining ranks in one go
            # (pow2 height for the halving chain; extra ranks are dead)
            h = 1 << max(0, (occ - r - 1).bit_length())
            bands.append((Q, h, r))
            break
        h = 1
        while r + h < occ and h < max_h:
            nxt = int(nprof[min(r + h, len(nprof) - 1)])
            if min(B, -(-max(nxt, 1) // q_step) * q_step) < Q:
                break
            h *= 2
        bands.append((Q, h, r))
        r += h
    return tuple(bands)


def _poisson_profile(n_keys: int, lam: float, B: int) -> tuple:
    """(nprof, occ): expected #buckets with count > r for occupancy ~
    Poisson(lam) over `n_keys` active buckets, with a +4-sigma + 8 margin,
    capped at B; occ = first rank where the mean drops below 1e-4."""
    import math
    R = MAX_PROFILE_RANK
    nprof = np.zeros(R, dtype=np.int64)
    occ = R
    # iterate the Poisson pmf; survival S(r) = P(Occ > r).  For lam >~ 700
    # exp(-lam) underflows to 0 and the model degenerates to nprof == B
    # everywhere — conservatively correct, and unreachable in practice (the
    # MAX_PROFILE_RANK occupancy gate already routed such shapes to the
    # grid path).
    pmf = math.exp(-lam)
    cdf = pmf
    for r in range(R):
        s = max(0.0, 1.0 - cdf)
        mean = n_keys * s
        n_r = mean + 4.0 * math.sqrt(mean + 1.0) + 8.0
        nprof[r] = min(B, min(n_keys, int(math.ceil(n_r))))
        if mean < 1e-4 and occ == R:
            occ = r + 1
            break
        pmf *= lam / (r + 1)
        cdf += pmf
    return nprof, min(occ, R)


@functools.lru_cache(maxsize=None)
def _model_bands(N: int, c: int, max_h: int = 64,
                 top_keys: int | None = None) -> tuple:
    """Deterministic staircase bands for UNIFORM scalars from the Poisson
    occupancy model (bucket occupancy ~ Poisson(N/B) for signed window
    digits), with a +4-sigma, pow2-rounded margin on every rank's bucket
    count: (bands, occ_model).

    `top_keys`: number of distinct digit values in the TOP window (the
    scalar modulus truncated: e.g. BLS12-381 Fr at c=16 has only 0x73ee ~=
    0.91*B top-window values, so that window runs hotter — Poisson(N/29678)
    vs Poisson(N/32768)).  The model profile is the elementwise max of the
    body-window and top-window profiles so ONE program covers every window
    (pre-round-5, the top window silently escaped the model and every
    2^20 MSM compiled a second exact-bands program).

    One band tuple per (N, c, top_keys) means ONE compiled window program
    per size class, instead of a fresh ~10-min XLA compile whenever a new
    scalar set's exact count profile shifts a band boundary by one rank
    (the failure mode flagged in round-3 review).  Correctness never rests
    on the model: `msm_device_scheduled` checks the actual count profile
    against the bands and falls back to exact per-run bands if any rank is
    uncovered (adversarial/structured digit distributions)."""
    B = 1 << (c - 1)
    nprof, occ_model = _poisson_profile(B, N / B, B)
    if top_keys is not None and 0 < top_keys:
        np_top, occ_top = _poisson_profile(min(top_keys, B),
                                           N / min(top_keys, B), B)
        nprof = np.maximum(nprof, np_top)
        occ_model = max(occ_model, occ_top)
    return _build_bands(nprof, occ_model, B, max_h=max_h), occ_model


def _bands_cover(bands: tuple, nprof_actual: np.ndarray, occ: int) -> bool:
    """True iff every (bucket, rank) slot the actual count profile needs is
    inside some band: for all r < occ, Q_band(r) >= #buckets with count > r."""
    height = sum(h for (_, h, _) in bands)
    if occ > height:
        return False
    for (Q, h, r0) in bands:
        hi = min(r0 + h, occ)
        if r0 < hi and np.any(nprof_actual[r0:hi] > Q):
            return False
    return True


def _inv_t(F, v: jnp.ndarray) -> jnp.ndarray:
    """Transposed (U, n) -> elementwise inverses via F.inv (U = prod of
    F.unit_shape; works for base and tower fields)."""
    U, n = v.shape
    std = v.T.reshape((n,) + tuple(F.unit_shape))
    return F.inv(std).reshape(n, U).T


def batch_inv_t(F, v: jnp.ndarray, mulT, blk: int = 512) -> jnp.ndarray:
    """Transposed-layout batch inversion: v (U, n) nonzero -> elementwise
    inverses, via the half-split product tree (3 muls/elem amortized) with
    every mul running the fused Pallas Montgomery kernel (`mulT`; U = L for
    the base field, 2L for Fq2)."""
    U, n = v.shape

    def pad_to_block(a):
        b = a.shape[1]
        pad = (-b) % blk
        if pad == 0:
            return a, b
        onev = jnp.zeros((U, pad), jnp.int32).at[0, :].set(1)
        return jnp.concatenate([a, onev], axis=1), b

    def mul(a, b):
        m = a.shape[1]
        ap, _ = pad_to_block(a)
        bp, _ = pad_to_block(b)
        return mulT(ap, bp)[:, :m]

    if n == 1:
        return _inv_t(F, v)
    levels = [v]
    cur = v
    while cur.shape[1] > 1:
        h = cur.shape[1] // 2
        cur = mul(cur[:, :h], cur[:, h:])
        levels.append(cur)
    root_inv = _inv_t(F, cur)                    # (U, 1)
    inv = root_inv
    for lev in reversed(levels[:-1]):
        h = lev.shape[1] // 2
        lo = lev[:, :h]
        hi = lev[:, h:]
        inv_lo = mul(inv, hi)
        inv_hi = mul(inv, lo)
        inv = jnp.concatenate([inv_lo, inv_hi], axis=1)
    return inv


class DeviceMSM:
    """Per-curve jit cache for the window program."""

    def __init__(self, jc: JCurve):
        self.jc = jc
        self.F = jc.F
        self._jits = {}

    def window_program(self, N: int, c: int, PAD: int, rounds: int = 1):
        key = (N, c, PAD, rounds)
        if key in self._jits:
            return self._jits[key]
        B = 1 << (c - 1)
        F = self.F
        bucket_sums = self.bucket_sums_fn(c, PAD, rounds)
        tail = self.tail_fn(c)

        def full(dw, x, y, inf):
            P, maxc, flag = bucket_sums(dw, x, y, inf)
            ox, oy, oinf = tail(P.x, P.y, P.inf)
            return ox, oy, oinf, maxc, flag

        prog = full if jax.default_backend() == "cpu" else jax.jit(full)
        self._jits[key] = prog
        return prog

    def window_program_planned(self, N: int, c: int, PAD: int,
                               rounds: int = 1, fast: bool = True):
        """Fused bucket-sums + tail taking the precomputed sort plan.
        Measured on v5e: the fused-in-window tail (61 ms) beats the
        (W,)-batched standalone tail program (2.2 s for 16 windows — XLA
        schedules the composed Jacobian reductions poorly when they are
        the whole program); enable the batched tail with
        CRYPTO_TPU_BATCHED_TAIL=1."""
        key = ("wp", N, c, PAD, rounds, fast)
        if key in self._jits:
            return self._jits[key]
        bucket_sums = self.bucket_sums_fn(c, PAD, rounds, planned=True,
                                          fast=fast)
        tail = self.tail_fn(c)

        def full(dw, x, y, inf, order, starts, counts):
            P, maxc, flag = bucket_sums(dw, x, y, inf, order, starts, counts)
            ox, oy, oinf = tail(P.x, P.y, P.inf)
            return ox, oy, oinf, flag

        # On CPU (tests) run eagerly: each field op dispatches its own small
        # cached jit instead of one mega-graph whose XLA:CPU compile takes
        # minutes.  On TPU the fused program amortizes the remote dispatch.
        prog = full if jax.default_backend() == "cpu" else jax.jit(full)
        self._jits[key] = prog
        return prog

    def bucket_sums_fn(self, c: int, PAD: int, rounds: int = 1,
                       planned: bool = False, fast: bool = False):
        """dw (N,), x/y (N, unit), inf (N,) -> (AffinePoints (B,), max
        occupancy): digit-bucket layout + batched-affine halving reduction.

        `planned=True` returns a variant taking the precomputed sort plan
        (order, starts, counts) from `_plan_windows` — one batched plan
        program replaces the per-window argsort+searchsorted (~40 ms/window
        at 2^20 on v5e, and the occupancy pass needs the same sort anyway).

        `rounds`: int r (r rounds of PAD ranks each) or an explicit tuple of
        per-round pow2 pads, e.g. (64, 1) for max occupancy 65 — each round
        lays out the next `pad` ranks and accumulates into a running bucket
        vector.  Shrinking pads make overflow cheap: a bucket one past PAD
        costs one (B,) pass, not a full second grid.  Skewed digit
        distributions (structured/adversarial scalars) get more rounds
        instead of a memory-exploding PAD.

        This is the shardable stage: data-parallel over points, combined
        across shards by adding bucket vectors."""
        B = 1 << (c - 1)
        F = self.F
        pads = tuple(rounds) if isinstance(rounds, (tuple, list)) \
            else (PAD,) * int(rounds)

        def bucket_sums(dw, x, y, inf, order=None, starts=None, counts=None):
            if order is None:
                order, starts, counts = _layout_plan(dw, inf, B)
            maxc = jnp.max(counts)
            # RANK-MAJOR layout: slot = rank*B + bucket, so the half-split
            # pairing of `affine_halve` always pairs same-bucket entries
            # with zero relayout, and the final level is bucket-ordered.
            acc = None
            off = 0
            for pad_r in pads:
                bgrid = jnp.tile(jnp.arange(B, dtype=jnp.int32), pad_r)
                rgrid = jnp.repeat(jnp.arange(pad_r, dtype=jnp.int32), B)
                rank = off + rgrid
                pos = starts[bgrid] + rank
                valid = rank < counts[bgrid]
                srcp = jnp.where(valid, order[jnp.where(valid, pos, 0)], 0)
                sx = x[srcp]
                sy = y[srcp]
                sgn = dw[srcp]
                sy = F.select((sgn < 0) & valid, F.neg(sy), sy)
                P = AffinePoints(sx, sy, ~valid)
                while P.x.shape[0] > B:
                    P = affine_halve(F, P)
                acc = P if acc is None else affine_pair_add(F, acc, P)
                off += pad_r
            return acc, maxc, jnp.zeros((), jnp.int32)

        on_tpu = (jax.default_backend() == "tpu"
                  or bool(__import__("os").environ.get(
                      "CRYPTO_TPU_FORCE_TPU_MSM")))
        if not on_tpu or F.unit_ndim not in (1, 2):
            fn = bucket_sums
        else:
            fn = self._bucket_sums_tpu(c, PAD, rounds, fast=fast)
        if planned:
            return fn
        return lambda dw, x, y, inf: fn(dw, x, y, inf)

    def _fused_ctx(self, fast: bool = False):
        """(halve_t, pair_add_t, U, ush): the fused-Pallas batched-affine
        level machinery in transposed (U, M) layout, shared by the grid and
        staircase-band bucket reductions.

        Every pair_add/halve returns (x3, y3, inf3, zflag).  In the default
        SAFE mode the kernels implement the total unified add/double and
        zflag is the constant 0.  With `fast=True` (G1 only) the kernels
        assume distinct non-opposite operands — valid for every real MSM
        workload with distinct bases — and a colliding pair surfaces as a
        ZERO denominator, which zeroes its inversion product; zflag != 0
        reports it and `msm_device_scheduled` reruns that window through
        the safe program (`window_program_bands(..., fast=False)`)."""
        F = self.F
        if F.unit_ndim == 1:
            from .pallas.curve_kernels import (affine_kernels_for,
                                               affine_kernels_fast)
            from .pallas.field_kernels import mont_mul_t_fn
            base = F
            if fast:
                pre, post = affine_kernels_fast(base.L, base.p,
                                                base.field.Ninv_R)
            else:
                pre, post = affine_kernels_for(base.L, base.p,
                                               base.field.Ninv_R)
            mulT = mont_mul_t_fn(base.L, base.p, base.field.Ninv_R)
            BLK = 512   # affine kernels' pallas block (one-hot VMEM bound)
        else:           # Fq2 (G2): safe kernels only
            from .pallas.curve_kernels import (affine_kernels_for_fq2,
                                               fq2_mul_t_fn, FQ2_BLOCK)
            fast = False
            base = F.base
            assert F.beta_is_m1, "fused Fq2 kernels assume beta == -1"
            pre, post = affine_kernels_for_fq2(base.L, base.p,
                                               base.field.Ninv_R)
            mulT = fq2_mul_t_fn(base.L, base.p, base.field.Ninv_R)
            BLK = FQ2_BLOCK
        U = base.L * (1 if F.unit_ndim == 1 else 2)
        ush = tuple(F.unit_shape)
        zero_flag = jnp.zeros((), jnp.int32)

        def _pad6(x1, y1, m1, x2, y2, m2, blk):
            h = x1.shape[1]
            pad = (-h) % blk
            if pad:
                zL = jnp.zeros((U, pad), jnp.int32)
                z1 = jnp.ones((1, pad), jnp.int32)
                x1 = jnp.concatenate([x1, zL], axis=1)
                x2 = jnp.concatenate([x2, zL], axis=1)
                y1 = jnp.concatenate([y1, zL], axis=1)
                y2 = jnp.concatenate([y2, zL], axis=1)
                m1 = jnp.concatenate([m1, z1], axis=1)   # dead lanes
                m2 = jnp.concatenate([m2, z1], axis=1)
            return x1, y1, m1, x2, y2, m2, h, pad

        chunked = None
        if F.unit_ndim == 1 and not os.environ.get("CRYPTO_TPU_NO_CHUNKED"):
            from .pallas.curve_kernels import (chunked_level_kernels_for,
                                               chunked_level_kernels_fast,
                                               CHUNK_K, CHUNK_BW)
            CW = CHUNK_K * CHUNK_BW
            if fast:
                call_prefix, call_down = chunked_level_kernels_fast(
                    base.L, base.p, base.field.Ninv_R)

                def pair_add_t_chunked(x1, y1, m1, x2, y2, m2):
                    (x1, y1, m1, x2, y2, m2, h, pad) = _pad6(
                        x1, y1, m1, x2, y2, m2, CW)
                    prefix, total, inf3 = call_prefix(x1, y1, m1, x2, y2, m2)
                    # a zero chunk total == some live pair had d == 0
                    # (doubling/cancellation): flag for the safe rerun
                    zf = jnp.any(jnp.all(total == 0, axis=0)).astype(
                        jnp.int32)
                    tinv = batch_inv_t(F, total, mulT, BLK)
                    x3, y3 = call_down(x1, y1, m1, x2, y2, m2, prefix, tinv)
                    if pad:
                        x3, y3, inf3 = x3[:, :h], y3[:, :h], inf3[:, :h]
                    return x3, y3, inf3, zf
            else:
                call_prefix, call_down = chunked_level_kernels_for(
                    base.L, base.p, base.field.Ninv_R)

                def pair_add_t_chunked(x1, y1, m1, x2, y2, m2):
                    (x1, y1, m1, x2, y2, m2, h, pad) = _pad6(
                        x1, y1, m1, x2, y2, m2, CW)
                    prefix, total, mdbl, inf3 = call_prefix(
                        x1, y1, m1, x2, y2, m2)
                    tinv = batch_inv_t(F, total, mulT, BLK)
                    x3, y3 = call_down(x1, y1, m1, x2, y2, m2, prefix, tinv,
                                       mdbl)
                    if pad:
                        x3, y3, inf3 = x3[:, :h], y3[:, :h], inf3[:, :h]
                    return x3, y3, inf3, zero_flag

            chunked = pair_add_t_chunked

        if fast:
            def pair_add_t(x1, y1, m1, x2, y2, m2):
                (x1, y1, m1, x2, y2, m2, h, pad) = _pad6(
                    x1, y1, m1, x2, y2, m2, BLK)
                d, inf3 = pre(x1, y1, m1, x2, y2, m2)
                zf = jnp.any(jnp.all(d == 0, axis=0)).astype(jnp.int32)
                dinv = batch_inv_t(F, d, mulT, BLK)
                x3, y3 = post(x1, y1, x2, y2, dinv, m1, m2)
                if pad:
                    x3, y3, inf3 = x3[:, :h], y3[:, :h], inf3[:, :h]
                return x3, y3, inf3, zf
        else:
            def pair_add_t(x1, y1, m1, x2, y2, m2):
                (x1, y1, m1, x2, y2, m2, h, pad) = _pad6(
                    x1, y1, m1, x2, y2, m2, BLK)
                d, dbl, inf3 = pre(x1, y1, m1, x2, y2, m2)
                dinv = batch_inv_t(F, d, mulT, BLK)
                x3, y3 = post(x1, y1, x2, y2, dinv, dbl, m1, m2)
                if pad:
                    x3, y3, inf3 = x3[:, :h], y3[:, :h], inf3[:, :h]
                return x3, y3, inf3, zero_flag

        def dispatch_pair_add(x1, y1, m1, x2, y2, m2):
            # the chunked level wins above ~CW pairs (2 launches vs ~40);
            # below that, padding waste exceeds the saved overhead
            if chunked is not None and x1.shape[1] >= 4096:
                return chunked(x1, y1, m1, x2, y2, m2)
            return pair_add_t(x1, y1, m1, x2, y2, m2)

        def halve_t(xT, yT, mT):
            h = xT.shape[1] // 2
            return dispatch_pair_add(xT[:, :h], yT[:, :h], mT[:, :h],
                                     xT[:, h:], yT[:, h:], mT[:, h:])

        return halve_t, dispatch_pair_add, U, ush

    def _bucket_sums_tpu(self, c: int, PAD: int, rounds, fast: bool = False):
        """TPU variant: the halving levels run as fused Pallas kernels in
        transposed (U, M) layout (U = L for G1/Fq, 2L for G2/Fq2); the
        rank-major half-split pairing keeps every level a contiguous slab
        (no strided relayouts).  `rounds`: int or per-round pads tuple (see
        `bucket_sums_fn`)."""
        B = 1 << (c - 1)
        F = self.F
        pads = tuple(rounds) if isinstance(rounds, (tuple, list)) \
            else (PAD,) * int(rounds)
        halve_t, _pair_add_t, U, ush = self._fused_ctx(fast)

        def bucket_sums(dw, x, y, inf, order=None, starts=None, counts=None):
            if order is None:
                order, starts, counts = _layout_plan(dw, inf, B)
            maxc = jnp.max(counts)
            # PACKED payload: x and (sign-applied) y 15-bit limbs share one
            # int32 per limb position, so the latency-bound padded gather
            # reads HALF the rows-bytes and the per-slot sign gather
            # disappears.  Built per window (~N-row elementwise work).
            y_signed = F.select(dw < 0, F.neg(y), y)
            xy = (x | (y_signed << 15)).reshape(
                x.shape[0], -1)                           # (N, U), 30-bit
            use_dma = bool(__import__("os").environ.get(
                "CRYPTO_TPU_DMA_GATHER"))
            if not use_dma and xy.shape[1] < 128:
                # tile-aligned rows gather 3.1x faster (see bands variant)
                xy = jnp.concatenate(
                    [xy, jnp.zeros((xy.shape[0], 128 - xy.shape[1]),
                                   jnp.int32)], axis=1)
            accx = accy = accm = None
            off = 0
            flag = jnp.zeros((), jnp.int32)
            for pad_r in pads:
                bgrid = jnp.tile(jnp.arange(B, dtype=jnp.int32), pad_r)
                rgrid = jnp.repeat(jnp.arange(pad_r, dtype=jnp.int32), B)
                rank = off + rgrid
                off += pad_r
                pos = starts[bgrid] + rank
                valid = rank < counts[bgrid]
                srcp = jnp.where(valid, order[jnp.where(valid, pos, 0)], 0)
                if use_dma:
                    # scalar-prefetch DMA gather emits transposed directly;
                    # dead slots (idx -1) issue no DMA at all
                    from .pallas.field_kernels import gather_rows_t_fn
                    srcd = jnp.where(valid, srcp, -1).astype(jnp.int32)
                    sxyT = gather_rows_t_fn(U)(xy, srcd)
                else:
                    sxyT = xy[srcp].T[:U]                 # (U, M)
                xT = sxyT & 0x7FFF
                yT = sxyT >> 15
                mT = (~valid).astype(jnp.int32)[None, :]
                while xT.shape[1] > B:
                    xT, yT, mT, zf = halve_t(xT, yT, mT)
                    flag = jnp.maximum(flag, zf)
                if accx is None:
                    accx, accy, accm = xT, yT, mT
                else:
                    accx, accy, accm, zf = halve_t(
                        jnp.concatenate([accx, xT], axis=1),
                        jnp.concatenate([accy, yT], axis=1),
                        jnp.concatenate([accm, mT], axis=1))
                    flag = jnp.maximum(flag, zf)
            outx = accx.T.reshape((accx.shape[1],) + ush)
            outy = accy.T.reshape((accy.shape[1],) + ush)
            return AffinePoints(outx, outy, accm[0] > 0), maxc, flag

        return bucket_sums

    def _bucket_sums_tpu_bands_unified(self, c: int, bands: tuple,
                                       fast: bool = True):
        """Unified-level variant of `_bucket_sums_tpu_bands`: ONE
        `pair_add_t` call per halving level across ALL bands (segments
        concatenated), instead of one call per level per band.

        Every `pair_add_t` carries a batch-inversion whose tree root is a
        sequential ~380-step Fermat chain (measured ~3-10 ms of pure
        latency per call regardless of width) — so the staircase's ~14
        per-band level calls + 4 combines at 2^20/c=16 pay that latency ~17
        times.  Unifying the levels pays it max(log2 h_i) + #combines ~= 9
        times and feeds the mul kernels wider slabs (better MXU shapes)."""
        B = 1 << (c - 1)
        F = self.F
        halve_t, pair_add_t, U, ush = self._fused_ctx(fast)

        def bucket_sums_sorted(dw, x, y, inf, order, starts_p, counts_p,
                               bgrid_cat, rank_cat):
            y_signed = F.select(dw < 0, F.neg(y), y)
            xy = (x | (y_signed << 15)).reshape(x.shape[0], -1)
            if xy.shape[1] < 128:
                xy = jnp.concatenate(
                    [xy, jnp.zeros((xy.shape[0], 128 - xy.shape[1]),
                                   jnp.int32)], axis=1)
            # ONE gather over all bands: bgrid_cat/rank_cat are runtime
            # inputs (N_slots,) — as traced constants XLA folds them into
            # multi-MB literals that bloat the executable (slow relay
            # loads) and the compile itself
            pos = starts_p[bgrid_cat] + rank_cat
            valid = rank_cat < counts_p[bgrid_cat]
            srcp = jnp.where(valid, order[jnp.where(valid, pos, 0)], 0)
            sxyT = xy[srcp].T[:U]
            ax = sxyT & 0x7FFF
            ay = sxyT >> 15
            am = (~valid).astype(jnp.int32)[None, :]
            segs = []                       # [xT, yT, mT, Q] per band
            off = 0
            for (Q, h, r0) in bands:
                w = Q * h
                segs.append([ax[:, off:off + w], ay[:, off:off + w],
                             am[:, off:off + w], Q])
                off += w
            flag = jnp.zeros((), jnp.int32)
            # unified halving: one call per level across all active bands
            while any(s[0].shape[1] > s[3] for s in segs):
                active = [s for s in segs if s[0].shape[1] > s[3]]
                halves = [s[0].shape[1] // 2 for s in active]
                Lx = jnp.concatenate([s[0][:, :h] for s, h in
                                      zip(active, halves)], axis=1)
                Ly = jnp.concatenate([s[1][:, :h] for s, h in
                                      zip(active, halves)], axis=1)
                Lm = jnp.concatenate([s[2][:, :h] for s, h in
                                      zip(active, halves)], axis=1)
                Rx = jnp.concatenate([s[0][:, h:] for s, h in
                                      zip(active, halves)], axis=1)
                Ry = jnp.concatenate([s[1][:, h:] for s, h in
                                      zip(active, halves)], axis=1)
                Rm = jnp.concatenate([s[2][:, h:] for s, h in
                                      zip(active, halves)], axis=1)
                cx, cy, cm, zf = pair_add_t(Lx, Ly, Lm, Rx, Ry, Rm)
                flag = jnp.maximum(flag, zf)
                off = 0
                for s, h in zip(active, halves):
                    s[0] = cx[:, off:off + h]
                    s[1] = cy[:, off:off + h]
                    s[2] = cm[:, off:off + h]
                    off += h
            # padded TREE combine: bands are prefix-nested (Q descending),
            # so pairing adjacent finals (shorter padded with dead lanes)
            # needs ceil(log2 nbands) pair_add_t calls instead of nbands-1
            # sequential prefix combines — each call is a ~380-step Fermat
            # latency, so call count matters more than the pad waste
            def pad_dead(x, y, m, w):
                p = w - x.shape[1]
                if p == 0:
                    return x, y, m
                zL = jnp.zeros((U, p), jnp.int32)
                return (jnp.concatenate([x, zL], axis=1),
                        jnp.concatenate([y, zL], axis=1),
                        jnp.concatenate([m, jnp.ones((1, p), jnp.int32)],
                                        axis=1))

            finals = [(s[0], s[1], s[2], s[3]) for s in segs]
            while len(finals) > 1:
                Ls, Rs, widths = [], [], []
                for i in range(0, len(finals) - 1, 2):
                    ax, ay, am, aQ = finals[i]
                    bx, by, bm, _bQ = finals[i + 1]
                    Ls.append((ax, ay, am))
                    Rs.append(pad_dead(bx, by, bm, aQ))
                    widths.append(aQ)
                leftover = finals[-1] if len(finals) % 2 else None
                cx, cy, cm, zf = pair_add_t(
                    jnp.concatenate([t[0] for t in Ls], axis=1),
                    jnp.concatenate([t[1] for t in Ls], axis=1),
                    jnp.concatenate([t[2] for t in Ls], axis=1),
                    jnp.concatenate([t[0] for t in Rs], axis=1),
                    jnp.concatenate([t[1] for t in Rs], axis=1),
                    jnp.concatenate([t[2] for t in Rs], axis=1))
                flag = jnp.maximum(flag, zf)
                nxt, off = [], 0
                for w in widths:
                    nxt.append((cx[:, off:off + w], cy[:, off:off + w],
                                cm[:, off:off + w], w))
                    off += w
                if leftover is not None:
                    nxt.append(leftover)
                finals = nxt
            accx, accy, accm, _Q0 = finals[0]
            accx, accy, accm = pad_dead(accx, accy, accm, B)
            outx = accx.T.reshape((B,) + ush)
            outy = accy.T.reshape((B,) + ush)
            return AffinePoints(outx, outy, accm[0] > 0), flag

        return bucket_sums_sorted

    def _bucket_sums_tpu_bands(self, c: int, bands: tuple,
                               fast: bool = True):
        """Staircase-band bucket reduction (TPU): buckets are processed in
        COUNT-SORTED order; band (Q, h, r0) lays out ranks [r0, r0+h) for
        the Q highest-count buckets only (Q, h pow2; Q >= #buckets with
        count > r0, exact from the window's count profile, so correctness
        never depends on a distribution model).

        Versus the uniform PAD grid (2x average occupancy => ~50% dead
        slots), the staircase tracks the occupancy profile: ~1.15N slots
        for uniform scalars at 2^20/c=16 — ~40% less gather + level work.

        Returns bucket sums in SORTED order; the caller unpermutes with the
        plan's inverse permutation before the weighted tail."""
        B = 1 << (c - 1)
        F = self.F
        halve_t, pair_add_t, U, ush = self._fused_ctx(fast)

        def bucket_sums_sorted(dw, x, y, inf, order, starts_p, counts_p,
                               bgrid_cat, rank_cat):
            y_signed = F.select(dw < 0, F.neg(y), y)
            xy = (x | (y_signed << 15)).reshape(x.shape[0], -1)
            # pad payload rows to one full 128-lane tile: XLA's row gather
            # runs 3.1x faster on tile-aligned rows (13.2 vs 41.5 ms per 1M
            # rows on v5e) and the padding write is bandwidth-trivial
            if xy.shape[1] < 128:
                xy = jnp.concatenate(
                    [xy, jnp.zeros((xy.shape[0], 128 - xy.shape[1]),
                                   jnp.int32)], axis=1)
            accx = accy = accm = None      # (U, B) running, sorted order
            flag = jnp.zeros((), jnp.int32)
            offg = 0
            for (Q, h, r0) in bands:
                wband = Q * h
                bgrid = bgrid_cat[offg:offg + wband]
                rank = rank_cat[offg:offg + wband]
                offg += wband
                pos = starts_p[bgrid] + rank
                valid = rank < counts_p[bgrid]
                srcp = jnp.where(valid, order[jnp.where(valid, pos, 0)], 0)
                sxyT = xy[srcp].T[:U]                  # (U, Q*h)
                xT = sxyT & 0x7FFF
                yT = sxyT >> 15
                mT = (~valid).astype(jnp.int32)[None, :]
                while xT.shape[1] > Q:
                    xT, yT, mT, zf = halve_t(xT, yT, mT)
                    flag = jnp.maximum(flag, zf)
                if accx is None:
                    if Q < B:              # pad first band to full width
                        zL = jnp.zeros((U, B - Q), jnp.int32)
                        z1 = jnp.ones((1, B - Q), jnp.int32)
                        xT = jnp.concatenate([xT, zL], axis=1)
                        yT = jnp.concatenate([yT, zL], axis=1)
                        mT = jnp.concatenate([mT, z1], axis=1)
                    accx, accy, accm = xT, yT, mT
                else:
                    # combine into the sorted prefix [:Q] only
                    cx, cy, cm, zf = pair_add_t(accx[:, :Q], accy[:, :Q],
                                                accm[:, :Q], xT, yT, mT)
                    flag = jnp.maximum(flag, zf)
                    accx = jnp.concatenate([cx, accx[:, Q:]], axis=1)
                    accy = jnp.concatenate([cy, accy[:, Q:]], axis=1)
                    accm = jnp.concatenate([cm, accm[:, Q:]], axis=1)
            outx = accx.T.reshape((B,) + ush)
            outy = accy.T.reshape((B,) + ush)
            return AffinePoints(outx, outy, accm[0] > 0), flag

        return bucket_sums_sorted

    def window_program_bands(self, N: int, c: int, bands: tuple,
                             fast: bool = True):
        """Fused staircase-band bucket sums + inverse-permutation + tail.
        Returns (x, y, inf, zflag); zflag != 0 means the fast distinct-
        points kernels hit a colliding pair and the window must be rerun
        with fast=False (see `_fused_ctx`)."""
        unified = os.environ.get("CRYPTO_TPU_UNIFIED_LEVELS", "1") \
            not in ("", "0")
        key = ("wpb", N, c, bands, fast, unified)
        if key in self._jits:
            return self._jits[key]
        mk = self._bucket_sums_tpu_bands_unified if unified \
            else self._bucket_sums_tpu_bands
        bucket_sums = mk(c, bands, fast=fast)
        tail = self.tail_fn(c)
        grids = self.band_grids(bands)

        def full(dw, x, y, inf, order, starts_p, counts_p, invperm,
                 bgrid_cat, rank_cat):
            P, flag = bucket_sums(dw, x, y, inf, order, starts_p, counts_p,
                                  bgrid_cat, rank_cat)
            px = P.x[invperm]              # back to natural bucket order
            py = P.y[invperm]
            pinf = P.inf[invperm]
            ox, oy, oinf = tail(px, py, pinf)
            return ox, oy, oinf, flag

        jfull = full if jax.default_backend() == "cpu" else jax.jit(full)

        def prog(dw, x, y, inf, order, starts_p, counts_p, invperm):
            return jfull(dw, x, y, inf, order, starts_p, counts_p, invperm,
                         *grids)

        self._jits[key] = prog
        return prog

    def band_grids(self, bands: tuple):
        """Concatenated (bucket, rank) index grids for a band tuple, as
        device arrays (cached): runtime inputs to the window programs so
        XLA does not fold them into multi-MB executable literals."""
        key = ("grids", bands)
        if key in self._jits:
            return self._jits[key]
        bg = np.concatenate([np.tile(np.arange(Q, dtype=np.int32), h)
                             for (Q, h, r0) in bands])
        rk = np.concatenate([np.repeat(np.arange(h, dtype=np.int32), Q) + r0
                             for (Q, h, r0) in bands])
        out = (jnp.asarray(bg), jnp.asarray(rk))
        self._jits[key] = out
        return out

    def window_program_bands_group(self, N: int, c: int, bands: tuple,
                                   G: int, fast: bool = True):
        """G windows per compiled program (unrolled): XLA overlaps one
        window's latency-bound gather with another's compute-bound levels,
        and the host dispatches W/G programs instead of W.  Returns
        (x (G,unit), y (G,unit), inf (G,), zflag ())."""
        unified = os.environ.get("CRYPTO_TPU_UNIFIED_LEVELS", "1") \
            not in ("", "0")
        key = ("wpbg", N, c, bands, G, fast, unified)
        if key in self._jits:
            return self._jits[key]
        mk = self._bucket_sums_tpu_bands_unified if unified \
            else self._bucket_sums_tpu_bands
        bucket_sums = mk(c, bands, fast=fast)
        tail = self.tail_fn(c)
        grids = self.band_grids(bands)

        def full(dws, x, y, inf, orders, starts_ps, counts_ps, invperms,
                 bgrid_cat, rank_cat):
            oxs, oys, oinfs = [], [], []
            flag = jnp.zeros((), jnp.int32)
            for g in range(G):
                P, fl = bucket_sums(dws[g], x, y, inf, orders[g],
                                    starts_ps[g], counts_ps[g],
                                    bgrid_cat, rank_cat)
                flag = jnp.maximum(flag, fl)
                ox, oy, oinf = tail(P.x[invperms[g]], P.y[invperms[g]],
                                    P.inf[invperms[g]])
                oxs.append(ox)
                oys.append(oy)
                oinfs.append(oinf)
            return (jnp.stack(oxs), jnp.stack(oys), jnp.stack(oinfs), flag)

        jfull = full if jax.default_backend() == "cpu" else jax.jit(full)

        def prog(dws, x, y, inf, orders, starts_ps, counts_ps, invperms):
            return jfull(dws, x, y, inf, orders, starts_ps, counts_ps,
                         invperms, *grids)

        self._jits[key] = prog
        return prog

    def tail_fn(self, c: int):
        """Bucket sums (B,) -> window point, via the two-axis weighted
        reduction: bucket b (0-based) has weight b+1 = q*C + c + 1 with
        b = q*C + c, so  sum = C * sum_q q*Sq[q] + sum_c (c+1)*Tc[c].

        Runs in JACOBIAN coordinates (total select-based `jc.add`): the tail
        is O(B) work but its Horner/doubling chains are sequential, and the
        batched-affine form would pay a ~380-mul Fermat inversion per
        sequential step (measured 560 ms/window vs ~50 ms Jacobian)."""
        B = 1 << (c - 1)
        F = self.F
        jc = self.jc

        def to_jac(px, py, pinf):
            one = F.ones(())
            z = F.select(pinf, F.zeros(pinf.shape),
                         jnp.broadcast_to(one, px.shape).astype(px.dtype))
            return JPoints(px, py, z)

        def tree_sum(p: JPoints, axis_len: int):
            while axis_len > 1:
                half = axis_len // 2
                a = JPoints(p.X[:half], p.Y[:half], p.Z[:half])
                b = JPoints(p.X[half:axis_len], p.Y[half:axis_len],
                            p.Z[half:axis_len])
                p = jc.add(a, b)
                axis_len = half
            return JPoints(p.X[0], p.Y[0], p.Z[0])

        def weighted_sum_shift1(points: JPoints, n: int):
            """sum_i (i+1) * P_i via bit-decomposition masked tree sums."""
            nbits = n.bit_length()
            idx = jnp.arange(1, n + 1, dtype=jnp.int32)
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
                p = jc.add(a, b)
                m = half
            bitsums = JPoints(p.X[:, 0], p.Y[:, 0], p.Z[:, 0])
            acc = JPoints(bitsums.X[nbits - 1], bitsums.Y[nbits - 1],
                          bitsums.Z[nbits - 1])
            for bpos in range(nbits - 2, -1, -1):
                acc = jc.double(acc)
                acc = jc.add(acc, JPoints(bitsums.X[bpos], bitsums.Y[bpos],
                                          bitsums.Z[bpos]))
            return acc

        def tail(px, py, pinf):
            logB = B.bit_length() - 1
            logC = (logB + 1) // 2
            C = 1 << logC
            R = B // C
            ush = tuple(F.unit_shape)
            P = to_jac(px, py, pinf)
            grid = JPoints(P.X.reshape((R, C) + ush),
                           P.Y.reshape((R, C) + ush),
                           P.Z.reshape((R, C) + ush))
            Tstack = JPoints(grid.X.swapaxes(0, 1), grid.Y.swapaxes(0, 1),
                             grid.Z.swapaxes(0, 1))
            # Sq[q] = sum_c grid[q,:] ; Tc[c] = sum_q grid[:,c]
            Sq = _jac_reduce_axis0(jc, Tstack)    # over C -> (R,)
            Tc = _jac_reduce_axis0(jc, grid)      # over R -> (C,)
            wq = weighted_sum_shift1(Sq, R)       # sum (q+1) Sq_q
            tq = tree_sum(Sq, R)                  # sum Sq_q
            qpart = jc.add(wq, jc.neg(tq))        # sum q Sq_q
            for _ in range(logC):
                qpart = jc.double(qpart)          # * C
            cpart = weighted_sum_shift1(Tc, C)    # sum (c+1) Tc_c
            out = jc.add(qpart, cpart)
            inf_out = jc.is_infinity(out)
            aff = jc.to_affine(out)
            return aff.X, aff.Y, inf_out

        return tail

    def tail_batched_fn(self, c: int):
        """Batched variant of `tail_fn`: (Wb, B, unit) bucket sums for Wb
        windows -> (Wb,) window points in ONE program.

        The tail's Horner/doubling chains are sequential and latency-bound;
        running all windows' tails as one (Wb,)-wide batch pays that latency
        once instead of Wb times (measured ~60 ms/window at c=16 on v5e when
        run per window)."""
        B = 1 << (c - 1)
        F = self.F
        jc = self.jc

        def to_jac(px, py, pinf):
            one = F.ones(())
            z = F.select(pinf, F.zeros(pinf.shape),
                         jnp.broadcast_to(one, px.shape).astype(px.dtype))
            return JPoints(px, py, z)

        def weighted_sum_shift1_b(points: JPoints, n: int):
            """sum_i (i+1) * P[w, i] -> (Wb,), via bit-decomposition masked
            tree sums batched over the leading window axis."""
            Wb = points.X.shape[0]
            nbits = n.bit_length()
            idx = jnp.arange(1, n + 1, dtype=jnp.int32)
            masks = ((idx[None, :] >> jnp.arange(
                nbits, dtype=jnp.int32)[:, None]) & 1) > 0      # (nbits, n)
            masks = jnp.broadcast_to(masks[:, None, :], (nbits, Wb, n))
            inf = jc.infinity((nbits, Wb, n))
            stacked = JPoints(
                jnp.broadcast_to(points.X[None], (nbits,) + points.X.shape),
                jnp.broadcast_to(points.Y[None], (nbits,) + points.Y.shape),
                jnp.broadcast_to(points.Z[None], (nbits,) + points.Z.shape))
            p = jc.select(masks, stacked, inf)
            m = n
            while m > 1:
                half = m // 2
                a = JPoints(p.X[:, :, :half], p.Y[:, :, :half],
                            p.Z[:, :, :half])
                b = JPoints(p.X[:, :, half:m], p.Y[:, :, half:m],
                            p.Z[:, :, half:m])
                p = jc.add(a, b)
                m = half
            bitsums = JPoints(p.X[:, :, 0], p.Y[:, :, 0], p.Z[:, :, 0])
            acc = JPoints(bitsums.X[nbits - 1], bitsums.Y[nbits - 1],
                          bitsums.Z[nbits - 1])
            for bpos in range(nbits - 2, -1, -1):
                acc = jc.double(acc)
                acc = jc.add(acc, JPoints(bitsums.X[bpos], bitsums.Y[bpos],
                                          bitsums.Z[bpos]))
            return acc

        def tail_b(px, py, pinf):
            Wb = px.shape[0]
            logB = B.bit_length() - 1
            logC = (logB + 1) // 2
            C = 1 << logC
            R = B // C
            ush = tuple(F.unit_shape)
            P = to_jac(px, py, pinf)
            grid = JPoints(P.X.reshape((Wb, R, C) + ush),
                           P.Y.reshape((Wb, R, C) + ush),
                           P.Z.reshape((Wb, R, C) + ush))
            Tstack = JPoints(grid.X.swapaxes(1, 2), grid.Y.swapaxes(1, 2),
                             grid.Z.swapaxes(1, 2))
            Sq = _jac_reduce_axis1(jc, Tstack)    # over C -> (Wb, R)
            Tc = _jac_reduce_axis1(jc, grid)      # over R -> (Wb, C)
            wq = weighted_sum_shift1_b(Sq, R)     # (Wb,) sum (q+1) Sq_q
            tq = _jac_reduce_axis1(jc, Sq)        # (Wb,) sum_q Sq_q
            qpart = jc.add(wq, jc.neg(tq))        # (Wb,) sum q Sq_q
            for _ in range(logC):
                qpart = jc.double(qpart)          # * C
            cpart = weighted_sum_shift1_b(Tc, C)  # (Wb,) sum (c+1) Tc_c
            out = jc.add(qpart, cpart)
            inf_out = jc.is_infinity(out)
            aff = jc.to_affine(out)
            return aff.X, aff.Y, inf_out

        return tail_b

    def bucket_program(self, N: int, c: int, PAD: int, rounds: int = 1,
                       fast: bool = True):
        """Jit cache for the bucket-sums-only program taking the precomputed
        sort plan (tail runs separately, batched across windows — see
        `tail_batched_fn`)."""
        key = ("bs", N, c, PAD, rounds, fast)
        if key in self._jits:
            return self._jits[key]
        bucket_sums = self.bucket_sums_fn(c, PAD, rounds, planned=True,
                                          fast=fast)

        def bs(dw, x, y, inf, order, starts, counts):
            P, maxc, flag = bucket_sums(dw, x, y, inf, order, starts, counts)
            return P.x, P.y, P.inf, flag

        prog = bs if jax.default_backend() == "cpu" else jax.jit(bs)
        self._jits[key] = prog
        return prog

    def tail_batched_program(self, Wb: int, c: int):
        key = ("tailb", Wb, c)
        if key in self._jits:
            return self._jits[key]
        tail_b = self.tail_batched_fn(c)
        prog = tail_b if jax.default_backend() == "cpu" else jax.jit(tail_b)
        self._jits[key] = prog
        return prog


def _jac_reduce_axis1(jc, P: JPoints) -> JPoints:
    """Tree-reduce axis 1 of a (Wb, n, m?, unit) Jacobian batch -> (Wb, m?)."""
    n = P.X.shape[1]
    while n > 1:
        half = n // 2
        a = JPoints(P.X[:, :half], P.Y[:, :half], P.Z[:, :half])
        b = JPoints(P.X[:, half:n], P.Y[:, half:n], P.Z[:, half:n])
        P = jc.add(a, b)
        n = half
    return JPoints(P.X[:, 0], P.Y[:, 0], P.Z[:, 0])


def _jac_reduce_axis0(jc, P: JPoints) -> JPoints:
    """Tree-reduce the leading axis of a 2-D Jacobian batch -> (m,)."""
    n = P.X.shape[0]
    while n > 1:
        half = n // 2
        a = JPoints(P.X[:half], P.Y[:half], P.Z[:half])
        b = JPoints(P.X[half:n], P.Y[half:n], P.Z[half:n])
        P = jc.add(a, b)
        n = half
    return JPoints(P.X[0], P.Y[0], P.Z[0])


def _reduce_axis0(F, P: AffinePoints) -> AffinePoints:
    """Tree-reduce the leading axis of a 2-D batch (n, m, unit) -> (m,)."""
    n = P.x.shape[0]
    m = P.x.shape[1]
    while n > 1:
        half = n // 2
        A = AffinePoints(P.x[:half].reshape((-1,) + P.x.shape[2:]),
                         P.y[:half].reshape((-1,) + P.y.shape[2:]),
                         P.inf[:half].reshape(-1))
        Bp = AffinePoints(P.x[half:n].reshape((-1,) + P.x.shape[2:]),
                          P.y[half:n].reshape((-1,) + P.y.shape[2:]),
                          P.inf[half:n].reshape(-1))
        S = affine_pair_add(F, A, Bp)
        P = AffinePoints(S.x.reshape((half, m) + S.x.shape[1:]),
                         S.y.reshape((half, m) + S.y.shape[1:]),
                         S.inf.reshape(half, m))
        n = half
    return AffinePoints(P.x[0], P.y[0], P.inf[0])


@functools.lru_cache(maxsize=None)
def _engine_for(jc: JCurve) -> DeviceMSM:
    return DeviceMSM(jc)


def _auto_c_v2(n: int) -> int:
    """Window size: c=16 amortizes the 2^15-bucket tail at large N; c=8
    keeps the per-window fixed costs (tail, sort) small below ~2^17."""
    return 16 if n >= (1 << 17) else 8


def msm_device_scheduled(curve: SWCurve, points, scalars,
                         c: int | None = None, nbits: int | None = None,
                         pad: int | None = None) -> Point:
    """Full MSM with on-device scheduling; returns a host Point.

    `points`: host Point list or affine-packed JPoints (Z in {0,1}).
    `scalars`: int sequence, (N, nbytes) uint8 LE-byte ndarray, or a device
    (W, N) int32 digit tensor from `device_digits`.
    """
    jc = jcurve_for(curve)
    F = jc.F
    if nbits is None:
        nbits = curve.scalar_field.bits
    engine = _engine_for(jc)

    if not isinstance(points, JPoints):
        points = jc.pack_points([p.normalize() for p in points])
    N = points.X.shape[0]
    if c is None:
        c = _auto_c_v2(N)
    # pad N to the next power of two with infinity points / zero digits so
    # ragged workloads (the SNARK prover's 2^k-1-ish query vectors) share
    # ONE compiled window program per size class
    N_pad = 1 << max(1, (N - 1).bit_length())

    if isinstance(scalars, jnp.ndarray) and scalars.ndim == 2 \
            and scalars.dtype == jnp.int32:
        digits = scalars
    else:
        if isinstance(scalars, (np.ndarray, jnp.ndarray)) \
                and scalars.dtype == np.uint8:
            sbytes = scalars      # device-staged LE bytes pass through
        else:
            W_ = (nbits + c) // c
            nbytes = (W_ * c + 7) // 8
            sbytes = scalars_to_bytes([int(s) for s in scalars], nbytes)
        digits = device_digits(jnp.asarray(sbytes), c, nbits)
    W = digits.shape[0]

    inf_mask = jc.is_infinity(points)
    if N_pad != N:
        ush = tuple(F.unit_shape)
        zc = jnp.zeros((N_pad - N,) + ush, jnp.int32)
        points = JPoints(jnp.concatenate([points.X, zc]),
                         jnp.concatenate([points.Y, zc]),
                         jnp.concatenate([points.Z, zc]))
        inf_mask = jnp.concatenate(
            [inf_mask, jnp.ones((N_pad - N,), bool)])
        digits = jnp.concatenate(
            [digits, jnp.zeros((W, N_pad - N), jnp.int32)], axis=1)
        N = N_pad

    # B*PAD layout rows live in HBM with ~4x temporaries during the first
    # halving level; PAD_MAX=64 keeps the 2^20/c=16 working set ~2 GB
    # (PAD=128 peaked at 21 GB > 16 GB HBM on v5e)
    PAD_MAX = 64
    B = 1 << (c - 1)
    on_tpu_fused = ((jax.default_backend() == "tpu"
                     or bool(os.environ.get("CRYPTO_TPU_FORCE_TPU_MSM")))
                    and F.unit_ndim in (1, 2))
    use_bands = (on_tpu_fused and pad is None
                 and not os.environ.get("CRYPTO_TPU_NO_BANDS"))
    # doubling-free fast kernels by default on the fused G1 path; a
    # colliding pair (duplicate base in a bucket, or a negligible-probability
    # partial-sum collision) raises the window's zflag and that window is
    # rerun below with the total-formula kernels
    fast = (on_tpu_fused and F.unit_ndim == 1
            and not os.environ.get("CRYPTO_TPU_SAFE_AFFINE"))
    wgroup = int(os.environ.get("CRYPTO_TPU_WGROUP", "1"))
    wouts = None
    if use_bands:
        (order, starts_p, counts_p, invperm, nprof_d,
         occs_d) = _plan_windows_sorted(digits, inf_mask, B)
        # canonical model bands: ONE band tuple (= one compiled window
        # program) per (N, c) for any uniform scalar set; exact per-run
        # bands only when the actual profile escapes the model
        # (structured/adversarial digits).
        # the TOP window's digits only span the modulus' leading bits
        # (e.g. 0x73ee values for BLS12-381 Fr at c=16), so that window
        # runs hotter than Poisson(N/B); fold it into the model
        smax = min(1 << nbits, curve.scalar_field.p)
        top_keys = (smax >> ((W - 1) * c)) + 1
        shared_bands, occ_model = _model_bands(N, c, max_h=PAD_MAX,
                                               top_keys=top_keys)
        if wgroup <= 1 or W % wgroup:
            # OPTIMISTIC DISPATCH: enqueue all W window programs under the
            # model bands BEFORE pulling the count profile, so the ~2 MB
            # profile pull + host coverage check overlap the async window
            # executions instead of serializing ahead of them (the pull is
            # a full round trip through the ~50 MB/s relay tunnel).  If the
            # profile escapes the model (structured/adversarial digits) the
            # dispatched results are discarded below and recomputed; an
            # uncovered layout cannot fault — slot indices clamp inside the
            # band buffers (XLA gather/dynamic_slice clamp, scatter drops).
            prog = engine.window_program_bands(N, c, shared_bands, fast=fast)
            wouts = [prog(digits[w], points.X, points.Y, inf_mask, order[w],
                          starts_p[w], counts_p[w], invperm[w])
                     for w in range(W)]
        nprof, occs = (np.asarray(jax.device_get(nprof_d)),
                       np.maximum(np.asarray(jax.device_get(occs_d)), 1))
        occ_a = int(occs.max())
        nprof_a = nprof.max(axis=0)
        if occ_a > MAX_PROFILE_RANK:
            use_bands = False      # adversarially skewed digits: grid path
            wouts = None
        elif not (occ_a <= occ_model
                  and _bands_cover(shared_bands, nprof_a, occ_a)):
            wouts = None           # optimistic results used uncovered bands
            shared_bands = _build_bands(nprof_a, occ_a, B, max_h=PAD_MAX)
            import logging
            logging.getLogger("crypto_tpu.msm").warning(
                "msm_v2: count profile outside the Poisson model, "
                "using exact bands (fresh multi-minute XLA compile "
                "likely): N=%d c=%d occ=%d (model %d)", N, c, occ_a,
                occ_model)
    if not use_bands:
        order, starts, counts, occs_d = _plan_windows(digits, inf_mask, B)
        if pad is None:
            occs = np.maximum(np.asarray(jax.device_get(occs_d)), 1)
        else:
            occs = np.full((W,), pad, dtype=np.int64)
    # CRYPTO_TPU_BATCHED_TAIL applies to the grid path only (the bands
    # program fuses its tail per window); combining it with bands would
    # feed (unit,)-shaped window points into the (W, B, unit) batched tail
    batched_tail = (bool(os.environ.get("CRYPTO_TPU_BATCHED_TAIL"))
                    and not use_bands)

    def run_window(w, fast_w):
        occ = int(occs[w])
        if use_bands:
            prog = engine.window_program_bands(N, c, shared_bands,
                                               fast=fast_w)
            return prog(digits[w], points.X, points.Y, inf_mask,
                        order[w], starts_p[w], counts_p[w], invperm[w])
        if occ <= PAD_MAX:
            pads = (1 << (occ - 1).bit_length(),)
        else:
            # shrinking overflow rounds: occupancy 65 costs one extra (B,)
            # rank pass, not a full second PAD_MAX grid
            nfull, rem = divmod(occ, PAD_MAX)
            pads = (PAD_MAX,) * nfull
            if rem:
                pads = pads + (1 << (rem - 1).bit_length(),)
        if batched_tail:
            prog = engine.bucket_program(N, c, pads[0], pads, fast=fast_w)
        else:
            prog = engine.window_program_planned(N, c, pads[0], pads,
                                                 fast=fast_w)
        return prog(digits[w], points.X, points.Y, inf_mask,
                    order[w], starts[w], counts[w])

    if use_bands and os.environ.get("CRYPTO_TPU_METRICS"):
        from ..utils.metrics import msm_cost_model, emit
        emit("msm_v2", msm_cost_model(N, c, shared_bands, W, F.L
                                      if F.unit_ndim == 1 else F.base.L,
                                      fast=True))
    if use_bands and wgroup > 1 and W % wgroup == 0:
        gprog = engine.window_program_bands_group(N, c, shared_bands,
                                                  wgroup, fast=fast)
        wouts = []
        for g0 in range(0, W, wgroup):
            sl = slice(g0, g0 + wgroup)
            gx, gy, gi, gf = gprog(digits[sl], points.X, points.Y, inf_mask,
                                   order[sl], starts_p[sl], counts_p[sl],
                                   invperm[sl])
            for j in range(wgroup):
                wouts.append((gx[j], gy[j], gi[j], gf))
    elif wouts is None:
        wouts = [run_window(w, fast) for w in range(W)]
    def _pull(wouts):
        """ONE device->host round trip for flags + window results (each
        device_get is a full sync through the relay tunnel; unpack_host
        accepts host arrays — its device_get is then a no-op)."""
        xs = jnp.stack([o[0] for o in wouts])
        ys = jnp.stack([o[1] for o in wouts])
        infs = jnp.stack([o[2] for o in wouts])
        fl = jnp.stack([o[-1] for o in wouts]) if fast else infs
        return [np.asarray(a) for a in jax.device_get((xs, ys, infs, fl))]

    if batched_tail:
        # one (W,)-wide tail program (see window_program_planned docstring:
        # slower than the fused-in-window tail on v5e today, kept for study)
        if fast:
            flags = np.asarray(jax.device_get(jnp.stack(
                [o[-1] for o in wouts])))
            for w in np.nonzero(flags)[0]:
                import logging
                logging.getLogger("crypto_tpu.msm").warning(
                    "msm_v2: colliding pair in window %d (duplicate "
                    "bases?), rerunning with total-formula kernels", int(w))
                wouts[int(w)] = run_window(int(w), False)
        bx = jnp.stack([o[0] for o in wouts])
        by = jnp.stack([o[1] for o in wouts])
        binf = jnp.stack([o[2] for o in wouts])
        tailb = engine.tail_batched_program(W, c)
        hxs, hys, hinf = jax.device_get(tailb(bx, by, binf))
    else:
        hxs, hys, hinf, flags = _pull(wouts)
        if fast and flags.any():
            for w in np.nonzero(flags)[0]:
                import logging
                logging.getLogger("crypto_tpu.msm").warning(
                    "msm_v2: colliding pair in window %d (duplicate "
                    "bases?), rerunning with total-formula kernels", int(w))
                wouts[int(w)] = run_window(int(w), False)
            hxs, hys, hinf, _ = _pull(wouts)
    hx = np.atleast_1d(F.unpack_host(hxs))
    hy = np.atleast_1d(F.unpack_host(hys))
    hinf = np.asarray(hinf)
    K = curve.K
    acc = curve.infinity()
    for w in range(W - 1, -1, -1):
        for _ in range(c):
            acc = acc.double()
        if not bool(hinf[w]):
            acc = acc + Point(hx[w], hy[w], K.one(), curve)
    return acc


@functools.partial(jax.jit, static_argnums=(2,))
def _window_occupancies(digits, inf_mask, B):
    """(W,) per-window max bucket occupancy."""
    absd = jnp.abs(digits)
    live = (absd > 0) & (~inf_mask)[None, :]
    keys = jnp.where(live, absd - 1, B)
    out = []
    for w in range(digits.shape[0]):
        sk = jnp.sort(keys[w])
        starts = jnp.searchsorted(sk, jnp.arange(B, dtype=jnp.int32))
        ends = jnp.searchsorted(sk, jnp.arange(1, B + 1, dtype=jnp.int32))
        out.append(jnp.max(ends - starts).astype(jnp.int32))
    return jnp.stack(out)


def _global_max_occupancy(digits, inf_mask, B):
    return jnp.max(_window_occupancies(digits, inf_mask, B))
