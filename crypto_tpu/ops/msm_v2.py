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
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..curves.sw import SWCurve, Point
from ..curves.jcurve import JCurve, JPoints, jcurve_for
from .pippenger import scalars_to_bytes, _auto_c


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
    """One halving level: add adjacent pairs along the leading axis."""
    n = P.x.shape[0]
    half = n // 2
    u = F.unit_ndim
    xs = P.x.reshape((half, 2) + P.x.shape[1:])
    ys = P.y.reshape((half, 2) + P.y.shape[1:])
    infs = P.inf.reshape((half, 2) + P.inf.shape[1:])
    A = AffinePoints(xs[:, 0], ys[:, 0], infs[:, 0])
    B = AffinePoints(xs[:, 1], ys[:, 1], infs[:, 1])
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
            P, maxc = bucket_sums(dw, x, y, inf)
            ox, oy, oinf = tail(P.x, P.y, P.inf)
            return ox, oy, oinf, maxc

        # On CPU (tests) run eagerly: each field op dispatches its own small
        # cached jit instead of one mega-graph whose XLA:CPU compile takes
        # minutes.  On TPU the fused program amortizes the remote dispatch.
        prog = full if jax.default_backend() == "cpu" else jax.jit(full)
        self._jits[key] = prog
        return prog

    def bucket_sums_fn(self, c: int, PAD: int, rounds: int = 1):
        """dw (N,), x/y (N, unit), inf (N,) -> (AffinePoints (B,), max
        occupancy): digit-bucket layout + batched-affine halving reduction.

        `rounds`: buckets can hold up to rounds*PAD entries — each round
        lays out ranks [r*PAD, (r+1)*PAD) and accumulates into a running
        bucket vector.  rounds == 1 for uniform scalars; skewed digit
        distributions (structured/adversarial scalars) get more rounds
        instead of a memory-exploding PAD.

        This is the shardable stage: data-parallel over points, combined
        across shards by adding bucket vectors."""
        B = 1 << (c - 1)
        F = self.F

        def bucket_sums(dw, x, y, inf):
            absd = jnp.abs(dw)
            live = (absd > 0) & (~inf)
            keys = jnp.where(live, absd - 1, B).astype(jnp.int32)
            order = jnp.argsort(keys, stable=True)
            sk = keys[order]
            starts = jnp.searchsorted(sk, jnp.arange(B, dtype=jnp.int32))
            ends = jnp.searchsorted(sk, jnp.arange(1, B + 1, dtype=jnp.int32))
            counts = (ends - starts).astype(jnp.int32)
            maxc = jnp.max(counts)
            bgrid = jnp.repeat(jnp.arange(B, dtype=jnp.int32), PAD)
            rgrid = jnp.tile(jnp.arange(PAD, dtype=jnp.int32), B)
            acc = None
            for r in range(rounds):
                rank = r * PAD + rgrid
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
            return acc, maxc

        return bucket_sums

    def tail_fn(self, c: int):
        """Bucket sums (B,) -> window point, via the two-axis weighted
        reduction: bucket b (0-based) has weight b+1 = q*C + c + 1 with
        b = q*C + c, so  sum = C * sum_q q*Sq[q] + sum_c (c+1)*Tc[c]."""
        B = 1 << (c - 1)
        F = self.F

        def tail(px, py, pinf):
            logB = B.bit_length() - 1
            logC = (logB + 1) // 2
            C = 1 << logC
            R = B // C
            ush = tuple(F.unit_shape)
            gx = px.reshape((R, C) + ush)
            gy = py.reshape((R, C) + ush)
            gi = pinf.reshape(R, C)
            Tx = gx.swapaxes(0, 1)      # (C, R, unit)
            Ty = gy.swapaxes(0, 1)
            Ti = gi.swapaxes(0, 1)
            Sq = _reduce_axis0(F, AffinePoints(Tx, Ty, Ti))   # over C -> (R,)
            Tc = _reduce_axis0(F, AffinePoints(gx, gy, gi))   # over R -> (C,)
            wq = affine_weighted_sum(F, Sq)                   # sum (q+1) Sq_q
            tq = affine_tree_sum(F, Sq)                       # sum Sq_q
            neg_tq = AffinePoints(tq.x, F.neg(tq.y), tq.inf)
            qpart = affine_pair_add(F, wq, neg_tq)            # sum q Sq_q
            for _ in range(logC):
                qpart = affine_pair_add(F, qpart, qpart)      # * C
            cpart = affine_weighted_sum(F, Tc)                # sum (c+1) Tc_c
            out = affine_pair_add(F, qpart, cpart)
            return out.x[0], out.y[0], out.inf[0]

        return tail


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


def msm_device_scheduled(curve: SWCurve, points, scalars,
                         c: int = 16, nbits: int | None = None,
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

    if isinstance(scalars, jnp.ndarray) and scalars.ndim == 2 \
            and scalars.dtype == jnp.int32:
        digits = scalars
    else:
        if isinstance(scalars, np.ndarray) and scalars.dtype == np.uint8:
            sbytes = scalars
        else:
            W_ = (nbits + c) // c
            nbytes = (W_ * c + 7) // 8
            sbytes = scalars_to_bytes([int(s) for s in scalars], nbytes)
        digits = device_digits(jnp.asarray(sbytes), c, nbits)
    W = digits.shape[0]

    inf_mask = jc.is_infinity(points)

    PAD_MAX = 512
    if pad is None:
        occs = np.asarray(jax.device_get(
            _window_occupancies(digits, inf_mask, 1 << (c - 1))))
        occs = np.maximum(occs, 1)
    else:
        occs = np.full((W,), pad, dtype=np.int64)
    outs = []
    for w in range(W):
        occ = int(occs[w])
        pad_w = 1 << (occ - 1).bit_length()
        rounds = 1
        if pad_w > PAD_MAX:
            pad_w = PAD_MAX
            rounds = (occ + PAD_MAX - 1) // PAD_MAX
        prog = engine.window_program(N, c, pad_w, rounds)
        ox, oy, oinf, maxcw = prog(digits[w], points.X, points.Y, inf_mask)
        outs.append((ox, oy, oinf))

    xs = jnp.stack([o[0] for o in outs])
    ys = jnp.stack([o[1] for o in outs])
    infs = jnp.stack([o[2] for o in outs])
    hx = np.atleast_1d(F.unpack_host(xs))
    hy = np.atleast_1d(F.unpack_host(ys))
    hinf = np.asarray(jax.device_get(infs))
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
