"""Device-batched accumulator witness updates (manager side, with sk).

The host path (`witness.py::_batch_update_with_sk`, mirroring the
reference `vb_accumulator/src/batch_utils.rs` polynomials) costs
O(|batch| * |members|) host field muls plus one variable-base scalar mul
PER member — minutes at the BASELINE 2^14 scale.  This path evaluates the
d/v polynomials as `lax.scan`s batched over members, derives scalar
bits/digits on device, and runs ONE batched double-and-add for the
member-witness terms plus one fixed-base gather for the accumulator
terms.

Routed from `witness.py` above `DEVICE_THRESHOLD` members (override off
with CRYPTO_TPU_NO_DEVICE_ACCUM=1; force on for tests with
CRYPTO_TPU_FORCE_DEVICE_ACCUM=1).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..curves import bls12_381 as bls
from ..curves.jcurve import jcurve_for, JPoints
from ..fields.jfield import jfield_for, LIMB_BITS
from ..ops.msm_v2 import batch_inv as _device_batch_inv

DEVICE_THRESHOLD = 512


def enabled(n_members: int) -> bool:
    if os.environ.get("CRYPTO_TPU_NO_DEVICE_ACCUM"):
        return False
    if os.environ.get("CRYPTO_TPU_FORCE_DEVICE_ACCUM"):
        return True
    return (n_members >= DEVICE_THRESHOLD
            and jax.default_backend() != "cpu")


def _bits_msb(limbs: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """(M, L) plain 15-bit limbs -> (M, nbits) 0/1 int32, MSB first."""
    pos = np.arange(nbits)
    li = (pos // LIMB_BITS).astype(np.int32)
    off = (pos % LIMB_BITS).astype(np.int32)
    bits = (limbs[:, li] >> off[None, :]) & 1
    return bits[:, ::-1]


def _eval_add_polys(Jr, x, additions, alpha):
    """Batched d_A(x) = prod(y_i - x) and
    v_A(x) = sum_s prod_{i<s}(y_i + alpha) * prod_{i>s}(y_i - x)
    over members x: one lax.scan of |additions| steps (3 muls per step,
    batched over members).  Reference: `batch_utils.rs` Poly_d / Poly_v_A."""
    F = alpha.f
    n = len(additions)
    M = x.shape[0]
    ones = jnp.broadcast_to(Jr.pack([1])[0], x.shape)
    if n == 0:
        return ones, jnp.zeros_like(x)
    # host-precomputed factors: factor_s = prod_{i<s}(y_i + alpha)
    factors = [F(1)]
    for s in range(1, n):
        factors.append(factors[-1] * (additions[s - 1] + alpha))
    adds_p = Jr.pack([int(y) for y in additions])          # (n, L)
    facs_p = Jr.pack([int(f) for f in factors])            # (n, L)

    def body(carry, inp):
        dA, suffix, acc = carry
        y, f = inp
        acc = Jr.add(acc, Jr.mul(jnp.broadcast_to(f, x.shape), suffix))
        t = Jr.sub(jnp.broadcast_to(y, x.shape), x)
        suffix = Jr.mul(suffix, t)
        dA = Jr.mul(dA, t)
        return (dA, suffix, acc), None

    # iterate s descending so `suffix` holds prod_{i>s}(y_i - x)
    (dA, _sfx, vA), _ = jax.lax.scan(
        body, (ones, ones, jnp.zeros_like(x)), (adds_p[::-1], facs_p[::-1]))
    return dA, vA


def _eval_rem_polys(Jr, x, removals, alpha):
    """Batched d_D(x) = prod(y_i - x) and
    v_D(x) = sum_s prod_{i<=s} 1/(y_i + alpha) * prod_{i<s}(y_i - x)."""
    from .batch_utils import _batch_inverse
    F = alpha.f
    n = len(removals)
    ones = jnp.broadcast_to(Jr.pack([1])[0], x.shape)
    if n == 0:
        return ones, jnp.zeros_like(x)
    inv = _batch_inverse([y + alpha for y in removals])
    factors = []
    f = F(1)
    for s in range(n):
        f = f * inv[s]
        factors.append(f)
    rems_p = Jr.pack([int(y) for y in removals])
    facs_p = Jr.pack([int(f) for f in factors])

    def body(carry, inp):
        dD, prefix, acc = carry
        y, f = inp
        acc = Jr.add(acc, Jr.mul(jnp.broadcast_to(f, x.shape), prefix))
        t = Jr.sub(jnp.broadcast_to(y, x.shape), x)
        prefix = Jr.mul(prefix, t)
        dD = Jr.mul(dD, t)
        return (dD, prefix, acc), None

    (dD, _pfx, vD), _ = jax.lax.scan(
        body, (ones, ones, jnp.zeros_like(x)), (rems_p, facs_p))
    return dD, vD


def batch_update_with_sk_device(additions, removals, elements, old_Cs,
                                old_accumulator, sk):
    """Device variant of `witness._batch_update_with_sk`: returns
    (d_factors host Fp list, new_Cs host Point list)."""
    curve = old_accumulator.curve
    F = sk.alpha.f
    jc = jcurve_for(curve)
    Jr = jfield_for(F)
    M = len(elements)
    x = Jr.pack([int(y) for y in elements])                # (M, L) mont

    dA, vA = _eval_add_polys(Jr, x, additions, sk.alpha)
    if removals:
        dD, vD = _eval_rem_polys(Jr, x, removals, sk.alpha)
        # pad to pow2 handled inside batch_inv
        dDinv = _device_batch_inv(Jr, dD)
        if additions:
            fA = F(1)
            for a in additions:
                fA = fA * (a + sk.alpha)
            fA_p = jnp.broadcast_to(Jr.pack([int(fA)])[0], x.shape)
            v = Jr.sub(vA, Jr.mul(vD, fA_p))               # v_AD
        else:
            v = Jr.neg(vD)
        f = Jr.mul(dA, dDinv) if additions else dDinv
        vscal = Jr.mul(v, dDinv)
    else:
        f = dA
        vscal = vA

    # plain-int forms for bit extraction
    f_plain = Jr.from_mont(f)
    v_plain = Jr.from_mont(vscal)
    nbits = F.p.bit_length()

    # ONE batched double-and-add over 2M lanes computes C_i * f_i (member
    # witnesses, variable bases) and V * v_i (broadcast accumulator base)
    # together; the halves then add pairwise.
    Cs = jc.pack_points([c.normalize() for c in old_Cs])
    Vp = jc.pack_points([old_accumulator.normalize()])
    pts2 = JPoints(jnp.concatenate([Cs.X, jnp.tile(Vp.X, (M, 1))]),
                   jnp.concatenate([Cs.Y, jnp.tile(Vp.Y, (M, 1))]),
                   jnp.concatenate([Cs.Z, jnp.tile(Vp.Z, (M, 1))]))
    bits2 = jnp.concatenate([_bits_msb(f_plain, nbits),
                             _bits_msb(v_plain, nbits)])
    both = jc.scalar_mul(pts2, bits2)
    out = jc.add(JPoints(both.X[:M], both.Y[:M], both.Z[:M]),
                 JPoints(both.X[M:], both.Y[M:], both.Z[M:]))
    aff = jc.to_affine(out)
    inf = np.asarray(jax.device_get(aff.inf))
    xs = np.atleast_1d(jc.F.unpack_host(aff.X))
    ys = np.atleast_1d(jc.F.unpack_host(aff.Y))
    K = curve.K
    from ..curves.sw import Point
    new_pts = []
    for i in range(M):
        if inf[i]:
            new_pts.append(curve.infinity())
        else:
            new_pts.append(Point(xs[i], ys[i], K.one(), curve))
    d_factors = [F(int(v)) for v in np.atleast_1d(Jr.unpack_host(f))]
    return d_factors, new_pts
