"""Batched prime-field arithmetic on TPU: the L0 compute core.

This is the TPU-native replacement for the arkworks `ark-ff` layer the
reference delegates to (SURVEY.md §2.2): every heavy path (MSM, NTT, batched
signature/proof verification, SNARK proving) runs on these kernels.

Representation
--------------
A field element batch is an int32 tensor of shape ``(..., L)`` holding
**15-bit limbs, least-significant first**, in **Montgomery form**
(value·R mod p, R = 2^(15·L)).  15-bit limbs are chosen for TPU int32 lanes:

  * limb products fit int32 exactly:  (2^15-1)^2 < 2^31
  * schoolbook column sums routed through an f32 one-hot einsum hit the MXU
    and stay exact:  products < 2^15 per split half, column sums < 2^21 < 2^24

Montgomery reduction uses the 3-multiplication form (REDC via full-width
m = t·(-p^-1) mod R) instead of limb-serial CIOS: 50% more limb products but
a ~L× smaller XLA graph, which keeps compile times sane when these ops are
composed into curve formulas and scanned loops.

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .host import Field

LIMB_BITS = 15
LIMB_MASK = (1 << LIMB_BITS) - 1

_CARRY_MODE = None  # "ks" | "scan" | None (auto by backend)


def set_carry_mode(mode: str | None) -> None:
    """Force the carry-propagation implementation: "ks" (flat log-depth
    Kogge-Stone — fast at runtime on TPU, large graphs) or "scan"
    (lax.scan chains — small graphs, fast compiles on CPU).  None = auto:
    ks on tpu-like backends, scan on cpu.  Must be set before tracing."""
    global _CARRY_MODE
    _CARRY_MODE = mode


def _use_flat_carries() -> bool:
    import os
    mode = _CARRY_MODE or os.environ.get("CRYPTO_TPU_CARRY")
    if mode:
        return mode == "ks"
    return jax.default_backend() != "cpu"


def int_to_limbs(v: int, L: int) -> np.ndarray:
    out = np.zeros(L, dtype=np.int32)
    for i in range(L):
        out[i] = v & LIMB_MASK
        v >>= LIMB_BITS
    assert v == 0
    return out


def limbs_to_int(limbs) -> int:
    v = 0
    arr = np.asarray(limbs)
    for i in range(arr.shape[-1] - 1, -1, -1):
        v = (v << LIMB_BITS) | int(arr[i])
    return v


@functools.cache
def _onehot_cols(L: int) -> np.ndarray:
    """(L, L, 2L) f32 tensor with oh[i,j,i+j] = 1 — routes schoolbook partial
    products into base-2^15 columns via one MXU matmul."""
    oh = np.zeros((L, L, 2 * L), dtype=np.float32)
    for i in range(L):
        for j in range(L):
            oh[i, j, i + j] = 1.0
    return oh


class JField:
    """Device-side field context bound to a host `Field`. Stateless ops."""

    unit_ndim = 1   # trailing axes per element: (..., L)

    def __init__(self, field: Field):
        assert field.limb_bits == LIMB_BITS
        self.field = field
        self.L = field.num_limbs
        self.unit_shape = (field.num_limbs,)
        self.p = field.p
        p_limbs = int_to_limbs(field.p, self.L)
        self.p_limbs = jnp.asarray(p_limbs)
        self.p_limbs_ext = jnp.asarray(np.concatenate([p_limbs, [0]]))
        self.ninv_limbs = jnp.asarray(int_to_limbs(field.Ninv_R, self.L))
        self.r_mont = jnp.asarray(int_to_limbs(field.R, self.L))       # 1 in Mont form
        self.r2 = jnp.asarray(int_to_limbs(field.R2, self.L))
        self.zero_limbs = jnp.zeros((self.L,), dtype=jnp.int32)
        self._onehot = jnp.asarray(_onehot_cols(self.L))
        # p-2 bits MSB-first for Fermat inversion scan
        self._inv_bits = jnp.asarray(
            np.array([int(c) for c in bin(field.p - 2)[2:]], dtype=np.int32))
        # jit the hot entry points (shape-polymorphic via compile cache)
        self.add = jax.jit(self.add)
        self.sub = jax.jit(self.sub)
        self.neg = jax.jit(self.neg)
        self.mul = jax.jit(self.mul)
        self.square = jax.jit(self.square)
        self.inv = jax.jit(self.inv)
        self.to_mont = jax.jit(self.to_mont)
        self.from_mont = jax.jit(self.from_mont)

    # ------------------------------------------------------------------
    # host <-> device conversion
    # ------------------------------------------------------------------

    def pack(self, values, mont: bool = True) -> jnp.ndarray:
        """Python ints (nested lists ok) -> (..., L) int32 device array.
        Values are converted to Montgomery form by default."""
        arr = np.asarray(values, dtype=object)
        flat = arr.reshape(-1)
        out = np.zeros((flat.shape[0], self.L), dtype=np.int32)
        R = 1 << (LIMB_BITS * self.L)
        for k, v in enumerate(flat):
            v = int(v) % self.p
            if mont:
                v = (v * R) % self.p
            out[k] = int_to_limbs(v, self.L)
        return jnp.asarray(out.reshape(arr.shape + (self.L,)))

    def unpack_host(self, limbs):
        """(..., L) device array -> host `Field` elements (object array).
        Uniform protocol with the tower fields' `unpack_host`."""
        ints = self.unpack(limbs)
        arr = np.asarray(ints, dtype=object)
        flat = arr.reshape(-1)
        out = np.empty(flat.shape[0], dtype=object)
        for i, v in enumerate(flat):
            out[i] = self.field(int(v))
        return out.reshape(arr.shape) if arr.shape else out[0]

    def unpack(self, limbs, mont: bool = True):
        """(..., L) device array -> nested lists of Python ints."""
        arr = np.asarray(jax.device_get(limbs))
        shape = arr.shape[:-1]
        flat = arr.reshape(-1, self.L)
        Rinv = pow(1 << (LIMB_BITS * self.L), -1, self.p)
        out = []
        for row in flat:
            v = limbs_to_int(row)
            if mont:
                v = (v * Rinv) % self.p
            out.append(v)
        res = np.empty(len(out), dtype=object)
        res[:] = out
        return res.reshape(shape) if shape else out[0]

    # ------------------------------------------------------------------
    # limb helpers
    # ------------------------------------------------------------------

    @staticmethod
    def _shift_up(x: jnp.ndarray, k: int) -> jnp.ndarray:
        """Shift limbs toward higher significance by k positions (zeros in)."""
        if k == 0:
            return x
        return jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (k,), dtype=x.dtype), x[..., :-k]], axis=-1)

    def _carry_norm(self, x: jnp.ndarray, out_len: int) -> jnp.ndarray:
        if _use_flat_carries():
            return self._carry_norm_ks(x, out_len)
        return self._carry_norm_scan(x, out_len)

    def _carry_norm_scan(self, x: jnp.ndarray, out_len: int) -> jnp.ndarray:
        """lax.scan carry chain — tiny XLA graph, sequential at runtime.
        Used on CPU where compile time dominates (tests)."""
        K = x.shape[-1]
        if K < out_len:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (out_len - K,), dtype=x.dtype)], axis=-1)
        elif out_len < K:
            x = x[..., :out_len]
        xt = jnp.moveaxis(x, -1, 0)

        def body(c, v):
            v = v + c
            return v >> LIMB_BITS, v & LIMB_MASK

        _, limbs = jax.lax.scan(body, jnp.zeros_like(xt[0]), xt)
        return jnp.moveaxis(limbs, 0, -1)

    def _carry_norm_ks(self, x: jnp.ndarray, out_len: int) -> jnp.ndarray:
        """EXACT carry propagation in O(log L) parallel steps (no scans —
        sequential scans of tiny bodies are pathologically slow on TPU and
        bloat graphs).  x has nonneg int32 limbs (< 2^31).  Returns
        (..., out_len) 15-bit limbs; overflow beyond out_len is dropped
        (callers guarantee none, except deliberate mod-R truncation).

        Method: two relaxation rounds bring every limb into [0, 2^15]; the
        residual overflow bits (each 0/1, plus-one into the next limb) are
        then added with Kogge-Stone generate/propagate prefix carries."""
        K = x.shape[-1]
        if K < out_len:  # pad so carries can spill into the extra limbs
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (out_len - K,), dtype=x.dtype)], axis=-1)
        elif out_len < K:
            x = x[..., :out_len]
        # relaxation: v_i <- (v_i & M) + (v_{i-1} >> 15); after two rounds
        # every limb is in [0, 2^15] (carries in round 2 are <= 2^6, round 3
        # residue is a single bit captured below).
        x = (x & LIMB_MASK) + self._shift_up(x >> LIMB_BITS, 1)
        x = (x & LIMB_MASK) + self._shift_up(x >> LIMB_BITS, 1)
        a = x & LIMB_MASK
        w = self._shift_up(x >> LIMB_BITS, 1)        # 0/1 plus-one vector
        s = a + w                                     # <= 2^15
        g = (s >> LIMB_BITS).astype(jnp.int32)        # generate (s == 2^15)
        p = (s == LIMB_MASK).astype(jnp.int32)        # propagate
        # Kogge-Stone prefix: carry into limb i = OR over j<i of g_j & AND p's
        step = 1
        n = s.shape[-1]
        while step < n:
            g = g | (p & self._shift_up(g, step))
            p = p & self._shift_up(p, step)
            step <<= 1
        carry_in = self._shift_up(g, 1)
        return (s + carry_in) & LIMB_MASK

    def _wide_cols(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Full product as UNnormalized base-2^15 columns: (..., 2L) int32,
        each < 2·L·2^15 < 2^21."""
        P = a[..., :, None] * b[..., None, :]              # int32 exact (<2^30)
        Plo = (P & LIMB_MASK).astype(jnp.float32)
        Phi = (P >> LIMB_BITS).astype(jnp.float32)
        stacked = jnp.stack([Plo, Phi], axis=-3)           # (..., 2, L, L)
        cols2 = jnp.einsum(
            "...xij,ijk->...xk", stacked, self._onehot,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)                                # (..., 2, 2L)
        lo = cols2[..., 0, :]
        hi = cols2[..., 1, :]
        hi_shifted = jnp.concatenate(
            [jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
        return lo + hi_shifted

    def _sub_limbs(self, a: jnp.ndarray, b: jnp.ndarray):
        if _use_flat_carries():
            return self._sub_limbs_ks(a, b)
        return self._sub_limbs_scan(a, b)

    def _sub_limbs_scan(self, a: jnp.ndarray, b: jnp.ndarray):
        d = jnp.moveaxis(a - b, -1, 0)

        def body(borrow, v):
            v = v - borrow
            return (v < 0).astype(jnp.int32), v & LIMB_MASK

        borrow, limbs = jax.lax.scan(body, jnp.zeros_like(d[0]), d)
        return jnp.moveaxis(limbs, 0, -1), borrow.astype(bool)

    def _sub_limbs_ks(self, a: jnp.ndarray, b: jnp.ndarray):
        """a - b limbwise with log-depth parallel-prefix borrows.
        Inputs are normalized 15-bit limbs.  Returns (diff, borrow_mask)."""
        d = a - b                                     # in (-2^15, 2^15)
        g = (d < 0).astype(jnp.int32)                 # generate borrow
        p = (d == 0).astype(jnp.int32)                # propagate borrow
        gg, pp = g, p
        step = 1
        n = d.shape[-1]
        while step < n:
            gg = gg | (pp & self._shift_up(gg, step))
            pp = pp & self._shift_up(pp, step)
            step <<= 1
        borrow_in = self._shift_up(gg, 1)
        out = (d - borrow_in) & LIMB_MASK
        # gg already folds borrow-ins from below: top entry = overall borrow
        return out, gg[..., -1].astype(bool)

    def _cond_sub_p(self, x: jnp.ndarray) -> jnp.ndarray:
        """x in [0, 2p) possibly with one extra limb; reduce to [0, p)."""
        K = x.shape[-1]
        p_ext = self.p_limbs_ext[:K] if K > self.L else self.p_limbs
        d, borrow = self._sub_limbs(x, jnp.broadcast_to(p_ext, x.shape))
        res = jnp.where(borrow[..., None], x, d)
        return res[..., : self.L]

    # ------------------------------------------------------------------
    # public field ops (Montgomery domain)
    # ------------------------------------------------------------------

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        s = self._carry_norm(a + b, self.L + 1)
        return self._cond_sub_p(s)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        d, borrow = self._sub_limbs(a, b)
        dp = self._carry_norm(d + self.p_limbs, self.L)
        return jnp.where(borrow[..., None], dp, d)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        d, _ = self._sub_limbs(jnp.broadcast_to(self.p_limbs, a.shape), a)
        return jnp.where(self.is_zero(a)[..., None], a, d)

    def double(self, a):
        return self.add(a, a)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product: a·b·R^-1 mod p (3-multiplication REDC).

        On TPU the product routes through the fused Pallas Montgomery-mul
        kernel (`ops/pallas/field_kernels.py`) — ~19 ns/elem on v5e vs the
        composed-XLA einsum form; on CPU (tests) the einsum form compiles
        fast and runs everywhere.  Override with CRYPTO_TPU_MUL_BACKEND.
        """
        if self._use_pallas_mul():
            from ..ops.pallas.field_kernels import mont_mul_batched
            return mont_mul_batched(self, a, b)
        return self.mul_einsum(a, b)

    @staticmethod
    def _use_pallas_mul() -> bool:
        import os
        mode = os.environ.get("CRYPTO_TPU_MUL_BACKEND")
        if mode:
            return mode == "pallas"
        return jax.default_backend() == "tpu"

    def mul_einsum(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Composed-XLA Montgomery product (reference path; all backends)."""
        L = self.L
        t = self._carry_norm(self._wide_cols(a, b), 2 * L)
        # m = (t mod R) * (-p^-1 mod R) mod R
        m = self._carry_norm(self._wide_cols(t[..., :L], self.ninv_limbs)[..., :L], L)
        u = self._wide_cols(m, self.p_limbs)               # m * p, cols < 2^21
        s = t + u                                          # < 2^22, safe
        s = self._carry_norm(s, 2 * L + 1)
        res = s[..., L:]                                   # exact division by R
        return self._cond_sub_p(res)

    def square(self, a):
        return self.mul(a, a)

    def mul_const(self, a: jnp.ndarray, c_mont: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, jnp.broadcast_to(c_mont, a.shape))

    def pow_fixed(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a *static* exponent, via lax.scan square-and-multiply."""
        if e == 0:
            return jnp.broadcast_to(self.r_mont, a.shape).astype(jnp.int32)
        bits = jnp.asarray([int(c) for c in bin(e)[2:]], dtype=jnp.int32)

        def body(acc, bit):
            acc = self.mul(acc, acc)
            acc = jnp.where(bit > 0, self.mul(acc, a), acc)
            return acc, None

        # first bit is always 1 -> start from a
        out, _ = jax.lax.scan(body, a, bits[1:])
        return out

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Batched inversion via Fermat (a^(p-2)); 0 maps to 0."""
        def body(acc, bit):
            acc = self.mul(acc, acc)
            acc = jnp.where(bit > 0, self.mul(acc, a), acc)
            return acc, None

        out, _ = jax.lax.scan(body, a, self._inv_bits[1:])
        return out

    # ------------------------------------------------------------------
    # predicates / conversion
    # ------------------------------------------------------------------

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    def select(self, mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
        """where(mask, a, b) with mask shaped (...,) broadcasting over limbs."""
        return jnp.where(mask[..., None], a, b)

    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, jnp.broadcast_to(self.r2, a.shape))

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mul(a, one)

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros(tuple(shape) + (self.L,), dtype=jnp.int32)

    def ones(self, shape=()) -> jnp.ndarray:
        """Montgomery 1 (= R mod p)."""
        return jnp.broadcast_to(self.r_mont, tuple(shape) + (self.L,)).astype(jnp.int32)

    def rand(self, key, shape=()) -> jnp.ndarray:
        """Uniform field elements (for randomized checks on device):
        rejection-free wide reduction of 2L random limbs... simple version:
        sample L limbs + reduce via one Montgomery mul by R2 (slight bias
        < 2^-(15L - bits) — negligible for our fields only when 15L >> bits;
        use host RNG for protocol randomness instead)."""
        raw = jax.random.randint(
            key, tuple(shape) + (2 * self.L,), 0, 1 << LIMB_BITS, dtype=jnp.int32)
        # interpret as 2L-limb integer, reduce: value = hi*R + lo (mod p).
        lo, hi = raw[..., : self.L], raw[..., self.L:]
        # mont_mul(hi, R2) = hi*R mod p; mont_mul(lo, R mod p) = lo mod p
        # (REDC is valid for any operand < R as long as the other is < p).
        hi_red = self.mul(hi, jnp.broadcast_to(self.r2, hi.shape))
        lo_red = self.mul(lo, jnp.broadcast_to(self.r_mont, lo.shape))
        return self.add(hi_red, lo_red)


@functools.cache
def jfield_for(field: Field) -> JField:
    return JField(field)
