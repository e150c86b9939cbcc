"""Radix-2 NTT / iNTT over Fr on device (+ coset variants).

The TPU-native replacement for arkworks `EvaluationDomain`
(`Radix2EvaluationDomain`) used by the reference's QAP witness map
(`legogroth16/src/r1cs_to_qap.rs:150-209`: 3 iFFTs + 3 coset FFTs +
pointwise + coset iFFT) and polynomial multiplication
(`utils/src/poly.rs` via ark-poly).

Design: decimation-in-time butterflies over (..., N, L) Montgomery limb
tensors; one bit-reversal gather, then log2(N) stages of
reshape + broadcasted twiddle-mul + add/sub — all dense batched field ops.
Twiddle tables are precomputed per (field, N) and cached on device.

BLS12-381 Fr has two-adicity 32 (plenty for 2^20+ domains).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.host import Field
from ..fields.jfield import JField, jfield_for


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class NTTDomain:
    """Evaluation domain of size N = 2^k over field F (host metadata +
    device twiddle tables)."""

    def __init__(self, F: Field, n: int):
        assert n & (n - 1) == 0, "domain size must be a power of two"
        k = n.bit_length() - 1
        assert k <= F.two_adicity, "field lacks required two-adicity"
        self.F = F
        self.J = jfield_for(F)
        self.n = n
        self.k = k
        p = F.p
        # primitive n-th root of unity
        self.w = pow(F.generator, (p - 1) // n, p)
        self.w_inv = pow(self.w, -1, p)
        self.n_inv = pow(n, -1, p)
        self._perm = jnp.asarray(_bit_reverse_perm(n))
        self._tw_fwd = self._twiddle_tables(self.w)
        self._tw_inv = self._twiddle_tables(self.w_inv)
        self._n_inv_mont = self.J.pack([self.n_inv])[0]
        self._fwd = jax.jit(functools.partial(self._ntt_impl, inverse=False))
        self._inv = jax.jit(functools.partial(self._ntt_impl, inverse=True))

    def _twiddle_tables(self, w: int):
        """Per-stage twiddle vectors for DIT: stage s has m=2^s, twiddles
        w_m^j for j in [0, m/2), w_m = w^(n/m)."""
        p = self.F.p
        tables = []
        for s in range(1, self.k + 1):
            m = 1 << s
            wm = pow(w, self.n // m, p)
            half = m // 2
            tw = [1] * half
            for j in range(1, half):
                tw[j] = tw[j - 1] * wm % p
            tables.append(self.J.pack(tw))
        return tables

    def _ntt_impl(self, a: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """a: (..., n, L) Montgomery limbs -> same shape, NTT'd."""
        J = self.J
        n, L = self.n, J.L
        a = jnp.take(a, self._perm, axis=-2)
        tables = self._tw_inv if inverse else self._tw_fwd
        lead = a.shape[:-2]
        for s in range(1, self.k + 1):
            m = 1 << s
            half = m // 2
            a = a.reshape(lead + (n // m, m, L))
            even = a[..., :half, :]
            odd = a[..., half:, :]
            t = J.mul(odd, tables[s - 1])
            a = jnp.concatenate([J.add(even, t), J.sub(even, t)], axis=-2)
        a = a.reshape(lead + (n, L))
        if inverse:
            a = J.mul(a, jnp.broadcast_to(self._n_inv_mont, a.shape))
        return a

    # -- public API --

    def ntt(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._fwd(a)

    def intt(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._inv(a)

    def coset_scale_tables(self, g: int):
        """(powers of g, powers of g^-1 scaled by 1) for coset (i)NTT."""
        p = self.F.p
        pw = [1] * self.n
        for i in range(1, self.n):
            pw[i] = pw[i - 1] * g % p
        ginv = pow(g, -1, p)
        pwi = [1] * self.n
        for i in range(1, self.n):
            pwi[i] = pwi[i - 1] * ginv % p
        return self.J.pack(pw), self.J.pack(pwi)

    @functools.cached_property
    def _coset_tables(self):
        """Default coset = field multiplicative generator (matches arkworks
        `get_coset` usage in the QAP reduction)."""
        return self.coset_scale_tables(self.F.generator)

    def coset_ntt(self, a: jnp.ndarray) -> jnp.ndarray:
        pw, _ = self._coset_tables
        return self.ntt(self.J.mul(a, pw))

    def coset_intt(self, a: jnp.ndarray) -> jnp.ndarray:
        _, pwi = self._coset_tables
        return self.J.mul(self.intt(a), pwi)

    # -- host bridges --

    def ntt_ints(self, values: list[int], inverse: bool = False,
                 coset: bool = False) -> list[int]:
        a = self.J.pack([v % self.F.p for v in values])
        if coset:
            out = self.coset_intt(a) if inverse else self.coset_ntt(a)
        else:
            out = self.intt(a) if inverse else self.ntt(a)
        return [int(v) for v in np.atleast_1d(self.J.unpack(out))]

    def z_on_coset(self) -> int:
        """Z_H(g) = g^n - 1 evaluated on the default coset (constant across
        the coset) — the vanishing-poly divisor in the QAP reduction."""
        p = self.F.p
        return (pow(self.F.generator, self.n, p) - 1) % p


@functools.lru_cache(maxsize=None)
def domain_for(F: Field, n: int) -> NTTDomain:
    return NTTDomain(F, n)


def poly_mul_ntt(F: Field, a: list[int], b: list[int]) -> list[int]:
    """Polynomial multiplication via NTT (device); coefficients as ints."""
    out_len = len(a) + len(b) - 1
    n = 1 << (out_len - 1).bit_length()
    if n > (1 << F.two_adicity):
        raise ValueError("polynomial too large for field two-adicity")
    dom = domain_for(F, n)
    J = dom.J
    pa = J.pack(list(a) + [0] * (n - len(a)))
    pb = J.pack(list(b) + [0] * (n - len(b)))
    fa = dom.ntt(pa)
    fb = dom.ntt(pb)
    prod = dom.intt(J.mul(fa, fb))
    vals = [int(v) for v in np.atleast_1d(J.unpack(prod))]
    return vals[:out_len]
