"""Distributed NTT over a device mesh — four-step (Bailey) decomposition
(the TPU-native replacement for the reference's rayon-parallel FFT, and the
"NTT butterfly stages exchanged over ICI" item of BASELINE.md).

Data x[0..N) is sharded contiguously: device n1 holds rows of the (D, N2)
matrix view x[n1*N2 + n2], N2 = N/D.  With W = primitive N-th root:

  X[k1 + D*k2] = NTT_{N2, n2->k2}( W_N^{k1*n2} * C[k1, n2] )
  C[k1, n2]    = sum_{n1} x[n1, n2] * W_D^{k1*n1}        (cross-device)

Step 1 (cross-device column DFT, size D) uses one all_gather over ICI —
communication is O(N) once, independent of log N; steps 2-3 are local
twiddle + local NTT.  Output lands in the strided ("CRT") layout: device k1
holds all frequencies k with k mod D == k1.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..fields.host import Field
from ..fields.jfield import jfield_for
from ..ops.ntt import domain_for, NTTDomain


@functools.lru_cache(maxsize=None)
def _plan(F: Field, n: int, d: int):
    """Host-side constants for an (n, d) sharded NTT."""
    assert n % d == 0
    n2 = n // d
    dom = domain_for(F, n)
    local = domain_for(F, n2)
    J = dom.J
    p = F.p
    w = dom.w
    w_d = pow(w, n2, p)          # primitive d-th root
    # W_D powers matrix (d, d)
    wd_pows = [[pow(w_d, (k1 * n1) % d, p) for n1 in range(d)]
               for k1 in range(d)]
    # twiddles W_N^{k1*n2} laid out (d, n2)
    tw = [[pow(w, (k1 * j), p) for j in range(n2)] for k1 in range(d)]
    return dict(dom=dom, local=local, J=J,
                wd=J.pack(wd_pows),          # (d, d, L)
                tw=J.pack(tw))               # (d, n2, L)


def make_ntt_step(F: Field, n: int, mesh: Mesh, axis: str = "data"):
    d = mesh.devices.size
    plan = _plan(F, n, d)
    J = plan["J"]
    local_dom: NTTDomain = plan["local"]

    def step(x, wd, tw):
        def local(x_loc, wd_all, tw_loc):
            # x_loc: (1, n2, L) local rows; gather all rows
            g = jax.lax.all_gather(x_loc[0], axis)        # (d, n2, L)
            k1 = jax.lax.axis_index(axis)
            # C[k1, n2] = sum_d g[d] * W_D[k1, d]
            coefs = wd_all[k1]                            # (d, L)
            acc = None
            for i in range(d):
                term = J.mul(g[i], jnp.broadcast_to(coefs[i], g[i].shape))
                acc = term if acc is None else J.add(acc, term)
            # twiddle W_N^{k1*n2}
            y = J.mul(acc, tw_loc[0])
            # local NTT size n2
            out = local_dom._ntt_impl(y, inverse=False)
            return out[None]

        kwargs = dict(mesh=mesh,
                      in_specs=(P(axis), P(None), P(axis)),
                      out_specs=P(axis))
        try:
            sm = shard_map(local, check_vma=False, **kwargs)
        except TypeError:
            sm = shard_map(local, check_rep=False, **kwargs)
        return sm(x, wd, tw)

    return jax.jit(step), plan


def sharded_ntt(F: Field, values: list, mesh: Mesh, axis: str = "data"):
    """values: N ints; returns the NTT output as ints in NATURAL order
    (device-strided layout unshuffled on host)."""
    n = len(values)
    d = mesh.devices.size
    n2 = n // d
    step, plan = make_ntt_step(F, n, mesh, axis)
    J = plan["J"]
    x = J.pack(np.asarray(values, dtype=object).reshape(d, n2).tolist())
    out = step(x, plan["wd"], plan["tw"])
    flat = J.unpack(out)          # (d, n2) object array
    result = [0] * n
    for k1 in range(d):
        for k2 in range(n2):
            result[k1 + d * k2] = int(flat[k1][k2])
    return result
