"""Run the Pallas kernels in interpreter mode on CPU — covers the Mosaic
kernel code paths (Montgomery mul, fused affine pre/post, Jacobian
add/double) that otherwise only execute on real TPU hardware."""

import os
import subprocess
import sys

SCRIPT = r"""
import os
os.environ["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
import jax; jax.config.update("jax_platforms", "cpu")
import random
import numpy as np
import jax.numpy as jnp
from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.fields.jfield import jfield_for
rng = random.Random(12)
F = jfield_for(bls.Fq)
L = F.L

# 1. transposed Montgomery mul kernel
from crypto_tpu.ops.pallas.field_kernels import mont_mul_t_fn
mulT = mont_mul_t_fn(L, F.p, F.field.Ninv_R)
xs = [bls.Fq.rand(rng) for _ in range(8)]
ys = [bls.Fq.rand(rng) for _ in range(8)]
X = F.pack([int(v) for v in xs]); Y = F.pack([int(v) for v in ys])
pad = 512 - 8
XT = jnp.concatenate([X, jnp.zeros((pad, L), jnp.int32)]).T
YT = jnp.concatenate([Y, jnp.zeros((pad, L), jnp.int32)]).T
out = np.asarray(mulT(XT, YT)).T[:8]
got = F.unpack_host(jnp.asarray(out))
assert list(got) == [a * b for a, b in zip(xs, ys)], "mont_mul_t mismatch"
print("mont_mul_t interpret OK")

# 2. fused affine pre/post kernels via a tiny TPU-path bucket_sums
from crypto_tpu.ops.pallas.curve_kernels import affine_kernels_for
from crypto_tpu.ops.msm_v2 import batch_inv_t, AffinePoints
pre, post = affine_kernels_for(L, F.p, F.field.Ninv_R, block_b=512)
pts = [bls.G1.rand(rng).normalize() for _ in range(4)]
qts = [bls.G1.rand(rng).normalize() for _ in range(4)]
cases = list(zip(pts, qts)) + [(pts[0], pts[0])]        # incl. a doubling
n = len(cases)
def aff(ps):
    xs = F.pack([int(p.to_affine()[0]) for p in ps])
    ys = F.pack([int(p.to_affine()[1]) for p in ps])
    return xs, ys
x1, y1 = aff([c[0] for c in cases]); x2, y2 = aff([c[1] for c in cases])
padn = 512 - n
def padT(a):
    return jnp.concatenate([a, jnp.zeros((padn, L), jnp.int32)]).T
m0 = jnp.concatenate([jnp.zeros((1, n), jnp.int32),
                      jnp.ones((1, padn), jnp.int32)], axis=1)
d, dbl, inf3 = pre(padT(x1), padT(y1), m0, padT(x2), padT(y2), m0)
dinv = batch_inv_t(F, d, mulT)
x3, y3 = post(padT(x1), padT(y1), padT(x2), padT(y2), dinv, dbl, m0, m0)
gx = F.unpack_host(jnp.asarray(np.asarray(x3).T[:n]))
gy = F.unpack_host(jnp.asarray(np.asarray(y3).T[:n]))
for i, (p, q) in enumerate(cases):
    ex, ey = (p + q).to_affine()
    assert gx[i] == ex and gy[i] == ey, f"affine kernel case {i}"
print("affine pre/post interpret OK")
"""


def test_pallas_kernels_interpret_mode():
    env = dict(os.environ)
    env["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
    out = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                         capture_output=True, text=True, timeout=1200,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert "affine pre/post interpret OK" in out.stdout, \
        out.stderr[-3000:] + out.stdout[-500:]


SCRIPT_GATHER = r"""
import os
os.environ["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from crypto_tpu.ops.pallas.field_kernels import gather_rows_t_fn
rng = np.random.default_rng(0)
N, M, C = 300, 2048, 26
payload = jnp.asarray(rng.integers(0, 1 << 15, size=(N, C), dtype=np.int32))
idx = jnp.asarray(rng.integers(0, N, size=M, dtype=np.int32))
out = np.asarray(gather_rows_t_fn(C, block_b=1024, nchunk=8)(payload, idx))
assert (out == np.asarray(payload)[np.asarray(idx)].T).all()
print("GATHER OK")
"""


def test_dma_gather_interpret_mode():
    env = dict(os.environ)
    env["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
    out = subprocess.run([sys.executable, "-c", SCRIPT_GATHER], env=env,
                         capture_output=True, text=True, timeout=900,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert "GATHER OK" in out.stdout, out.stderr[-2000:]


SCRIPT_FQ2 = r"""
import os
os.environ["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
os.environ["CRYPTO_TPU_FORCE_TPU_MSM"] = "1"
import jax; jax.config.update("jax_platforms", "cpu")
import random
import numpy as np
import jax.numpy as jnp
from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.fields.jtower import jquad_for
rng = random.Random(5)
F2 = jquad_for(bls.Fq2)
L = F2.base.L

# 1. fused Fq2 Karatsuba mul kernel vs host tower
from crypto_tpu.ops.pallas.curve_kernels import fq2_mul_t_fn, FQ2_BLOCK
mulT2 = fq2_mul_t_fn(L, F2.base.p, F2.base.field.Ninv_R)
xs = [bls.Fq2.rand(rng) for _ in range(4)]
ys = [bls.Fq2.rand(rng) for _ in range(4)]
X = F2.pack(xs); Y = F2.pack(ys)               # (4, 2, L)
pad = FQ2_BLOCK - 4
def padT(a):
    a2 = a.reshape(a.shape[0], -1)
    return jnp.concatenate([a2, jnp.zeros((pad, 2 * L), jnp.int32)]).T
outT = np.asarray(mulT2(padT(X), padT(Y)))
got = F2.unpack_host(jnp.asarray(outT.T[:4].reshape(4, 2, L)))
assert list(got) == [a * b for a, b in zip(xs, ys)], "fq2 mul kernel mismatch"
print("fq2_mul_t interpret OK")

# 2. batch_inv_t over Fq2 (dead lanes must be nonzero, like `pre` emits)
from crypto_tpu.ops.msm_v2 import batch_inv_t
vT = padT(X).at[0, 4:].set(1)
inv = batch_inv_t(F2, vT, mulT2, FQ2_BLOCK)
goti = F2.unpack_host(jnp.asarray(np.asarray(inv).T[:4].reshape(4, 2, L)))
one = bls.Fq2.one()
assert all((a * b) == one for a, b in zip(xs, goti)), "fq2 batch_inv_t"
print("fq2 batch_inv_t interpret OK")

# 3. fused G2 bucket-sums stage (packing + gather + fq2 halving kernels)
# vs the generic jnp path on identical inputs.  (The full MSM tail is too
# slow under the interpreter; it is generic-field code covered by
# test_jcurve_g2 / test_msm_v2.)
from crypto_tpu.curves.jcurve import jcurve_for
from crypto_tpu.ops.msm_v2 import (_engine_for, device_digits,
                                   scalars_to_bytes)
jc = jcurve_for(bls.G2)
engine = _engine_for(jc)
n, c, padb = 8, 8, 2
pts = [bls.G2.rand(rng).normalize() for _ in range(n)]
packed = jc.pack_points(pts)
scal = [rng.randrange(1 << 16) for _ in range(n)]
digits = device_digits(jnp.asarray(scalars_to_bytes(scal, 2)), c, 16)
inf = jc.is_infinity(packed)
fused = engine.bucket_sums_fn(c, padb)           # TPU path (forced)
del os.environ["CRYPTO_TPU_FORCE_TPU_MSM"]
generic = engine.bucket_sums_fn(c, padb)         # generic jnp path
Pf, _, _fl = fused(digits[0], packed.X, packed.Y, inf)
Pg, _, _fl2 = generic(digits[0], packed.X, packed.Y, inf)
inf_f = np.asarray(Pf.inf)
inf_g = np.asarray(Pg.inf)
assert (inf_f == inf_g).all(), "G2 bucket inf mask mismatch"
xf = F2.unpack_host(Pf.x); yf = F2.unpack_host(Pf.y)
xg = F2.unpack_host(Pg.x); yg = F2.unpack_host(Pg.y)
for i in range(len(inf_f)):
    if not inf_f[i]:
        assert xf[i] == xg[i] and yf[i] == yg[i], f"G2 bucket {i}"
print("G2 fused bucket sums interpret OK")
"""


import pytest


@pytest.mark.slow
def test_fq2_kernels_interpret_mode():
    env = dict(os.environ)
    env["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
    env["CRYPTO_TPU_FORCE_TPU_MSM"] = "1"
    out = subprocess.run([sys.executable, "-c", SCRIPT_FQ2], env=env,
                         capture_output=True, text=True, timeout=1800,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert "G2 fused bucket sums interpret OK" in out.stdout, \
        out.stderr[-3000:] + out.stdout[-500:]


SCRIPT_CHUNKED = r"""
import os
os.environ["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
import jax; jax.config.update("jax_platforms", "cpu")
import random
import numpy as np
import jax.numpy as jnp
from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.fields.jfield import jfield_for
from crypto_tpu.ops.pallas.field_kernels import mont_mul_t_fn
from crypto_tpu.ops.pallas.curve_kernels import (chunked_level_kernels_for,
                                                 CHUNK_K, CHUNK_BW)
from crypto_tpu.ops.msm_v2 import batch_inv_t
rng = random.Random(21)
F = jfield_for(bls.Fq)
L = F.L
mulT = mont_mul_t_fn(L, F.p, F.field.Ninv_R)
call_prefix, call_down = chunked_level_kernels_for(L, F.p, F.field.Ninv_R)
W = CHUNK_K * CHUNK_BW

# real pairs spread across several sub-slices so the prefix/downsweep walk
# crosses chunk boundaries; include doubling, inverse (P + -P), and
# one-operand-infinity cases
pts = [bls.G1.rand(rng).normalize() for _ in range(6)]
qts = [bls.G1.rand(rng).normalize() for _ in range(6)]
cases = list(zip(pts, qts)) + [(pts[0], pts[0]), (pts[1], -pts[1])]
slots = [0, 1, 511, 512, 1000, 2048, 3000, W - 1]          # spread positions
inf_slot = 4000                                            # P + inf = P
x1 = np.zeros((L, W), np.int32); y1 = np.zeros((L, W), np.int32)
x2 = np.zeros((L, W), np.int32); y2 = np.zeros((L, W), np.int32)
m1 = np.ones((1, W), np.int32);  m2 = np.ones((1, W), np.int32)
def put(xa, ya, s, p):
    ax, ay = p.to_affine()
    xa[:, s] = np.asarray(F.pack([int(ax)]))[0]
    ya[:, s] = np.asarray(F.pack([int(ay)]))[0]
for s, (p, q) in zip(slots, cases):
    put(x1, y1, s, p); put(x2, y2, s, q.normalize() if hasattr(q, 'normalize') else q)
    m1[0, s] = 0; m2[0, s] = 0
put(x2, y2, inf_slot, qts[0]); m2[0, inf_slot] = 0          # m1 stays 1 (inf)
prefix, total, mdbl, inf3 = call_prefix(*map(jnp.asarray,
                                             (x1, y1, m1, x2, y2, m2)))
tinv = batch_inv_t(F, total, mulT)
x3, y3 = call_down(jnp.asarray(x1), jnp.asarray(y1), jnp.asarray(m1),
                   jnp.asarray(x2), jnp.asarray(y2), jnp.asarray(m2),
                   prefix, tinv, mdbl)
gx = F.unpack_host(jnp.asarray(np.asarray(x3).T))
gy = F.unpack_host(jnp.asarray(np.asarray(y3).T))
ginf = np.asarray(inf3)[0]
for s, (p, q) in zip(slots, cases):
    r = p + q
    if r.is_infinity():
        assert ginf[s], f"slot {s}: expected infinity"
    else:
        ex, ey = r.to_affine()
        assert not ginf[s] and gx[s] == ex and gy[s] == ey, f"slot {s}"
ex, ey = qts[0].to_affine()
assert not ginf[inf_slot] and gx[inf_slot] == ex and gy[inf_slot] == ey
print("chunked level interpret OK")
"""


@pytest.mark.slow
def test_chunked_level_interpret_mode():
    env = dict(os.environ)
    env["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
    out = subprocess.run([sys.executable, "-c", SCRIPT_CHUNKED], env=env,
                         capture_output=True, text=True, timeout=1200,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert "chunked level interpret OK" in out.stdout, \
        out.stderr[-3000:] + out.stdout[-500:]


SCRIPT_FAST = r"""
import os
os.environ["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
os.environ["CRYPTO_TPU_FORCE_TPU_MSM"] = "1"
import jax; jax.config.update("jax_platforms", "cpu")
import logging
import random
import numpy as np
import jax.numpy as jnp
from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jcurve import jcurve_for
from crypto_tpu.ops import msm_v2

rng = random.Random(31)
jc = jcurve_for(bls.G1)
G = bls.G1.generator()
n, c = 16, 8
dlogs = [rng.randrange(1, 1 << 40) for _ in range(n)]
dlogs[7] = dlogs[3]                      # duplicate base -> bucket collision
pts = [(G.mul_raw(a)).normalize() for a in dlogs]
scal = [rng.randrange(1, 1 << 16) for _ in range(n)]
scal[7] = scal[3]                        # same digits -> same buckets
packed = jc.pack_points(pts)

records = []
h = logging.Handler()
h.emit = lambda rec: records.append(rec.getMessage())
logging.getLogger("crypto_tpu.msm").addHandler(h)

res = msm_v2.msm_device_scheduled(bls.G1, packed, scal, c=c, nbits=16)
expect = G.mul_raw(sum(s * a for s, a in zip(scal, dlogs)) % bls.R)
assert res.normalize() == expect.normalize(), "fast-path MSM mismatch"
assert any("rerunning" in m for m in records), \
    f"duplicate base did not trip the fast-path flag: {records}"
print("fast path collision rerun OK")

# distinct bases: no flag, exact result
dlogs2 = [rng.randrange(1, 1 << 40) for _ in range(n)]
pts2 = [(G.mul_raw(a)).normalize() for a in dlogs2]
packed2 = jc.pack_points(pts2)
records.clear()
res2 = msm_v2.msm_device_scheduled(bls.G1, packed2, scal, c=c, nbits=16)
expect2 = G.mul_raw(sum(s * a for s, a in zip(scal, dlogs2)) % bls.R)
assert res2.normalize() == expect2.normalize(), "fast-path distinct mismatch"
assert not records, f"unexpected rerun on distinct bases: {records}"
print("fast path distinct bases OK")

# grid path (explicit pad disables bands): duplicate bases again -> the
# planned grid programs must flag and rerun too
records.clear()
res3 = msm_v2.msm_device_scheduled(bls.G1, packed, scal, c=c, nbits=16,
                                   pad=8)
assert res3.normalize() == expect.normalize(), "grid fast-path mismatch"
assert any("rerunning" in m for m in records), "grid path flag missed"
print("grid fast path collision rerun OK")
"""

SCRIPT_ESCAPE = r"""
import os
os.environ["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
os.environ["CRYPTO_TPU_FORCE_TPU_MSM"] = "1"
import jax; jax.config.update("jax_platforms", "cpu")
import logging
import random
from crypto_tpu.curves import bls12_381 as bls
from crypto_tpu.curves.jcurve import jcurve_for
from crypto_tpu.ops import msm_v2

rng = random.Random(31)
jc = jcurve_for(bls.G1)
G = bls.G1.generator()
n, c = 16, 8
records = []
h = logging.Handler()
h.emit = lambda rec: records.append(rec.getMessage())
logging.getLogger("crypto_tpu.msm").addHandler(h)

# adversarial structured scalars: ALL equal -> every live digit lands in
# ONE bucket (occupancy n, far outside the Poisson model).  The bands path
# dispatches optimistically under the model bands, must then DISCARD those
# results on the coverage check and recompute with exact per-run bands —
# the answer must still be exact (msm_v2 optimistic-dispatch fallback).
dlogs = [rng.randrange(1, 1 << 40) for _ in range(n)]
pts = [(G.mul_raw(a)).normalize() for a in dlogs]
packed = jc.pack_points(pts)
scal = [12345] * n
res = msm_v2.msm_device_scheduled(bls.G1, packed, scal, c=c, nbits=16)
expect = G.mul_raw(sum(12345 * a for a in dlogs) % bls.R)
assert res.normalize() == expect.normalize(), "escape-path MSM mismatch"
assert any("outside the Poisson model" in m for m in records), \
    f"structured scalars did not escape the model: {records}"
print("model-escape exact-bands fallback OK")
"""


@pytest.mark.slow
def test_model_escape_exact_bands_interpret_mode():
    env = dict(os.environ)
    env["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
    env["CRYPTO_TPU_FORCE_TPU_MSM"] = "1"
    out = subprocess.run([sys.executable, "-c", SCRIPT_ESCAPE], env=env,
                         capture_output=True, text=True, timeout=1800,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert "model-escape exact-bands fallback OK" in out.stdout, \
        out.stderr[-3000:] + out.stdout[-500:]


@pytest.mark.slow
def test_fast_path_collision_rerun_interpret_mode():
    env = dict(os.environ)
    env["CRYPTO_TPU_PALLAS_INTERPRET"] = "1"
    env["CRYPTO_TPU_FORCE_TPU_MSM"] = "1"
    out = subprocess.run([sys.executable, "-c", SCRIPT_FAST], env=env,
                         capture_output=True, text=True, timeout=1800,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert "grid fast path collision rerun OK" in out.stdout, \
        out.stderr[-3000:] + out.stdout[-500:]
