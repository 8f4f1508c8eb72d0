"""Dev drive: differential-check pallas/ec.py + pallas/bucket.py.

Stage 1: ec_add/ec_double (pure jnp, no pallas) vs G1_LM — tiny graph.
Stage 2: seg_scan_pallas interpret on n=8 real points (padded to 128
lanes, steps=3) vs loop-mode seg_scan.
  JAX_PLATFORMS=cpu python scripts/dev_check_bucket.py
"""
import os, sys, time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
for p in (REPO, os.path.join(REPO, "src")):
    sys.path.insert(0, p)

import numpy as np
import jax

try:
    from jax._src import xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from tpukzg.utils import cachefix
cachefix.install()

import jax.numpy as jnp
from tpukzg.field.mont import FP
from tpukzg.msm.scan import seg_scan
from tpukzg.curve.weierstrass_lm import G1_LM
from tpukzg.pallas.bucket import seg_scan_pallas
from tpukzg.pallas.ec import ec_add, ec_double

import golden.model as gold

L = FP.L


def fp_to_limbs(x):
    xm = (x * (1 << (16 * L))) % gold.P
    return [(xm >> (16 * i)) & 0xFFFF for i in range(L)]


def pts_to_lm(pts_aff, shape):
    """golden affine points -> (L,)+shape limb-major arrays."""
    X = np.zeros((L,) + shape, np.uint32)
    Y = np.zeros((L,) + shape, np.uint32)
    Z = np.zeros((L,) + shape, np.uint32)
    flatX = X.reshape(L, -1); flatY = Y.reshape(L, -1); flatZ = Z.reshape(L, -1)
    for j, pt in enumerate(pts_aff):
        x, y, inf = pt
        if inf:
            flatY[:, j] = fp_to_limbs(1)
        else:
            flatX[:, j] = fp_to_limbs(x)
            flatY[:, j] = fp_to_limbs(y)
            flatZ[:, j] = fp_to_limbs(1)
    return X, Y, Z


def to_affine(xl, yl, zl):
    def fromm(limbs):
        v = 0
        for i in reversed(range(L)):
            v = (v << 16) | int(limbs[i])
        return (v * pow(1 << (16 * L), -1, gold.P)) % gold.P
    x, y, z = fromm(xl), fromm(yl), fromm(zl)
    if z == 0:
        return None
    zi = pow(z, -1, gold.P)
    return (x * zi % gold.P, y * zi % gold.P)


# -- build a few points (multiples of G) --
pts_aff = []
acc = gold.G1_GEN
for i in range(16):
    pts_aff.append(gold.g1_affine(acc) + (False,))
    acc = gold.g1_add(acc, gold.G1_GEN)

# ---------------- stage 1: ec_add / ec_double vs G1_LM ----------------
print("stage 1: ec_add/ec_double direct...", flush=True)
X, Y, Z = pts_to_lm(pts_aff[:4], (4,))
mu = jnp.asarray(np.asarray(FP.mu_limbs, np.uint32)[:, None])
pm = jnp.asarray(np.asarray(FP.mod_limbs, np.uint32)[:, None])
p1 = tuple(jnp.asarray(c[:, :2]) for c in (X, Y, Z))
p2 = tuple(jnp.asarray(c[:, 2:]) for c in (X, Y, Z))

t0 = time.time()
got_add = [np.asarray(c) for c in
           jax.jit(lambda a, b: ec_add(a, b, mu, pm, L))(p1, p2)]
print(f"  ec_add jit {time.time()-t0:.1f}s", flush=True); t0 = time.time()
got_dbl = [np.asarray(c) for c in
           jax.jit(lambda a: ec_double(a, mu, pm, L))(p1)]
print(f"  ec_double jit {time.time()-t0:.1f}s", flush=True); t0 = time.time()
ref_add = [np.asarray(c) for c in jax.jit(G1_LM.add)(p1, p2)]
print(f"  G1_LM.add jit {time.time()-t0:.1f}s", flush=True); t0 = time.time()
ref_dbl = [np.asarray(c) for c in jax.jit(G1_LM.double)(p1)]
print(f"  G1_LM.double jit {time.time()-t0:.1f}s", flush=True)
ok = True
for i in range(2):
    a = to_affine(*(g[:, i] for g in got_add))
    r = to_affine(*(g[:, i] for g in ref_add))
    gsum = gold.g1_affine(gold.g1_add(gold.g1_from_affine(pts_aff[i][:2]),
                                      gold.g1_from_affine(pts_aff[2 + i][:2])))
    if not (a == r == gsum):
        ok = False; print(f"ADD MISMATCH lane {i}: {a} vs {r} vs {gsum}")
    d = to_affine(*(g[:, i] for g in got_dbl))
    rd = to_affine(*(g[:, i] for g in ref_dbl))
    gd = gold.g1_affine(gold.g1_double(gold.g1_from_affine(pts_aff[i][:2])))
    if not (d == rd == gd):
        ok = False; print(f"DBL MISMATCH lane {i}: {d} vs {rd} vs {gd}")
print("stage 1:", "OK" if ok else "FAIL", flush=True)
if not ok:
    sys.exit(1)

# ---------------- stage 2: seg_scan_pallas interpret ----------------
print("stage 2: seg_scan_pallas interpret (n=8, steps=3)...", flush=True)
rng = np.random.default_rng(7)
n, g = 8, 1
X, Y, Z = pts_to_lm(pts_aff[: n * g], (g, n))
seg = np.sort(rng.integers(0, 3, size=(g, n)).astype(np.int32), axis=1)

t0 = time.time()
ref = seg_scan(G1_LM.add, G1_LM.select,
               (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z)),
               jnp.asarray(seg), coord_axis=2, seg_axis=1, impl="loop")
ref = [np.asarray(r) for r in ref]
print(f"  loop ref done {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
out = seg_scan_pallas((jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z)),
                      jnp.asarray(seg), interpret=True)
out = [np.asarray(o) for o in out]
print(f"  pallas interpret done {time.time()-t0:.1f}s", flush=True)

bad = 0
for gi in range(g):
    for ni in range(n):
        a = to_affine(ref[0][:, gi, ni], ref[1][:, gi, ni], ref[2][:, gi, ni])
        b = to_affine(out[0][:, gi, ni], out[1][:, gi, ni], out[2][:, gi, ni])
        if a != b:
            bad += 1
            if bad < 5:
                print(f"MISMATCH g={gi} n={ni}: {a} vs {b}", flush=True)
print("stage 2 MISMATCHES:", bad, flush=True)
print("OK" if bad == 0 else "FAIL", flush=True)
sys.exit(0 if bad == 0 else 1)
