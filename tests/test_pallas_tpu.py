"""Compiled-TPU gates for the Pallas kernel suite (VERDICT r1 weak #8).

The interpret-mode differential tests in test_pallas.py validate kernel
*semantics* on CPU; these run the same kernels COMPILED through Mosaic on
a real TPU so backend-specific breakage (layout constraints, VMEM limits,
unsupported ops) cannot ship silently.  Skipped automatically when no TPU
is attached (the driver's CPU suite), run manually with:

    TPUKZG_TEST_TPU=1 python -m pytest tests/test_pallas_tpu.py -v
"""

import os

import numpy as np
import pytest

from tpukzg.field.mont import FP, FR


def _tpu_available():
    if os.environ.get("TPUKZG_TEST_TPU", "") != "1":
        return False  # conftest pinned the suite to CPU
    try:
        import jax
        return any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _tpu_available(),
                                reason="no TPU attached (compiled Mosaic "
                                       "gate; interpret tests cover CPU)")


def test_montmul_pallas_compiled(rng):
    from tpukzg.pallas.montmul import make_montmul_pallas
    n = 512
    a = np.stack([np.asarray(FP.from_int(rng.randrange(FP.modulus)))
                  for _ in range(n)])
    b = np.stack([np.asarray(FP.from_int(rng.randrange(FP.modulus)))
                  for _ in range(n)])
    f = make_montmul_pallas(FP, tile=128, interpret=False)
    got = np.asarray(f(a, b))
    ref = np.asarray(FP.mul(a, b))
    assert np.array_equal(got, ref)


def _g1_lm_case(rng, g, n, n_base=8, n_seg=9):
    import golden.model as gold
    from tpukzg.curve import g1 as g1m

    ks = [rng.randrange(1, gold.R) for _ in range(n_base)]
    aff = [gold.g1_affine(gold.g1_mul(gold.G1_GEN, k)) for k in ks]
    pd = g1m.points_from_ints([a[0] for a in aff], [a[1] for a in aff],
                              [False] * n_base)
    base = np.stack([np.asarray(c) for c in pd])
    nprng = np.random.default_rng(rng.randrange(1 << 31))
    idx = nprng.integers(0, n_base, size=(g * n,))
    pts = tuple(base[i][idx].T.reshape(24, g, n).copy() for i in range(3))
    seg = np.sort(nprng.integers(0, n_seg, size=(g, n)),
                  axis=-1).astype(np.int32)
    return pts, seg


def test_bucket_seg_scan_compiled(rng):
    """Single-tile (T=1) path: bit-exact vs loop mode (same association
    order)."""
    from tpukzg.curve.weierstrass_lm import G1_LM
    from tpukzg.msm.scan import seg_scan
    from tpukzg.pallas.bucket import seg_scan_pallas

    pts, seg = _g1_lm_case(rng, g=2, n=128)
    got = seg_scan_pallas(pts, seg, interpret=False)
    ref = seg_scan(G1_LM.add, G1_LM.select, pts, seg,
                   coord_axis=2, seg_axis=1, impl="loop")
    for cg, cr in zip(got, ref):
        assert np.array_equal(np.asarray(cg), np.asarray(cr))


def test_bucket_seg_scan_tiled_compiled(rng):
    """Lane-tiled (T>1, cross-tile carry) path compiled through Mosaic;
    association order differs so compare as group elements."""
    from tpukzg.curve.weierstrass_lm import G1_LM
    from tpukzg.msm.scan import seg_scan
    from tpukzg.pallas.bucket import seg_scan_pallas

    pts, seg = _g1_lm_case(rng, g=1, n=256, n_seg=4)
    got = seg_scan_pallas(pts, seg, interpret=False, tile=128)
    ref = seg_scan(G1_LM.add, G1_LM.select, pts, seg,
                   coord_axis=2, seg_axis=1, impl="loop")
    assert bool(np.asarray(G1_LM.eq(got, ref)).all())


def test_ntt_pallas_compiled(rng):
    from tpukzg.ntt.ntt import get_plan
    from tpukzg.pallas.ntt import NttPallas

    n = 256
    plan = get_plan(n)
    pn = NttPallas(plan, interpret=False)
    vals = [rng.randrange(FR.modulus) for _ in range(n)]
    a = np.asarray(FR.to_mont(FR.from_int(vals))).reshape(1, n, 16)
    got = np.asarray(pn.ntt(a))
    want = np.asarray(plan.ntt(a))
    assert np.array_equal(got, want)
    back = np.asarray(pn.intt(got))
    assert np.array_equal(back, np.asarray(a))


def test_mxu_montmul_compiled(rng):
    """MXU-assisted REDC must stay bit-exact under real bf16 matmuls
    (the f32-exactness argument of field/mxu.py), not just in CPU
    emulation."""
    from tpukzg.field.mxu import montmul_mxu
    n = 256
    a = np.stack([np.asarray(FP.from_int(rng.randrange(FP.modulus)))
                  for _ in range(n)])
    b = np.stack([np.asarray(FP.from_int(rng.randrange(FP.modulus)))
                  for _ in range(n)])
    got = np.asarray(montmul_mxu(a, b, FP))
    ref = np.asarray(FP.mul(a, b))
    assert np.array_equal(got, ref)


def test_fractree_eval_compiled(rng):
    """Fraction-tree eval kernel compiled through Mosaic at the
    production blob shape (n=4096), vs the pure-bignum golden
    barycentric formula (no second XLA compile on the shared host)."""
    import jax.numpy as jnp
    import golden.model as gold
    from tpukzg.ntt.ntt import get_plan
    from tpukzg.poly.poly import _fraction_merge
    from tpukzg.pallas import fractree

    n, k = 4096, 4
    plan = get_plan(n)
    nprng = np.random.default_rng(0xF4AC)
    ev_int = [[int(v) for v in row]
              for row in nprng.integers(0, 1 << 62, size=(k, n))]
    evals = np.stack([FR.to_mont_host(row) for row in ev_int])
    zs = [int(nprng.integers(1 << 60)) for _ in range(k - 1)]
    zs.append(plan.roots_int[17])            # in-domain
    z = np.stack([np.asarray(FR.to_mont_host(v)) for v in zs])
    a, b = fractree.fractree_partials(evals, z, plan.roots, tile=4096)
    got_m = FR.mul(_fraction_merge(jnp.asarray(a), jnp.asarray(b)),
                   jnp.asarray(plan.n_inv))
    got = [FR.to_int(row) for row in np.asarray(FR.from_mont(got_m))]
    R = gold.R
    for i in range(k):
        zi = zs[i] % R
        if zi in plan.roots_int:
            expect = ev_int[i][plan.roots_int.index(zi)] % R
        else:
            s = sum(e * w % R * pow((zi - w) % R, -1, R)
                    for e, w in zip(ev_int[i], plan.roots_int)) % R
            expect = s * (pow(zi, n, R) - 1) % R * pow(n, -1, R) % R
        assert got[i] == expect, i
    assert got[-1] == ev_int[-1][17] % R
