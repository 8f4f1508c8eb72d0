"""Pallas kernel differential tests (SURVEY.md section 4.6): each kernel
vs the FieldParams reference, interpret mode on CPU, plus carry-overflow
stress inputs (all-limbs-0xFFFF) for the carry-resolve bounds."""

import numpy as np
import pytest

from tpukzg.field.mont import FP, FR
from tpukzg.pallas.montmul import montmul_lm, make_montmul_pallas


@pytest.mark.parametrize("field", [FP, FR], ids=["fp", "fr"])
def test_montmul_lm_matches_reference(field, rng):
    n = 16
    a = np.stack([np.asarray(field.from_int(rng.randrange(field.modulus)))
                  for _ in range(n)])
    b = np.stack([np.asarray(field.from_int(rng.randrange(field.modulus)))
                  for _ in range(n)])
    ref = np.asarray(field.mul(a, b))
    got = np.asarray(montmul_lm(a.T, b.T, field)).T
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("field", [FP, FR], ids=["fp", "fr"])
def test_montmul_lm_carry_stress(field):
    """Max-limb operands exercise every carry/borrow chain."""
    n = 4
    mx = np.asarray(field.from_int(field.modulus - 1))
    a = np.broadcast_to(mx, (n, field.L)).copy()
    ref = np.asarray(field.mul(a, a))
    got = np.asarray(montmul_lm(a.T, a.T, field)).T
    assert np.array_equal(got, ref)


def test_montmul_pallas_interpret(rng):
    n = 256  # one tile
    a = np.stack([np.asarray(FP.from_int(rng.randrange(FP.modulus)))
                  for _ in range(n)])
    b = np.stack([np.asarray(FP.from_int(rng.randrange(FP.modulus)))
                  for _ in range(n)])
    f = make_montmul_pallas(FP, tile=128, interpret=True)
    got = np.asarray(f(a, b))
    ref = np.asarray(FP.mul(a, b))
    assert np.array_equal(got, ref)


# ---------------------------------------------------------------------------
# Limb-major field ops (field/limb_major.py) vs FieldParams reference
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("field", [FP, FR], ids=["fp", "fr"])
def test_limb_major_field_ops(field, rng):
    from tpukzg.field.limb_major import FieldLM
    lm = FieldLM(field)
    n = 8
    xs = [rng.randrange(field.modulus) for _ in range(n)]
    ys = [rng.randrange(field.modulus) for _ in range(n)]
    a = np.stack([np.asarray(field.from_int(x)) for x in xs])
    b = np.stack([np.asarray(field.from_int(y)) for y in ys])
    al, bl = a.T.copy(), b.T.copy()
    for op in ("add", "sub", "mul", "neg", "double"):
        ref = np.asarray(getattr(field, op)(a, b) if op in ("add", "sub", "mul")
                         else getattr(field, op)(a))
        got_lm = (getattr(lm, op)(al, bl) if op in ("add", "sub", "mul")
                  else getattr(lm, op)(al))
        assert np.array_equal(np.asarray(got_lm).T, ref), op
    # edge: a - a = 0; (p-1) ops
    mx = np.asarray(field.from_int(field.modulus - 1))[:, None]
    assert np.array_equal(np.asarray(lm.sub(mx, mx)), np.zeros_like(mx))
    assert np.array_equal(np.asarray(lm.add(mx, mx)).T[0],
                          np.asarray(field.from_int(field.modulus - 2)))


def test_curve_lm_add_double(rng):
    import golden.model as gold
    from tpukzg.curve import g1 as g1m
    from tpukzg.curve.weierstrass_lm import G1_LM
    k1, k2 = rng.randrange(gold.R), rng.randrange(gold.R)
    P = gold.g1_mul(gold.G1_GEN, k1)
    Q = gold.g1_mul(gold.G1_GEN, k2)
    pa, qa = gold.g1_affine(P), gold.g1_affine(Q)
    pd = g1m.points_from_ints([pa[0], qa[0]], [pa[1], qa[1]], [False, False])
    lmp = tuple(np.asarray(c).T.copy() for c in pd)  # (L, 2)
    one = tuple(c[:, 0] for c in lmp)
    two = tuple(c[:, 1] for c in lmp)
    s = G1_LM.add(one, two)
    d = G1_LM.double(one)
    xs, ys, _ = g1m.point_to_ints(tuple(np.asarray(c) for c in s))
    assert (xs, ys) == gold.g1_affine(gold.g1_add(P, Q))
    xs, ys, _ = g1m.point_to_ints(tuple(np.asarray(c) for c in d))
    assert (xs, ys) == gold.g1_affine(gold.g1_double(P))
    # complete-formula edges: P + (-P) = inf, P + inf = P
    negq = G1_LM.neg(one)
    si = G1_LM.add(one, negq)
    assert bool(np.asarray(G1_LM.is_inf(si)))
    infp = G1_LM.inf(())
    sp = G1_LM.add(one, infp)
    xs, ys, _ = g1m.point_to_ints(tuple(np.asarray(c) for c in sp))
    assert (xs, ys) == pa


def test_checked_mode(rng, monkeypatch):
    """TPUKZG_CHECKED boundary asserts + bound certificate + bignum
    Montgomery oracle (SURVEY.md 5.2)."""
    import numpy as np
    from tpukzg.utils import checked
    from tpukzg.field.mont import FP

    cert = checked.cios_bound_certificate(16, 32)
    assert cert["worst_intermediate"] < 1 << 32

    # oracle vs device kernel, incl. the all-0xFFFF stress operand
    a = np.asarray(FP.from_int(rng.randrange(FP.modulus)))
    b = np.full((FP.L,), 0xFFFF, np.uint32)
    b_val = sum(int(x) << (16 * i) for i, x in enumerate(b)) % FP.modulus
    b_red = np.asarray(FP.from_int(b_val))
    got = np.asarray(FP.mul(a, b_red))
    want = checked.montmul_golden(a, b_red, FP)
    assert got.tolist() == want.tolist()

    monkeypatch.setenv("TPUKZG_CHECKED", "1")
    checked.check_limbs("ok", np.array([0xFFFF], np.uint32))
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        checked.check_limbs("bad", np.array([0x10000], np.uint32))


@pytest.mark.parametrize("field", [FP, FR], ids=["fp", "fr"])
def test_shadow_montmul_int64(field, rng):
    """int64 shadow replay of the limb-major kernel (SURVEY 5.2): asserts
    every intermediate < 2^32 AND matches the device kernel bit-exactly,
    on random + all-max-limb stress operands."""
    from tpukzg.utils import checked
    vals = ([rng.randrange(field.modulus) for _ in range(3)]
            + [field.modulus - 1])
    a = np.stack([np.asarray(field.from_int(v)) for v in vals]).T.copy()
    b = np.stack([np.asarray(field.from_int(v)) for v in reversed(vals)]).T.copy()
    shadow, bounds = checked.shadow_montmul_lm(a, b, field)
    got = np.asarray(montmul_lm(a, b, field))
    assert np.array_equal(shadow, got)
    assert bounds["column_sum"] < 1 << 32 and bounds["t_plus_mp"] < 1 << 32


def test_pallas_ec_add_double(rng):
    """Fused limb-major EC formulas (pallas/ec.py) vs the XLA group law
    and the golden model (VERDICT round-1 item 4)."""
    import jax
    import jax.numpy as jnp
    import golden.model as gold
    from tpukzg.curve import g1 as g1m
    from tpukzg.curve.weierstrass_lm import G1_LM
    from tpukzg.pallas.ec import ec_add, ec_double

    k1, k2 = rng.randrange(gold.R), rng.randrange(gold.R)
    P = gold.g1_mul(gold.G1_GEN, k1)
    Q = gold.g1_mul(gold.G1_GEN, k2)
    pa, qa = gold.g1_affine(P), gold.g1_affine(Q)
    pd = g1m.points_from_ints([pa[0], qa[0]], [pa[1], qa[1]], [False, False])
    lmp = tuple(np.asarray(c).T.copy() for c in pd)      # (L, 2)
    one = tuple(c[:, :1] for c in lmp)
    two = tuple(c[:, 1:] for c in lmp)
    mu = np.asarray(FP.mu_limbs, np.uint32)[:, None]
    pm = np.asarray(FP.mod_limbs, np.uint32)[:, None]
    L = FP.L
    s = jax.jit(lambda x, y: ec_add(x, y, jnp.asarray(mu), jnp.asarray(pm), L))(one, two)
    d = jax.jit(lambda x: ec_double(x, jnp.asarray(mu), jnp.asarray(pm), L))(one)
    ref_s = G1_LM.add(one, two)
    ref_d = G1_LM.double(one)
    for got, ref in ((s, ref_s), (d, ref_d)):
        for cg, cr in zip(got, ref):
            assert np.array_equal(np.asarray(cg), np.asarray(cr))
    xs, ys, _ = g1m.point_to_ints(tuple(np.asarray(c)[:, 0] for c in s))
    assert (xs, ys) == gold.g1_affine(gold.g1_add(P, Q))
    xs, ys, _ = g1m.point_to_ints(tuple(np.asarray(c)[:, 0] for c in d))
    assert (xs, ys) == gold.g1_affine(gold.g1_double(P))


def test_bucket_seg_scan_pallas_interpret(rng):
    """Pallas segmented EC-sum scan (pallas/bucket.py, SURVEY comp. 10)
    vs the loop-mode lowering on random points + random sorted segment
    ids — including bucket collisions and single-element segments."""
    import golden.model as gold
    from tpukzg.curve import g1 as g1m
    from tpukzg.curve.weierstrass_lm import G1_LM
    from tpukzg.msm.scan import seg_scan
    from tpukzg.pallas.bucket import seg_scan_pallas

    g, n = 2, 16
    ks = [rng.randrange(1, gold.R) for _ in range(g * n)]
    aff = [gold.g1_affine(gold.g1_mul(gold.G1_GEN, k)) for k in ks]
    pd = g1m.points_from_ints([a[0] for a in aff], [a[1] for a in aff],
                              [False] * (g * n))
    pts = tuple(np.asarray(c).T.reshape(24, g, n).copy() for c in pd)
    seg = np.sort(rng_np(rng).integers(0, 5, size=(g, n)), axis=-1)
    seg = seg.astype(np.int32)
    got = seg_scan_pallas(pts, seg, interpret=True)
    ref = seg_scan(G1_LM.add, G1_LM.select, pts, seg,
                   coord_axis=2, seg_axis=1, impl="loop")
    for cg, cr in zip(got, ref):
        assert np.array_equal(np.asarray(cg), np.asarray(cr))
    # NOTE: the true Pallas-interpreter path (force_kernel=True) is NOT
    # exercised here — XLA:CPU compiles the whole emulated kernel as one
    # giant LLVM function (19 GB RSS observed); kernel glue (BlockSpecs,
    # scratch, grid carry) is validated COMPILED by test_pallas_tpu.py.


def rng_np(rng):
    return np.random.default_rng(rng.randrange(1 << 31))


def test_bucket_seg_scan_pallas_tiled_interpret(rng):
    """Lane-TILED path (T > 1, cross-tile carry) of the Pallas scan.
    Association order differs from loop mode when a segment crosses a
    tile boundary, so results are compared as GROUP ELEMENTS (projective
    eq), not raw coordinates — the MSM consumes points, not coords."""
    import golden.model as gold
    from tpukzg.curve import g1 as g1m
    from tpukzg.curve.weierstrass_lm import G1_LM
    from tpukzg.msm.scan import seg_scan, suffix_scan
    from tpukzg.pallas.bucket import seg_scan_pallas, suffix_scan_pallas

    base = 6
    ks = [rng.randrange(1, gold.R) for _ in range(base)]
    aff = [gold.g1_affine(gold.g1_mul(gold.G1_GEN, k)) for k in ks]
    pd = g1m.points_from_ints([a[0] for a in aff], [a[1] for a in aff],
                              [False] * base)
    base_pts = np.stack([np.asarray(c) for c in pd])        # (3, base, 24)
    g, n = 2, 320   # tile=128 -> T=3 with a ragged final tile's padding
    nprng = rng_np(rng)
    idx = nprng.integers(0, base, size=(g * n,))
    pts = tuple(base_pts[i][idx].T.reshape(24, g, n).copy() for i in range(3))
    seg = np.sort(nprng.integers(0, 5, size=(g, n)), axis=-1).astype(np.int32)

    got = seg_scan_pallas(pts, seg, interpret=True, tile=128)
    ref = seg_scan(G1_LM.add, G1_LM.select, pts, seg,
                   coord_axis=2, seg_axis=1, impl="loop")
    assert bool(np.asarray(G1_LM.eq(got, ref)).all())

    gs = suffix_scan_pallas(pts, interpret=True, tile=128)
    rs = suffix_scan(G1_LM.add, G1_LM.select, pts, coord_axis=2,
                     batch_shape=pts[0].shape[1:3], scan_axis_in_batch=1,
                     impl="loop")
    assert bool(np.asarray(G1_LM.eq(gs, rs)).all())


def test_ntt_pallas_interpret(rng):
    """Fused-stage Pallas NTT (pallas/ntt.py) vs the XLA plan: the
    jitted pure twin at n=16 fwd+inv, and the TRUE Pallas interpreter
    (kernel machinery) at a minimal n=8 fwd shape vs the twin — the
    bucket.py equivalence-pinning pattern (SURVEY comp. 12)."""
    from tpukzg.ntt.ntt import get_plan
    from tpukzg.pallas.ntt import NttPallas

    n = 16
    plan = get_plan(n)
    pn = NttPallas(plan, interpret=True)
    vals = [rng.randrange(FR.modulus) for _ in range(2 * n)]
    a = np.asarray(FR.to_mont(FR.from_int(vals))).reshape(2, n, 16)
    got = np.asarray(pn.ntt(a))
    want = np.asarray(plan.ntt(a))
    assert np.array_equal(got, want)
    back = np.asarray(pn.intt(got))
    assert np.array_equal(back, np.asarray(plan.intt(want)))
    assert np.array_equal(back, np.asarray(a))


@pytest.mark.slow
def test_ntt_pallas_true_interpreter(rng):
    """Kernel-MACHINERY equivalence via the eager Pallas interpreter at a
    minimal shape (~90s on a 1-core host, hence `slow`; the compiled TPU
    gate test_pallas_tpu.py::test_ntt_pallas_compiled covers the same
    kernel on hardware)."""
    from tpukzg.ntt.ntt import get_plan
    from tpukzg.pallas.ntt import NttPallas

    n = 8
    plan = get_plan(n)
    vals = [rng.randrange(FR.modulus) for _ in range(n)]
    a = np.asarray(FR.to_mont(FR.from_int(vals))).reshape(1, n, 16)
    pk = NttPallas(plan, interpret=True, force_kernel=True)
    pt = NttPallas(plan, interpret=True)
    assert np.array_equal(np.asarray(pk.ntt(a)), np.asarray(pt.ntt(a)))


def test_fractree_eval_interpret(rng):
    """Fused fraction-tree eval kernel (pallas/fractree.py) vs the XLA
    barycentric path, interpret mode; includes the in-domain z = w^m
    case (derivative identity, no branch)."""
    from tpukzg.ntt.ntt import get_plan
    from tpukzg.poly.poly import _fraction_merge
    from tpukzg.pallas import fractree
    import jax.numpy as jnp

    n, k = 512, 3
    plan = get_plan(n)
    evals = np.stack([
        np.stack([np.asarray(FR.to_mont_host(rng.randrange(FR.modulus)))
                  for _ in range(n)]) for _ in range(k)])
    zs = [rng.randrange(FR.modulus), plan.roots_int[5],  # in-domain row!
          rng.randrange(FR.modulus)]
    z = np.stack([np.asarray(FR.to_mont_host(v)) for v in zs])
    a, b = fractree.fractree_partials(evals, z, plan.roots,
                                      tile=256, interpret=True)
    got = np.asarray(FR.mul(_fraction_merge(jnp.asarray(a), jnp.asarray(b)),
                            jnp.asarray(plan.n_inv)))
    from tpukzg.poly.poly import barycentric_eval
    import os
    os.environ["TPUKZG_EVAL_IMPL"] = "xla"
    try:
        ref = np.asarray(barycentric_eval(plan, jnp.asarray(evals),
                                          jnp.asarray(z)))
    finally:
        del os.environ["TPUKZG_EVAL_IMPL"]
    assert np.array_equal(got, ref)
    # in-domain row equals e_m exactly
    assert np.array_equal(got[1], evals[1, 5])
