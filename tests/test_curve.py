"""Curve-law + differential tests vs golden (SURVEY 4.1/4.2)."""

import numpy as np
import pytest

import golden.model as gold
from tpukzg.field.mont import FR
from tpukzg.curve import g1 as g1m, g2 as g2m
from tpukzg.curve.g1 import G1
from tpukzg.curve.g2 import G2


def g1_in(gp):
    a = gold.g1_affine(gp)
    return g1m.point_from_ints(0, 0, True) if a is None else g1m.point_from_ints(a[0], a[1])


def g1_out(p):
    xi, yi, inf = g1m.point_to_ints(p)
    return None if inf else (xi, yi)


def g2_in(gp):
    a = gold.g2_affine(gp)
    if a is None:
        return g2m.point_from_ints(0, 0, 0, 0, True)
    return g2m.point_from_ints(a[0].c0, a[0].c1, a[1].c0, a[1].c1)


def g2_out(p):
    (x0, x1), (y0, y1), inf = g2m.point_to_ints(p)
    return None if inf else (gold.Fp2(x0, x1), gold.Fp2(y0, y1))


def g1_batch(gps):
    pts = [g1_in(gp) for gp in gps]
    return tuple(np.stack([np.asarray(p[i]) for p in pts]) for i in range(3))


def test_g1_add_double_differential(rng):
    ks = [rng.randrange(gold.R) for _ in range(3)]
    gps = [gold.g1_mul(gold.G1_GEN, k) for k in ks]
    a, b = g1_in(gps[0]), g1_in(gps[1])
    assert g1_out(G1.add(a, b)) == gold.g1_affine(gold.g1_add(gps[0], gps[1]))
    assert g1_out(G1.double(a)) == gold.g1_affine(gold.g1_double(gps[0]))
    # complete-formula edge cases
    assert g1_out(G1.add(a, a)) == gold.g1_affine(gold.g1_double(gps[0]))
    assert g1_out(G1.add(a, G1.neg(a))) is None
    inf = g1m.point_from_ints(0, 0, True)
    assert g1_out(G1.add(a, inf)) == gold.g1_affine(gps[0])
    assert g1_out(G1.add(inf, inf)) is None
    assert g1_out(G1.double(inf)) is None


def test_g1_scalar_mul(rng):
    k = rng.randrange(gold.R)
    s = rng.randrange(gold.R)
    p = gold.g1_mul(gold.G1_GEN, k)
    got = g1_out(G1.scalar_mul(g1_in(p), FR.from_int(s)))
    assert got == gold.g1_affine(gold.g1_mul(p, s))
    # edge scalars
    assert g1_out(G1.scalar_mul(g1_in(p), FR.from_int(0))) is None
    assert g1_out(G1.scalar_mul(g1_in(p), FR.from_int(1))) == gold.g1_affine(p)
    assert g1_out(G1.scalar_mul(g1_in(p), FR.from_int(gold.R - 1))) == \
        gold.g1_affine(gold.g1_neg(p))


def test_g1_scalar_mul_windowed_vs_ladder(rng):
    # the windowed ladder (SURVEY comp. 8) must agree with the plain
    # 256-step double-and-add bit-exactly, including edge scalars
    import jax
    ks = [rng.randrange(gold.R) for _ in range(3)] + [0, 1, gold.R - 1]
    kl = FR.from_int(ks)
    pts = G1.gen((len(ks),))
    win = jax.tree.map(np.asarray, G1.normalize(G1.scalar_mul(pts, kl)))
    lad = jax.tree.map(np.asarray, G1.normalize(G1.scalar_mul_ladder(pts, kl)))
    for a, b in zip(win, lad):
        assert np.array_equal(a, b)


def test_g1_msm_naive(rng):
    n = 5
    ks = [rng.randrange(gold.R) for _ in range(n)]
    ss = [rng.randrange(gold.R) for _ in range(n)]
    gps = [gold.g1_mul(gold.G1_GEN, k) for k in ks]
    pts = g1_batch(gps)
    got = g1_out(G1.msm_naive(pts, FR.from_int(ss)))
    want = gold.g1_affine(gold.g1_msm(gps, ss))
    assert got == want


def test_g1_predicates(rng):
    k = rng.randrange(gold.R)
    p = g1_in(gold.g1_mul(gold.G1_GEN, k))
    assert bool(np.asarray(G1.is_on_curve(p)))
    assert bool(np.asarray(G1.in_subgroup(p)))
    assert bool(np.asarray(G1.eq(p, p)))
    assert not bool(np.asarray(G1.eq(p, G1.double(p))))
    # a point on the curve but outside the subgroup (cofactor != 1)
    x = 3
    while True:
        y2 = (x * x * x + 4) % gold.P
        y = gold.fp_sqrt(y2)
        if y is not None:
            cand = gold.g1_from_affine((x, y))
            if gold.g1_affine(gold.g1_mul(cand, gold.R)) is not None:
                break
        x += 1
    q = g1_in_raw = g1m.point_from_ints(x, y)
    assert bool(np.asarray(G1.is_on_curve(q)))
    assert not bool(np.asarray(G1.in_subgroup(q)))


def test_g2_ops_differential(rng):
    k1, k2 = rng.randrange(gold.R), rng.randrange(gold.R)
    p1 = gold.g2_mul(gold.G2_GEN, k1)
    p2 = gold.g2_mul(gold.G2_GEN, k2)
    a, b = g2_in(p1), g2_in(p2)
    assert g2_out(G2.add(a, b)) == gold.g2_affine(gold.g2_add(p1, p2))
    assert g2_out(G2.double(a)) == gold.g2_affine(gold.g2_double(p1))
    assert g2_out(G2.add(a, G2.neg(a))) is None
    s = rng.randrange(gold.R)
    assert g2_out(G2.scalar_mul(a, FR.from_int(s))) == gold.g2_affine(gold.g2_mul(p1, s))
    assert bool(np.asarray(G2.is_on_curve(a)))
    assert bool(np.asarray(G2.in_subgroup(a)))


def test_g1_codec_roundtrip(rng):
    k = rng.randrange(gold.R)
    gp = gold.g1_mul(gold.G1_GEN, k)
    p = g1_in(gp)
    data = g1m.compress_point(p)
    assert data == gold.g1_compress(gp)  # bit-exact vs golden
    x, y, inf = g1m.decompress(data)
    assert not inf and (x, y) == gold.g1_affine(gp)
    inf_bytes = g1m.compress_point(g1m.point_from_ints(0, 0, True))
    assert g1m.decompress(inf_bytes)[2] is True
    with pytest.raises(ValueError):
        g1m.decompress(b"\x00" * 48)


def test_g2_codec_matches_golden(rng):
    k = rng.randrange(gold.R)
    gp = gold.g2_mul(gold.G2_GEN, k)
    assert g2m.compress_point(g2_in(gp)) == gold.g2_compress(gp)


def test_g1_decompress_batch_device(rng):
    """Batched device decompression (sqrt + sign + checks on device) vs
    golden, incl. both sign flags, infinity, a not-on-curve x, and an
    on-curve point outside the r-subgroup."""
    ps = [gold.g1_mul(gold.G1_GEN, rng.randrange(gold.R)) for _ in range(4)]
    byte_list = [gold.g1_compress(p) for p in ps]
    byte_list.append(gold.g1_compress(gold.G1_INF))   # infinity
    # x not on curve: find x with x^3+4 a non-residue
    x = 1
    while gold.fp_sqrt((x * x * x + 4) % gold.P) is not None:
        x += 1
    byte_list.append(bytes([0x80 | (x >> 376)]) + (x % (1 << 376)).to_bytes(47, "big"))
    # on-curve but outside the subgroup
    x = 1
    outside = None
    while outside is None:
        x += 1
        y = gold.fp_sqrt((x * x * x + 4) % gold.P)
        if y is not None and not gold.g1_in_subgroup(gold.g1_from_affine((x, y))):
            outside = (x, y)
    byte_list.append(gold.g1_compress(gold.g1_from_affine(outside)))

    pts, ok = g1m.decompress_batch(byte_list)
    assert np.asarray(ok).tolist() == [True] * 5 + [False, False]
    for i, p in enumerate(ps):
        assert g1_out(tuple(c[i] for c in pts)) == gold.g1_affine(p)
    assert g1_out(tuple(c[4] for c in pts)) is None   # infinity decodes
    # malformed encodings still raise host-side
    with pytest.raises(ValueError):
        g1m.decompress_batch([b"\x00" * 48])
    with pytest.raises(ValueError):
        g1m.decompress_batch([b"\xc0" + b"\x01" + b"\x00" * 46])


def test_in_subgroup_fast(rng):
    """GLV endomorphism membership test vs golden ground truth, including
    an on-curve point OUTSIDE the r-subgroup (h1-torsion component)."""
    import golden.model as gold
    from tpukzg.curve import g1 as g1m

    members = [gold.g1_mul(gold.G1_GEN, rng.randrange(gold.R)) for _ in range(3)]
    # find an on-curve point NOT in the subgroup
    x = 1
    outside = None
    while outside is None:
        x += 1
        y = gold.fp_sqrt((x * x * x + 4) % gold.P)
        if y is None:
            continue
        cand = gold.g1_from_affine((x, y))
        if not gold.g1_in_subgroup(cand):
            outside = cand
    pts_aff = [gold.g1_affine(p) for p in members] + [gold.g1_affine(outside)]
    infs = [False] * 4
    pts = g1m.points_from_ints([a[0] for a in pts_aff],
                               [a[1] for a in pts_aff], infs)
    got = np.asarray(g1m.in_subgroup_fast(pts))
    assert got.tolist() == [True, True, True, False]
    # infinity is a member
    inf_pt = g1m.points_from_ints([0], [0], [True])
    assert bool(np.asarray(g1m.in_subgroup_fast(inf_pt))[0])


def test_g2_psi_subgroup_check(rng):
    """psi-endomorphism fast check (SURVEY comp. 7): accepts [k]G2,
    rejects on-curve points outside the r-subgroup; host and device
    paths agree."""
    members = [gold.g2_mul(gold.G2_GEN, rng.randrange(gold.R))
               for _ in range(2)]
    # on-curve non-subgroup points: x = (v, 1) search via host sqrt
    outs = []
    v = 5
    while len(outs) < 2:
        v += 1
        c0 = (v * v * v - 3 * v + 4) % gold.P         # Re (x^3 + 4+4u)
        c1 = (3 * v * v - 1 + 4) % gold.P             # Im
        y = g2m._fp2_sqrt_ints(c0, c1)
        if y is None:
            continue
        pt = (gold.Fp2(v, 1), gold.Fp2(*y))
        assert gold.g2_is_on_curve(gold.g2_from_affine(pt))
        if not gold.g2_in_subgroup(gold.g2_from_affine(pt)):
            outs.append((v, 1, y[0], y[1]))

    # host path
    for gp in members:
        a = gold.g2_affine(gp)
        assert g2m.in_subgroup_host(a[0].c0, a[0].c1, a[1].c0, a[1].c1)
    for (x0, x1, y0, y1) in outs:
        assert not g2m.in_subgroup_host(x0, x1, y0, y1)

    # device path, one batched call
    pts = [g2_in(gp) for gp in members] + \
          [g2m.point_from_ints(x0, x1, y0, y1) for (x0, x1, y0, y1) in outs]
    batch = tuple(np.stack([np.asarray(p[i]) for p in pts]) for i in range(3))
    got = np.asarray(g2m.in_subgroup_psi(batch))
    assert got.tolist() == [True, True, False, False]
