"""Differential tests: JAX extension tower vs golden model (SURVEY 4.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

import golden.model as gold
from tpukzg.field.mont import FP
from tpukzg.field.tower import FP2, FP6, FP12


# ---- host bridges: golden objects <-> Montgomery limb arrays ----

def fp2_in(x: gold.Fp2):
    return np.stack([np.asarray(FP.to_mont(FP.from_int(x.c0))),
                     np.asarray(FP.to_mont(FP.from_int(x.c1)))])


def fp2_out(a) -> gold.Fp2:
    a = np.asarray(FP.from_mont(jnp.asarray(a)))
    return gold.Fp2(FP.to_int(a[0]), FP.to_int(a[1]))


def fp6_in(x: gold.Fp6):
    return np.stack([fp2_in(x.c0), fp2_in(x.c1), fp2_in(x.c2)])


def fp6_out(a) -> gold.Fp6:
    return gold.Fp6(fp2_out(a[0]), fp2_out(a[1]), fp2_out(a[2]))


def fp12_in(x: gold.Fp12):
    return np.stack([fp6_in(x.c0), fp6_in(x.c1)])


def fp12_out(a) -> gold.Fp12:
    a = np.asarray(a)
    return gold.Fp12(fp6_out(a[0]), fp6_out(a[1]))


def rand_fp2(rng):
    return gold.Fp2(rng.randrange(gold.P), rng.randrange(gold.P))


def rand_fp6(rng):
    return gold.Fp6(rand_fp2(rng), rand_fp2(rng), rand_fp2(rng))


def rand_fp12(rng):
    return gold.Fp12(rand_fp6(rng), rand_fp6(rng))


def test_fp2_ops(rng):
    a, b = rand_fp2(rng), rand_fp2(rng)
    la, lb = fp2_in(a), fp2_in(b)
    assert fp2_out(FP2.mul(la, lb)) == a * b
    assert fp2_out(FP2.sqr(la)) == a.sqr()
    assert fp2_out(FP2.inv(la)) == a.inv()
    assert fp2_out(FP2.add(la, lb)) == a + b
    assert fp2_out(FP2.sub(la, lb)) == a - b
    assert fp2_out(FP2.conj(la)) == a.conj()
    assert fp2_out(FP2.mul_by_nonresidue(la)) == gold.XI * a


def test_fp2_batched(rng):
    xs = [rand_fp2(rng) for _ in range(4)]
    ys = [rand_fp2(rng) for _ in range(4)]
    la = np.stack([fp2_in(x) for x in xs])
    lb = np.stack([fp2_in(y) for y in ys])
    out = np.asarray(FP2.mul(la, lb))
    for i in range(4):
        assert fp2_out(out[i]) == xs[i] * ys[i]


def test_fp6_ops(rng):
    a, b = rand_fp6(rng), rand_fp6(rng)
    la, lb = fp6_in(a), fp6_in(b)
    assert fp6_out(np.asarray(FP6.mul(la, lb))) == a * b
    assert fp6_out(np.asarray(FP6.sqr(la))) == a * a
    assert fp6_out(np.asarray(FP6.inv(la))) == a.inv()
    assert fp6_out(np.asarray(FP6.mul_by_v(la))) == a.mul_by_v()


def test_fp12_ops(rng):
    a, b = rand_fp12(rng), rand_fp12(rng)
    la, lb = fp12_in(a), fp12_in(b)
    assert fp12_out(np.asarray(FP12.mul(la, lb))) == a * b
    assert fp12_out(np.asarray(FP12.sqr(la))) == a * a
    assert fp12_out(np.asarray(FP12.inv(la))) == a.inv()
    assert fp12_out(np.asarray(FP12.conj(la))) == a.conj()
    one = FP12.mul(la, np.asarray(FP12.inv(la)))
    assert fp12_out(np.asarray(one)) == gold.Fp12.one()


@pytest.mark.parametrize("n", [1, 2, 3])
def test_frobenius(rng, n):
    a = rand_fp12(rng)
    la = fp12_in(a)
    got = fp12_out(np.asarray(FP12.frobenius(la, n)))
    want = a.pow(gold.P**n)
    assert got == want


def test_conj_is_p6_frobenius(rng):
    a = rand_fp12(rng)
    assert a.conj() == a.pow(gold.P**6)


def test_cyclotomic_sqr(rng):
    """Granger-Scott squaring == generic squaring on norm-1 elements.

    A cyclotomic element is manufactured on-device by the easy-part map
    f -> (conj(f)/f)^(p^2+1); both squarings are exact mod-p arithmetic,
    so the canonical outputs must be bit-identical."""
    a = rand_fp12(rng)
    la = fp12_in(a)
    u = FP12.mul(FP12.conj(la), np.asarray(FP12.inv(la)))
    c = np.asarray(FP12.mul(FP12.frobenius(u, 2), u))
    got = fp12_out(np.asarray(FP12.cyclotomic_sqr(c)))
    want = fp12_out(np.asarray(FP12.sqr(c)))
    assert got == want
    # and against the golden model
    cg = fp12_out(c)
    assert got == cg * cg
