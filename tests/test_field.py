"""Differential + algebraic-law tests for the Montgomery limb engine
(SURVEY.md section 4.1/4.2) against the pure-Python golden model."""

import numpy as np
import pytest

from tpukzg.field.mont import FP, FR, int_to_limbs, limbs_to_int
import golden.model as gold


@pytest.fixture(scope="module", params=["fp", "fr"])
def F(request):
    return FP if request.param == "fp" else FR


def rand_elems(rng, F, n):
    return [rng.randrange(F.modulus) for _ in range(n)]


def test_limb_roundtrip(rng, F):
    for x in rand_elems(rng, F, 5) + [0, 1, F.modulus - 1]:
        assert limbs_to_int(int_to_limbs(x, F.L)) == x


def test_mont_roundtrip(rng, F):
    xs = rand_elems(rng, F, 8) + [0, 1, F.modulus - 1]
    limbs = F.from_int(xs)
    back = F.to_int(np.asarray(F.from_mont(F.to_mont(limbs))))
    assert back == xs


def test_add_sub_neg_differential(rng, F):
    n = 32
    a = rand_elems(rng, F, n)
    b = rand_elems(rng, F, n)
    la, lb = F.from_int(a), F.from_int(b)
    assert F.to_int(np.asarray(F.add(la, lb))) == [(x + y) % F.modulus for x, y in zip(a, b)]
    assert F.to_int(np.asarray(F.sub(la, lb))) == [(x - y) % F.modulus for x, y in zip(a, b)]
    assert F.to_int(np.asarray(F.neg(la))) == [(-x) % F.modulus for x in a]


def test_add_edge_cases(F):
    m = F.modulus
    cases_a = [0, m - 1, m - 1, 1]
    cases_b = [0, 1, m - 1, m - 1]
    la, lb = F.from_int(cases_a), F.from_int(cases_b)
    assert F.to_int(np.asarray(F.add(la, lb))) == [(x + y) % m for x, y in zip(cases_a, cases_b)]


def test_mul_differential(rng, F):
    n = 32
    a = rand_elems(rng, F, n)
    b = rand_elems(rng, F, n)
    la, lb = F.to_mont(F.from_int(a)), F.to_mont(F.from_int(b))
    got = F.to_int(np.asarray(F.from_mont(F.mul(la, lb))))
    assert got == [(x * y) % F.modulus for x, y in zip(a, b)]


def test_mul_allones_stress(F):
    """Max-limb operands (the lazy-carry overflow stress of SURVEY 4.6)."""
    m = F.modulus
    x = m - 1
    lx = F.to_mont(F.from_int([x, x]))
    got = F.to_int(np.asarray(F.from_mont(F.mul(lx, lx))))
    assert got == [(x * x) % m] * 2


def test_mul_small(rng, F):
    a = rand_elems(rng, F, 4)
    la = F.to_mont(F.from_int(a))
    for k in (0, 1, 2, 3, 12):
        got = F.to_int(np.asarray(F.from_mont(F.mul_small(la, k))))
        assert got == [(x * k) % F.modulus for x in a], k


def test_inv_and_pow(rng, F):
    a = rand_elems(rng, F, 4)
    la = F.to_mont(F.from_int(a))
    inv = F.to_int(np.asarray(F.from_mont(F.inv(la))))
    assert inv == [pow(x, -1, F.modulus) for x in a]
    # inv(0) == 0 convention
    z = F.to_mont(F.from_int([0]))
    assert F.to_int(np.asarray(F.inv(z))) == [0]
    e = 0xABCDEF0123456789
    got = F.to_int(np.asarray(F.from_mont(F.pow_int(la, e))))
    assert got == [pow(x, e, F.modulus) for x in a]


def test_batch_inv(rng, F):
    n = 16
    a = rand_elems(rng, F, n)
    a[3] = 0  # zero passes through as zero
    la = F.to_mont(F.from_int(a))
    got = F.to_int(np.asarray(F.from_mont(F.batch_inv(la, axis=0))))
    want = [pow(x, -1, F.modulus) if x else 0 for x in a]
    assert got == want


def test_field_axioms(rng, F):
    n = 8
    a = F.to_mont(F.from_int(rand_elems(rng, F, n)))
    b = F.to_mont(F.from_int(rand_elems(rng, F, n)))
    c = F.to_mont(F.from_int(rand_elems(rng, F, n)))
    lhs = F.mul(a, F.add(b, c))
    rhs = F.add(F.mul(a, b), F.mul(a, c))
    assert bool(np.all(F.eq(lhs, rhs)))
    assert bool(np.all(F.eq(F.mul(a, b), F.mul(b, a))))
    assert bool(np.all(F.eq(F.mul(F.mul(a, b), c), F.mul(a, F.mul(b, c)))))


def test_gt_half(rng, F):
    m = F.modulus
    xs = [0, 1, (m - 1) // 2, (m - 1) // 2 + 1, m - 1] + rand_elems(rng, F, 3)
    lx = F.from_int(xs)
    got = np.asarray(F.gt_half(lx)).tolist()
    assert got == [x > (m - 1) // 2 for x in xs]


def test_constants_match_golden():
    assert FP.modulus == gold.P
    assert FR.modulus == gold.R
    assert FP.n_prime == 0xFFFD  # SURVEY.md 2.1


def test_montmul_mxu_differential(rng, F):
    """MXU-REDC montmul (field/mxu.py) bit-exact vs the VPU path,
    incl. the all-max-limb carry stress."""
    from tpukzg.field.mxu import montmul_mxu
    n = 32
    a = rand_elems(rng, F, n) + [F.modulus - 1]
    b = rand_elems(rng, F, n) + [F.modulus - 1]
    la, lb = F.to_mont(F.from_int(a)), F.to_mont(F.from_int(b))
    got = np.asarray(montmul_mxu(la, lb, F))
    want = np.asarray(F.mul(la, lb))
    assert got.tolist() == want.tolist()
