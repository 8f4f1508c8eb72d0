"""NTT + polynomial layer differential tests vs golden (SURVEY 4.2/4.3)."""

import numpy as np
import pytest

import golden.model as gold
from tpukzg.field.mont import FR
from tpukzg.ntt.ntt import NttPlan, omega_for
from tpukzg.poly.poly import barycentric_eval_jit, eval_form_quotient_jit


def to_mont(xs):
    return np.asarray(FR.to_mont(FR.from_int(xs)))


def from_mont(a):
    return FR.to_int(np.asarray(FR.from_mont(a)))


@pytest.fixture(scope="module")
def plan():
    return NttPlan(32)


def test_omega_matches_golden():
    for n in (2, 8, 32, 1 << 12):
        assert omega_for(n) == gold.fr_omega(n)


def test_ntt_roundtrip_and_golden(rng, plan):
    n = plan.n
    coeffs = [rng.randrange(gold.R) for _ in range(n)]
    lc = to_mont(coeffs)
    evals = from_mont(plan.ntt(lc))
    assert evals == gold.ntt(coeffs)
    back = from_mont(plan.intt(to_mont(evals)))
    assert back == coeffs


def test_ntt_batched(rng, plan):
    n = plan.n
    cs = [[rng.randrange(gold.R) for _ in range(n)] for _ in range(3)]
    lc = np.stack([to_mont(c) for c in cs])
    out = np.asarray(plan.ntt(lc))
    for i in range(3):
        assert from_mont(out[i]) == gold.ntt(cs[i])


def test_barycentric_out_of_domain(rng, plan):
    n = plan.n
    coeffs = [rng.randrange(gold.R) for _ in range(n)]
    evals = gold.ntt(coeffs)
    z = rng.randrange(gold.R)
    got = from_mont(barycentric_eval_jit(plan, to_mont(evals), to_mont(z)))
    assert got == gold.poly_eval(coeffs, z)


def test_barycentric_in_domain(rng, plan):
    evals = [rng.randrange(gold.R) for _ in range(plan.n)]
    z = plan.roots_int[7]
    got = from_mont(barycentric_eval_jit(plan, to_mont(evals), to_mont(z)))
    assert got == evals[7]


def test_barycentric_batched(rng, plan):
    n = plan.n
    evs = [[rng.randrange(gold.R) for _ in range(n)] for _ in range(4)]
    zs = [rng.randrange(gold.R), plan.roots_int[3], rng.randrange(gold.R),
          plan.roots_int[0]]
    le = np.stack([to_mont(e) for e in evs])
    lz = np.stack([to_mont(z) for z in zs])
    got = np.asarray(barycentric_eval_jit(plan, le, lz))
    for i in range(4):
        want = gold.barycentric_eval(evs[i], zs[i], plan.omega)
        assert from_mont(got[i]) == want, i


@pytest.mark.parametrize("in_domain", [False, True])
def test_quotient(rng, plan, in_domain):
    n = plan.n
    evals = [rng.randrange(gold.R) for _ in range(n)]
    z = plan.roots_int[5] if in_domain else rng.randrange(gold.R)
    y = gold.barycentric_eval(evals, z, plan.omega)
    got = from_mont(eval_form_quotient_jit(plan, to_mont(evals), to_mont(z), to_mont(y)))
    want = gold.eval_form_quotient(evals, z, y, plan.omega)
    assert got == want


def test_coset_ntt_roundtrip_and_golden(rng, plan):
    """coset_ntt evaluates on {g w^i} (g = 7); coset_intt inverts it."""
    from tpukzg.ntt.ntt import COSET_GEN
    n = plan.n
    coeffs = [rng.randrange(gold.R) for _ in range(n)]
    evals = from_mont(plan.coset_ntt(to_mont(coeffs)))
    for i in range(n):
        z = (COSET_GEN * plan.roots_int[i]) % gold.R
        assert evals[i] == gold.poly_eval(coeffs, z)
    back = from_mont(plan.coset_intt(to_mont(evals)))
    assert back == coeffs
