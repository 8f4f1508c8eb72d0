"""Pairing differential tests vs golden (SURVEY 4.2; config-1 gate M3)."""

import numpy as np
import pytest

import golden.model as gold
from tpukzg.curve import g1 as g1m, g2 as g2m
from tpukzg.curve.g1 import G1
from tpukzg.pairing.check import pairing, pairing_check
from tpukzg.pairing.lines import precompute_lines

from tests.test_tower import fp12_out


def g1_dev(gp):
    a = gold.g1_affine(gp)
    return g1m.point_from_ints(0, 0, True) if a is None else g1m.point_from_ints(*a)


def g2_dev(gp):
    a = gold.g2_affine(gp)
    return g2m.point_from_ints(a[0].c0, a[0].c1, a[1].c0, a[1].c1)


@pytest.fixture(scope="module")
def pts(rng):
    k1, k2 = rng.randrange(gold.R), rng.randrange(gold.R)
    P = gold.g1_mul(gold.G1_GEN, k1)
    Q = gold.g2_mul(gold.G2_GEN, k2)
    return P, Q


def test_pairing_matches_golden(pts):
    P, Q = pts
    got = fp12_out(np.asarray(pairing(g1_dev(P), g2_dev(Q))))
    assert got == gold.pairing(P, Q)


def test_pairing_infinity(pts):
    _, Q = pts
    got = fp12_out(np.asarray(pairing(g1_dev(gold.G1_INF), g2_dev(Q))))
    assert got == gold.Fp12.one()


def test_pairing_check(pts):
    P, Q = pts
    lines = precompute_lines(g2_dev(Q))
    ok = pairing_check([(g1_dev(P), lines), (G1.neg(g1_dev(P)), lines)])
    assert bool(np.asarray(ok))
    bad = pairing_check([(g1_dev(P), lines), (g1_dev(P), lines)])
    assert not bool(np.asarray(bad))
