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
