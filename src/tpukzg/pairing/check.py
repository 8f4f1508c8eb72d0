"""Pairing + multi-pairing product check (SURVEY.md component 15)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpukzg.field.tower import FP12
from tpukzg.curve.g1 import G1
from tpukzg.pairing.lines import precompute_lines
from tpukzg.pairing.miller import miller_loop_lines
from tpukzg.pairing.final_exp import final_exp


def _miller_one(p_point, lines):
    """Miller value for one (P, lines(Q)) pair; infinity -> one."""
    xp, yp, is_inf = G1.normalize(p_point)
    f = miller_loop_lines(xp, yp, *lines)
    one = jnp.broadcast_to(jnp.asarray(FP12.one_np), f.shape)
    return FP12.select(jnp.broadcast_to(is_inf, f.shape[:-4]), one, f)


def pairing(p_point, q_point):
    """e(P, Q)^3 — full pairing, comparable bit-exact with golden.pairing."""
    lines = precompute_lines(q_point)
    return final_exp(_miller_one(p_point, lines))


def pairing_check(pairs_with_lines):
    """prod_i e(P_i, Q_i) == 1 with one shared final exponentiation.

    pairs_with_lines: list of (g1_point, (dbl_lines, add_lines)).
    Returns a scalar bool array.
    """
    f = None
    for p_point, lines in pairs_with_lines:
        fi = _miller_one(p_point, lines)
        f = fi if f is None else FP12.mul(f, fi)
    e = final_exp(f)
    one = jnp.broadcast_to(jnp.asarray(FP12.one_np), e.shape)
    return FP12.eq(e, one)
