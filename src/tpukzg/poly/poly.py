"""Evaluation-form polynomial operations over Fr (SURVEY.md component 16).

Everything is branchless: the in-domain case (z = w^m) is handled by
masking, never by data-dependent control flow, so a whole batch of blobs
evaluates in one fused device program (SURVEY.md section 7 hard-part 6;
formulas verified in golden/selftest and SURVEY 0.2):

  out-of-domain:  p(z) = (z^n - 1)/n * sum_i e_i w^i / (z - w^i)
  in-domain:      p(w^m) = e_m
  quotient out:   q_i = (e_i - y) / (w^i - z)
  quotient in:    q_i = (e_i - y)/(w^i - z)  (i != m),
                  q_m = -z^{-1} * sum_j (e_j - y) w^j / (w^j - z)

Shapes: evals (..., n, L), z (..., L); Montgomery form throughout.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpukzg.field.mont import FR
from tpukzg.ntt.ntt import NttPlan


def _zn_minus_one(plan: NttPlan, z):
    """z^n - 1 via log2(n) squarings (n is a power of two)."""
    zn = z
    for _ in range(plan.log_n):
        zn = FR.mul(zn, zn)
    return FR.sub(zn, jnp.broadcast_to(jnp.asarray(FR.one_mont), z.shape))


def barycentric_eval(plan: NttPlan, evals, z):
    """p(z) for evaluation-form p on plan's domain. Batched over leading axes."""
    roots = jnp.asarray(plan.roots)  # (n, L)
    d = FR.sub(z[..., None, :], roots)           # (..., n, L)  z - w^i
    mask = FR.is_zero(d)                          # (..., n)
    in_domain = jnp.any(mask, axis=-1)            # (...)
    dinv = FR.batch_inv(d, axis=-2)               # inv(0) = 0
    terms = FR.mul(FR.mul(evals, jnp.broadcast_to(roots, d.shape)), dinv)
    s = FR.sum_along(terms, axis=-2)              # (..., L)
    factor = FR.mul(_zn_minus_one(plan, z), jnp.asarray(plan.n_inv))
    out_val = FR.mul(factor, s)
    in_val = FR.sum_along(FR.select(mask, evals, jnp.zeros_like(evals)), axis=-2)
    return FR.select(in_domain, in_val, out_val)


def eval_form_quotient(plan: NttPlan, evals, z, y):
    """Witness polynomial q in evaluation form, both branches blended."""
    roots = jnp.asarray(plan.roots)
    num = FR.sub(evals, y[..., None, :])          # e_i - y
    den = FR.sub(roots, z[..., None, :])          # w^i - z
    mask = FR.is_zero(den)                        # (..., n); true only at m
    dinv = FR.batch_inv(den, axis=-2)             # inv(0) = 0 => q_m starts 0
    q = FR.mul(num, dinv)
    # in-domain correction at position m:
    #   q_m = -z^{-1} * sum_j num_j * w^j * dinv_j
    s = FR.sum_along(FR.mul(FR.mul(num, jnp.broadcast_to(roots, q.shape)), dinv),
                     axis=-2)
    corr = FR.neg(FR.mul(FR.inv(z), s))           # (..., L)
    q = FR.add(q, FR.select(mask, jnp.broadcast_to(corr[..., None, :], q.shape),
                            jnp.zeros_like(q)))
    return q


barycentric_eval_jit = jax.jit(barycentric_eval, static_argnums=0)
eval_form_quotient_jit = jax.jit(eval_form_quotient, static_argnums=0)
