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


def _fraction_merge(a, b):
    """Fold (..., m, L) fraction pairs to one (..., L) numerator via
    pairwise merges (a, b) x (a', b') -> (a b' + a' b, b b'); every
    level batches its 3 half-width products into one FR.mul."""
    n = a.shape[-2]
    while n > 1:
        al, ar = a[..., 0::2, :], a[..., 1::2, :]
        bl, br = b[..., 0::2, :], b[..., 1::2, :]
        lhs = jnp.concatenate([al, ar, bl], axis=-2)
        rhs = jnp.concatenate([br, bl, br], axis=-2)
        prod = FR.mul(lhs, rhs)
        m = n // 2
        a = FR.add(prod[..., :m, :], prod[..., m:2 * m, :])
        b = prod[..., 2 * m:, :]
        n = m
    return a[..., 0, :]


def _eval_impl() -> str:
    """Eval lowering: 'pallas' (VMEM fraction-tree kernel) or 'xla'."""
    import os
    v = os.environ.get("TPUKZG_EVAL_IMPL")
    if v is None:
        # Earned default (VERDICT r4 #3): pallas on TPU, xla elsewhere.
        return "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    assert v in ("xla", "pallas"), v
    return v


def barycentric_eval(plan: NttPlan, evals, z):
    """p(z) for evaluation-form p on plan's domain. Batched over leading axes.

    INVERSION-FREE fraction-tree form (r4 rework; bench/results.jsonl
    showed batch_inv was 0.25s of the 0.31s eval at (256, 4096)):
    with partial fractions  sum_i e_i w^i/(z - w^i) = N(z) / prod(z-w^i)
    and  prod_i (z - w^i) = z^n - 1,  the barycentric scale factor
    cancels exactly:  p(z) = (z^n-1)/n * N(z)/(z^n-1) = N(z)/n.
    N is built by pairwise merging (a, b) fraction nodes
    (a = a_l b_r + a_r b_l, b = b_l b_r): ~4n montmuls, work-efficient
    halving levels, NO field inversions, and the in-domain case z = w^m
    needs no branch — N(w^m) = e_m * w^m * (x^n-1)'(w^m) = n e_m, so
    N/n = e_m automatically (derivative identity; differentially tested
    vs the golden model incl. the in-domain KATs).

    On TPU the tree bottom runs as ONE VMEM-resident Pallas kernel
    (pallas/fractree.py; fraction addition is field-exact and
    commutative/associative, so kernel and XLA orders are bit-identical);
    the (n/tile)*128-wide tail merges here either way."""
    roots = jnp.asarray(plan.roots)  # (n, L)
    n, L = plan.roots.shape
    if _eval_impl() == "pallas":
        from tpukzg.pallas import fractree
        import os
        tile = int(os.environ.get("TPUKZG_EVAL_TILE", "4096"))
        if fractree.supported(n, L, tile):
            batch = evals.shape[:-2]
            k = 1
            for d in batch:
                k *= int(d)
            ev2 = evals.reshape((k, n, L))
            z2 = jnp.broadcast_to(z, batch + (L,)).reshape((k, L))
            a, b = fractree.fractree_partials(ev2, z2, plan.roots, tile=tile)
            num = _fraction_merge(a, b).reshape(batch + (L,))
            return FR.mul(num, jnp.asarray(plan.n_inv))
    a = FR.mul(evals, jnp.broadcast_to(roots, evals.shape))  # e_i w^i
    b = FR.sub(z[..., None, :], roots)                       # z - w^i
    num = _fraction_merge(a, b)
    return FR.mul(num, jnp.asarray(plan.n_inv))


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
