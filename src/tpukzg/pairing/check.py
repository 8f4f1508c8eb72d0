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


_pairing_core_jit = jax.jit(
    lambda p_point, lines: final_exp(_miller_one(p_point, lines)))


def pairing(p_point, q_point):
    """e(P, Q)^3 — full pairing, comparable bit-exact with golden.pairing.

    miller+final_exp run as ONE jitted program.  The eager composition
    returned WRONG values on the tunneled TPU (r5 session, 2026-08-21):
    the experimental axon client appears to memoize (executable, input
    buffer ids) pairs, and a long eager op chain recycles freed buffer
    ids, so later tiny-op calls can be served a stale cached result.
    Everything inside one jit is a single dispatch and immune; library
    production paths are already whole-program jits — only this helper
    composed eagerly."""
    lines = precompute_lines(q_point)
    return _pairing_core_jit(p_point, lines)


def pairing_check(pairs_with_lines):
    """prod_i e(P_i, Q_i) == 1 with one shared final exponentiation.

    pairs_with_lines: list of (g1_point, (dbl_lines, add_lines)).
    Returns a scalar bool array.

    All Miller loops run as ONE batched loop (pairs stacked on a leading
    axis): the loop is latency-bound at small batch, so k pairs cost the
    same wall-clock as one (profile 2026-08-16: 2 sequential loops were
    ~57% of the whole batch-verify device time).
    """
    k = len(pairs_with_lines)
    if k == 1:
        f = _miller_one(*pairs_with_lines[0])
    else:
        pts = tuple(jnp.stack([p[i] for p, _ in pairs_with_lines])
                    for i in range(3))                    # (k, L) coords
        xp, yp, is_inf = G1.normalize(pts)                # ONE batched inv
        dl = jnp.stack([jnp.asarray(l[0]) for _, l in pairs_with_lines])
        al = jnp.stack([jnp.asarray(l[1]) for _, l in pairs_with_lines])
        fs = miller_loop_lines(xp, yp, dl, al)            # (k, 2,3,2,L)
        one = jnp.broadcast_to(jnp.asarray(FP12.one_np), fs.shape)
        fs = FP12.select(is_inf, one, fs)
        f = fs[0]
        for i in range(1, k):
            f = FP12.mul(f, fs[i])
    e = final_exp(f)
    one = jnp.broadcast_to(jnp.asarray(FP12.one_np), e.shape)
    return FP12.eq(e, one)


# ---------------------------------------------------------------------------
# Split lowering (CPU): the fused pairing-check program (miller loop +
# final_exp + glue, all in one graph) took ~6 min to compile on this
# box's single-core XLA:CPU and produced executables whose persistent-
# cache (de)serialization segfaults (utils/cachefix.py sentinel,
# VERDICT r4 missing #1).  Split form: ONE module-level jit for the
# batched miller merge (lines passed as ARGUMENTS so every Setup /
# Kzg instance shares the same executable), then final_exp_split's
# small chained programs.  Bit-exact with pairing_check.
# ---------------------------------------------------------------------------


def _miller_merged(pts, dl, al):
    xp, yp, is_inf = G1.normalize(pts)                # ONE batched inv
    fs = miller_loop_lines(xp, yp, dl, al)            # (k, 2,3,2,L)
    one = jnp.broadcast_to(jnp.asarray(FP12.one_np), fs.shape)
    fs = FP12.select(is_inf, one, fs)
    f = fs[0]
    for i in range(1, fs.shape[0]):
        f = FP12.mul(f, fs[i])
    return f


_miller_merged_jit = jax.jit(_miller_merged)
_eq_one_jit = jax.jit(lambda e: FP12.eq(
    e, jnp.broadcast_to(jnp.asarray(FP12.one_np), e.shape)))


def pairing_check_split(pairs_with_lines):
    """prod_i e(P_i, Q_i) == 1, chained small programs (CPU lowering;
    identical values to pairing_check — see final_exp_split)."""
    from tpukzg.pairing.final_exp import final_exp_split
    pts = tuple(jnp.stack([p[i] for p, _ in pairs_with_lines])
                for i in range(3))
    dl = jnp.stack([jnp.asarray(l[0]) for _, l in pairs_with_lines])
    al = jnp.stack([jnp.asarray(l[1]) for _, l in pairs_with_lines])
    f = _miller_merged_jit(pts, dl, al)
    e = final_exp_split(f)
    return _eq_one_jit(e)
