"""Miller-loop line functions for the BLS12-381 M-twist (SURVEY comp. 13).

Derivation (first principles, so the sparse structure is OURS, verified
against the golden model rather than copied):  with the untwist
x_hat = x/w^2, y_hat = y/w^3 (golden/model.py `_untwist`, verified in
SURVEY 0.2), the tangent/chord line through points of E'(Fp2) evaluated at
P = (x_P, y_P) in G1, scaled only by Fp2 factors (Fp2 is a subfield of
Fp6, so such factors die under the (p^6-1)(p^2+1) easy part of the final
exponentiation — powers of w would NOT), is the sparse Fp12 element

    l(P) = [c0 * y_P] * w^0  +  [c3] * w^3  +  [c5 * x_P] * w^5

with, for the DOUBLING step at T = (X, Y, Z) (homogeneous projective):

    c0 = 2 xi Y Z^2,   c3 = 3 X^3 - 2 Y^2 Z,   c5 = -3 X^2 Z

and for the ADDITION step T + Q, Q = (xq, yq) affine:

    theta = Y - yq Z,  lam = X - xq Z
    c0 = xi lam,       c3 = theta xq - lam yq,  c5 = -theta

In the tower layout (i, j) <-> w^(i + 2j): w^0 -> (0,0), w^3 -> (1,1),
w^5 -> (1,2).

The two G2 arguments of the KZG pairing check ([1]_2 and [tau]_2) are
FIXED per setup, so all line coefficients are precomputed once per setup
with one lax.scan over the 63 Miller steps (arkworks' G2Prepared is the
ecosystem analogue); the Miller loop itself then touches no G2 arithmetic.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpukzg.field.mont import FP
from tpukzg.field.tower import FP2, FP12
from tpukzg.curve.g2 import G2

X_BLS_ABS = 0xD201000000010000  # |x|; x itself is negative

# MSB-first bits of |x| skipping the leading 1: one entry per Miller step.
MILLER_BITS = np.array([int(b) for b in bin(X_BLS_ABS)[3:]], dtype=np.uint32)
N_STEPS = len(MILLER_BITS)  # 63


def _dbl_coeffs(T):
    X, Y, Z = T
    sq = FP2.sqr(jnp.stack([X, Y, Z], axis=-3))
    X2, Y2, Z2 = sq[..., 0, :, :], sq[..., 1, :, :], sq[..., 2, :, :]
    pr = FP2.mul(jnp.stack([Y, X2, FP2.sqr(X)], axis=-3),
                 jnp.stack([Z2, X, Z], axis=-3))
    YZ2, X3, X2Z = pr[..., 0, :, :], pr[..., 1, :, :], pr[..., 2, :, :]
    Y2Z = FP2.mul(Y2, Z)
    c0 = FP2.mul_by_nonresidue(FP2.double(YZ2))                 # 2 xi Y Z^2
    c3 = FP2.sub(FP2.mul_small(X3, 3), FP2.double(Y2Z))         # 3X^3 - 2Y^2Z
    c5 = FP2.neg(FP2.mul_small(X2Z, 3))                         # -3 X^2 Z
    return c0, c3, c5


def _add_coeffs(T, q_aff):
    X, Y, Z = T
    xq, yq = q_aff
    pr = FP2.mul(jnp.stack([yq, xq], axis=-3), jnp.stack([Z, Z], axis=-3))
    yqZ, xqZ = pr[..., 0, :, :], pr[..., 1, :, :]
    theta = FP2.sub(Y, yqZ)
    lam = FP2.sub(X, xqZ)
    pr2 = FP2.mul(jnp.stack([theta, lam], axis=-3), jnp.stack([xq, yq], axis=-3))
    c3 = FP2.sub(pr2[..., 0, :, :], pr2[..., 1, :, :])          # theta xq - lam yq
    c0 = FP2.mul_by_nonresidue(lam)                             # xi lam
    c5 = FP2.neg(theta)                                         # -theta
    return c0, c3, c5


def _stack_coeffs(c0, c3, c5):
    return jnp.stack([c0, c3, c5], axis=-3)  # (..., 3, 2, L)


@jax.jit
def precompute_lines(q_point):
    """q_point: projective G2 point (X, Y, Z) tuple (single, not batched).

    Returns (dbl_lines, add_lines): (63, 3, 2, L) coefficient stacks.
    add_lines rows at non-add steps are garbage and masked out by the
    static MILLER_BITS table inside the Miller loop.
    """
    xq, yq, _ = G2.normalize(q_point)
    q_aff = (xq, yq)
    bits = jnp.asarray(MILLER_BITS)
    T0 = (xq, yq, jnp.asarray(FP2.one_np))

    def step(T, bit):
        d0, d3, d5 = _dbl_coeffs(T)
        T = G2._double(T)
        a0, a3, a5 = _add_coeffs(T, q_aff)
        T_added = G2._add(T, (q_aff[0], q_aff[1], jnp.asarray(FP2.one_np)))
        T = G2.select(bit == 1, T_added, T)
        return T, (_stack_coeffs(d0, d3, d5), _stack_coeffs(a0, a3, a5))

    _, (dbl_lines, add_lines) = lax.scan(step, T0, bits)
    return dbl_lines, add_lines


def line_eval(coeffs, xp, yp):
    """Sparse line -> dense Fp12 element.

    coeffs: (..., 3, 2, L) stacked (c0, c3, c5); xp, yp: (..., L) G1 affine
    (Montgomery).  Positions: w^0 -> (0,0,...), w^3 -> (1,1,...),
    w^5 -> (1,2,...).
    """
    c0 = FP2.mul_fp(coeffs[..., 0, :, :], yp)
    c3 = coeffs[..., 1, :, :]
    c5 = FP2.mul_fp(coeffs[..., 2, :, :], xp)
    z2 = jnp.zeros_like(c0)
    row0 = jnp.stack([c0, z2, z2], axis=-3)          # (0, j)
    row1 = jnp.stack([z2, c3, c5], axis=-3)          # (1, j): w^3, w^5
    return jnp.stack([row0, row1], axis=-4)
