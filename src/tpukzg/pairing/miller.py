"""Miller loop over precomputed lines (SURVEY.md component 13).

One fori_loop over the 63 static steps of |x| = 0xd201000000010000:
  f <- f^2 * l_dbl(P);  at the 5 add-bits additionally f <- f * l_add(P).
The add-step multiply is computed unconditionally and select-masked by the
static bit table (branchless; the 5/63 waste is revisited in the perf
pass).  Because x < 0 the loop result is conjugated (golden/model.py
miller_loop, SURVEY 0.2c).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpukzg.field.tower import FP12
from tpukzg.pairing.lines import MILLER_BITS, N_STEPS, line_eval


def miller_loop_lines(xp, yp, dbl_lines, add_lines):
    """f_{|x|,Q}(P) conjugated.  Batched: xp/yp (..., L) broadcast against
    dbl_lines/add_lines (..., 63, 3, 2, L)."""
    bits = jnp.asarray(MILLER_BITS)
    batch = jnp.broadcast_shapes(xp.shape[:-1], dbl_lines.shape[:-4])
    f0 = jnp.broadcast_to(jnp.asarray(FP12.one_np), batch + (2, 3, 2, xp.shape[-1]))

    def body(i, f):
        f = FP12.sqr(f)
        ld = line_eval(jnp.take(dbl_lines, i, axis=-4), xp, yp)
        f = FP12.mul(f, ld)
        la = line_eval(jnp.take(add_lines, i, axis=-4), xp, yp)
        fa = FP12.mul(f, la)
        return FP12.select(jnp.full(batch, bits[i] == 1), fa, f)

    f = lax.fori_loop(0, N_STEPS, body, f0)
    return FP12.conj(f)


miller_loop_lines_jit = jax.jit(miller_loop_lines)
