"""Limb-major complete projective group law (SURVEY.md components 6, 10).

Same RCB15 complete a=0 formulas as curve/weierstrass.py, specialized to
the limb-major layout: point coords are (L, *batch) u32 arrays.  The six
independent field products of each formula stack along a fresh axis right
after the limb axis, so one montmul call runs 6x-wider lanes — on the
hardware this is the difference between issuing 6 narrow kernels and one
dense one.

An optional Pallas path fuses the ENTIRE add/double formula into one
VMEM-resident kernel (pallas/ec.py) — no HBM roundtrips between the ~30
intermediate (L, N) tensors, which is what bounds the XLA path (TPU
microbench 2026-08-16: montmul alone is ~5x faster fused in VMEM).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpukzg.field.limb_major import FieldLM


class CurveLM:
    """G1-over-Fp limb-major ops.  (Fp2 curves keep the generic path —
    the MSM hot loop is G1-only in this protocol.)"""

    def __init__(self, field: FieldLM, b3_small: int):
        self.F = field
        self.b3_small = b3_small  # 3b as a small int (G1: 12)

    # -- helpers --

    def _bmul(self, pairs):
        F = self.F
        lhs = jnp.stack([a for a, _ in pairs], axis=1)   # (L, k, *batch)
        rhs = jnp.stack([b for _, b in pairs], axis=1)
        prod = F.mul(lhs, rhs)
        return [prod[:, i] for i in range(len(pairs))]

    def _b3(self, x):
        return self.F.mul_small(x, self.b3_small)

    def inf(self, batch_shape=()):
        F = self.F
        one = jnp.broadcast_to(jnp.asarray(F.one_np).reshape(
            (F.L,) + (1,) * len(batch_shape)), (F.L,) + batch_shape)
        zero = jnp.zeros((F.L,) + batch_shape, jnp.uint32)
        return (zero, one, zero)

    def select(self, mask, p, q):
        F = self.F
        return tuple(F.select(mask, a, b) for a, b in zip(p, q))

    def is_inf(self, p):
        return self.F.is_zero(p[2])

    # -- group law (RCB15 Alg. 7 / 9, a = 0) --

    def add(self, p, q):
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        t0, t1, t2, t3, t4, t5 = self._bmul([
            (X1, X2), (Y1, Y2), (Z1, Z2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (F.add(Y1, Z1), F.add(Y2, Z2)),
            (F.add(X1, Z1), F.add(X2, Z2)),
        ])
        t3 = F.sub(t3, F.add(t0, t1))
        t4 = F.sub(t4, F.add(t1, t2))
        t5 = F.sub(t5, F.add(t0, t2))
        t0 = F.add(F.add(t0, t0), t0)
        t2 = self._b3(t2)
        z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        y3 = self._b3(t5)
        m0, m1, m2, m3, m4, m5 = self._bmul([
            (t4, y3), (t3, t1), (y3, t0), (t1, z3), (t0, t3), (z3, t4),
        ])
        return (F.sub(m1, m0), F.add(m3, m2), F.add(m5, m4))

    def double(self, p):
        F = self.F
        X, Y, Z = p
        t0, t1, t2, t3 = self._bmul([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
        z8 = F.add(t0, t0)
        z8 = F.add(z8, z8)
        z8 = F.add(z8, z8)
        t2 = self._b3(t2)
        t6 = F.sub(t0, F.add(F.add(t2, t2), t2))
        y3t = F.add(t0, t2)
        m0, m1, m2, m3 = self._bmul([(t2, z8), (t1, z8), (t6, y3t), (t6, t3)])
        return (F.add(m3, m3), F.add(m2, m0), m1)

    def neg(self, p):
        X, Y, Z = p
        return (X, self.F.neg(Y), Z)

    # -- predicates --

    def is_inf(self, p):
        return self.F.is_zero(p[2])

    def eq(self, p, q):
        """Projective equality via cross-multiplication, infinity-aware."""
        F = self.F
        a, b, c, d = self._bmul([(p[0], q[2]), (q[0], p[2]),
                                 (p[1], q[2]), (q[1], p[2])])
        same = F.eq(a, b) & F.eq(c, d)
        pi, qi = self.is_inf(p), self.is_inf(q)
        return jnp.where(pi | qi, pi == qi, same)

    def is_on_curve(self, p):
        """3 Y^2 Z == 3 X^3 + 3b Z^3 (avoids dividing b3 by 3)."""
        F = self.F
        y2, x2, z2 = self._bmul([(p[1], p[1]), (p[0], p[0]), (p[2], p[2])])
        y2z, x3, z3 = self._bmul([(y2, p[2]), (x2, p[0]), (z2, p[2])])
        lhs = F.add(F.add(y2z, y2z), y2z)
        rhs = F.add(F.add(F.add(x3, x3), x3), F.mul_small(z3, self.b3_small))
        return F.eq(lhs, rhs) | self.is_inf(p)

    # -- reductions --

    def reduce_sum_lanes(self, pts, axis: int):
        """Tree-reduce points along a batch axis (axis counts batch dims,
        i.e. axis+1 in the raw arrays)."""
        ax = axis + 1
        pts = tuple(jnp.moveaxis(c, ax, 1) for c in pts)
        n = pts[0].shape[1]
        while n > 1:
            if n % 2 == 1:
                pad = [(0, 0), (0, 1)] + [(0, 0)] * (pts[0].ndim - 2)
                pts = tuple(jnp.pad(c, pad) for c in pts)
                # padded slot must be infinity (0,1,0): fix Y lane
                x, y, z = pts
                one = jnp.asarray(self.F.one_np).reshape(
                    (self.F.L, 1) + (1,) * (y.ndim - 2))
                y = y.at[:, -1:].set(jnp.broadcast_to(one, y[:, -1:].shape))
                pts = (x, y, z)
                n += 1
            half = n // 2
            a = tuple(c[:, :half] for c in pts)
            b = tuple(c[:, half:] for c in pts)
            pts = self.add(a, b)
            n = half
        return tuple(jnp.moveaxis(c[:, 0], 0, 0) for c in pts)


from tpukzg.field.limb_major import FP_LM

G1_LM = CurveLM(FP_LM, b3_small=12)
