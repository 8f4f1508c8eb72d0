"""Fp2/Fp6/Fp12 extension tower over the Montgomery limb engine.

Tower (SURVEY.md component 5, verified in golden/model.py):
    Fp2  = Fp [u] / (u^2 + 1)
    Fp6  = Fp2[v] / (v^3 - xi),  xi = 1 + u
    Fp12 = Fp6[w] / (w^2 - v)

Layouts (component axes precede the limb axis; leading axes are batch):
    Fp2:  (..., 2, L)      Fp6: (..., 3, 2, L)      Fp12: (..., 2, 3, 2, L)

Karatsuba-style multiplication at every level, with the independent
sub-multiplications of one level STACKED into a single batched call of the
level below — an Fp12 mul reaches the limb engine as a few wide Fp muls,
which is what the TPU VPU wants (long lanes, no scalar work).

Frobenius maps use host-precomputed gamma tables  xi^(k*(p^n - 1)/6)
(pure-int computation at import, no golden-model dependency).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpukzg.field.mont import FP, P_MOD


def _stack(parts, axis):
    return jnp.stack(parts, axis=axis)


class Fp2Ops:
    """Arithmetic on (..., 2, L) arrays (Montgomery-form components)."""

    suffix_ndim = 2

    def __init__(self):
        L = FP.L
        self.zero_np = np.zeros((2, L), np.uint32)
        self.one_np = np.stack([FP.one_mont, np.zeros(L, np.uint32)])

    # -- helpers --
    def c(self, a, i):
        return a[..., i, :]

    def build(self, c0, c1):
        return _stack([c0, c1], axis=-2)

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None], a, b)

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    # -- linear ops (FP broadcasts over the component axis) --
    def add(self, a, b):
        return FP.add(a, b)

    def sub(self, a, b):
        return FP.sub(a, b)

    def neg(self, a):
        return FP.neg(a)

    def double(self, a):
        return FP.add(a, a)

    def mul_small(self, a, k: int):
        return FP.mul_small(a, k)

    def conj(self, a):
        return self.build(self.c(a, 0), FP.neg(self.c(a, 1)))

    def mul_by_nonresidue(self, a):
        """a * xi = a * (1 + u) = (a0 - a1) + (a0 + a1) u."""
        a0, a1 = self.c(a, 0), self.c(a, 1)
        return self.build(FP.sub(a0, a1), FP.add(a0, a1))

    # -- multiplicative ops --
    def mul(self, a, b):
        """Karatsuba: 3 Fp muls in ONE batched call."""
        a0, a1 = self.c(a, 0), self.c(a, 1)
        b0, b1 = self.c(b, 0), self.c(b, 1)
        lhs = _stack([a0, a1, FP.add(a0, a1)], axis=-2)
        rhs = _stack([b0, b1, FP.add(b0, b1)], axis=-2)
        t = FP.mul(lhs, rhs)
        t0, t1, t2 = t[..., 0, :], t[..., 1, :], t[..., 2, :]
        return self.build(FP.sub(t0, t1), FP.sub(FP.sub(t2, t0), t1))

    def sqr(self, a):
        """(a0+a1)(a0-a1) and a0*a1 in one batched call."""
        a0, a1 = self.c(a, 0), self.c(a, 1)
        lhs = _stack([FP.add(a0, a1), a0], axis=-2)
        rhs = _stack([FP.sub(a0, a1), a1], axis=-2)
        t = FP.mul(lhs, rhs)
        return self.build(t[..., 0, :], FP.add(t[..., 1, :], t[..., 1, :]))

    def mul_fp(self, a, s):
        """Multiply both components by an Fp element s (..., L)."""
        return FP.mul(a, s[..., None, :])

    def inv(self, a):
        a0, a1 = self.c(a, 0), self.c(a, 1)
        t = FP.mul(_stack([a0, a1], axis=-2), _stack([a0, a1], axis=-2))
        norm = FP.add(t[..., 0, :], t[..., 1, :])
        d = FP.inv(norm)
        return self.build(FP.mul(a0, d), FP.neg(FP.mul(a1, d)))


class Fp6Ops:
    """Arithmetic on (..., 3, 2, L) arrays over Fp2."""

    suffix_ndim = 3

    def __init__(self, fp2: Fp2Ops):
        self.fp2 = fp2
        self.zero_np = np.zeros((3, 2, FP.L), np.uint32)
        self.one_np = np.stack([fp2.one_np, fp2.zero_np, fp2.zero_np])

    def c(self, a, i):
        return a[..., i, :, :]

    def build(self, c0, c1, c2):
        return _stack([c0, c1, c2], axis=-3)

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None, None], a, b)

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2, -3))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2, -3))

    def add(self, a, b):
        return FP.add(a, b)

    def sub(self, a, b):
        return FP.sub(a, b)

    def neg(self, a):
        return FP.neg(a)

    def double(self, a):
        return FP.add(a, a)

    def mul_small(self, a, k: int):
        return FP.mul_small(a, k)

    def mul_by_v(self, a):
        """a * v: (c0, c1, c2) -> (xi*c2, c0, c1)."""
        f2 = self.fp2
        return self.build(f2.mul_by_nonresidue(self.c(a, 2)), self.c(a, 0), self.c(a, 1))

    def mul(self, a, b):
        """Toom-style 6 Fp2 muls in ONE batched fp2 call (=> one wide Fp mul)."""
        f2 = self.fp2
        a0, a1, a2 = (self.c(a, i) for i in range(3))
        b0, b1, b2 = (self.c(b, i) for i in range(3))
        lhs = _stack([a0, a1, a2, f2.add(a1, a2), f2.add(a0, a1), f2.add(a0, a2)], axis=-3)
        rhs = _stack([b0, b1, b2, f2.add(b1, b2), f2.add(b0, b1), f2.add(b0, b2)], axis=-3)
        v = f2.mul(lhs, rhs)
        v0, v1, v2 = v[..., 0, :, :], v[..., 1, :, :], v[..., 2, :, :]
        m12, m01, m02 = v[..., 3, :, :], v[..., 4, :, :], v[..., 5, :, :]
        c0 = f2.add(v0, f2.mul_by_nonresidue(f2.sub(f2.sub(m12, v1), v2)))
        c1 = f2.add(f2.sub(f2.sub(m01, v0), v1), f2.mul_by_nonresidue(v2))
        c2 = f2.add(f2.sub(f2.sub(m02, v0), v2), v1)
        return self.build(c0, c1, c2)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_fp2(self, a, s):
        """Multiply all three Fp2 coefficients by one Fp2 element s."""
        f2 = self.fp2
        ss = jnp.broadcast_to(s[..., None, :, :], a.shape)
        return f2.mul(a, ss)

    def inv(self, a):
        f2 = self.fp2
        a0, a1, a2 = (self.c(a, i) for i in range(3))
        sq = f2.sqr(_stack([a0, a1, a2], axis=-3))
        s0, s1, s2 = sq[..., 0, :, :], sq[..., 1, :, :], sq[..., 2, :, :]
        pr = f2.mul(_stack([a1, a0, a0], axis=-3), _stack([a2, a1, a2], axis=-3))
        p12, p01, p02 = pr[..., 0, :, :], pr[..., 1, :, :], pr[..., 2, :, :]
        c0 = f2.sub(s0, f2.mul_by_nonresidue(p12))
        c1 = f2.sub(f2.mul_by_nonresidue(s2), p01)
        c2 = f2.sub(s1, p02)
        den_terms = f2.mul(_stack([a0, a1, a2], axis=-3), _stack([c0, c2, c1], axis=-3))
        den = f2.add(den_terms[..., 0, :, :],
                     f2.mul_by_nonresidue(f2.add(den_terms[..., 1, :, :], den_terms[..., 2, :, :])))
        d = f2.inv(den)
        out = f2.mul(self.build(c0, c1, c2), jnp.broadcast_to(d[..., None, :, :], a.shape))
        return out


class Fp12Ops:
    """Arithmetic on (..., 2, 3, 2, L) arrays over Fp6."""

    suffix_ndim = 4

    def __init__(self, fp6: Fp6Ops):
        self.fp6 = fp6
        self.fp2 = fp6.fp2
        self.zero_np = np.zeros((2, 3, 2, FP.L), np.uint32)
        self.one_np = np.stack([fp6.one_np, fp6.zero_np])
        self._frob = _frobenius_tables()

    def c(self, a, i):
        return a[..., i, :, :, :]

    def build(self, c0, c1):
        return _stack([c0, c1], axis=-4)

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None, None, None], a, b)

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2, -3, -4))

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2, -3, -4))

    def add(self, a, b):
        return FP.add(a, b)

    def sub(self, a, b):
        return FP.sub(a, b)

    def neg(self, a):
        return FP.neg(a)

    def conj(self, a):
        """c0 - c1 w — the p^6 Frobenius; inverse on the cyclotomic subgroup."""
        return self.build(self.c(a, 0), FP.neg(self.c(a, 1)))

    def mul(self, a, b):
        """Karatsuba: 3 Fp6 muls in ONE batched fp6 call."""
        f6 = self.fp6
        a0, a1 = self.c(a, 0), self.c(a, 1)
        b0, b1 = self.c(b, 0), self.c(b, 1)
        lhs = _stack([a0, a1, f6.add(a0, a1)], axis=-4)
        rhs = _stack([b0, b1, f6.add(b0, b1)], axis=-4)
        v = f6.mul(lhs, rhs)
        v0, v1, m = v[..., 0, :, :, :], v[..., 1, :, :, :], v[..., 2, :, :, :]
        c0 = f6.add(v0, f6.mul_by_v(v1))
        c1 = f6.sub(f6.sub(m, v0), v1)
        return self.build(c0, c1)

    def sqr(self, a):
        """Complex squaring: c0' = (a0+a1)(a0+v a1) - m - v m, c1' = 2m."""
        f6 = self.fp6
        a0, a1 = self.c(a, 0), self.c(a, 1)
        lhs = _stack([f6.add(a0, a1), a0], axis=-4)
        rhs = _stack([f6.add(a0, f6.mul_by_v(a1)), a1], axis=-4)
        v = f6.mul(lhs, rhs)
        t, m = v[..., 0, :, :, :], v[..., 1, :, :, :]
        c0 = f6.sub(f6.sub(t, m), f6.mul_by_v(m))
        c1 = f6.add(m, m)
        return self.build(c0, c1)

    def inv(self, a):
        f6 = self.fp6
        a0, a1 = self.c(a, 0), self.c(a, 1)
        sq = f6.mul(_stack([a0, a1], axis=-4), _stack([a0, a1], axis=-4))
        den = f6.sub(sq[..., 0, :, :, :], f6.mul_by_v(sq[..., 1, :, :, :]))
        d = f6.inv(den)
        num = f6.mul(_stack([a0, f6.neg(a1)], axis=-4),
                     jnp.broadcast_to(d[..., None, :, :, :], a.shape))
        return self.build(num[..., 0, :, :, :], num[..., 1, :, :, :])

    def cyclotomic_sqr(self, a):
        """Granger-Scott squaring for the cyclotomic subgroup (eprint 2010/542).

        View Fp12 = Fp4[w]-triple with Fp4 = Fp2[y]/(y^2 - xi), y = w^3;
        the w^k coefficient lives at component (i=k%2, j=k//2).  The three
        Fp4 squarings cost 9 Fp2 squarings total — issued as ONE batched
        FP2.sqr of a 9-component stack — vs 18 Fp2 muls for the generic
        sqr().  Valid only for norm-1 elements (post easy-part); the
        differential test checks it against sqr() on real pairing outputs.
        """
        f2 = self.fp2
        z = [a[..., k % 2, k // 2, :, :] for k in range(6)]  # w^k coeffs
        pairs = ((z[0], z[3]), (z[1], z[4]), (z[2], z[5]))   # (c, c*y) per Fp4
        comps = []
        for c0, c1 in pairs:
            comps += [c0, c1, f2.add(c0, c1)]
        s = f2.sqr(_stack(comps, axis=-3))
        t = []
        for gi in range(3):
            s0 = s[..., 3 * gi, :, :]       # c0^2
            s1 = s[..., 3 * gi + 1, :, :]   # c1^2
            sv = s[..., 3 * gi + 2, :, :]   # (c0+c1)^2
            t0 = f2.add(s0, f2.mul_by_nonresidue(s1))   # c0^2 + xi c1^2
            t1 = f2.sub(f2.sub(sv, s0), s1)             # 2 c0 c1
            t.append((t0, t1))
        (tA0, tA1), (tB0, tB1), (tC0, tC1) = t

        def m3p2(tt, zz):  # 3t + 2z
            return f2.add(f2.double(f2.add(tt, zz)), tt)

        def m3m2(tt, zz):  # 3t - 2z
            return f2.add(f2.double(f2.sub(tt, zz)), tt)

        o0 = m3m2(tA0, z[0])                         # w^0
        o3 = m3p2(tA1, z[3])                         # w^3
        o2 = m3m2(tB0, z[2])                         # w^2 <- sq of (w^1,w^4)
        o5 = m3p2(tB1, z[5])                         # w^5
        o1 = m3p2(f2.mul_by_nonresidue(tC1), z[1])   # w^1 <- sq of (w^2,w^5)
        o4 = m3m2(tC0, z[4])                         # w^4
        c0 = _stack([o0, o2, o4], axis=-3)
        c1 = _stack([o1, o3, o5], axis=-3)
        return self.build(c0, c1)

    # ---- Frobenius ----

    def frobenius(self, a, n: int):
        """a^(p^n) for n in {1, 2, 3}.

        Viewing Fp12 = sum d_k w^k (k = i + 2j for component (i, j, ...)):
        (d_k w^k)^(p^n) = Frob_n(d_k) * xi^(k (p^n - 1)/6) * w^k, where
        Frob_n on Fp2 is conjugation iff n is odd.
        """
        assert n in (1, 2, 3)
        gam = self._frob[n]  # list of 6 np (2, L) Fp2 constants, Mont form
        f2 = self.fp2
        out_c = [[None] * 3 for _ in range(2)]
        for i in range(2):
            for j in range(3):
                k = i + 2 * j
                d = a[..., i, j, :, :]
                if n % 2 == 1:
                    d = f2.conj(d)
                out_c[i][j] = f2.mul(d, jnp.asarray(gam[k]))
        c0 = _stack(out_c[0], axis=-3)
        c1 = _stack(out_c[1], axis=-3)
        return self.build(c0, c1)


def _frobenius_tables():
    """gamma[n][k] = xi^(k (p^n - 1)/6) as Montgomery-form (2, L) arrays."""
    p = P_MOD

    def fp2_mul_int(a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % p, (a[0] * b[1] + a[1] * b[0]) % p)

    def fp2_pow_int(a, e):
        result = (1, 0)
        base = a
        while e:
            if e & 1:
                result = fp2_mul_int(result, base)
            base = fp2_mul_int(base, base)
            e >>= 1
        return result

    xi = (1, 1)
    tables = {}
    for n in (1, 2, 3):
        e = (p**n - 1) // 6
        base = fp2_pow_int(xi, e)
        row = []
        acc = (1, 0)
        for _ in range(6):
            row.append(np.stack([FP.to_mont_host(acc[0]),
                                 FP.to_mont_host(acc[1])]))
            acc = fp2_mul_int(acc, base)
        tables[n] = row
    return tables


FP2 = Fp2Ops()
FP6 = Fp6Ops(FP2)
FP12 = Fp12Ops(FP6)
