"""Pure-Python golden model of BLS12-381 + KZG with batch verification.

This is the bit-exactness oracle for the TPU-native implementation
(SURVEY.md component 28).  It is deliberately written with Python bignum
arithmetic and zero JAX dependency; speed is irrelevant, clarity and
correctness are everything.

Scope (SURVEY.md section 0.1/0.2 — the reference repo at /root/reference
contains only a LICENSE, so the capability surface is the published KZG
scheme itself, verified numerically in-session):
  * Fp / Fr prime fields, Fp2/Fp6/Fp12 tower (u^2=-1, v^3=u+1, w^2=v)
  * G1 (y^2=x^3+4) and G2 (y^2=x^3+4(1+u)) in Jacobian coordinates
  * ZCash-format compressed (de)serialization (48B G1 / 96B G2)
  * optimal-Ate pairing: affine Miller loop over E(Fp12) via the untwist
    X=x'/w^2, Y=y'/w^3; final exponentiation by the FIXED project-wide
    exponent 3*(p^12-1)/r (the cubed hard part, gcd(3,r)=1, so all
    pairing *checks* are unaffected; the cube lets the accelerated
    implementation use the (x-1)^2*(x+p)*(x^2+p^2-1)+3 chain and still
    agree bit-exactly with this model)
  * radix-2 NTT / iNTT over Fr, bit-reversal permutation
  * KZG: insecure dev setup, commit, open, verify, blob API
    (EIP-4844-shaped), Fiat-Shamir transcript, batch verification via
    random linear combination:
        e(sum rho^i pi_i, [tau]_2)
          == e(sum rho^i (C_i - [y_i]_1 + z_i pi_i), [1]_2)
"""

from __future__ import annotations

import hashlib

# ---------------------------------------------------------------------------
# Curve constants (SURVEY.md section 2.1, numerically re-verified there)
# ---------------------------------------------------------------------------

P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
X_BLS = -0xD201000000010000  # BLS parameter x (negative)

# 2-adicity of r-1 is 32; omega32 = 7^((r-1)/2^32) mod r
TWO_ADICITY = 32
OMEGA_2_32 = 0x16A2A19EDFE81F20D09B681922C813B4B63683508C2280B93829971F439F0D2B

G1_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1

G2_X0 = 0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8
G2_X1 = 0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E
G2_Y0 = 0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801
G2_Y1 = 0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE

# Project-wide pairing exponent: 3 * (p^12 - 1) / r.  See module docstring.
FINAL_EXP_E = 3 * ((P**12 - 1) // R)

# ---------------------------------------------------------------------------
# Fr scalar-field helpers (plain ints mod R)
# ---------------------------------------------------------------------------


def fr_inv(a: int) -> int:
    return pow(a, R - 2, R)


def fr_omega(order: int) -> int:
    """Primitive `order`-th root of unity in Fr (order a power of two <= 2^32)."""
    assert order & (order - 1) == 0 and order <= (1 << TWO_ADICITY)
    w = OMEGA_2_32
    n = 1 << TWO_ADICITY
    while n > order:
        w = (w * w) % R
        n >>= 1
    return w


# ---------------------------------------------------------------------------
# Fp and extension tower
# ---------------------------------------------------------------------------


def fp_inv(a: int) -> int:
    return pow(a, P - 2, P)


def fp_sqrt(a: int) -> int | None:
    """Square root in Fp (p = 3 mod 4), or None if a is not a QR."""
    if a == 0:
        return 0
    s = pow(a, (P + 1) // 4, P)
    return s if (s * s) % P == a % P else None


class Fp2:
    """a0 + a1*u with u^2 = -1."""

    __slots__ = ("c0", "c1")

    def __init__(self, c0: int, c1: int):
        self.c0 = c0 % P
        self.c1 = c1 % P

    def __add__(a, b):
        return Fp2(a.c0 + b.c0, a.c1 + b.c1)

    def __sub__(a, b):
        return Fp2(a.c0 - b.c0, a.c1 - b.c1)

    def __neg__(a):
        return Fp2(-a.c0, -a.c1)

    def __mul__(a, b):
        if isinstance(b, int):
            return Fp2(a.c0 * b, a.c1 * b)
        t0 = a.c0 * b.c0
        t1 = a.c1 * b.c1
        t2 = (a.c0 + a.c1) * (b.c0 + b.c1)
        return Fp2(t0 - t1, t2 - t0 - t1)

    __rmul__ = __mul__

    def sqr(a):
        # (a0+a1u)^2 = (a0+a1)(a0-a1) + 2a0a1 u
        t = a.c0 * a.c1
        return Fp2((a.c0 + a.c1) * (a.c0 - a.c1), t + t)

    def conj(a):
        return Fp2(a.c0, -a.c1)

    def inv(a):
        d = fp_inv((a.c0 * a.c0 + a.c1 * a.c1) % P)
        return Fp2(a.c0 * d, -a.c1 * d)

    def is_zero(a) -> bool:
        return a.c0 == 0 and a.c1 == 0

    def __eq__(a, b):
        return isinstance(b, Fp2) and a.c0 == b.c0 and a.c1 == b.c1

    def __hash__(self):
        return hash((self.c0, self.c1))

    def __repr__(self):
        return f"Fp2({hex(self.c0)}, {hex(self.c1)})"

    @staticmethod
    def zero():
        return Fp2(0, 0)

    @staticmethod
    def one():
        return Fp2(1, 0)

    def sqrt(a) -> "Fp2 | None":
        """Square root in Fp2 via the norm trick (valid for p = 3 mod 4)."""
        if a.is_zero():
            return Fp2.zero()
        if a.c1 == 0:
            s = fp_sqrt(a.c0)
            if s is not None:
                return Fp2(s, 0)
            s = fp_sqrt(-a.c0 % P)
            assert s is not None
            return Fp2(0, s)  # (s*u)^2 = -s^2 = a0
        n = (a.c0 * a.c0 + a.c1 * a.c1) % P  # norm
        s = fp_sqrt(n)
        if s is None:
            return None
        inv2 = fp_inv(2)
        x0sq = ((a.c0 + s) * inv2) % P
        x0 = fp_sqrt(x0sq)
        if x0 is None:
            x0sq = ((a.c0 - s) * inv2) % P
            x0 = fp_sqrt(x0sq)
            if x0 is None:
                return None
        x1 = (a.c1 * fp_inv(2 * x0 % P)) % P
        cand = Fp2(x0, x1)
        return cand if cand.sqr() == a else None


XI = Fp2(1, 1)  # v^3 = xi = 1 + u


class Fp6:
    """c0 + c1*v + c2*v^2 over Fp2 with v^3 = xi."""

    __slots__ = ("c0", "c1", "c2")

    def __init__(self, c0: Fp2, c1: Fp2, c2: Fp2):
        self.c0, self.c1, self.c2 = c0, c1, c2

    def __add__(a, b):
        return Fp6(a.c0 + b.c0, a.c1 + b.c1, a.c2 + b.c2)

    def __sub__(a, b):
        return Fp6(a.c0 - b.c0, a.c1 - b.c1, a.c2 - b.c2)

    def __neg__(a):
        return Fp6(-a.c0, -a.c1, -a.c2)

    def __mul__(a, b):
        a0, a1, a2 = a.c0, a.c1, a.c2
        b0, b1, b2 = b.c0, b.c1, b.c2
        return Fp6(
            a0 * b0 + XI * (a1 * b2 + a2 * b1),
            a0 * b1 + a1 * b0 + XI * (a2 * b2),
            a0 * b2 + a1 * b1 + a2 * b0,
        )

    def mul_by_v(a):
        """a * v  (used as the Fp12 non-residue gamma = v)."""
        return Fp6(XI * a.c2, a.c0, a.c1)

    def inv(a):
        a0, a1, a2 = a.c0, a.c1, a.c2
        c0 = a0.sqr() - XI * (a1 * a2)
        c1 = XI * a2.sqr() - a0 * a1
        c2 = a1.sqr() - a0 * a2
        den = a0 * c0 + XI * (a1 * c2 + a2 * c1)
        d = den.inv()
        return Fp6(c0 * d, c1 * d, c2 * d)

    def is_zero(a) -> bool:
        return a.c0.is_zero() and a.c1.is_zero() and a.c2.is_zero()

    def __eq__(a, b):
        return isinstance(b, Fp6) and a.c0 == b.c0 and a.c1 == b.c1 and a.c2 == b.c2

    def __hash__(self):
        return hash((self.c0, self.c1, self.c2))

    @staticmethod
    def zero():
        return Fp6(Fp2.zero(), Fp2.zero(), Fp2.zero())

    @staticmethod
    def one():
        return Fp6(Fp2.one(), Fp2.zero(), Fp2.zero())


class Fp12:
    """c0 + c1*w over Fp6 with w^2 = v."""

    __slots__ = ("c0", "c1")

    def __init__(self, c0: Fp6, c1: Fp6):
        self.c0, self.c1 = c0, c1

    def __add__(a, b):
        return Fp12(a.c0 + b.c0, a.c1 + b.c1)

    def __sub__(a, b):
        return Fp12(a.c0 - b.c0, a.c1 - b.c1)

    def __neg__(a):
        return Fp12(-a.c0, -a.c1)

    def __mul__(a, b):
        t0 = a.c0 * b.c0
        t1 = a.c1 * b.c1
        return Fp12(t0 + t1.mul_by_v(), a.c0 * b.c1 + a.c1 * b.c0)

    def sqr(a):
        return a * a

    def conj(a):
        return Fp12(a.c0, -a.c1)

    def inv(a):
        den = a.c0 * a.c0 - (a.c1 * a.c1).mul_by_v()
        d = den.inv()
        return Fp12(a.c0 * d, -a.c1 * d)

    def pow(a, e: int):
        if e < 0:
            return a.inv().pow(-e)
        result = Fp12.one()
        base = a
        while e:
            if e & 1:
                result = result * base
            base = base * base
            e >>= 1
        return result

    def is_zero(a) -> bool:
        return a.c0.is_zero() and a.c1.is_zero()

    def __eq__(a, b):
        return isinstance(b, Fp12) and a.c0 == b.c0 and a.c1 == b.c1

    def __hash__(self):
        return hash((self.c0, self.c1))

    @staticmethod
    def zero():
        return Fp12(Fp6.zero(), Fp6.zero())

    @staticmethod
    def one():
        return Fp12(Fp6.one(), Fp6.zero())


def fp12_from_fp(x: int) -> Fp12:
    return Fp12(Fp6(Fp2(x, 0), Fp2.zero(), Fp2.zero()), Fp6.zero())


def fp12_from_fp2(x: Fp2) -> Fp12:
    return Fp12(Fp6(x, Fp2.zero(), Fp2.zero()), Fp6.zero())


W12 = Fp12(Fp6.zero(), Fp6.one())  # the generator w of Fp12 over Fp6
W12_INV2 = (W12 * W12).inv()  # w^-2
W12_INV3 = (W12 * W12 * W12).inv()  # w^-3


# ---------------------------------------------------------------------------
# Generic Jacobian curve arithmetic (works over int-mod-p via Fp wrapper, Fp2)
# ---------------------------------------------------------------------------
#
# Points are (X, Y, Z) Jacobian tuples; Z == field zero means infinity.
# Formulas: dbl-2009-l and add-2007-bl for a = 0 short Weierstrass.


class _FpW:
    """Tiny int-mod-P wrapper so the generic Jacobian code has one interface."""

    __slots__ = ("n",)

    def __init__(self, n: int):
        self.n = n % P

    def __add__(a, b):
        return _FpW(a.n + b.n)

    def __sub__(a, b):
        return _FpW(a.n - b.n)

    def __neg__(a):
        return _FpW(-a.n)

    def __mul__(a, b):
        if isinstance(b, int):
            return _FpW(a.n * b)
        return _FpW(a.n * b.n)

    __rmul__ = __mul__

    def sqr(a):
        return _FpW(a.n * a.n)

    def inv(a):
        return _FpW(fp_inv(a.n))

    def is_zero(a):
        return a.n == 0

    def __eq__(a, b):
        return isinstance(b, _FpW) and a.n == b.n

    def __hash__(self):
        return hash(self.n)

    @staticmethod
    def zero():
        return _FpW(0)

    @staticmethod
    def one():
        return _FpW(1)


def _jac_double(pt, fzero, fone):
    X, Y, Z = pt
    if Z.is_zero() or Y.is_zero():
        return (fone, fone, fzero)
    A = X.sqr()
    B = Y.sqr()
    C = B.sqr()
    D = (X + B).sqr() - A - C
    D = D + D
    E = A + A + A
    F = E.sqr()
    X3 = F - (D + D)
    Y3 = E * (D - X3) - (C + C + C + C + C + C + C + C)
    Z3 = (Y * Z) + (Y * Z)
    return (X3, Y3, Z3)


def _jac_add(p, q, fzero, fone):
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    if Z1.is_zero():
        return q
    if Z2.is_zero():
        return p
    Z1Z1 = Z1.sqr()
    Z2Z2 = Z2.sqr()
    U1 = X1 * Z2Z2
    U2 = X2 * Z1Z1
    S1 = Y1 * Z2 * Z2Z2
    S2 = Y2 * Z1 * Z1Z1
    if U1 == U2:
        if S1 == S2:
            return _jac_double(p, fzero, fone)
        return (fone, fone, fzero)
    H = U2 - U1
    I = (H + H).sqr()
    J = H * I
    rr = (S2 - S1) + (S2 - S1)
    V = U1 * I
    X3 = rr.sqr() - J - (V + V)
    Y3 = rr * (V - X3) - (S1 * J + S1 * J)
    Z3 = ((Z1 + Z2).sqr() - Z1Z1 - Z2Z2) * H
    return (X3, Y3, Z3)


def _jac_neg(p, fzero, fone):
    X, Y, Z = p
    return (X, -Y, Z)


def _jac_scalar_mul(p, k: int, fzero, fone):
    # NB: k is deliberately NOT reduced mod r — subgroup checks multiply by
    # r itself and must not short-circuit (a k%r here once made the golden
    # subgroup check vacuously true).
    assert k >= 0
    acc = (fone, fone, fzero)
    if k == 0:
        return acc
    for bit in bin(k)[2:]:
        acc = _jac_double(acc, fzero, fone)
        if bit == "1":
            acc = _jac_add(acc, p, fzero, fone)
    return acc


def _jac_to_affine(p, fzero, fone):
    X, Y, Z = p
    if Z.is_zero():
        return None
    zi = Z.inv()
    zi2 = zi.sqr()
    return (X * zi2, Y * zi2 * zi)


# --- G1 public helpers (points: None = infinity, else Jacobian _FpW tuple) ---

G1_GEN = (_FpW(G1_X), _FpW(G1_Y), _FpW(1))
G1_INF = (_FpW(1), _FpW(1), _FpW(0))


def g1_add(p, q):
    return _jac_add(p, q, _FpW.zero(), _FpW.one())


def g1_double(p):
    return _jac_double(p, _FpW.zero(), _FpW.one())


def g1_neg(p):
    return _jac_neg(p, _FpW.zero(), _FpW.one())


def g1_mul(p, k: int):
    return _jac_scalar_mul(p, k, _FpW.zero(), _FpW.one())


def g1_affine(p):
    """-> (x, y) ints or None for infinity."""
    a = _jac_to_affine(p, _FpW.zero(), _FpW.one())
    return None if a is None else (a[0].n, a[1].n)


def g1_from_affine(xy):
    if xy is None:
        return G1_INF
    return (_FpW(xy[0]), _FpW(xy[1]), _FpW(1))


def g1_eq(p, q) -> bool:
    return g1_affine(p) == g1_affine(q)


def g1_is_on_curve(p) -> bool:
    a = g1_affine(p)
    if a is None:
        return True
    x, y = a
    return (y * y - (x * x * x + 4)) % P == 0


def g1_in_subgroup(p) -> bool:
    return g1_is_on_curve(p) and g1_affine(g1_mul(p, R)) is None


def g1_msm(points, scalars):
    acc = G1_INF
    for pt, s in zip(points, scalars):
        acc = g1_add(acc, g1_mul(pt, s))
    return acc


# --- G2 ---

G2_GEN = (Fp2(G2_X0, G2_X1), Fp2(G2_Y0, G2_Y1), Fp2.one())
G2_INF = (Fp2.one(), Fp2.one(), Fp2.zero())


def g2_add(p, q):
    return _jac_add(p, q, Fp2.zero(), Fp2.one())


def g2_double(p):
    return _jac_double(p, Fp2.zero(), Fp2.one())


def g2_neg(p):
    return _jac_neg(p, Fp2.zero(), Fp2.one())


def g2_mul(p, k: int):
    return _jac_scalar_mul(p, k, Fp2.zero(), Fp2.one())


def g2_affine(p):
    return _jac_to_affine(p, Fp2.zero(), Fp2.one())


def g2_from_affine(xy):
    if xy is None:
        return G2_INF
    return (xy[0], xy[1], Fp2.one())


def g2_eq(p, q) -> bool:
    return g2_affine(p) == g2_affine(q)


def g2_is_on_curve(p) -> bool:
    a = g2_affine(p)
    if a is None:
        return True
    x, y = a
    b = Fp2(4, 4)  # 4(1+u)
    return y.sqr() == x * x * x + b


def g2_in_subgroup(p) -> bool:
    return g2_is_on_curve(p) and g2_affine(g2_mul(p, R)) is None


# ---------------------------------------------------------------------------
# Serialization (ZCash compressed format)
# ---------------------------------------------------------------------------

_SIGN_THRESHOLD = (P - 1) // 2  # y is "largest" if y > (p-1)/2


def g1_compress(p) -> bytes:
    a = g1_affine(p)
    if a is None:
        return bytes([0xC0]) + bytes(47)
    x, y = a
    flags = 0x80 | (0x20 if y > _SIGN_THRESHOLD else 0)
    b = x.to_bytes(48, "big")
    return bytes([b[0] | flags]) + b[1:]


def g1_decompress(data: bytes):
    """-> Jacobian point; raises ValueError on invalid encodings."""
    if len(data) != 48:
        raise ValueError("G1 compressed point must be 48 bytes")
    flags = data[0] & 0xE0
    if not (flags & 0x80):
        raise ValueError("uncompressed G1 not supported")
    if flags & 0x40:  # infinity
        if (data[0] & 0x1F) or any(data[1:]) or (flags & 0x20):
            raise ValueError("invalid G1 infinity encoding")
        return G1_INF
    x = int.from_bytes(bytes([data[0] & 0x1F]) + data[1:], "big")
    if x >= P:
        raise ValueError("G1 x out of range")
    y = fp_sqrt((x * x * x + 4) % P)
    if y is None:
        raise ValueError("G1 x not on curve")
    if (y > _SIGN_THRESHOLD) != bool(flags & 0x20):
        y = P - y
    pt = g1_from_affine((x, y))
    if not g1_in_subgroup(pt):
        raise ValueError("G1 point not in subgroup")
    return pt


def g2_compress(p) -> bytes:
    a = g2_affine(p)
    if a is None:
        return bytes([0xC0]) + bytes(95)
    x, y = a
    flag_sign = (y.c1, y.c0) > ((P - y.c1) % P, (P - y.c0) % P) if not y.is_zero() else False
    # lexicographic largest: compare (c1, c0) against its negation
    flags = 0x80 | (0x20 if flag_sign else 0)
    b = x.c1.to_bytes(48, "big") + x.c0.to_bytes(48, "big")
    return bytes([b[0] | flags]) + b[1:]


def g2_decompress(data: bytes):
    if len(data) != 96:
        raise ValueError("G2 compressed point must be 96 bytes")
    flags = data[0] & 0xE0
    if not (flags & 0x80):
        raise ValueError("uncompressed G2 not supported")
    if flags & 0x40:
        if (data[0] & 0x1F) or any(data[1:]) or (flags & 0x20):
            raise ValueError("invalid G2 infinity encoding")
        return G2_INF
    x1 = int.from_bytes(bytes([data[0] & 0x1F]) + data[1:48], "big")
    x0 = int.from_bytes(data[48:], "big")
    if x0 >= P or x1 >= P:
        raise ValueError("G2 x out of range")
    x = Fp2(x0, x1)
    y = (x * x * x + Fp2(4, 4)).sqrt()
    if y is None:
        raise ValueError("G2 x not on curve")
    is_large = (y.c1, y.c0) > ((P - y.c1) % P, (P - y.c0) % P) if not y.is_zero() else False
    if is_large != bool(flags & 0x20):
        y = -y
    pt = g2_from_affine((x, y))
    if not g2_in_subgroup(pt):
        raise ValueError("G2 point not in subgroup")
    return pt


# ---------------------------------------------------------------------------
# Pairing: affine Miller loop over E(Fp12) via untwist (SURVEY.md section 0.2)
# ---------------------------------------------------------------------------


def _untwist(q_aff):
    """E'(Fp2) twist point -> E(Fp12): X = x'/w^2, Y = y'/w^3."""
    x, y = q_aff
    return (fp12_from_fp2(x) * W12_INV2, fp12_from_fp2(y) * W12_INV3)


def _line(a, b, p):
    """Line through affine E(Fp12) points a, b (tangent if a == b), eval at p."""
    ax, ay = a
    bx, by = b
    px, py = p
    if ax == bx and ay == by:
        # tangent: lambda = 3x^2 / 2y  (a = 0 curve)
        num = (ax * ax) + (ax * ax) + (ax * ax)
        lam = num * (ay + ay).inv()
    elif ax == bx:
        # vertical line
        return px - ax
    else:
        lam = (by - ay) * (bx - ax).inv()
    return (py - ay) - lam * (px - ax)


def _aff_double(a):
    ax, ay = a
    lam = ((ax * ax) + (ax * ax) + (ax * ax)) * (ay + ay).inv()
    x3 = lam * lam - ax - ax
    return (x3, lam * (ax - x3) - ay)


def _aff_add(a, b):
    ax, ay = a
    bx, by = b
    lam = (by - ay) * (bx - ax).inv()
    x3 = lam * lam - ax - bx
    return (x3, lam * (ax - x3) - ay)


def miller_loop(p_g1_aff, q_g2_aff) -> Fp12:
    """Optimal-Ate Miller loop f_{|x|,Q}(P), conjugated for x < 0.

    p_g1_aff: (x, y) ints, affine, not infinity.
    q_g2_aff: (Fp2, Fp2) affine twist point, not infinity.
    """
    p12 = (fp12_from_fp(p_g1_aff[0]), fp12_from_fp(p_g1_aff[1]))
    q12 = _untwist(q_g2_aff)
    t = q12
    f = Fp12.one()
    for bit in bin(abs(X_BLS))[3:]:
        f = f * f * _line(t, t, p12)
        t = _aff_double(t)
        if bit == "1":
            f = f * _line(t, q12, p12)
            t = _aff_add(t, q12)
    return f.conj()  # x < 0


def final_exp(f: Fp12) -> Fp12:
    return f.pow(FINAL_EXP_E)


def pairing(p_g1, q_g2) -> Fp12:
    """e(P, Q)^3 — the project-wide pairing (see module docstring)."""
    pa = g1_affine(p_g1)
    qa = g2_affine(q_g2)
    if pa is None or qa is None:
        return Fp12.one()
    return final_exp(miller_loop(pa, qa))


def pairing_check(pairs) -> bool:
    """prod e(P_i, Q_i) == 1, with a single shared final exponentiation."""
    f = Fp12.one()
    for p_g1, q_g2 in pairs:
        pa = g1_affine(p_g1)
        qa = g2_affine(q_g2)
        if pa is None or qa is None:
            continue
        f = f * miller_loop(pa, qa)
    return final_exp(f) == Fp12.one()


# ---------------------------------------------------------------------------
# NTT / polynomial layer over Fr
# ---------------------------------------------------------------------------


def bit_reversal_permutation(values):
    n = len(values)
    assert n & (n - 1) == 0
    bits = n.bit_length() - 1
    return [values[int(bin(i)[2:].zfill(bits)[::-1], 2)] for i in range(n)]


def ntt(coeffs, inverse=False):
    """Radix-2 NTT over Fr. Input: coefficients; output: evaluations at
    [w^0, w^1, ..., w^{n-1}] in natural order (inverse maps back)."""
    n = len(coeffs)
    assert n & (n - 1) == 0
    a = bit_reversal_permutation([c % R for c in coeffs])
    w_n = fr_omega(n)
    if inverse:
        w_n = fr_inv(w_n)
    length = 2
    while length <= n:
        w_step = pow(w_n, n // length, R)
        for start in range(0, n, length):
            w = 1
            half = length // 2
            for j in range(start, start + half):
                u, v = a[j], (a[j + half] * w) % R
                a[j] = (u + v) % R
                a[j + half] = (u - v) % R
                w = (w * w_step) % R
        length *= 2
    if inverse:
        n_inv = fr_inv(n)
        a = [(x * n_inv) % R for x in a]
    return a


def intt(evals):
    return ntt(evals, inverse=True)


def poly_eval(coeffs, z: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % R
    return acc


def barycentric_eval(evals, z: int, omega: int | None = None) -> int:
    """Evaluate the evaluation-form polynomial at z (natural domain order):
    p(z) = (z^n - 1)/n * sum_i e_i * w^i / (z - w^i); in-domain returns e_m."""
    n = len(evals)
    w = omega if omega is not None else fr_omega(n)
    # in-domain?
    wi = 1
    for i in range(n):
        if wi == z % R:
            return evals[i] % R
        wi = (wi * w) % R
    zn = pow(z, n, R)
    factor = ((zn - 1) * fr_inv(n)) % R
    acc = 0
    wi = 1
    for i in range(n):
        acc = (acc + evals[i] * wi % R * fr_inv((z - wi) % R)) % R
        wi = (wi * w) % R
    return (acc * factor) % R


def eval_form_quotient(evals, z: int, y: int, omega: int | None = None):
    """q_i for the KZG witness polynomial in evaluation form (SURVEY 0.2):
    out-of-domain: q_i = (e_i - y)/(w^i - z)
    in-domain (z = w^m): q_i = (e_i - y)/(w^i - z) for i != m and
       q_m = sum_{j != m} (e_j - y) * w^j / (w^m (w^m - w^j))."""
    n = len(evals)
    w = omega if omega is not None else fr_omega(n)
    roots = []
    wi = 1
    for _ in range(n):
        roots.append(wi)
        wi = (wi * w) % R
    m = None
    for i in range(n):
        if roots[i] == z % R:
            m = i
            break
    q = [0] * n
    if m is None:
        for i in range(n):
            q[i] = (evals[i] - y) * fr_inv((roots[i] - z) % R) % R
        return q
    for i in range(n):
        if i == m:
            continue
        q[i] = (evals[i] - y) * fr_inv((roots[i] - z) % R) % R
        # accumulate the in-domain term
        q[m] = (q[m] + (evals[i] - y) * roots[i] % R *
                fr_inv(roots[m] * ((roots[m] - roots[i]) % R) % R)) % R
    return q


# ---------------------------------------------------------------------------
# KZG protocol
# ---------------------------------------------------------------------------


class GoldenSetup:
    """Insecure dev setup from an explicit tau (power-of-two degree n)."""

    def __init__(self, tau: int, n: int):
        assert n & (n - 1) == 0
        self.n = n
        self.tau = tau % R
        self.omega = fr_omega(n)
        self.roots = []
        wi = 1
        for _ in range(n):
            self.roots.append(wi)
            wi = (wi * self.omega) % R
        # Monomial SRS: [tau^i] G1
        self.g1_monomial = []
        t = 1
        for _ in range(n):
            self.g1_monomial.append(g1_mul(G1_GEN, t))
            t = (t * self.tau) % R
        # Lagrange SRS: [L_i(tau)] G1, computed in Fr with known tau
        lag = self.lagrange_scalars()
        self.g1_lagrange = [g1_mul(G1_GEN, s) for s in lag]
        self.g2_gen = G2_GEN
        self.g2_tau = g2_mul(G2_GEN, self.tau)

    def lagrange_scalars(self):
        n, tau = self.n, self.tau
        if tau in self.roots:  # degenerate dev case
            return [1 if r == tau else 0 for r in self.roots]
        zn = (pow(tau, n, R) - 1) % R
        ninv = fr_inv(n)
        return [zn * ninv % R * self.roots[i] % R *
                fr_inv((tau - self.roots[i]) % R) % R for i in range(n)]


def commit_coeff(setup: GoldenSetup, coeffs):
    assert len(coeffs) <= setup.n
    return g1_msm(setup.g1_monomial[: len(coeffs)], coeffs)


def commit_lagrange(setup: GoldenSetup, evals):
    assert len(evals) == setup.n
    return g1_msm(setup.g1_lagrange, evals)


def compute_proof(setup: GoldenSetup, evals, z: int):
    """Open evaluation-form polynomial at z -> (proof point, y)."""
    y = barycentric_eval(evals, z, setup.omega)
    q = eval_form_quotient(evals, z, y, setup.omega)
    pi = g1_msm(setup.g1_lagrange, q)
    return pi, y


def verify(setup: GoldenSetup, commitment, z: int, y: int, proof) -> bool:
    """e(C - [y]_1 + [z] pi, [1]_2) == e(pi, [tau]_2)."""
    lhs_pt = g1_add(g1_add(commitment, g1_neg(g1_mul(G1_GEN, y))),
                    g1_mul(proof, z))
    return pairing_check([
        (lhs_pt, setup.g2_gen),
        (g1_neg(proof), setup.g2_tau),
    ])


def verify_batch(setup: GoldenSetup, commitments, zs, ys, proofs, rho: int) -> bool:
    """Fold k openings with powers of rho into one MSM + 2 pairings:
    e(sum rho^i pi_i, [tau]_2) == e(sum rho^i (C_i - [y_i]_1 + z_i pi_i), [1]_2)
    """
    k = len(commitments)
    acc_l = G1_INF  # sum rho^i (C_i - [y_i] G1 + z_i pi_i)
    acc_pi = G1_INF  # sum rho^i pi_i
    rp = 1
    for i in range(k):
        term = g1_add(
            g1_add(commitments[i], g1_neg(g1_mul(G1_GEN, ys[i]))),
            g1_mul(proofs[i], zs[i]),
        )
        acc_l = g1_add(acc_l, g1_mul(term, rp))
        acc_pi = g1_add(acc_pi, g1_mul(proofs[i], rp))
        rp = (rp * rho) % R
    return pairing_check([
        (acc_l, setup.g2_gen),
        (g1_neg(acc_pi), setup.g2_tau),
    ])


# ---------------------------------------------------------------------------
# Fiat-Shamir transcript (EIP-4844-shaped; host-side, SHA-256)
# ---------------------------------------------------------------------------

FIAT_SHAMIR_DOMAIN = b"FSBLOBVERIFY_V1_"
RANDOM_CHALLENGE_DOMAIN = b"RCKZGBATCH___V1_"
BYTES_PER_FIELD_ELEMENT = 32


def hash_to_fr(data: bytes) -> int:
    return int.from_bytes(hashlib.sha256(data).digest(), "big") % R


def fr_to_bytes(x: int) -> bytes:
    return (x % R).to_bytes(32, "big")


def blob_to_bytes(blob) -> bytes:
    return b"".join(fr_to_bytes(e) for e in blob)


def blob_from_bytes(data: bytes):
    assert len(data) % 32 == 0
    out = []
    for i in range(0, len(data), 32):
        v = int.from_bytes(data[i : i + 32], "big")
        if v >= R:
            raise ValueError("blob element out of Fr range")
        out.append(v)
    return out


def compute_challenge(blob, commitment_bytes: bytes, n: int) -> int:
    data = (FIAT_SHAMIR_DOMAIN + n.to_bytes(16, "big")
            + blob_to_bytes(blob) + commitment_bytes)
    return hash_to_fr(data)


def compute_r_powers(commitment_bytes_list, zs, ys, proof_bytes_list, n: int):
    k = len(commitment_bytes_list)
    data = RANDOM_CHALLENGE_DOMAIN + n.to_bytes(16, "big") + k.to_bytes(8, "big")
    for i in range(k):
        data += commitment_bytes_list[i]
        data += fr_to_bytes(zs[i])
        data += fr_to_bytes(ys[i])
        data += proof_bytes_list[i]
    rho = hash_to_fr(data)
    powers = [1] * k
    for i in range(1, k):
        powers[i] = (powers[i - 1] * rho) % R
    return rho, powers


# ---------------------------------------------------------------------------
# Blob API (EIP-4844-shaped; blobs are evaluations on the bit-reversed domain)
# ---------------------------------------------------------------------------


def _blob_to_natural(setup: GoldenSetup, blob):
    """Blobs store evaluations at bit-reversed roots; map to natural order."""
    return bit_reversal_permutation(list(blob))


def blob_to_kzg_commitment(setup: GoldenSetup, blob):
    return commit_lagrange(setup, _blob_to_natural(setup, blob))


def compute_kzg_proof(setup: GoldenSetup, blob, z: int):
    evals = _blob_to_natural(setup, blob)
    pi, y = compute_proof(setup, evals, z)
    return pi, y


def verify_kzg_proof(setup: GoldenSetup, commitment, z: int, y: int, proof) -> bool:
    return verify(setup, commitment, z, y, proof)


def compute_blob_kzg_proof(setup: GoldenSetup, blob, commitment_bytes: bytes):
    z = compute_challenge(blob, commitment_bytes, setup.n)
    return compute_kzg_proof(setup, blob, z)


def verify_blob_kzg_proof(setup: GoldenSetup, blob, commitment_bytes: bytes,
                          proof_bytes: bytes) -> bool:
    commitment = g1_decompress(commitment_bytes)
    proof = g1_decompress(proof_bytes)
    z = compute_challenge(blob, commitment_bytes, setup.n)
    y = barycentric_eval(_blob_to_natural(setup, blob), z, setup.omega)
    return verify(setup, commitment, z, y, proof)


def verify_blob_kzg_proof_batch(setup: GoldenSetup, blobs,
                                commitment_bytes_list, proof_bytes_list) -> bool:
    k = len(blobs)
    commitments = [g1_decompress(b) for b in commitment_bytes_list]
    proofs = [g1_decompress(b) for b in proof_bytes_list]
    zs, ys = [], []
    for i in range(k):
        z = compute_challenge(blobs[i], commitment_bytes_list[i], setup.n)
        y = barycentric_eval(_blob_to_natural(setup, blobs[i]), z, setup.omega)
        zs.append(z)
        ys.append(y)
    rho, _ = compute_r_powers(commitment_bytes_list, zs, ys,
                              proof_bytes_list, setup.n)
    return verify_batch(setup, commitments, zs, ys, proofs, rho)
