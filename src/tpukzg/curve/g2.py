"""G2: E'(Fp2) with y^2 = x^3 + 4(1+u)  (SURVEY.md component 7).

96-byte compressed codec with the ZCash convention: x = x_c1 || x_c0,
sign = lexicographic on (c1, c0).
"""

from __future__ import annotations

import numpy as np

from tpukzg.field.mont import FP, FR, P_MOD
from tpukzg.field.tower import FP2
from tpukzg.curve.weierstrass import CurveOps

G2_X0 = 0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8
G2_X1 = 0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E
G2_Y0 = 0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801
G2_Y1 = 0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE


def fp2_from_ints(c0: int, c1: int) -> np.ndarray:
    return np.stack([np.asarray(FP.to_mont(FP.from_int(c0))),
                     np.asarray(FP.to_mont(FP.from_int(c1)))])


def fp2_to_ints(a):
    a = np.asarray(FP.from_mont(a))
    return FP.to_int(a[..., 0, :]), FP.to_int(a[..., 1, :])


_gen_x = fp2_from_ints(G2_X0, G2_X1)
_gen_y = fp2_from_ints(G2_Y0, G2_Y1)


def _b3_mul(x):
    # 3b = 12(1+u): multiply by xi = 1+u, then by 12.
    return FP2.mul_small(FP2.mul_by_nonresidue(x), 12)


G2 = CurveOps(
    "G2",
    FP2,
    b3_mul=_b3_mul,
    gen_affine_np=(_gen_x, _gen_y),
    order_bits=FR._bits(FR.modulus),
)


def point_from_ints(x0, x1, y0, y1, is_inf: bool = False):
    if is_inf:
        return tuple(np.asarray(c) for c in G2.inf_np)
    return (fp2_from_ints(x0, x1), fp2_from_ints(y0, y1),
            np.asarray(FP2.one_np))


def point_to_ints(p):
    """-> ((x0, x1), (y0, y1), is_inf)."""
    x, y, inf = G2.normalize(p)
    return fp2_to_ints(np.asarray(x)), fp2_to_ints(np.asarray(y)), np.asarray(inf)


def compress(x0: int, x1: int, y0: int, y1: int, is_inf: bool) -> bytes:
    if is_inf:
        return bytes([0xC0]) + bytes(95)
    large = (y1, y0) > ((P_MOD - y1) % P_MOD, (P_MOD - y0) % P_MOD) if (y0, y1) != (0, 0) else False
    flags = 0x80 | (0x20 if large else 0)
    b = x1.to_bytes(48, "big") + x0.to_bytes(48, "big")
    return bytes([b[0] | flags]) + b[1:]


def compress_point(p) -> bytes:
    (x0, x1), (y0, y1), inf = point_to_ints(p)
    return compress(x0, x1, y0, y1, bool(inf))


# ---------------------------------------------------------------------------
# Host-side decompression (pure-int; mirrors golden/model.py:606 convention)
# ---------------------------------------------------------------------------


def _fp_sqrt_int(a: int):
    if a == 0:
        return 0
    s = pow(a, (P_MOD + 1) // 4, P_MOD)
    return s if (s * s) % P_MOD == a % P_MOD else None


def _fp2_sqrt_ints(c0: int, c1: int):
    """sqrt in Fp2 via the norm trick (p = 3 mod 4); None if non-residue."""
    if c0 == 0 and c1 == 0:
        return 0, 0
    if c1 == 0:
        s = _fp_sqrt_int(c0)
        if s is not None:
            return s, 0
        return 0, _fp_sqrt_int((-c0) % P_MOD)
    n = (c0 * c0 + c1 * c1) % P_MOD
    s = _fp_sqrt_int(n)
    if s is None:
        return None
    inv2 = pow(2, -1, P_MOD)
    x0 = _fp_sqrt_int((c0 + s) * inv2 % P_MOD)
    if x0 is None:
        x0 = _fp_sqrt_int((c0 - s) * inv2 % P_MOD)
        if x0 is None:
            return None
    x1 = c1 * pow(2 * x0 % P_MOD, -1, P_MOD) % P_MOD
    if ((x0 * x0 - x1 * x1) % P_MOD, 2 * x0 * x1 % P_MOD) != (c0 % P_MOD, c1 % P_MOD):
        return None
    return x0, x1


def decompress(data: bytes):
    """96 bytes -> (x0, x1, y0, y1, is_inf) host ints; ValueError on invalid
    encodings.  Subgroup membership is checked separately on device
    (G2.in_subgroup), same split as curve/g1.py decompress."""
    if len(data) != 96:
        raise ValueError("G2 compressed point must be 96 bytes")
    flags = data[0] & 0xE0
    if not (flags & 0x80):
        raise ValueError("uncompressed G2 not supported")
    if flags & 0x40:
        if (data[0] & 0x1F) or any(data[1:]) or (flags & 0x20):
            raise ValueError("invalid G2 infinity encoding")
        return 0, 0, 0, 0, True
    x1 = int.from_bytes(bytes([data[0] & 0x1F]) + data[1:48], "big")
    x0 = int.from_bytes(data[48:], "big")
    if x0 >= P_MOD or x1 >= P_MOD:
        raise ValueError("G2 x out of range")
    # y^2 = x^3 + 4(1+u)
    a0 = (x0 * x0 - x1 * x1) % P_MOD
    a1 = 2 * x0 * x1 % P_MOD
    c0 = (a0 * x0 - a1 * x1 + 4) % P_MOD
    c1 = (a0 * x1 + a1 * x0 + 4) % P_MOD
    y = _fp2_sqrt_ints(c0, c1)
    if y is None:
        raise ValueError("G2 x not on curve")
    y0, y1 = y
    is_large = ((y1, y0) > ((P_MOD - y1) % P_MOD, (P_MOD - y0) % P_MOD)
                if (y0, y1) != (0, 0) else False)
    if is_large != bool(flags & 0x20):
        y0, y1 = (P_MOD - y0) % P_MOD, (P_MOD - y1) % P_MOD
    return x0, x1, y0, y1, False
