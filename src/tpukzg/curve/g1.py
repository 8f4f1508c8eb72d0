"""G1: E(Fp) with y^2 = x^3 + 4  (SURVEY.md component 6).

Device arithmetic comes from the generic complete-projective CurveOps;
this module adds the constants and the host-side ZCash compressed codec
(48-byte, flag bits 0x80/0x40/0x20).
"""

from __future__ import annotations

import numpy as np

from tpukzg.field.mont import FP, FR, P_MOD, int_to_limbs
from tpukzg.curve.weierstrass import CurveOps

G1_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1

_gen_x = FP.to_mont_host(G1_X)
_gen_y = FP.to_mont_host(G1_Y)

G1 = CurveOps(
    "G1",
    FP,
    b3_mul=lambda x: FP.mul_small(x, 12),  # 3b = 12
    gen_affine_np=(_gen_x, _gen_y),
    order_bits=FR._bits(FR.modulus),
)

_SIGN_THRESHOLD = (P_MOD - 1) // 2


def _fp_sqrt_int(a: int):
    if a == 0:
        return 0
    s = pow(a, (P_MOD + 1) // 4, P_MOD)
    return s if (s * s) % P_MOD == a % P_MOD else None


def compress(x_int: int, y_int: int, is_inf: bool) -> bytes:
    """Affine ints -> 48-byte compressed encoding (host side)."""
    if is_inf:
        return bytes([0xC0]) + bytes(47)
    flags = 0x80 | (0x20 if y_int > _SIGN_THRESHOLD else 0)
    b = x_int.to_bytes(48, "big")
    return bytes([b[0] | flags]) + b[1:]


def decompress(data: bytes):
    """48 bytes -> (x_int, y_int, is_inf); raises ValueError on invalid
    encodings.  Subgroup membership is NOT checked here — run the batched
    device-side G1.in_subgroup on the deserialized points."""
    if len(data) != 48:
        raise ValueError("G1 compressed point must be 48 bytes")
    flags = data[0] & 0xE0
    if not (flags & 0x80):
        raise ValueError("uncompressed G1 not supported")
    if flags & 0x40:
        if (data[0] & 0x1F) or any(data[1:]) or (flags & 0x20):
            raise ValueError("invalid G1 infinity encoding")
        return 0, 0, True
    x = int.from_bytes(bytes([data[0] & 0x1F]) + data[1:], "big")
    if x >= P_MOD:
        raise ValueError("G1 x out of range")
    y = _fp_sqrt_int((x * x * x + 4) % P_MOD)
    if y is None:
        raise ValueError("G1 x not on curve")
    if (y > _SIGN_THRESHOLD) != bool(flags & 0x20):
        y = P_MOD - y
    return x, y, False


def point_from_ints(x: int, y: int, is_inf: bool = False):
    """Host ints -> device projective point (Montgomery limbs)."""
    if is_inf:
        return tuple(np.asarray(c) for c in G1.inf_np)
    return (FP.to_mont_host(x),
            FP.to_mont_host(y),
            np.asarray(FP.one_mont))


def points_from_ints(xs, ys, infs):
    """Lists of host ints -> batched device point (N leading axis).

    Vectorized: limb building is pure numpy and Montgomery conversion is
    ONE batched device call — per-point device roundtrips over the tunnel
    dominated the verify pipeline before this (profile 2026-08-16:
    ~8s -> ~0.1s for 128 points)."""
    n = len(xs)
    infs = np.asarray(list(infs), dtype=bool)
    x_l = np.stack([int_to_limbs(0 if i else x, FP.L)
                    for x, i in zip(xs, infs)])
    from tpukzg.utils import checked
    checked.check_limbs("points_from_ints.x", x_l)
    y_l = np.stack([int_to_limbs(1 if i else y, FP.L)
                    for y, i in zip(ys, infs)])
    z_l = np.broadcast_to(int_to_limbs(1, FP.L), (n, FP.L)).copy()
    z_l[infs] = 0
    coords = np.asarray(FP.to_mont(np.stack([x_l, y_l, z_l])))  # (3, n, L)
    return (coords[0], coords[1], coords[2])


def point_to_ints(p):
    """Device point -> (x_int, y_int, is_inf) via normalize (host side)."""
    x, y, inf = G1.normalize(p)
    xi = FP.to_int(np.asarray(FP.from_mont(x)))
    yi = FP.to_int(np.asarray(FP.from_mont(y)))
    return xi, yi, np.asarray(inf)


def compress_point(p) -> bytes:
    xi, yi, inf = point_to_ints(p)
    return compress(xi, yi, bool(inf))


def compress_points(p) -> list[bytes]:
    """Batched device points ((k, L) coords) -> list of 48-byte
    compressed encodings.  One batched normalize (the field inversions
    dominate), then host-side byte packing."""
    x, y, inf = G1.normalize(p)
    x = np.asarray(FP.from_mont(x))
    y = np.asarray(FP.from_mont(y))
    inf = np.asarray(inf)
    return [compress(FP.to_int(x[i]), FP.to_int(y[i]), bool(inf[i]))
            for i in range(x.shape[0])]


# ---------------------------------------------------------------------------
# Fast subgroup membership via the GLV endomorphism (SURVEY.md comp. 6)
# ---------------------------------------------------------------------------
#
# phi(x, y) = (beta x, y) with beta a primitive cube root of unity acts on
# the r-order subgroup as multiplication by lambda = x_BLS^2 - 1 (verified
# against the golden model in-session; lambda^2 + lambda + 1 = 0 mod r since
# r = x^4 - x^2 + 1).  deg(lambda - phi) = lambda^2 + lambda + 1 = r exactly,
# so ker(phi - [lambda]) has order r and equals G1: the test
#     on_curve(P)  and  phi(P) == [lambda]P
# accepts exactly G1 (plus infinity).  [lambda]P = [x]([x]P) - P costs two
# 64-bit x-ladders instead of one 255-bit r-ladder — ~2x fewer EC ops.

BETA_GLV = 0x1A0111EA397FE699EC02408663D4DE85AA0D857D89759AD4897D29650FB85F9B409427EB4F49FFFD8BFD00000000AAAC
_X_ABS = 0xD201000000010000
_beta_mont_col = FP.to_mont_host(BETA_GLV)[:, None]


def _x_addition_chain():
    """|x_BLS| as (run_of_doubles, then_add) segments after the leading
    bit: x has Hamming weight 6, so the MSB-first ladder is 63 doubles +
    5 adds — vs 63 doubles + 63 add-and-selects for a bit-table ladder."""
    bits = bin(_X_ABS)[2:]
    segs, run = [], 0
    for b in bits[1:]:
        run += 1
        if b == "1":
            segs.append((run, True))
            run = 0
    if run:
        segs.append((run, False))
    return tuple(segs)


_X_SEGS = _x_addition_chain()


def _mul_by_abs_x_lm(p):
    """[|x_BLS|] P in limb-major layout ((L, *batch) coords): static
    addition chain, double-runs as fori loops (6 small loop bodies keep
    the graph compile-friendly on this box's single-core XLA)."""
    from jax import lax
    from tpukzg.curve.weierstrass_lm import G1_LM

    acc = p
    for n_doubles, then_add in _X_SEGS:
        acc = lax.fori_loop(0, n_doubles, lambda i, a: G1_LM.double(a), acc)
        if then_add:
            acc = G1_LM.add(acc, p)
    return acc


def _in_subgroup_check(p):
    """Traced body of in_subgroup_fast (see below)."""
    import jax.numpy as jnp
    from tpukzg.curve.weierstrass_lm import G1_LM
    from tpukzg.field.limb_major import FP_LM

    plm = tuple(jnp.moveaxis(c, -1, 0) for c in p)    # (L, *batch)
    xp = _mul_by_abs_x_lm(plm)        # [x]P (sign of x squares away)
    x2p = _mul_by_abs_x_lm(xp)        # [x^2]P
    lam_p = G1_LM.add(x2p, G1_LM.neg(plm))            # [x^2 - 1]P
    beta = jnp.broadcast_to(jnp.asarray(_beta_mont_col).reshape(
        (FP.L,) + (1,) * (plm[0].ndim - 1)), plm[0].shape)
    phi = (FP_LM.mul(plm[0], beta), plm[1], plm[2])
    return G1_LM.eq(phi, lam_p) & G1_LM.is_on_curve(plm)


_in_subgroup_jit = None


# ---------------------------------------------------------------------------
# Batched device-side decompression (SURVEY.md comp. 6; VERDICT round-1 #8)
# ---------------------------------------------------------------------------
#
# p = 3 mod 4, so sqrt(a) = a^((p+1)/4) when a is a QR; the candidate is
# squared back and compared to detect non-residues (x not on curve).  The
# whole pipeline — Montgomery lift, x^3+4, ~381-step pow chain (one
# fori_loop), sign select, on-curve + subgroup verdict — is ONE jitted
# device program; the host only unpacks bytes and flag bits.  This
# replaces the per-point host bignum sqrt that cost ~180 ms / 512 points
# on the hot verify path (round-1 profile).

_SQRT_BITS = None  # lazy: FP._bits((P_MOD + 1) // 4)
_B_MONT = FP.to_mont_host(4)


def _decompress_sqrt(x_can, sign, inf):
    """Traced body: (n, L) canonical x limbs, (n,) sign flag (y > half),
    (n,) infinity flag -> ((X, Y, Z) Montgomery projective, ok_curve).
    ok_curve = x is a QR (point is on the curve).  The subgroup check is
    a SEPARATE jitted program (in_subgroup_fast): the fused graph's
    executable crashed XLA:CPU's serializer (cpu:jit__decompress_check
    sentinel, VERDICT r2), and split programs also cache/compile
    faster."""
    import jax.numpy as jnp

    xm = FP._to_mont(x_can)
    rhs = FP._add(FP._mul(FP._sqr(xm), xm),
                  jnp.broadcast_to(jnp.asarray(_B_MONT), xm.shape))
    y = FP.pow_bits(rhs, _SQRT_BITS)
    ok_curve = FP.eq(FP._sqr(y), rhs)
    flip = FP._gt_half(FP._from_mont(y)) != sign
    y = FP.select(flip, FP._neg(y), y)

    one = jnp.broadcast_to(jnp.asarray(FP.one_mont), xm.shape)
    zero = jnp.zeros_like(xm)
    X = FP.select(inf, zero, xm)
    Y = FP.select(inf, one, y)
    Z = FP.select(inf, zero, one)
    return (X, Y, Z), ok_curve


_decompress_jit = None
_combine_ok_jit = None


def decompress_batch(byte_list):
    """48-byte compressed encodings -> batched device point + ok mask.

    Host work is bytes-only (flag parsing, x < p range check); the sqrt,
    curve and subgroup checks run batched on device.  Raises ValueError
    on malformed ENCODINGS (bad flags, x out of range) exactly like
    `decompress`; x-not-on-curve / not-in-subgroup surface via the
    returned (device, unsynced) ok mask instead of an exception."""
    global _SQRT_BITS, _decompress_jit
    n = len(byte_list)
    raw = np.frombuffer(b"".join(byte_list), np.uint8).reshape(n, 48)
    if raw.shape[1] != 48:
        raise ValueError("G1 compressed point must be 48 bytes")
    flags = raw[:, 0] & 0xE0
    if not np.all(flags & 0x80):
        raise ValueError("uncompressed G1 not supported")
    inf = (flags & 0x40) != 0
    sign = (flags & 0x20) != 0
    body = raw.copy()
    body[:, 0] &= 0x1F
    if np.any(inf & (sign | (body.max(axis=1) != 0))):
        raise ValueError("invalid G1 infinity encoding")
    # 16-bit little-endian limbs from big-endian bytes
    limbs_be = (body[:, 0::2].astype(np.uint32) << 8) | body[:, 1::2]
    x_l = np.ascontiguousarray(limbs_be[:, ::-1])
    p_l = np.asarray(FP.mod_limbs)[::-1]          # big-endian for lexicmp
    le = limbs_be < p_l
    gt = limbs_be > p_l
    first = np.argmax(le | gt, axis=1)
    idx = np.arange(n)
    in_range = (le | gt)[idx, first] & le[idx, first]
    if not np.all(in_range | inf):
        raise ValueError("G1 x out of range")
    if _SQRT_BITS is None:
        _SQRT_BITS = FP._bits((P_MOD + 1) // 4)
    global _combine_ok_jit
    if _decompress_jit is None:
        import jax
        _decompress_jit = jax.jit(_decompress_sqrt)
        _combine_ok_jit = jax.jit(
            lambda oc, sub, i: (oc & sub) | i)
    pts, ok_curve = _decompress_jit(x_l, sign, inf)
    from tpukzg.utils.config import KzgConfig
    if not KzgConfig.from_env().check_subgroup:
        # trusted-input mode (TPUKZG_CHECK_SUBGROUP=0): skip the GLV
        # membership chain; on-curve + range checks still run
        return pts, _combine_ok_jit(ok_curve, ok_curve, inf)
    sub = in_subgroup_fast(pts)
    return pts, _combine_ok_jit(ok_curve, sub, inf)


def in_subgroup_fast(p):
    """Batched G1 membership: on-curve and phi(P) == [x^2-1]P, where
    phi(x, y) = (beta x, y) acts on the r-subgroup as [lambda],
    lambda = x_BLS^2 - 1 (lambda^2 + lambda + 1 = 0 since
    r = x^4 - x^2 + 1; ker(phi - [lambda]) has order exactly r, so the
    test accepts exactly G1 plus infinity — verified vs the golden model
    in tests/test_curve.py).  [lambda]P = [x]([x]P) - P: two 64-bit
    x-chains (126 doubles + 10 adds) instead of a 255-bit [r]P ladder.
    Runs in limb-major layout so the point batch fills the 128 lanes.

    The jit wrapper is module-cached: rebuilding it per call forces a
    retrace + executable reload every call (measured 41 s/call at batch
    512 vs ~0.1 s with the cached wrapper)."""
    import jax
    if jax.default_backend() == "cpu":
        return _in_subgroup_split(p)
    global _in_subgroup_jit
    if _in_subgroup_jit is None:
        _in_subgroup_jit = jax.jit(_in_subgroup_check)
    return _in_subgroup_jit(p)


_sub_split_jits = None


def _in_subgroup_split(p):
    """CPU lowering of in_subgroup_fast as chained SMALL jits: the fused
    program recompiled ~6 min in EVERY process because its executable
    crashes the persistent cache's serializer (utils/cachefix.py
    sentinel cpu:jit__in_subgroup_check — the biggest fixed cost of the
    r1..r4 test suite).  One double-run program with a DYNAMIC fori
    bound serves all segments of both x-chains; values are identical
    (same ops, different program boundaries)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpukzg.curve.weierstrass_lm import G1_LM
    from tpukzg.field.limb_major import FP_LM

    global _sub_split_jits
    if _sub_split_jits is None:
        dbl_run = jax.jit(lambda q, n: lax.fori_loop(
            0, n, lambda i, a: G1_LM.double(a), q))

        def tail(plm, lam_p):
            beta = jnp.broadcast_to(jnp.asarray(_beta_mont_col).reshape(
                (FP.L,) + (1,) * (plm[0].ndim - 1)), plm[0].shape)
            phi = (FP_LM.mul(plm[0], beta), plm[1], plm[2])
            return G1_LM.eq(phi, lam_p) & G1_LM.is_on_curve(plm)

        _sub_split_jits = (dbl_run, jax.jit(G1_LM.add), jax.jit(G1_LM.neg),
                           jax.jit(tail))
    dbl_run, add_j, neg_j, tail_j = _sub_split_jits

    plm = tuple(jnp.moveaxis(jnp.asarray(c), -1, 0) for c in p)

    def mul_by_x(q):
        acc = q
        for n_doubles, then_add in _X_SEGS:
            acc = dbl_run(acc, jnp.int32(n_doubles))
            if then_add:
                acc = add_j(acc, q)
        return acc

    lam_p = add_j(mul_by_x(mul_by_x(plm)), neg_j(plm))   # [x^2 - 1]P
    return tail_j(plm, lam_p)
